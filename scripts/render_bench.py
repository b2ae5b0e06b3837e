"""Render/eval throughput benchmark: sec/frame + PSNR on a checkpoint.

Measures the production render path (train_lib.create_render_fn ->
models.render_image, the same path eval.py and render.py drive) on the
flagship 360 architecture, optionally comparing trunk dtypes — checkpoints
are interchangeable across f32/bf16/int8 trunks, and rendering is
forward-only, so the fused int8 trunk's forward speedup applies cleanly
with no gradient-quantization caveats.

Usage:
  python scripts/render_bench.py --checkpoint_dir /tmp/stab \
      --loader dummy_unbounded --near 0.2 --far 1e6 \
      --trunk_dtypes bfloat16,int8 [--frames 8]

Prints one JSON line per arm: {"trunk_dtype", "sec_per_frame",
"rays_per_sec", "psnr", ...} and a final comparison line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multinerf_tpu.utils import cache as _cache
_cache.enable_persistent_compilation_cache()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# The real flagship architecture comes from configs/360.gin (pinned, not
# re-stated, so the bench can't drift from the shipped config); the
# Config() kwargs below override its llff data fields for the dummy scene.
FLAGSHIP_GIN = os.path.join(REPO, 'configs', '360.gin')


def run_arm(trunk_dtype, args):
  from multinerf_tpu import configs as configs_lib
  from multinerf_tpu import ginlite
  from multinerf_tpu import train_lib
  from multinerf_tpu.data import datasets
  from multinerf_tpu.models import nerf as models
  from multinerf_tpu.parallel import mesh as mesh_lib
  from multinerf_tpu.utils import checkpoints as ckpt_lib

  ginlite.clear_config()
  bindings = []
  if trunk_dtype != 'float32':
    bindings += [f'NerfMLP.trunk_dtype = "{trunk_dtype}"',
                 f'PropMLP.trunk_dtype = "{trunk_dtype}"']
  ginlite.parse_config_files_and_bindings([FLAGSHIP_GIN], bindings)
  config = configs_lib.Config(
      dataset_loader=args.loader, near=args.near, far=args.far,
      render_chunk_size=args.chunk, batch_size=4096)
  mesh = mesh_lib.create_mesh()
  test_dataset = datasets.load_dataset('test', '', config)

  rng = jax.random.PRNGKey(0)
  model, state, render_pfn, _, _ = train_lib.setup_model(config, rng,
                                                         mesh=mesh)
  if args.checkpoint_dir:
    ckpt = ckpt_lib.CheckpointManager(args.checkpoint_dir, keep=100)
    state = ckpt.restore_latest(state)
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    step = ckpt.latest_step()
  else:
    step = 0

  # Pre-stage the test cases (rays stay host-side pytrees) and push ground
  # truth to device so the timed loop's only host->device traffic is ray
  # frames.  One compile-once renderer serves every frame.
  cases = [c for _, c in zip(range(args.frames), test_dataset)]
  gts = [jax.device_put(jnp.asarray(c.rgb)) for c in cases]
  renderer = models.ImageRenderer(render_pfn, config, mesh=mesh)

  def render_mse(case, gt):
    rendering = renderer(state.params, 1.0, case.rays, fetch=False)
    return jnp.mean((rendering['rgb'] - gt) ** 2)  # Device scalar.

  # Warmup/compile frame (also syncs the tunnel).
  t0 = time.perf_counter()
  warm_mse = float(render_mse(cases[0], gts[0]))
  t_first = time.perf_counter() - t0

  # Timed: dispatches queue asynchronously; fetching the MSE scalars at
  # the END forces completion of all frames, so the wall clock measures
  # on-chip render throughput plus ONE round trip — not (as a per-frame
  # fetch would, on the tunnelled platform) a round trip per frame.
  t0 = time.perf_counter()
  mses = np.asarray(jnp.stack([render_mse(c, g)
                               for c, g in zip(cases, gts)]))  # One fetch.
  sec = (time.perf_counter() - t0) / len(cases)
  psnrs = [-10 * np.log10(m) for m in mses]
  assert abs(mses[0] - warm_mse) < 1e-6  # Determinism across replays.

  h, w = cases[0].rays.origins.shape[:2]
  result = {
      'trunk_dtype': trunk_dtype,
      'checkpoint_step': step,
      'frame_hw': [h, w],
      'sec_per_frame': round(sec, 4),
      'rays_per_sec': round(h * w / sec, 1),
      'first_frame_s': round(t_first, 2),
      'psnr': round(float(np.mean(psnrs)), 3),
      'frames': len(psnrs),
  }
  print(json.dumps(result), flush=True)
  return result


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--checkpoint_dir', type=str, default='')
  p.add_argument('--loader', type=str, default='dummy_unbounded')
  p.add_argument('--near', type=float, default=0.2)
  p.add_argument('--far', type=float, default=1e6)
  p.add_argument('--chunk', type=int, default=16384)
  p.add_argument('--frames', type=int, default=8)
  p.add_argument('--trunk_dtypes', type=str, default='bfloat16,int8')
  args = p.parse_args()

  arms = [run_arm(d, args) for d in args.trunk_dtypes.split(',') if d]
  if len(arms) > 1:
    base = arms[0]
    comp = {a['trunk_dtype']: {
        'speedup_vs_' + base['trunk_dtype']:
            round(base['sec_per_frame'] / a['sec_per_frame'], 3),
        'psnr_delta': round(a['psnr'] - base['psnr'], 3)}
        for a in arms[1:]}
    print(json.dumps({'comparison': comp}), flush=True)


if __name__ == '__main__':
  main()
