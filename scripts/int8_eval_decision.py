"""Decide whether the int8 trunk becomes the eval/render default.

VERDICT r3 #6: the "+0.04 dB int8 render" claim rested on one scene and
never checked Ref-NeRF-style configs (whose heads read trunk features).
This harness gathers the missing evidence:

Arm A (the int8 kernel's regime — 360-style, density normals off):
  for each dummy scene, train the flagship architecture briefly in bf16,
  then render the SAME checkpoint through the bf16 and int8 trunks
  (checkpoints are dtype-interchangeable) via the production
  ImageRenderer; report per-scene PSNR deltas and sec/frame.

Arm B (Ref-NeRF-style config): enables predicted normals + IDE +
  reflection/roughness/diffuse heads.  With density normals on (the
  blender_refnerf setting), the fused int8 kernel is structurally
  ineligible (gradients through featurization are required), so
  trunk_dtype='int8' silently routes through the XLA QuantDense path —
  measured slower than bf16 in round 3.  This arm measures what a user
  flipping the binding would actually get: PSNR delta AND the slowdown.

Output: docs/INT8_EVAL_DECISION.json + one JSON line per measurement.

Usage: python scripts/int8_eval_decision.py [--steps 2500] [--out docs]
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

FLAGSHIP = [
    'Model.raydist_fn = @jnp.reciprocal',
    'Model.opaque_background = True',
    'PropMLP.warp_fn = @coord.contract',
    'PropMLP.net_depth = 4', 'PropMLP.net_width = 256',
    'PropMLP.disable_density_normals = True',
    'PropMLP.disable_rgb = True',
    'NerfMLP.warp_fn = @coord.contract',
    'NerfMLP.net_depth = 8', 'NerfMLP.net_width = 1024',
    'NerfMLP.disable_density_normals = True',
]
# Ref-NeRF head stack at flagship width, density-gradient normals ON as in
# configs/blender_refnerf.gin — the config class whose trunk features feed
# view-dependent heads.
REFNERF = [
    'Model.single_mlp = True',
    'Model.num_levels = 2',
    'Model.num_prop_samples = 64',
    'Model.num_nerf_samples = 32',
    'NerfMLP.net_depth = 8', 'NerfMLP.net_width = 1024',
    'NerfMLP.disable_density_normals = False',
    'NerfMLP.enable_pred_normals = True',
    'NerfMLP.use_directional_enc = True',
    'NerfMLP.use_reflections = True',
    'NerfMLP.use_specular_tint = True',
    'NerfMLP.enable_pred_roughness = True',
    'NerfMLP.use_diffuse_color = True',
    'NerfMLP.use_n_dot_v = True',
    'NerfMLP.bottleneck_width = 128',
]

SCENES = {
    'dummy_sphere': dict(near=2.0, far=6.0),
    'dummy_scatter': dict(near=2.0, far=6.0),
    'dummy_unbounded': dict(near=0.2, far=1e6),
}


def build(bindings, trunk_dtype, loader, near, far, steps):
  from multinerf_tpu import configs as configs_lib
  from multinerf_tpu import ginlite
  from multinerf_tpu import train_lib
  from multinerf_tpu.data import datasets
  from multinerf_tpu.models import nerf as models
  from multinerf_tpu.parallel import mesh as mesh_lib

  ginlite.clear_config()
  dtype_bindings = []
  if trunk_dtype != 'float32':
    dtype_bindings = [f'NerfMLP.trunk_dtype = "{trunk_dtype}"',
                      f'PropMLP.trunk_dtype = "{trunk_dtype}"']
  ginlite.parse_config_files_and_bindings([], bindings + dtype_bindings)
  config = configs_lib.Config(
      dataset_loader=loader, batch_size=4096, data_loss_type='mse',
      near=near, far=far, max_steps=steps, render_chunk_size=8192,
      lr_init=2e-3, lr_final=2e-5, lr_delay_steps=512, lr_delay_mult=0.01)
  mesh = mesh_lib.create_mesh()
  train_data = datasets.load_dataset('train', '', config)
  test_data = datasets.load_dataset('test', '', config)
  model, state, render_pfn, train_pstep, _ = train_lib.setup_model(
      config, jax.random.PRNGKey(0), mesh=mesh, dataset=train_data)
  renderer = models.ImageRenderer(render_pfn, config, mesh=mesh)
  return dict(config=config, mesh=mesh, train_data=train_data,
              test_data=test_data, state=state, train_pstep=train_pstep,
              renderer=renderer)


def train(ctx, steps):
  from multinerf_tpu.parallel import mesh as mesh_lib
  state, rng = ctx['state'], jax.random.PRNGKey(1)
  state = jax.device_put(state, mesh_lib.replicated(ctx['mesh']))
  for step, batch in zip(range(1, steps + 1), ctx['train_data']):
    gb = mesh_lib.shard_batch_to_global(ctx['mesh'], batch)
    tf = float(np.clip((step - 1) / (steps - 1), 0, 1))
    state, stats, rng = ctx['train_pstep'](rng, state, gb, tf, 1.0)
  float(stats['loss'])  # Sync.
  return state


def render_psnr(ctx, params, frames=6):
  """Mean held-out PSNR + steady-state sec/frame over `frames` views."""
  cases = [ctx['test_data'].generate_ray_batch(i) for i in range(frames)]
  vals = []
  ctx['renderer'](params, 1.0, cases[0].rays)  # Compile.
  t0 = time.perf_counter()
  for c in cases:
    r = ctx['renderer'](params, 1.0, c.rays)
    mse = float(np.mean((np.asarray(r['rgb']) - c.rgb) ** 2))
    vals.append(-10 * np.log10(mse))
  sec = (time.perf_counter() - t0) / frames
  return float(np.mean(vals)), sec


def run_arm(name, bindings, loader, near, far, steps):
  # Train ONCE in bf16 (the shipping training dtype)...
  bf16 = build(bindings, 'bfloat16', loader, near, far, steps)
  t0 = time.time()
  state = train(bf16, steps)
  train_s = round(time.time() - t0, 1)
  params = jax.device_get(state.params)  # Host copy, dtype-agnostic tree.

  result = {'arm': name, 'loader': loader, 'train_steps': steps,
            'train_s': train_s}
  # ...then render the same checkpoint through each trunk dtype.
  for dtype in ('bfloat16', 'int8'):
    ctx = bf16 if dtype == 'bfloat16' else build(bindings, dtype, loader,
                                                 near, far, steps)
    from multinerf_tpu.parallel import mesh as mesh_lib
    p = jax.device_put(params, mesh_lib.replicated(ctx['mesh']))
    psnr, sec = render_psnr(ctx, p)
    result[f'psnr_{dtype}'] = round(psnr, 3)
    result[f'sec_per_frame_{dtype}'] = round(sec, 4)
  result['psnr_delta_int8'] = round(
      result['psnr_int8'] - result['psnr_bfloat16'], 3)
  result['render_speedup_int8'] = round(
      result['sec_per_frame_bfloat16'] / result['sec_per_frame_int8'], 3)
  print(json.dumps(result), flush=True)
  return result


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--steps', type=int, default=2500)
  p.add_argument('--refnerf_steps', type=int, default=1500)
  p.add_argument('--out', default='docs')
  args = p.parse_args()

  arms = []
  for loader, nf in SCENES.items():
    arms.append(run_arm(f'360_{loader}', FLAGSHIP, loader, nf['near'],
                        nf['far'], args.steps))
  arms.append(run_arm('refnerf_dummy_sphere', REFNERF, 'dummy_sphere',
                      2.0, 6.0, args.refnerf_steps))

  deltas_360 = [a['psnr_delta_int8'] for a in arms if a['arm'].startswith(
      '360_')]
  refnerf = arms[-1]
  decision = {
      'measurements': arms,
      'min_psnr_delta_360': min(deltas_360),
      'refnerf_psnr_delta': refnerf['psnr_delta_int8'],
      'refnerf_render_speedup': refnerf['render_speedup_int8'],
      'decision': None,  # Filled below.
  }
  # Default-on requires: no 360 scene loses PSNR materially AND the
  # Ref-NeRF class is not silently degraded (it routes through the
  # unfused QuantDense path, so speed there also matters).
  if min(deltas_360) > -0.05 and refnerf['psnr_delta_int8'] > -0.05 and (
      refnerf['render_speedup_int8'] >= 1.0):
    decision['decision'] = 'default-on'
  else:
    decision['decision'] = 'opt-in'
  os.makedirs(args.out, exist_ok=True)
  path = os.path.join(args.out, 'INT8_EVAL_DECISION.json')
  with open(path, 'w') as f:
    json.dump(decision, f, indent=2)
  print(json.dumps({'decision': decision['decision'],
                    'min_psnr_delta_360': decision['min_psnr_delta_360'],
                    'refnerf_psnr_delta': decision['refnerf_psnr_delta'],
                    'refnerf_render_speedup':
                        decision['refnerf_render_speedup'],
                    'wrote': path}), flush=True)


if __name__ == '__main__':
  main()
