"""Occupancy-culling quality evidence at the flagship model scale.

Trains the 360-size model (8x1024 NerfMLP, contraction, 2 proposal levels)
on the synthetic DummySphere scene — full evaluation vs occupancy culling at
one or more capacities — and reports held-out novel-view PSNR through each
model's own render path, plus the measured keep fraction (the share of
final-level samples whose grid cell clears the density threshold).

This is the honest companion to bench.py's culled throughput number: the
capacity advertised there must show PSNR parity here.  (Real-scene
validation needs the mip-NeRF 360 datasets, which this environment does not
have; the dummy scene exercises the same geometry pipeline end to end.)

Usage: python scripts/cull_quality_experiment.py \
          [--steps 2000] [--capacities 0.5,0.33,0.25] [--out docs]
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

# Flagship SAMPLING geometry (contraction, reciprocal ray distances, 2
# proposal levels of 64 + 32 nerf samples — what the occupancy grid and the
# compaction actually see).  Default widths are debug-size: the 8x1024
# flagship trunk catastrophically overfits the 12-view 32x32 dummy scenes
# (train 30 dB / held-out 7 dB), which would say nothing about culling.
# --flagship switches to the REAL 360.gin widths (PropMLP 4x256, NerfMLP
# 8x1024) — pair it with the richer dummy_unbounded scene (48 views, 64^2,
# textured far shell) where held-out PSNR is meaningful at those widths.
BASE_BINDINGS = [
    'Model.raydist_fn = @jnp.reciprocal',
    'Model.opaque_background = True',
    'PropMLP.warp_fn = @coord.contract',
    'PropMLP.disable_density_normals = True',
    'PropMLP.disable_rgb = True',
    'NerfMLP.warp_fn = @coord.contract',
    'NerfMLP.disable_density_normals = True',
]
DEBUG_WIDTHS = [
    'PropMLP.net_depth = 2', 'PropMLP.net_width = 64',
    'NerfMLP.net_depth = 4', 'NerfMLP.net_width = 128',
]
FLAGSHIP_WIDTHS = [
    'PropMLP.net_depth = 4', 'PropMLP.net_width = 256',
    'NerfMLP.net_depth = 8', 'NerfMLP.net_width = 1024',
]
BINDINGS = BASE_BINDINGS + DEBUG_WIDTHS  # Overridden by --flagship in main.


def run(steps, capacity, eval_every, batch_size, loader='dummy_sphere',
        near=2.0, far=6.0, keep_rule='density', alpha_eps=1e-3):
  """Train once; capacity=None disables culling.  Returns the PSNR curve."""
  from multinerf_tpu import configs as configs_lib
  from multinerf_tpu import ginlite
  from multinerf_tpu import train_lib
  from multinerf_tpu.data import datasets
  from multinerf_tpu.models import culling
  from multinerf_tpu.models import nerf as models
  from multinerf_tpu.parallel import mesh as mesh_lib
  from multinerf_tpu.ops import image_ops

  ginlite.clear_config()
  ginlite.parse_config_files_and_bindings([], BINDINGS)
  # dummy_sphere: the geometric scene (unit sphere in empty space, novel
  # test ring) — the regime occupancy culling targets.  The plain 'dummy'
  # loader is a pure directional light field with density everywhere and
  # nothing cullable.
  kwargs = dict(
      dataset_loader=loader, batch_size=batch_size,
      data_loss_type='mse', near=near, far=far, max_steps=steps,
      render_chunk_size=8192,
      lr_init=2e-3, lr_final=2e-5, lr_delay_steps=512, lr_delay_mult=0.01)
  if capacity is not None:
    kwargs.update(occupancy_culling=True, occupancy_capacity_frac=capacity,
                  occupancy_warmup_steps=max(1, steps // 8),
                  occupancy_keep_rule=keep_rule,
                  occupancy_alpha_eps=alpha_eps)
  config = configs_lib.Config(**kwargs)
  mesh = mesh_lib.create_mesh()
  dataset = datasets.load_dataset('train', '', config)
  test_dataset = datasets.load_dataset('test', '', config)
  test_case = next(test_dataset)

  rng = jax.random.PRNGKey(0)
  model, state, render_pfn, train_pstep, _ = train_lib.setup_model(
      config, rng, mesh=mesh, dataset=dataset)
  cull_pstep = refresh_fn = render_cull_pfn = None
  if capacity is not None:
    cull_pstep = train_lib.create_train_step(model, config, mesh,
                                             dataset=dataset, cull=True)
    refresh_fn = culling.make_refresh_fn(model, config, mesh)
    # Grid-culled render, for reference only (production eval renders the
    # full path; see train_lib.setup_model).
    render_cull_pfn = train_lib.create_render_fn(model, mesh, cull=True)
  state = jax.device_put(state, mesh_lib.replicated(mesh))

  # Compile-once whole-image renderers (one per render fn).
  renderers = {id(render_pfn): models.ImageRenderer(render_pfn, config,
                                                    mesh=mesh)}
  if render_cull_pfn is not None:
    renderers[id(render_cull_pfn)] = models.ImageRenderer(
        render_cull_pfn, config, mesh=mesh)

  curve = []
  keep_frac = None
  keep_trace = []  # (step, measured keep fraction) at each grid refresh.
  cull_engaged = False
  cull_steps = 0
  t0 = time.time()
  for step, batch in zip(range(1, steps + 1), dataset):
    gb = mesh_lib.shard_batch_to_global(mesh, batch)
    tf = jnp.clip((step - 1) / (steps - 1), 0, 1)
    fn = train_pstep
    if (cull_pstep is not None and cull_engaged and
        step > config.occupancy_warmup_steps):
      fn = cull_pstep
      cull_steps += 1
    state, stats, rng = fn(rng, state, gb, tf, 1.0)
    if (refresh_fn is not None and
        step % config.occupancy_grid_refresh_every == 0):
      grid = refresh_fn(state.params, jax.random.PRNGKey(step))
      state = state.replace(
          params={**state.params, 'occupancy': {'grid': grid}})
      kf = stats.get('occ_keep_frac')
      if kf is not None:
        # Same self-gating rule as train.py.
        kf = float(kf)
        keep_trace.append((step, round(kf, 4)))
        cull_engaged = kf <= config.occupancy_capacity_frac
    if step % eval_every == 0 or step == steps:
      if 'occ_keep_frac' in stats:
        keep_frac = float(stats['occ_keep_frac'])
      def _psnr(pfn):
        rendering = renderers[id(pfn)](state.params, float(tf),
                                       test_case.rays)
        mse = float(np.mean((rendering['rgb'] - test_case.rgb) ** 2))
        return round(-10 * np.log10(mse), 3)
      entry = {'step': step, 'test_psnr': _psnr(render_pfn),
               'train_psnr': round(float(stats['psnr']), 3),
               'keep_frac': keep_frac, 'cull_steps': cull_steps}
      if render_cull_pfn is not None:
        entry['test_psnr_cull_render'] = _psnr(render_cull_pfn)
      curve.append(entry)
      print(json.dumps({'capacity': capacity, **entry}), flush=True)
  curve[-1]['train_time_s'] = round(time.time() - t0, 1)
  if keep_trace:
    curve[-1]['keep_frac_trace'] = keep_trace
  return curve


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--steps', type=int, default=2000)
  p.add_argument('--batch', type=int, default=4096)
  p.add_argument('--eval_every', type=int, default=500)
  p.add_argument('--capacities', type=str, default='0.5,0.33,0.25')
  p.add_argument('--out', type=str, default='docs')
  p.add_argument('--loader', type=str, default='dummy_sphere')
  p.add_argument('--near', type=float, default=2.0)
  p.add_argument('--far', type=float, default=6.0)
  p.add_argument('--flagship', action='store_true',
                 help='Real 360.gin widths (PropMLP 4x256, NerfMLP 8x1024).')
  p.add_argument('--trunk_dtype', type=str, default='float32',
                 choices=['float32', 'bfloat16', 'int8'])
  p.add_argument('--keep_rule', type=str, default='density',
                 choices=['density', 'alpha'],
                 help='Culling keep rule (Config.occupancy_keep_rule).')
  p.add_argument('--alpha_eps', type=float, default=1e-3,
                 help="Per-sample alpha bound for --keep_rule alpha.")
  p.add_argument('--tag', type=str, default='',
                 help='Extra output-filename tag (e.g. the trunk dtype).')
  p.add_argument('--skip_full', action='store_true',
                 help='Only run the culled arms (reuse a prior full run).')
  args = p.parse_args()

  global BINDINGS
  BINDINGS = BASE_BINDINGS + (
      FLAGSHIP_WIDTHS if args.flagship else DEBUG_WIDTHS)
  if args.trunk_dtype != 'float32':
    BINDINGS = BINDINGS + [
        f'NerfMLP.trunk_dtype = "{args.trunk_dtype}"',
        f'PropMLP.trunk_dtype = "{args.trunk_dtype}"']

  results = {'steps': args.steps, 'batch': args.batch, 'loader': args.loader,
             'flagship': args.flagship, 'trunk_dtype': args.trunk_dtype,
             'keep_rule': args.keep_rule, 'alpha_eps': args.alpha_eps,
             'runs': {}}
  kw = dict(loader=args.loader, near=args.near, far=args.far,
            keep_rule=args.keep_rule, alpha_eps=args.alpha_eps)
  if not args.skip_full:
    results['runs']['full'] = run(args.steps, None, args.eval_every,
                                  args.batch, **kw)
  for cap in [float(c) for c in args.capacities.split(',') if c]:
    results['runs'][f'cull_{cap}'] = run(args.steps, cap, args.eval_every,
                                         args.batch, **kw)
  suffix = '' if args.loader == 'dummy_sphere' else f'_{args.loader}'
  if args.tag:
    suffix += f'_{args.tag}'
  out = os.path.join(args.out, f'cull_quality{suffix}.json')
  with open(out, 'w') as f:
    json.dump(results, f, indent=1)
  print('wrote', out)


if __name__ == '__main__':
  main()
