"""Measure the culling keep fraction a trained checkpoint yields per rule.

Restores a checkpoint (e.g. the 25k stability run), refreshes the
occupancy grid from the trained density field, then reports the
final-level keep fraction under each requested keep rule — the quantity
train.py's self-gate compares against the capacity ladder.  A cheap
calibration probe: answers "which ladder rung would engage on this scene
under rule X / eps Y" in one forward batch instead of a full quality run.

Usage:
  python scripts/keep_frac_probe.py --checkpoint_dir /tmp/stab \
      --loader dummy_unbounded --near 0.2 --far 1e6 \
      --rules density:5e-3,alpha:1e-3,alpha:3e-3,alpha:1e-2
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from multinerf_tpu.utils import cache as _cache
_cache.enable_persistent_compilation_cache()

FLAGSHIP_GIN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'configs', '360.gin')


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--checkpoint_dir', type=str, required=True)
  p.add_argument('--loader', type=str, default='dummy_unbounded')
  p.add_argument('--near', type=float, default=0.2)
  p.add_argument('--far', type=float, default=1e6)
  p.add_argument('--batch', type=int, default=4096)
  p.add_argument('--rules', type=str,
                 default='density:5e-3,alpha:1e-3,alpha:3e-3,alpha:1e-2')
  args = p.parse_args()

  from multinerf_tpu import configs as configs_lib
  from multinerf_tpu import ginlite
  from multinerf_tpu import train_lib
  from multinerf_tpu.data import datasets
  from multinerf_tpu.models import culling
  from multinerf_tpu.parallel import mesh as mesh_lib
  from multinerf_tpu.utils import checkpoints as ckpt_lib

  results = {}
  for spec in args.rules.split(','):
    rule, value = spec.split(':')
    ginlite.clear_config()
    ginlite.parse_config_files_and_bindings([FLAGSHIP_GIN], [
        'NerfMLP.trunk_dtype = "bfloat16"',
        'PropMLP.trunk_dtype = "bfloat16"'])
    kwargs = dict(occupancy_keep_rule=rule)
    if rule == 'density':
      kwargs['occupancy_threshold'] = float(value)
    else:
      kwargs['occupancy_alpha_eps'] = float(value)
    config = configs_lib.Config(
        dataset_loader=args.loader, near=args.near, far=args.far,
        batch_size=args.batch, data_loss_type='mse',
        occupancy_culling=True, **kwargs)
    mesh = mesh_lib.create_mesh()
    dataset = datasets.load_dataset('train', '', config)

    rng = jax.random.PRNGKey(0)
    model, state, _, train_pstep, _ = train_lib.setup_model(
        config, rng, mesh=mesh, dataset=dataset)
    ckpt = ckpt_lib.CheckpointManager(args.checkpoint_dir, keep=100)
    state = ckpt.restore_latest(state)
    state = jax.device_put(state, mesh_lib.replicated(mesh))

    # Refresh the grid from the trained density field (train.py protocol).
    refresh_fn = culling.make_refresh_fn(model, config, mesh)
    grid = refresh_fn(state.params, jax.random.PRNGKey(1))
    state = state.replace(
        params={**state.params, 'occupancy': {'grid': grid}})

    # One uncull step computes the gate's keep-fraction stat.
    batch = mesh_lib.shard_batch_to_global(mesh, next(dataset))
    _, stats, _ = train_pstep(rng, state, batch, 1.0, 1.0)
    kf = float(stats['occ_keep_frac'])
    key = f'{rule}:{value}'
    results[key] = round(kf, 4)
    print(json.dumps({key: results[key]}), flush=True)

  print(json.dumps({'checkpoint': args.checkpoint_dir,
                    'loader': args.loader, 'keep_fracs': results}),
        flush=True)


if __name__ == '__main__':
  main()
