"""Device-pace A/B of the RobustNeRF-loss train step (bench protocol).

The h2h robust arm's wall-clock split (docs/HEAD_TO_HEAD_ROBUST_*.json
train_sec) is dominated by per-step host feeding + loss fetch over the
axon tunnel in BOTH stacks, so it is not a device-throughput comparison.
This probe times the robustnerf-loss step the same way bench.py times the
360 step (device-chained windows, one sync per window) for ours AND the
reference's own pmap step at the identical flagship+robust surface.

Usage: python scripts/robust_step_probe.py [--out docs]
Writes docs/ROBUST_STEP_PROBE.json and prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'scripts'))

import jax
import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--out', default='docs')
  p.add_argument('--steps', type=int, default=60)
  p.add_argument('--tiny', action='store_true',
                 help='Structure smoke on small shapes (CPU-safe).')
  args = p.parse_args()

  import head_to_head as h2h
  from multinerf_tpu.parallel import mesh as mesh_lib

  arch = dict(h2h.ARCHS['robust'])
  if args.tiny:
    arch.update(prop_depth=2, prop_width=32, nerf_depth=2, nerf_width=64,
                num_levels=2, num_prop_samples=8, num_nerf_samples=4,
                batch_size=1024)
    args.steps = 2
  result = {'device': jax.devices()[0].device_kind,
            'batch_size': arch['batch_size'], 'protocol': 'bench-chained'}

  # Ours: flagship + robustnerf loss on real patch-structured batches.
  ours = h2h.build_ours(arch, 'dummy_distractor', 1000)
  batch = next(ours['train_data'])
  gbatch = mesh_lib.shard_batch_to_global(ours['mesh'], batch)
  rng = jax.random.PRNGKey(0)
  state = ours['state']

  def run_ours(n, state, rng):
    for _ in range(n):
      state, stats, rng = ours['train_pstep'](rng, state, gbatch, 0.5, 1.0)
    float(stats['loss'])  # One sync.
    return state, rng

  state, rng = run_ours(5, state, rng)  # Warmup/compile.
  best = 0.0
  for _ in range(2):
    t0 = time.perf_counter()
    state, rng = run_ours(args.steps, state, rng)
    dt = time.perf_counter() - t0
    best = max(best, arch['batch_size'] * args.steps / dt)
  result['ours_rays_per_sec'] = round(best, 1)

  # Reference: its own pmap step, same surface, same protocol.
  import flax
  ref, ref_config, ref_model = h2h.build_reference(arch, 1000)
  ref_vars = ref_model.init(
      jax.random.PRNGKey(1), rng=None,
      rays=h2h.to_ref_rays(ref, jax.tree_util.tree_map(
          lambda x: x[:, :1, :1] if x.ndim > 2 else x[:10], batch.rays)),
      train_frac=1.0, compute_extras=False, zero_glo=True)
  ref_state, _ = ref.train_utils.create_optimizer(ref_config, ref_vars)
  ref_pstep = ref.train_utils.create_train_step(ref_model, ref_config)
  ref_state = flax.jax_utils.replicate(ref_state)
  ref_rngs = jax.random.split(jax.random.PRNGKey(2),
                              jax.local_device_count())
  ref_batch = ref.utils.shard(h2h.to_ref_batch(ref, batch))

  def run_ref(n, state, rngs):
    for _ in range(n):
      state, stats, rngs = ref_pstep(rngs, state, ref_batch, None, 0.5, 1.0)
    float(stats['loss'][0])
    return state, rngs

  ref_state, ref_rngs = run_ref(5, ref_state, ref_rngs)
  ref_best = 0.0
  for _ in range(2):
    t0 = time.perf_counter()
    ref_state, ref_rngs = run_ref(args.steps, ref_state, ref_rngs)
    dt = time.perf_counter() - t0
    ref_best = max(ref_best, arch['batch_size'] * args.steps / dt)
  result['reference_rays_per_sec'] = round(ref_best, 1)
  result['vs_reference'] = round(best / ref_best, 3)

  print(json.dumps(result))
  os.makedirs(args.out, exist_ok=True)
  with open(os.path.join(args.out, 'ROBUST_STEP_PROBE.json'), 'w') as f:
    json.dump(result, f, indent=2)


if __name__ == '__main__':
  main()
