"""Fair production-path render A/B: ours vs the reference, same frames.

Both stacks drive their PRODUCTION whole-image render surface on identical
synthetic frames of the flagship 360 architecture, including the final
host fetch:

  ours       models.ImageRenderer over the jitted SPMD render fn — one
             compile per frame shape, ONE device dispatch + ONE host
             fetch per frame.
  reference  the actual ``internal/models.py:625-706`` chunked host loop
             around its pmap render fn (what reference eval.py:101 runs),
             executed from the read-only /root/reference checkout.

Also reports ours with 2 frames in flight (``fetch=False`` + deferred
device_get, the pipelining eval.py uses) and ours with DEVICE-SIDE ray
casting (``models.DeviceImageRenderer``: cameras uploaded once, each
frame dispatches ONE int32 instead of a host-cast [H*W] ray pytree —
the production eval.py/render.py path for projective cameras).

Usage: python scripts/render_ab.py [--sizes 64,512] [--frames 6]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from multinerf_tpu.utils import cache as _cache
_cache.enable_persistent_compilation_cache()


def make_ray_fields(h, w, seed=2):
  # One source of truth for the "identical frames" premise: both stacks
  # (and bench.py's reference-render baseline) build frames from
  # bench.make_frame_rays, so a geometry change there can't silently
  # skew this A/B.
  from bench import make_frame_rays
  return make_frame_rays(h, w, seed=seed)


def time_device_cast(render_pfn, config, mesh, state, h, frames):
  from bench import SyntheticCameraRecord
  from multinerf_tpu.models import nerf as models
  renderer = models.DeviceImageRenderer(render_pfn, config,
                                        SyntheticCameraRecord(h, h),
                                        mesh=mesh)
  renderer(state.params, 1.0, 0)  # Warmup (compile).
  t0 = time.perf_counter()
  for _ in range(frames):
    renderer(state.params, 1.0, 0)
  seq = (time.perf_counter() - t0) / frames
  t0 = time.perf_counter()
  pending = renderer(state.params, 1.0, 0, fetch=False)
  for _ in range(frames - 1):
    nxt = renderer(state.params, 1.0, 0, fetch=False)
    jax.device_get(pending)
    pending = nxt
  jax.device_get(pending)
  pipe = (time.perf_counter() - t0) / frames
  return seq, pipe


def time_ours(renderer, state, rays, frames):
  # Warmup (compile).
  t0 = time.perf_counter()
  renderer(state.params, 1.0, rays)
  first = time.perf_counter() - t0
  # Sequential production: dispatch + fetch per frame.
  t0 = time.perf_counter()
  for _ in range(frames):
    out = renderer(state.params, 1.0, rays)
  seq = (time.perf_counter() - t0) / frames
  # Pipelined: 2 frames in flight.
  t0 = time.perf_counter()
  pending = renderer(state.params, 1.0, rays, fetch=False)
  for _ in range(frames - 1):
    nxt = renderer(state.params, 1.0, rays, fetch=False)
    jax.device_get(pending)
    pending = nxt
  jax.device_get(pending)
  pipe = (time.perf_counter() - t0) / frames
  del out
  return first, seq, pipe


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--sizes', type=str, default='64,512')
  p.add_argument('--frames', type=int, default=6)
  p.add_argument('--skip_reference', action='store_true')
  p.add_argument('--trunk_dtype', type=str, default='bfloat16',
                 help='ours-side trunk dtype (bfloat16 | int8 | float32); '
                      'the reference side always runs its own f32 stack')
  args = p.parse_args()
  sizes = [int(s) for s in args.sizes.split(',')]

  import bench
  from multinerf_tpu.data import types
  from multinerf_tpu.models import nerf as models

  DTYPE = [f'NerfMLP.trunk_dtype = "{args.trunk_dtype}"',
           f'PropMLP.trunk_dtype = "{args.trunk_dtype}"']
  state, _, _, (render_pfn, config, mesh), _ = bench.build({}, DTYPE)
  renderer = models.ImageRenderer(render_pfn, config, mesh=mesh)

  results = {}
  for s in sizes:
    fields = make_ray_fields(s, s)
    rays = types.Rays(**fields)
    first, seq, pipe = time_ours(renderer, state, rays, args.frames)
    dc_seq, dc_pipe = time_device_cast(render_pfn, config, mesh, state, s,
                                       args.frames)
    results[s] = {'ours_first_s': round(first, 3),
                  'ours_s': round(seq, 4),
                  'ours_pipelined_s': round(pipe, 4),
                  'ours_rays_per_sec': round(s * s / seq, 1),
                  'ours_device_cast_s': round(dc_seq, 4),
                  'ours_device_cast_pipelined_s': round(dc_pipe, 4),
                  'ours_device_cast_rays_per_sec': round(s * s / dc_seq, 1)}
    print(json.dumps({'size': s, **results[s]}), flush=True)

  if not args.skip_reference:
    from multinerf_tpu import reference_import
    render_frame, ref, _ = reference_import.build_reference_360_image_render()
    for s in sizes:
      fields = make_ray_fields(s, s)
      ref_rays = ref.utils.Rays(**fields)
      t0 = time.perf_counter()
      render_frame(ref_rays)
      ref_first = time.perf_counter() - t0
      t0 = time.perf_counter()
      for _ in range(args.frames):
        render_frame(ref_rays)
      ref_s = (time.perf_counter() - t0) / args.frames
      results[s].update({'ref_first_s': round(ref_first, 3),
                         'ref_s': round(ref_s, 4),
                         'ref_rays_per_sec': round(s * s / ref_s, 1),
                         'ours_vs_ref': round(ref_s / results[s]['ours_s'],
                                              3),
                         'ours_pipelined_vs_ref': round(
                             ref_s / results[s]['ours_pipelined_s'], 3),
                         'ours_device_cast_vs_ref': round(
                             ref_s / results[s]['ours_device_cast_s'], 3)})
      print(json.dumps({'size': s, **results[s]}), flush=True)

  print(json.dumps({'render_ab': {str(k): v for k, v in results.items()}}),
        flush=True)


if __name__ == '__main__':
  main()
