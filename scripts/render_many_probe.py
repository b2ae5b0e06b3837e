"""Small-frame render latency: per-frame dispatch vs render_many batching.

VERDICT r4 #7: at 64x64 the production device-cast renderer is
dispatch-latency-bound (~18 ms of compute inside a ~49 ms frame — the
host round trip per frame dominates).  DeviceImageRenderer.render_many
amortizes that round trip by scanning K camera indices inside ONE jit
dispatch and returning ONE stacked fetch.  This probe measures both paths
on the real chip at the flagship 360 architecture and records the win (or
negative) for DESIGN.md.

Usage: python scripts/render_many_probe.py [--sizes 64,128] [--k 8]
Writes docs/RENDER_MANY_PROBE.json and prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--sizes', default='64,128')
  p.add_argument('--k', type=int, default=8)
  p.add_argument('--frames', type=int, default=8,
                 help='Timed single-dispatch frames (and K-batches: '
                      'ceil(frames/k) render_many calls).')
  p.add_argument('--out', default='docs')
  args = p.parse_args()

  print('devices:', jax.devices(), flush=True)
  import bench
  from multinerf_tpu.models import nerf as models

  # Flagship 360 architecture, bf16 trunk — the shipping render surface.
  bf16 = ['NerfMLP.trunk_dtype = "bfloat16"',
          'PropMLP.trunk_dtype = "bfloat16"']
  state, _, _, (render_pfn, config, mesh), _ = bench.build({}, bf16)
  print('build done', flush=True)

  result = {'k': args.k, 'device': jax.devices()[0].device_kind}
  for s in [int(x) for x in args.sizes.split(',')]:
    dc = models.DeviceImageRenderer(render_pfn, config,
                                    bench.SyntheticCameraRecord(s, s),
                                    mesh=mesh)
    dc(state.params, 1.0, 0)  # Compile + sync.
    print(f'{s}: single compiled', flush=True)
    t0 = time.perf_counter()
    for _ in range(args.frames):
      dc(state.params, 1.0, 0)
    single = (time.perf_counter() - t0) / args.frames

    cams = [0] * args.k
    got = dc.render_many(state.params, 1.0, cams)  # Compile + sync.
    print(f'{s}: render_many compiled', flush=True)
    assert got['rgb'].shape[0] == args.k
    n_batches = max(1, args.frames // args.k)
    t0 = time.perf_counter()
    for _ in range(n_batches):
      dc.render_many(state.params, 1.0, cams)
    many = (time.perf_counter() - t0) / (n_batches * args.k)

    result[f'{s}x{s}'] = {
        'single_sec_per_frame': round(single, 4),
        'many_sec_per_frame': round(many, 4),
        'speedup': round(single / many, 3),
    }
  print(json.dumps(result))
  os.makedirs(args.out, exist_ok=True)
  with open(os.path.join(args.out, 'RENDER_MANY_PROBE.json'), 'w') as f:
    json.dump(result, f, indent=2)


if __name__ == '__main__':
  main()
