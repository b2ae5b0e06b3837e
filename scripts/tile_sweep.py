"""In-context A/B of the Pallas sample-tile size (MULTINERF_PALLAS_TILE).

Times the full uncull and culled@0.33 360 train steps via bench.py's
harness for each requested tile.  Run one tile per process (the kernel
builder caches per-process):

  for t in 0 1024 2048; do MULTINERF_PALLAS_TILE=$t python scripts/tile_sweep.py; done
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

BF16 = ['NerfMLP.trunk_dtype = "bfloat16"',
        'PropMLP.trunk_dtype = "bfloat16"']


def main():
  tile = os.environ.get('MULTINERF_PALLAS_TILE', 'default')
  state_c, step_c, batch_c, _, _ = bench.build(
      {'occupancy_culling': True, 'occupancy_capacity_frac': 0.33},
      BF16, cull=True)
  culled = bench.time_variant(state_c, step_c, batch_c)
  state, step_fn, batch, _, _ = bench.build({}, BF16)
  uncull = bench.time_variant(state, step_fn, batch)
  print(json.dumps({'tile': tile,
                    'uncull_rays_per_sec': round(uncull, 1),
                    'culled033_rays_per_sec': round(culled, 1)}))


if __name__ == '__main__':
  main()
