"""Train-step A/B: bf16 trunk vs int8 trunk vs int8-fwd/bf16-bwd hybrid.

VERDICT r4 #1b: the round-3 int8 training experiment quantized BOTH
directions and measured a wash vs bf16.  The hybrid keeps the int8 forward
(2x MXU MACs) but runs the backward unquantized in bf16
(MLP.trunk_dtype='int8_hybrid'), separating the int8 MAC win from the
backward's quantization overhead/noise.  This probe times all three trunks
on the flagship 360 train step, same protocol as bench.py.

Usage: python scripts/int8_hybrid_probe.py [--out docs]
Writes docs/INT8_HYBRID_PROBE.json and prints one JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--out', default='docs')
  args = p.parse_args()

  import bench

  arms = {
      'bfloat16': ['NerfMLP.trunk_dtype = "bfloat16"',
                   'PropMLP.trunk_dtype = "bfloat16"'],
      'int8': ['NerfMLP.trunk_dtype = "int8"',
               'PropMLP.trunk_dtype = "int8"'],
      'int8_hybrid': ['NerfMLP.trunk_dtype = "int8_hybrid"',
                      'PropMLP.trunk_dtype = "int8_hybrid"'],
  }
  n_chips = jax.device_count()
  result = {'device': jax.devices()[0].device_kind,
            'per_chip_batch': bench.PER_CHIP_BATCH}
  for name, bindings in arms.items():
    state, step_fn, batch, _, _ = bench.build({}, bindings)
    rays = bench.time_variant(state, step_fn, batch)
    result[f'train_rays_per_sec_per_chip_{name}'] = round(rays / n_chips, 1)
  base = result['train_rays_per_sec_per_chip_bfloat16']
  for name in ('int8', 'int8_hybrid'):
    result[f'vs_bf16_{name}'] = round(
        result[f'train_rays_per_sec_per_chip_{name}'] / base, 3)
  print(json.dumps(result))
  os.makedirs(args.out, exist_ok=True)
  with open(os.path.join(args.out, 'INT8_HYBRID_PROBE.json'), 'w') as f:
    json.dump(result, f, indent=2)


if __name__ == '__main__':
  main()
