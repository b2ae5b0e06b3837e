"""Profile the 360 train step on the attached chip and rank HLO op costs.

Reuses bench.py's build/timing harness, wraps a few steps in
``jax.profiler.trace``, then parses the written ``.xplane.pb`` directly
(tsl xplane proto) and prints per-op total/self durations from the TPU
device plane — the methodology behind docs/DESIGN.md's perf sections.

Usage:
  python scripts/profile_step.py [--cull] [--out /tmp/prof] [--top 40]
"""

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(path, top=40):
  from tensorflow.tsl.profiler.protobuf import xplane_pb2
  space = xplane_pb2.XSpace()
  with open(path, 'rb') as f:
    space.ParseFromString(f.read())
  rows = []
  for plane in space.planes:
    if 'TPU' not in plane.name and 'Device' not in plane.name:
      continue
    ev_names = plane.event_metadata
    for line in plane.lines:
      # XLA op lines carry the per-HLO events; step lines etc. are skipped.
      if line.name not in ('XLA Ops', 'XLA Modules', 'Steps'):
        pass
      for ev in line.events:
        name = ev_names[ev.metadata_id].name
        rows.append((line.name, name, ev.duration_ps / 1e6))  # -> microseconds
  # Aggregate the op-level lines only.
  per_op = collections.Counter()
  per_line = collections.Counter()
  for line_name, name, us in rows:
    per_line[line_name] += us
    if line_name == 'XLA Ops':
      per_op[name] += us
  print('== line totals (us, all captured steps) ==')
  for k, v in per_line.most_common(8):
    print(f'  {v:12.0f}  {k}')
  print(f'== top {top} XLA ops (us, all captured steps) ==')
  total = sum(per_op.values())
  for k, v in per_op.most_common(top):
    print(f'  {v:10.0f}  {100*v/max(total,1e-9):5.1f}%  {k}')
  print(f'  total XLA-op time: {total:.0f} us')
  # Grouped view: collapse fusion suffixes to spot families.
  fam = collections.Counter()
  for k, v in per_op.items():
    base = k.split('.')[0]
    fam[base.rstrip('0123456789_')] += v
  print('== top op families ==')
  for k, v in fam.most_common(25):
    print(f'  {v:10.0f}  {100*v/max(total,1e-9):5.1f}%  {k}')


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--cull', action='store_true')
  ap.add_argument('--render', action='store_true',
                  help='Profile the eval/render forward (whole-frame '
                       'ImageRenderer dispatch) instead of the train step.')
  ap.add_argument('--frame', type=int, default=512,
                  help='Frame edge length for --render.')
  ap.add_argument('--out', default='/tmp/prof_step')
  ap.add_argument('--top', type=int, default=40)
  ap.add_argument('--steps', type=int, default=3)
  ap.add_argument('--parse_only', default=None,
                  help='Skip running; parse this xplane.pb path.')
  args = ap.parse_args()

  if args.parse_only:
    parse_xplane(args.parse_only, args.top)
    return

  import jax
  import bench

  BF16 = ['NerfMLP.trunk_dtype = "bfloat16"',
          'PropMLP.trunk_dtype = "bfloat16"']
  overrides = {}
  if args.cull:
    overrides = {'occupancy_culling': True, 'occupancy_capacity_frac': 0.33}
  state, step_fn, batch, render_ctx, _ = bench.build(
      overrides, BF16, cull=args.cull)

  os.makedirs(args.out, exist_ok=True)
  if args.render:
    from multinerf_tpu.data import types
    from multinerf_tpu.models import nerf as models
    render_pfn, config, mesh = render_ctx
    renderer = models.ImageRenderer(render_pfn, config, mesh=mesh)
    rays = types.Rays(**bench.make_frame_rays(args.frame, args.frame))
    renderer(state.params, 1.0, rays)  # Compile + warm (+ sync).
    with jax.profiler.trace(args.out):
      for _ in range(args.steps - 1):
        renderer(state.params, 1.0, rays, fetch=False)
      renderer(state.params, 1.0, rays)  # Final fetch is the sync point.
  else:
    rng = jax.random.PRNGKey(1)
    for _ in range(3):  # Compile + warm.
      state, stats, rng = step_fn(rng, state, batch, 0.5, 1.0, False)
    float(stats['loss'])

    with jax.profiler.trace(args.out):
      for _ in range(args.steps):
        state, stats, rng = step_fn(rng, state, batch, 0.5, 1.0, False)
      float(stats['loss'])

  paths = sorted(glob.glob(args.out + '/**/*.xplane.pb', recursive=True),
                 key=os.path.getmtime)
  if not paths:
    print('no xplane written under', args.out)
    return
  print('parsing', paths[-1])
  parse_xplane(paths[-1], args.top)


if __name__ == '__main__':
  main()
