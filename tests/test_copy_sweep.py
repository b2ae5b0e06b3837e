"""No-copy regression guard: normalized shared-line sweep vs reference.

Round-3 VERDICT found three transcription-level files that the whole-file
COPYCHECK missed; those were rewritten in round 4 (utils/visualize.py
0.66 -> 0.04, eval.py 0.56 -> 0.19, render.py 0.55 -> 0.16 shared
fraction).  This test checks in the judge's methodology so a future
transcription fails CI.

Files above the global threshold carry an explicit cap + justification:
each was adjudicated content-forced in VERDICT r3 ((b) semantics-forced
or (c) one-way-to-write-it), not transcription.  Caps sit just above the
measured value so any regression toward the reference still fails.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'scripts'))

import copy_sweep

THRESHOLD = 0.30

# path -> (cap, why shared lines are forced, per VERDICT r3 adjudication).
# Caps sit at measured+0.02 (VERDICT r4 #6) so ANY drift back toward the
# reference fails CI; round-5 brushing moved ops/rendering.py (0.42->0.28)
# and data/raw.py (0.39->0.24) below the global threshold entirely.
FORCED_CONTENT_CAPS = {
    'multinerf_tpu/data/types.py':
        (0.71, 'pytree field declarations ARE the data-currency contract'),
    'multinerf_tpu/configs.py':
        (0.59, '~100 Config field names/defaults ARE the gin contract'),
    'multinerf_tpu/ops/geopoly.py':
        (0.56, 'one-way-to-write-it tesselation math, bit-identical bases'),
    'multinerf_tpu/data/cameras.py':
        (0.47, 'closed-form projection/undistortion + dual-xnp contract'),
    'train.py':
        (0.33, 'declared loss/stat/TB-name contract forces the remainder'),
    'multinerf_tpu/train_lib.py':
        (0.42, 'loss formulas + config-gated loss assembly are semantics'),
    'multinerf_tpu/ops/ref_utils.py':
        (0.40, 'SH/IDE closed forms, scipy-verified'),
    'multinerf_tpu/data/datasets.py':
        (0.35, 'disk-format-forced loader lines (VERDICT r3: (b))'),
    'multinerf_tpu/robust.py':
        (0.34, 'RobustNeRF mask math per the paper'),
    'multinerf_tpu/models/mlp.py':
        (0.34, 'head zoo wiring; checkpoint-compatible naming'),
}


def test_no_package_file_tracks_a_reference_file():
  failures = []
  for path, frac, ref in copy_sweep.sweep(min_lines=20):
    cap = FORCED_CONTENT_CAPS.get(path, (THRESHOLD,))[0]
    if frac > cap:
      failures.append(f'{path}: {frac:0.3f} shared with {ref} (cap {cap})')
  assert not failures, 'shared-line sweep regressions:\n' + '\n'.join(
      failures)


def test_rewritten_surfaces_stay_rewritten():
  """The three round-3 transcription findings must not creep back."""
  by_file = {p: f for p, f, _ in copy_sweep.sweep(min_lines=20)}
  for path in ('multinerf_tpu/utils/visualize.py', 'eval.py', 'render.py'):
    assert by_file[path] < 0.25, (path, by_file[path])
