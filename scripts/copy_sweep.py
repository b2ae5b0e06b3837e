"""Normalized shared-distinctive-line sweep against the reference checkout.

The no-copy bar for this repo is judged by (roughly) this methodology:
for every package source file, count how many of its *distinctive*
normalized code lines also appear in any single reference file, as a
fraction of the file's distinctive lines.  Whole-file detectors miss
renamed and partial copies; this catches them, and the accompanying test
(tests/test_copy_sweep.py) fails CI when any file crosses the threshold.

A "distinctive" line: code (not comment/blank), whitespace-collapsed,
long enough that a collision means shared authorship rather than idiom
(`return x`, `else:` and friends are excluded by the length floor).
Docstrings count — a transcribed docstring is still transcription.

Usage:
  python scripts/copy_sweep.py [--threshold 0.3] [--min_lines 20] [--json]
"""

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get('MULTINERF_REFERENCE', '/root/reference')

# The repo surfaces the bar applies to: package + drivers + bench.
PACKAGE_GLOBS = ('multinerf_tpu', 'train.py', 'eval.py', 'render.py',
                 'bench.py', '__graft_entry__.py')

MIN_DISTINCTIVE_CHARS = 16


def iter_py_files(root):
  if os.path.isfile(root):
    yield root
    return
  for dirpath, _, names in os.walk(root):
    for name in names:
      if name.endswith('.py'):
        yield os.path.join(dirpath, name)


def distinctive_lines(path):
  """The set of normalized, distinctive code lines of one file."""
  out = set()
  with open(path, errors='replace') as f:
    for line in f:
      line = line.strip()
      if not line or line.startswith('#'):
        continue
      line = line.split('  #')[0].rstrip()  # Trailing comments.
      line = re.sub(r'\s+', ' ', line)
      if len(line) >= MIN_DISTINCTIVE_CHARS:
        out.add(line)
  return out


def sweep(min_lines=20):
  """Yield (package_file, best_fraction, best_reference_file)."""
  ref_sets = {p: distinctive_lines(p)
              for p in iter_py_files(os.path.join(REFERENCE))}
  ref_sets = {p: s for p, s in ref_sets.items() if s}
  for entry in PACKAGE_GLOBS:
    for path in iter_py_files(os.path.join(REPO, entry)):
      ours = distinctive_lines(path)
      if len(ours) < min_lines:
        continue
      best, best_ref = 0.0, None
      for ref_path, ref in ref_sets.items():
        frac = len(ours & ref) / len(ours)
        if frac > best:
          best, best_ref = frac, ref_path
      yield (os.path.relpath(path, REPO), best,
             os.path.relpath(best_ref, REFERENCE) if best_ref else None)


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--threshold', type=float, default=0.3)
  p.add_argument('--min_lines', type=int, default=20)
  p.add_argument('--json', action='store_true')
  args = p.parse_args()

  rows = sorted(sweep(args.min_lines), key=lambda r: -r[1])
  if args.json:
    print(json.dumps([{'file': f, 'shared': round(s, 3), 'ref': r}
                      for f, s, r in rows]))
  else:
    for f, s, r in rows:
      flag = ' <-- OVER THRESHOLD' if s > args.threshold else ''
      print(f'{s:0.3f}  {f:55s} vs {r}{flag}')
  over = [f for f, s, _ in rows if s > args.threshold]
  return 1 if over else 0


if __name__ == '__main__':
  sys.exit(main())
