"""generate_tables.py scrapes eval's metric files into the results table.

Closes the loop on the metric-file contract: the table generator must
consume exactly what eval.py writes (``test_preds/metric_{name}_{step}.txt``,
space-separated per-image values).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scrapes_metric_files_into_table(tmp_path):
  for scene, psnrs, ssims in [('lego', '30.0 32.0', '0.9 0.92'),
                              ('chair', '28.0', '0.88')]:
    d = tmp_path / scene / 'test_preds'
    d.mkdir(parents=True)
    (d / 'metric_psnr_1000.txt').write_text(psnrs)
    (d / 'metric_ssim_1000.txt').write_text(ssims)

  out = subprocess.run(
      [sys.executable, os.path.join(REPO, 'scripts', 'generate_tables.py'),
       '--results_dir', str(tmp_path), '--scenes', 'lego', 'chair',
       '--iters', '1000'],
      capture_output=True, text=True, timeout=120)
  assert out.returncode == 0, out.stderr[-2000:]
  lines = out.stdout.splitlines()
  lego = next(l for l in lines if l.startswith('| lego'))
  assert '31.00' in lego and '0.910' in lego  # Per-scene means.
  chair = next(l for l in lines if l.startswith('| chair'))
  assert '28.00' in chair
  mean = next(l for l in lines if 'mean' in l)
  assert '29.50' in mean  # Mean over scenes.


def test_falls_back_to_latest_step_and_marks_missing(tmp_path):
  d = tmp_path / 'lego' / 'test_preds'
  d.mkdir(parents=True)
  (d / 'metric_psnr_500.txt').write_text('25.0')  # Not the requested step.

  out = subprocess.run(
      [sys.executable, os.path.join(REPO, 'scripts', 'generate_tables.py'),
       '--results_dir', str(tmp_path), '--scenes', 'lego',
       '--iters', '1000'],
      capture_output=True, text=True, timeout=120)
  assert out.returncode == 0, out.stderr[-2000:]
  lego = next(l for l in out.stdout.splitlines() if l.startswith('| lego'))
  assert '25.00' in lego  # Fell back to the latest available step.
  assert '--' in lego  # Missing SSIM/LPIPS render as placeholders.
