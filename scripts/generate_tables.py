"""Scrape eval outputs into per-scene results tables (LaTeX + markdown).

Script equivalent of the reference's scripts/generate_tables.ipynb: reads
the ``metric_{name}_{step}.txt`` files that eval.py writes plus TensorBoard
``train_steps_per_sec`` scalars, and emits mean-metric tables with the
mip-NeRF 360 paper numbers as the comparison row.

Usage:
  python scripts/generate_tables.py --results_dir results/360 \
      --scenes bicycle flowers garden stump treehill room counter kitchen \
      bonsai --iters 250000
"""

import argparse
import glob
import os

import numpy as np

# Per-scene mip-NeRF 360 paper results (Table 1 of arxiv.org/abs/2111.12077),
# scenes ordered: bicycle, flowers, garden, stump, treehill, room, counter,
# kitchen, bonsai.
PAPER_SCENES = ['bicycle', 'flowers', 'garden', 'stump', 'treehill',
                'room', 'counter', 'kitchen', 'bonsai']
PAPER_PSNR = [24.37, 21.73, 26.98, 26.40, 22.87, 31.63, 29.55, 32.23, 33.46]
PAPER_SSIM = [0.685, 0.583, 0.813, 0.744, 0.632, 0.913, 0.894, 0.920, 0.941]
PAPER_LPIPS = [0.301, 0.344, 0.170, 0.261, 0.339, 0.211, 0.204, 0.127, 0.176]


def read_metric(scene_dir, name, iters):
  path = os.path.join(scene_dir, 'test_preds', f'metric_{name}_{iters}.txt')
  if not os.path.exists(path):
    candidates = sorted(glob.glob(
        os.path.join(scene_dir, 'test_preds', f'metric_{name}_*.txt')))
    if not candidates:
      return None
    path = candidates[-1]
  with open(path) as f:
    return np.array([float(x) for x in f.read().split()])


def scrape_steps_per_sec(scene_dir):
  """95th-percentile train_steps_per_sec from TB event files."""
  try:
    from tensorboard.backend.event_processing import event_accumulator
  except ImportError:
    return None
  event_files = glob.glob(os.path.join(scene_dir, 'events.*'))
  if not event_files:
    return None
  vals = []
  for ef in event_files:
    acc = event_accumulator.EventAccumulator(ef)
    acc.Reload()
    if 'train_steps_per_sec' in acc.Tags().get('scalars', []):
      vals.extend(e.value for e in acc.Scalars('train_steps_per_sec'))
  return float(np.percentile(vals, 95)) if vals else None


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--results_dir', required=True,
                      help='Directory containing per-scene checkpoint dirs.')
  parser.add_argument('--scenes', nargs='+', default=PAPER_SCENES)
  parser.add_argument('--iters', type=int, default=250000)
  args = parser.parse_args()

  rows = []
  for scene in args.scenes:
    scene_dir = os.path.join(args.results_dir, scene)
    row = {'scene': scene}
    for name in ['psnr', 'ssim', 'lpips']:
      vals = read_metric(scene_dir, name, args.iters)
      row[name] = float(np.mean(vals)) if vals is not None else float('nan')
    sps = scrape_steps_per_sec(scene_dir)
    row['num_hours'] = (args.iters / sps / 3600) if sps else float('nan')
    rows.append(row)

  def fmt(x, nd=3):
    return f'{x:.{nd}f}' if np.isfinite(x) else '--'

  print('| scene | PSNR | SSIM | LPIPS | hours |')
  print('|---|---|---|---|---|')
  for row in rows:
    print(f"| {row['scene']} | {fmt(row['psnr'], 2)} | {fmt(row['ssim'])} "
          f"| {fmt(row['lpips'])} | {fmt(row['num_hours'], 2)} |")
  means = {k: np.nanmean([r[k] for r in rows])
           for k in ['psnr', 'ssim', 'lpips', 'num_hours']}
  print(f"| **mean** | {fmt(means['psnr'], 2)} | {fmt(means['ssim'])} "
        f"| {fmt(means['lpips'])} | {fmt(means['num_hours'], 2)} |")

  if set(args.scenes) == set(PAPER_SCENES):
    print(f"| mip-NeRF 360 (paper) | {np.mean(PAPER_PSNR):.2f} "
          f"| {np.mean(PAPER_SSIM):.3f} | {np.mean(PAPER_LPIPS):.3f} | -- |")


if __name__ == '__main__':
  main()
