"""End-to-end CLI driver chain: train.py -> eval.py -> render.py.

The three entry points are the framework's public surface (reference:
train.py/eval.py/render.py drivers); everything else in the suite tests
the library underneath them.  This runs the real CLIs as subprocesses on
the virtual CPU mesh with the dummy loader and a tiny model: train writes
a checkpoint, eval scores it and emits the reference-compatible
``metric_{name}_{step}.txt`` files, render produces per-frame images from
the same checkpoint directory.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    'PropMLP.net_depth = 2', 'PropMLP.net_width = 16',
    'NerfMLP.net_depth = 2', 'NerfMLP.net_width = 16',
    'Model.num_prop_samples = 8', 'Model.num_nerf_samples = 4',
    'Model.num_levels = 2',
]


def _run(script, bindings, timeout=900):
  env = dict(os.environ)
  env['JAX_PLATFORMS'] = 'cpu'
  # 2 virtual devices: enough to exercise the sharded driver paths while
  # keeping the from-scratch CPU compile of three full CLIs affordable.
  env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
  env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
  # cli_runner forces the CPU platform before handing off: the container
  # pins the TPU plugin past env overrides (see tests/conftest.py).
  cmd = [sys.executable, os.path.join(REPO, 'tests', 'helpers',
                                      'cli_runner.py'),
         os.path.join(REPO, script)]
  cmd += [f'--gin_bindings={b}' for b in TINY + bindings]
  proc = subprocess.run(cmd, env=env, stdout=subprocess.PIPE,
                        stderr=subprocess.STDOUT, text=True, timeout=timeout)
  assert proc.returncode == 0, f'{script} failed:\n{proc.stdout[-4000:]}'
  return proc.stdout


@pytest.fixture(scope='module')
def trained_ckpt_dir(tmp_path_factory):
  ckpt_dir = str(tmp_path_factory.mktemp('cli_ckpt'))
  common = [
      "Config.dataset_loader = 'dummy'",
      "Config.data_dir = ''",
      f"Config.checkpoint_dir = '{ckpt_dir}'",
      'Config.near = 0.5', 'Config.far = 10.0',
      "Config.data_loss_type = 'mse'",
      'Config.batch_size = 256',
      'Config.render_chunk_size = 256',
  ]
  _run('train.py', common + [
      'Config.max_steps = 10',
      'Config.checkpoint_every = 10',
      'Config.print_every = 5',
      # Never reached in 10 steps: the in-train test render would add a
      # second whole-model compile to the slowest stage.
      'Config.train_render_every = 100',
  ])
  return ckpt_dir, common


def test_train_cli_writes_checkpoint_and_config(trained_ckpt_dir):
  ckpt_dir, _ = trained_ckpt_dir
  steps = os.listdir(ckpt_dir)
  assert '10' in steps, steps
  # The resolved config is written out, reference train.py behavior.
  assert os.path.exists(os.path.join(ckpt_dir, 'config.gin'))


def test_eval_cli_writes_metrics(trained_ckpt_dir):
  ckpt_dir, common = trained_ckpt_dir
  _run('eval.py', common + [
      'Config.eval_only_once = True',
      'Config.eval_dataset_limit = 2',
      'Config.eval_save_output = True',
  ])
  test_dir = os.path.join(ckpt_dir, 'test_preds')
  names = os.listdir(test_dir)
  assert 'metric_psnr_10.txt' in names, names
  assert 'metric_ssim_10.txt' in names, names
  # Reference format: one space-separated value per evaluated image
  # (reference eval.py:232 writes ' '.join over per-image metrics).
  with open(os.path.join(test_dir, 'metric_psnr_10.txt')) as f:
    psnrs = [float(v) for v in f.read().split()]
  assert len(psnrs) == 2 and np.isfinite(psnrs).all()
  assert 'color_000.png' in names, names


def test_eval_cli_tb_showcase_branch(trained_ckpt_dir):
  """The polling/TB branch: showcases render through the numpy vis suite
  and summaries land in an eval/ event file (round-4 rewrite coverage)."""
  ckpt_dir, common = trained_ckpt_dir
  _run('eval.py', common + [
      'Config.eval_only_once = False',
      'Config.early_exit_steps = 10',  # One pass, then the step gate exits.
      'Config.eval_dataset_limit = 2',
      'Config.num_showcase_images = 1',
  ])
  eval_tb_dir = os.path.join(ckpt_dir, 'eval')
  assert os.path.isdir(eval_tb_dir)
  assert any(n.startswith('events') for n in os.listdir(eval_tb_dir))


def test_render_cli_writes_frames(trained_ckpt_dir):
  ckpt_dir, common = trained_ckpt_dir
  _run('render.py', common + [
      "Config.render_dir = '%s'" % os.path.join(ckpt_dir, 'render'),
      'Config.render_video_fps = 2',
  ])
  out_dir = os.path.join(ckpt_dir, 'render', 'test_preds_step_10')
  names = os.listdir(out_dir)
  # One color frame per test camera (dummy has 4).
  assert sum(n.startswith('color_') and n.endswith('.png')
             for n in names) >= 4, names
