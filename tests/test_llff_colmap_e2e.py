"""Real-scene code path e2e: fabricated COLMAP scene -> LLFF -> CLIs.

VERDICT r3 #5: the COLMAP -> staged LLFF loader -> driver path previously
had only unit tests (the CLI e2e suite uses the dummy loader).  Here a
tiny COLMAP model is written to disk (tests/helpers/fabricate_colmap.py
— the inverse of data/colmap.py's binary reader) with an images/ +
images_2/ pyramid, and the real train/eval/render CLIs run against it
with ``dataset_loader='llff'``, exercising colmap.py, the pyramid
decode, pose PCA normalization, and ellipse-path rendering.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tests', 'helpers'))

TINY = [
    'PropMLP.net_depth = 2', 'PropMLP.net_width = 16',
    'NerfMLP.net_depth = 2', 'NerfMLP.net_width = 16',
    'Model.num_prop_samples = 8', 'Model.num_nerf_samples = 4',
    'Model.num_levels = 2',
]


def _run(script, bindings, timeout=900):
  env = dict(os.environ)
  env['JAX_PLATFORMS'] = 'cpu'
  env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
  env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
  cmd = [sys.executable, os.path.join(REPO, 'tests', 'helpers',
                                      'cli_runner.py'),
         os.path.join(REPO, script)]
  cmd += [f'--gin_bindings={b}' for b in TINY + bindings]
  proc = subprocess.run(cmd, env=env, stdout=subprocess.PIPE,
                        stderr=subprocess.STDOUT, text=True, timeout=timeout)
  assert proc.returncode == 0, f'{script} failed:\n{proc.stdout[-4000:]}'
  return proc.stdout


@pytest.fixture(scope='module')
def colmap_scene(tmp_path_factory):
  import fabricate_colmap
  data_dir = str(tmp_path_factory.mktemp('colmap_scene'))
  names = fabricate_colmap.fabricate_scene(data_dir, num_images=8)
  return data_dir, names


def test_parser_roundtrips_fabricated_model(colmap_scene):
  """colmap.py must recover exactly what the fixture encoded."""
  import fabricate_colmap
  from multinerf_tpu.data import cameras as camera_lib
  from multinerf_tpu.data import colmap

  data_dir, names = colmap_scene
  got_names, poses, pixtocam, distortion, camtype = colmap.process_scene(
      os.path.join(data_dir, 'sparse', '0'))
  assert got_names == names
  np.testing.assert_allclose(poses, fabricate_colmap.ring_poses(8),
                             atol=1e-6)
  np.testing.assert_allclose(
      pixtocam,
      camera_lib.get_pixtocam(fabricate_colmap.RES * 1.2,
                              fabricate_colmap.RES, fabricate_colmap.RES),
      atol=1e-9)
  assert distortion is None  # PINHOLE.
  assert camtype == camera_lib.ProjectionType.PERSPECTIVE


def test_radial_distortion_scene_flows_through_loader(tmp_path_factory):
  """SIMPLE_RADIAL model: k1 recovered, undistortion runs on the loader
  path, and the distorted-camera rays stay well-formed."""
  import fabricate_colmap
  from multinerf_tpu import configs as configs_lib
  from multinerf_tpu import ginlite
  from multinerf_tpu.data import colmap
  from multinerf_tpu.data import datasets

  data_dir = str(tmp_path_factory.mktemp('colmap_radial'))
  fabricate_colmap.fabricate_scene(data_dir, num_images=4, k1=0.08)

  _, _, _, distortion, _ = colmap.process_scene(
      os.path.join(data_dir, 'sparse', '0'))
  assert distortion is not None and distortion['k1'] == pytest.approx(0.08)

  ginlite.clear_config()
  config = configs_lib.Config(
      dataset_loader='llff', data_dir=data_dir, factor=2, llffhold=4,
      near=0.5, far=20.0, batch_size=64)
  dataset = datasets.load_dataset('test', data_dir, config)
  assert dataset.distortion_params['k1'] == pytest.approx(0.08)
  batch = dataset.generate_ray_batch(0)
  dirs = np.asarray(batch.rays.viewdirs)
  assert np.isfinite(np.asarray(batch.rays.origins)).all()
  assert np.isfinite(dirs).all()
  np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
  assert (np.asarray(batch.rays.radii) > 0).all()


@pytest.fixture(scope='module')
def llff_ckpt_dir(colmap_scene, tmp_path_factory):
  data_dir, _ = colmap_scene
  ckpt_dir = str(tmp_path_factory.mktemp('llff_ckpt'))
  common = [
      "Config.dataset_loader = 'llff'",
      f"Config.data_dir = '{data_dir}'",
      f"Config.checkpoint_dir = '{ckpt_dir}'",
      'Config.factor = 2',  # Train on the images_2 pyramid level.
      'Config.llffhold = 8',  # 8 images: 7 train, 1 test.
      'Config.near = 0.5', 'Config.far = 20.0',
      "Config.data_loss_type = 'mse'",
      'Config.batch_size = 256',
      'Config.render_chunk_size = 256',
  ]
  _run('train.py', common + [
      'Config.max_steps = 10',
      'Config.checkpoint_every = 10',
      'Config.print_every = 5',
      'Config.train_render_every = 100',
  ])
  return ckpt_dir, common


def test_train_cli_on_colmap_scene(llff_ckpt_dir):
  ckpt_dir, _ = llff_ckpt_dir
  assert '10' in os.listdir(ckpt_dir)


def test_eval_cli_on_colmap_scene(llff_ckpt_dir):
  ckpt_dir, common = llff_ckpt_dir
  _run('eval.py', common + [
      'Config.eval_only_once = True',
      'Config.eval_save_output = True',
  ])
  test_dir = os.path.join(ckpt_dir, 'test_preds')
  names = os.listdir(test_dir)
  assert 'metric_psnr_10.txt' in names, names
  with open(os.path.join(test_dir, 'metric_psnr_10.txt')) as f:
    psnrs = [float(v) for v in f.read().split()]
  # llffhold=8 on 8 images holds out exactly one test view.
  assert len(psnrs) == 1 and np.isfinite(psnrs).all()


def test_render_cli_ellipse_path_on_colmap_scene(llff_ckpt_dir):
  ckpt_dir, common = llff_ckpt_dir
  _run('render.py', common + [
      'Config.render_path = True',  # Ellipse path from the PCA'd poses.
      'Config.render_path_frames = 3',
      "Config.render_dir = '%s'" % os.path.join(ckpt_dir, 'render'),
      'Config.render_video_fps = 2',
  ])
  out_dir = os.path.join(ckpt_dir, 'render', 'path_renders_step_10')
  names = os.listdir(out_dir)
  assert sum(n.startswith('color_') and n.endswith('.png')
             for n in names) == 3, names
