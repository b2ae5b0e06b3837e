"""Loader tests for Tanks&Temples (both layouts) and DTU with fixtures."""

import os

import numpy as np
import pytest
from PIL import Image

from multinerf_tpu import configs as configs_lib
from multinerf_tpu.data import cameras
from multinerf_tpu.data import datasets


def _write_png(path, arr):
  Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def _poses(n, radius=3.0, seed=0):
  poses = []
  for i in range(n):
    theta = 2 * np.pi * i / n
    position = np.array([radius * np.cos(theta), radius * np.sin(theta), 1.0])
    poses.append(cameras.viewmatrix(position, np.array([0.0, 0.0, 1.0]),
                                    position))
  return np.stack(poses)


@pytest.fixture
def tat_nerfpp_scene(tmp_path):
  res = 8
  rng = np.random.RandomState(0)
  for split, n in [('train', 4), ('test', 2)]:
    base = tmp_path / split
    for sub in ['rgb', 'pose', 'intrinsics']:
      os.makedirs(base / sub)
    poses = _poses(n)
    for i in range(n):
      _write_png(base / 'rgb' / f'{i:06d}.png', rng.rand(res, res, 3))
      pose44 = np.eye(4)
      pose44[:3] = poses[i]
      np.savetxt(base / 'pose' / f'{i:06d}.txt', pose44.reshape(-1))
      intr = np.eye(4)
      intr[0, 0] = intr[1, 1] = 10.0
      np.savetxt(base / 'intrinsics' / f'{i:06d}.txt', intr.reshape(-1))
  return str(tmp_path)


def test_tat_nerfpp_loader(tat_nerfpp_scene):
  config = configs_lib.Config(dataset_loader='tat_nerfpp', batch_size=64,
                              near=0.1, far=1e6)
  ds = datasets.load_dataset('train', tat_nerfpp_scene, config)
  assert ds.size == 4
  assert ds.images.shape == (4, 8, 8, 3)
  assert abs(ds.focal - 10.0) < 1e-6
  batch = next(ds)
  assert np.all(np.isfinite(batch.rays.origins))
  ds_test = datasets.load_dataset('test', tat_nerfpp_scene, config)
  assert ds_test.size == 2


@pytest.fixture
def tat_fvs_scene(tmp_path):
  res = 8
  rng = np.random.RandomState(1)
  n = 6
  base = tmp_path / 'dense' / 'ibr3d_pw_0.25'
  os.makedirs(base)
  poses = _poses(n)
  # FVS stores world-to-cam rotations/translations.
  rots, trans = [], []
  for i in range(n):
    _write_png(base / f'im_{i:08d}.png', rng.rand(res, res, 3))
    w2c = np.linalg.inv(cameras.pad_poses(poses[i][None]))[0]
    rots.append(w2c[:3, :3])
    trans.append(w2c[:3, 3])
  k = np.stack([cameras.intrinsic_matrix(10.0, 10.0, 4.0, 4.0)] * n)
  np.save(base / 'Ks.npy', k)
  np.save(base / 'Rs.npy', np.stack(rots))
  np.save(base / 'ts.npy', np.stack(trans))
  return str(tmp_path)


def test_tat_fvs_loader(tat_fvs_scene):
  config = configs_lib.Config(dataset_loader='tat_fvs', batch_size=64,
                              factor=0, near=0.1, far=1e6, llffhold=3)
  ds = datasets.load_dataset('train', tat_fvs_scene, config)
  # 6 images, every 3rd held out -> 4 train / 2 test.
  assert ds.size == 4
  ds_test = datasets.load_dataset('test', tat_fvs_scene, config)
  assert ds_test.size == 2
  batch = next(ds)
  assert np.all(np.isfinite(batch.rays.origins))


@pytest.fixture
def dtu_scene(tmp_path):
  res = 8
  rng = np.random.RandomState(2)
  scan = tmp_path / 'mvs' / 'rect' / 'scan1'
  cal = tmp_path / 'mvs' / 'cal18'
  os.makedirs(scan)
  os.makedirs(cal)
  n = 4
  poses = _poses(n)
  for i in range(1, n + 1):
    # 8 light conditions per pose; the loader divides listdir by 8.
    for light in list(range(7)) + ['max']:
      tag = f'{light}_r5000' if light != 'max' else 'max'
      _write_png(scan / f'rect_{i:03d}_{tag}.png', rng.rand(res, res, 3))
    # Projection P = K [R | t] in DTU's convention.
    k = cameras.intrinsic_matrix(10.0, 10.0, 4.0, 4.0)
    w2c = np.linalg.inv(cameras.pad_poses(poses[i - 1][None]))[0]
    p = k @ w2c[:3]
    np.savetxt(cal / f'pos_{i:03d}.txt', p)
  return str(scan)


def test_dtu_loader(dtu_scene):
  config = configs_lib.Config(dataset_loader='dtu', batch_size=64, factor=0,
                              near=0.5, far=6.0, dtu_light_cond=3, dtuhold=4)
  ds = datasets.load_dataset('train', dtu_scene, config)
  assert ds.size == 3  # 4 poses, every 4th held out.
  batch = next(ds)
  assert np.all(np.isfinite(batch.rays.origins))
  # Recovered intrinsics: focal 10 at the chosen light condition.
  np.testing.assert_allclose(1.0 / ds.pixtocams[0][0, 0], 10.0, rtol=1e-4)
