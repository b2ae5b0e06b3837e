"""Tests for render-path dataset modes: ellipse paths, pano, overrides."""

import numpy as np
import pytest
from PIL import Image

from multinerf_tpu import configs as configs_lib
from multinerf_tpu.data import datasets
from tests.test_datasets import _make_colmap_scene


def test_llff_render_path_ellipse(tmp_path):
  _make_colmap_scene(tmp_path, binary=True, n_images=4)
  config = configs_lib.Config(
      dataset_loader='llff', batch_size=64, factor=2, near=0.2, far=1e6,
      render_path=True, render_path_frames=12)
  ds = datasets.load_dataset('test', str(tmp_path), config)
  # Dataset now serves the generated ellipse path, not captures.
  assert ds.size == 12
  batch = ds.generate_ray_batch(0)
  assert batch.rgb is None  # No ground truth along a render path.
  assert np.all(np.isfinite(batch.rays.origins))
  assert np.all(np.isfinite(batch.rays.directions))


def test_llff_render_path_resolution_and_focal_overrides(tmp_path):
  _make_colmap_scene(tmp_path, binary=True, n_images=4)
  config = configs_lib.Config(
      dataset_loader='llff', batch_size=64, factor=2, near=0.2, far=1e6,
      render_path=True, render_path_frames=6,
      render_resolution=(20, 10), render_focal=33.0)
  ds = datasets.load_dataset('test', str(tmp_path), config)
  assert (ds.width, ds.height) == (20, 10)
  assert ds.focal == 33.0
  batch = ds.generate_ray_batch(0)
  assert batch.rays.origins.shape[:2] == (10, 20)


def test_llff_render_path_pano(tmp_path):
  _make_colmap_scene(tmp_path, binary=True, n_images=4)
  config = configs_lib.Config(
      dataset_loader='llff', batch_size=64, factor=2, near=0.2, far=1e6,
      render_path=True, render_path_frames=4,
      render_resolution=(16, 8), render_camtype='pano')
  ds = datasets.load_dataset('test', str(tmp_path), config)
  batch = ds.generate_ray_batch(0)
  # Equirectangular ray fan: full image, unit directions.
  assert batch.rays.origins.shape[:2] == (8, 16)
  np.testing.assert_allclose(
      np.linalg.norm(np.array(batch.rays.directions), axis=-1), 1, rtol=1e-4)


def test_llff_render_path_file_override(tmp_path):
  _make_colmap_scene(tmp_path, binary=True, n_images=4)
  poses = np.tile(np.eye(4)[:3][None], (5, 1, 1)).astype(np.float32)
  poses[:, 2, 3] = np.arange(5)
  np.save(tmp_path / 'path.npy', poses)
  config = configs_lib.Config(
      dataset_loader='llff', batch_size=64, factor=2, near=0.2, far=1e6,
      render_path=True, render_path_file=str(tmp_path / 'path.npy'))
  ds = datasets.load_dataset('test', str(tmp_path), config)
  assert ds.size == 5
  np.testing.assert_allclose(ds.camtoworlds, poses)


def test_blender_use_tiffs(tmp_path):
  """32-bit TIFF channel loading with linear->sRGB conversion."""
  import json
  from multinerf_tpu.data import cameras
  res = 8
  rng = np.random.RandomState(0)
  frames = []
  for i in range(2):
    name = f'r_{i}'
    for ch in ['R', 'G', 'B', 'A']:
      val = (rng.rand(res, res).astype(np.float32)
             if ch != 'A' else np.ones((res, res), np.float32))
      Image.fromarray(val).save(tmp_path / f'{name}_{ch}.tiff')
    pose = np.eye(4)
    pose[:3] = cameras.viewmatrix(np.array([1.0, 0, 0]),
                                  np.array([0.0, 0, 1]),
                                  np.array([4.0, 0, 1]))
    frames.append({'file_path': name, 'transform_matrix': pose.tolist()})
  with open(tmp_path / 'transforms_train.json', 'w') as f:
    json.dump({'camera_angle_x': 0.8, 'frames': frames}, f)

  config = configs_lib.Config(dataset_loader='blender', batch_size=64,
                              factor=0, near=2.0, far=6.0, use_tiffs=True)
  ds = datasets.load_dataset('train', str(tmp_path), config)
  assert ds.images.shape == (2, res, res, 3)
  assert ds.images.min() >= 0 and ds.images.max() <= 1
