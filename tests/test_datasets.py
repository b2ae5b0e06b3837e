"""Tests for data.datasets and data.colmap with synthetic on-disk fixtures."""

import json
import os
import struct

import numpy as np
import pytest
from PIL import Image

from multinerf_tpu import configs as configs_lib
from multinerf_tpu.data import cameras
from multinerf_tpu.data import colmap
from multinerf_tpu.data import datasets
from multinerf_tpu.data import types


def _write_png(path, arr):
  Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


@pytest.fixture
def blender_scene(tmp_path):
  """Tiny Blender-layout scene: transforms_{split}.json + PNGs."""
  res = 8
  rng = np.random.RandomState(0)
  for split in ['train', 'test']:
    frames = []
    for i in range(3):
      name = f'r_{i}'
      img = rng.rand(res, res, 4)
      img[..., 3] = 1.0
      _write_png(tmp_path / f'{name}.png', img)
      theta = i * 0.5
      pose = np.eye(4)
      pose[:3, :] = cameras.viewmatrix(
          np.array([np.cos(theta), np.sin(theta), 0.3]),
          np.array([0.0, 0.0, 1.0]),
          np.array([4 * np.cos(theta), 4 * np.sin(theta), 1.0]))
      frames.append({'file_path': name, 'transform_matrix': pose.tolist()})
    meta = {'camera_angle_x': 0.8, 'frames': frames}
    with open(tmp_path / f'transforms_{split}.json', 'w') as f:
      json.dump(meta, f)
  return str(tmp_path)


def test_blender_loader(blender_scene):
  config = configs_lib.Config(dataset_loader='blender', batch_size=64,
                              factor=0, near=2.0, far=6.0)
  ds = datasets.load_dataset('train', blender_scene, config)
  assert ds.size == 3
  assert ds.images.shape == (3, 8, 8, 3)
  batch = next(ds)
  assert batch.rgb.shape[-1] == 3
  assert batch.rays.origins.shape[-1] == 3
  # Rays' viewdirs are unit length.
  np.testing.assert_allclose(
      np.linalg.norm(batch.rays.viewdirs, axis=-1), 1, rtol=1e-4)
  # Test split serves full images round-robin.
  ds_test = datasets.load_dataset('test', blender_scene, config)
  b0 = next(ds_test)
  assert b0.rays.origins.shape[:2] == (8, 8)


def _make_colmap_scene(tmp_path, binary=True, n_images=4):
  """COLMAP sparse model + images dir + downsampled dir."""
  sparse = tmp_path / 'sparse' / '0'
  os.makedirs(sparse)
  res = 16
  fx = fy = 20.0
  cx, cy = res / 2, res / 2
  rng = np.random.RandomState(1)

  # Random c2w poses -> w2c quaternion/tvec (COLMAP convention).  scipy
  # handles the 180-degree (trace ~ -1) cases the naive formula cannot.
  def rotmat_to_qvec(r):
    from scipy.spatial.transform import Rotation
    x, y, z, w = Rotation.from_matrix(r).as_quat()
    return np.array([w, x, y, z])

  names, w2cs = [], []
  for i in range(n_images):
    theta = 2 * np.pi * i / n_images
    c2w = cameras.viewmatrix(
        np.array([np.cos(theta), np.sin(theta), 0.2]),
        np.array([0.0, 0.0, 1.0]),
        np.array([3 * np.cos(theta), 3 * np.sin(theta), 1.0]))
    w2c = np.linalg.inv(cameras.pad_poses(c2w[None]))[0]
    names.append(f'img_{i:02d}.png')
    w2cs.append(w2c)

  if binary:
    with open(sparse / 'cameras.bin', 'wb') as f:
      f.write(struct.pack('<Q', 1))
      f.write(struct.pack('<iiQQ', 1, 2, res, res))  # SIMPLE_RADIAL
      f.write(struct.pack('<4d', fx, cx, cy, 0.01))
    with open(sparse / 'images.bin', 'wb') as f:
      f.write(struct.pack('<Q', n_images))
      for i, (name, w2c) in enumerate(zip(names, w2cs)):
        q = rotmat_to_qvec(w2c[:3, :3])
        f.write(struct.pack('<i', i + 1))
        f.write(struct.pack('<4d', *q))
        f.write(struct.pack('<3d', *w2c[:3, 3]))
        f.write(struct.pack('<i', 1))
        f.write(name.encode() + b'\x00')
        f.write(struct.pack('<Q', 0))
  else:
    with open(sparse / 'cameras.txt', 'w') as f:
      f.write('# comment\n')
      f.write(f'1 SIMPLE_RADIAL {res} {res} {fx} {cx} {cy} 0.01\n')
    with open(sparse / 'images.txt', 'w') as f:
      f.write('# comment\n')
      for i, (name, w2c) in enumerate(zip(names, w2cs)):
        q = rotmat_to_qvec(w2c[:3, :3])
        t = w2c[:3, 3]
        f.write(f'{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} '
                f'{t[0]} {t[1]} {t[2]} 1 {name}\n')
        f.write('\n')

  # Image dirs (full-res and 2x downsampled).
  for d, r in [('images', res), ('images_2', res // 2)]:
    os.makedirs(tmp_path / d)
    for name in names:
      _write_png(tmp_path / d / name, rng.rand(r, r, 3))
  return names, w2cs, res, fx


@pytest.mark.parametrize('binary', [True, False])
def test_colmap_parser_roundtrip(tmp_path, binary):
  names, w2cs, res, fx = _make_colmap_scene(tmp_path, binary=binary)
  got_names, poses, pixtocam, dist, camtype = colmap.process_scene(
      str(tmp_path / 'sparse' / '0'))
  assert sorted(got_names) == sorted(names)
  assert poses.shape == (len(names), 3, 4)
  # pixtocam inverts the intrinsics.
  np.testing.assert_allclose(np.linalg.inv(pixtocam)[0, 0], fx, rtol=1e-6)
  assert dist is not None and abs(dist['k1'] - 0.01) < 1e-9
  assert camtype == cameras.ProjectionType.PERSPECTIVE
  # Recovered c2w equals the original up to the COLMAP->NeRF axis flip.
  for name, w2c in zip(names, w2cs):
    i = got_names.index(name)
    c2w = np.linalg.inv(w2c)[:3] @ np.diag([1, -1, -1, 1])
    np.testing.assert_allclose(poses[i], c2w, atol=1e-6)


def test_llff_loader_colmap(tmp_path):
  _make_colmap_scene(tmp_path, binary=True, n_images=4)
  config = configs_lib.Config(dataset_loader='llff', batch_size=64, factor=2,
                              near=0.2, far=1e6, llffhold=4)
  ds = datasets.load_dataset('train', str(tmp_path), config)
  # 4 images, every 4th held out -> 3 train.
  assert ds.size == 3
  assert ds.images.shape[1:3] == (8, 8)  # factor-2 downsampled dir.
  batch = next(ds)
  assert batch.rgb.shape[-1] == 3
  ds_test = datasets.load_dataset('test', str(tmp_path), config)
  assert ds_test.size == 1
  # An elliptical render path was generated.
  assert ds.render_poses.shape == (config.render_path_frames, 3, 4)


def test_llff_forward_facing_ndc(tmp_path):
  _make_colmap_scene(tmp_path, binary=True, n_images=4)
  np.save(tmp_path / 'poses_bounds.npy',
          np.concatenate([np.zeros((4, 15)), np.tile([[1.0, 10.0]], (4, 1))],
                         axis=-1))
  config = configs_lib.Config(dataset_loader='llff', batch_size=64, factor=2,
                              near=0.0, far=1.0, forward_facing=True)
  ds = datasets.load_dataset('train', str(tmp_path), config)
  assert ds.pixtocam_ndc is not None
  batch = next(ds)
  assert np.all(np.isfinite(batch.rays.origins))


def test_dummy_dataset_patches():
  config = configs_lib.Config(dataset_loader='dummy', batch_size=64,
                              patch_size=4, near=0.5, far=10.0)
  ds = datasets.load_dataset('train', '', config)
  batch = next(ds)
  # 64 rays = 4 patches of 4x4.
  assert batch.rays.origins.shape == (4, 4, 4, 3)
  assert batch.rgb.shape == (4, 4, 4, 3)


def test_single_image_batching():
  config = configs_lib.Config(dataset_loader='dummy', batch_size=64,
                              batching='single_image', near=0.5, far=10.0)
  ds = datasets.load_dataset('train', '', config)
  batch = next(ds)
  # All rays share one camera.
  assert np.unique(np.array(batch.rays.cam_idx)).size == 1


def test_dummy_scatter_loader_sparse_analytic_scene():
  """The culling-validation scene: analytic GT, novel test ring, and
  genuinely sparse coverage (most pixels see background — the scene's
  point is that most SAMPLES land in empty space)."""
  config = configs_lib.Config(dataset_loader='dummy_scatter', batch_size=64,
                              near=2.0, far=6.0)
  train = datasets.load_dataset('train', '', config)
  test = datasets.load_dataset('test', '', config)
  assert train.images.shape == test.images.shape
  assert np.isfinite(train.images).all()
  assert train.images.min() >= 0.0 and train.images.max() <= 1.0
  # Train and test cameras differ (novel-view evaluation is meaningful).
  assert not np.allclose(train.camtoworlds, test.camtoworlds)
  # Sparse: some but not most pixels are foreground.
  fg = (np.abs(train.images - 1.0).max(-1) > 1e-6).mean()
  assert 0.05 < fg < 0.5, fg
  batch = next(train)
  assert np.isfinite(batch.rgb).all()


def test_dummy_specular_loader_analytic_shiny_sphere():
  """Ref-NeRF validation scene: view-DEPENDENT appearance tied to analytic
  normals (the specular lobe moves with the camera), GT normals unit-length
  at hits, novel test ring."""
  config = configs_lib.Config(dataset_loader='dummy_specular', batch_size=64,
                              near=2.0, far=6.0)
  train = datasets.load_dataset('train', '', config)
  test = datasets.load_dataset('test', '', config)
  assert np.isfinite(train.images).all()
  assert train.images.min() >= 0.0 and train.images.max() <= 1.0
  assert not np.allclose(train.camtoworlds, test.camtoworlds)
  # GT normals: unit length at hits, zero elsewhere; alphas = hit mask.
  norms = np.linalg.norm(train.normal_images, axis=-1)
  hit = train.alphas > 0.5
  assert hit.any() and (~hit).any()
  np.testing.assert_allclose(norms[hit], 1.0, atol=1e-5)
  np.testing.assert_allclose(norms[~hit], 0.0, atol=1e-6)
  # View dependence: the same surface point shaded from two views differs
  # where the specular lobe lands (a diffuse-only scene would not).
  n = train.normal_images[0][hit[0]][:200]
  v1 = np.array([[0.0, -1.0, 0.0]], np.float32)
  v2 = np.array([[-np.sqrt(0.5), -np.sqrt(0.5), 0.0]], np.float32)
  c1 = datasets.DummySpecular.shade(n, np.broadcast_to(v1, n.shape),
                                    np.ones(n.shape[0], bool))
  c2 = datasets.DummySpecular.shade(n, np.broadcast_to(v2, n.shape),
                                    np.ones(n.shape[0], bool))
  assert np.abs(c1 - c2).max() > 0.05


def test_dummy_distractor_loader_train_only_distractors():
  """RobustNeRF validation scene: distractors pasted into train views only,
  recorded in distractor_masks, covering a minority of each view."""
  config = configs_lib.Config(dataset_loader='dummy_distractor',
                              batch_size=64, near=2.0, far=6.0)
  train = datasets.load_dataset('train', '', config)
  test = datasets.load_dataset('test', '', config)
  clean = datasets.load_dataset('test', '', configs_lib.Config(
      dataset_loader='dummy_scatter', batch_size=64, near=2.0, far=6.0))
  # Test split is exactly the clean DummyScatter scene.
  np.testing.assert_array_equal(test.images, clean.images)
  assert not hasattr(test, 'distractor_masks')
  # Train views differ from clean renders exactly on the recorded masks.
  m = train.distractor_masks
  frac = m.mean(axis=(1, 2))
  assert (frac > 0.02).all() and (frac < 0.25).all(), frac
  clean_train = datasets.load_dataset('train', '', configs_lib.Config(
      dataset_loader='dummy_scatter', batch_size=64, near=2.0, far=6.0))
  diff = np.abs(train.images - clean_train.images).max(-1) > 1e-6
  assert not diff[~m].any()
