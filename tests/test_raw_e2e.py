"""End-to-end RawNeRF data pipeline test on a synthetic raw scene.

Builds an on-disk LLFF-layout scene with raw Bayer mosaics (pre-decoded
.npy sidecars, exercising the rawpy-free path), exiftool-style JSON EXIF,
COLMAP text poses — then loads it through the real LLFF loader in
rawnerf_mode and runs a training step with the rawnerf loss + Bayer mask +
exposure conditioning.
"""

import json
import os
import struct

import jax
import numpy as np
import pytest

from multinerf_tpu import configs as configs_lib
from multinerf_tpu import ginlite
from multinerf_tpu import train_lib
from multinerf_tpu.data import cameras
from multinerf_tpu.data import datasets
from multinerf_tpu.data import types
from multinerf_tpu.parallel import mesh as mesh_lib


@pytest.fixture(autouse=True)
def _clean_gin():
  ginlite.clear_config()
  yield
  ginlite.clear_config()


@pytest.fixture
def raw_scene(tmp_path):
  res = 16
  n = 4
  rng = np.random.RandomState(0)

  # COLMAP text model (poses for the raw images).
  sparse = tmp_path / 'sparse' / '0'
  os.makedirs(sparse)
  with open(sparse / 'cameras.txt', 'w') as f:
    f.write(f'1 PINHOLE {res} {res} 20.0 20.0 {res/2} {res/2}\n')
  names = [f'img_{i:02d}.dng' for i in range(n)]
  from scipy.spatial.transform import Rotation
  with open(sparse / 'images.txt', 'w') as f:
    for i, name in enumerate(names):
      theta = 2 * np.pi * i / n
      c2w = cameras.viewmatrix(
          np.array([np.cos(theta), np.sin(theta), 0.2]),
          np.array([0.0, 0.0, 1.0]),
          np.array([3 * np.cos(theta), 3 * np.sin(theta), 1.0]))
      w2c = np.linalg.inv(cameras.pad_poses(c2w[None]))[0]
      x, y, z, w = Rotation.from_matrix(w2c[:3, :3]).as_quat()
      t = w2c[:3, 3]
      f.write(f'{i+1} {w} {x} {y} {z} {t[0]} {t[1]} {t[2]} 1 {name}\n\n')

  # Raw mosaics: 10-bit-ish sensor values + .npy sidecars + empty .dng
  # placeholders (the loader opens the .dng, then falls back to the .npy
  # because rawpy is absent here).
  raw_dir = tmp_path / 'raw'
  os.makedirs(raw_dir)
  shutters = ['1/100', '1/100', '1/400', '1/400']
  for i, name in enumerate(names):
    base = os.path.splitext(name)[0]
    mosaic = (rng.rand(res, res) * 800 + 64).astype(np.float32)
    np.save(raw_dir / f'{base}.npy', mosaic)
    (raw_dir / f'{base}.dng').write_bytes(b'placeholder')
    exif = [{
        'BlackLevel': 64,
        'WhiteLevel': 1023,
        'AsShotNeutral': '0.6 1.0 0.7',
        'ColorMatrix2': ' '.join(str(v) for v in np.eye(3).ravel()),
        'NoiseProfile': '0.001 0.0001',
        'ShutterSpeed': shutters[i],
    }]
    with open(raw_dir / f'{base}.json', 'w') as f:
      json.dump(exif, f)
  return str(tmp_path)


def test_rawnerf_dataset_and_train_step(raw_scene):
  ginlite.parse_config_files_and_bindings(
      [], ['PropMLP.net_depth = 1', 'PropMLP.net_width = 8',
           'NerfMLP.net_depth = 1', 'NerfMLP.net_width = 8',
           'NerfMLP.rgb_activation = @math.safe_exp',
           'NerfMLP.rgb_padding = 0.', 'NerfMLP.rgb_bias = -5.',
           'Model.num_prop_samples = 4', 'Model.num_nerf_samples = 4',
           'Model.num_levels = 2', 'Model.learned_exposure_scaling = True'])
  config = configs_lib.Config(
      dataset_loader='llff', batch_size=64, factor=1, near=0.0, far=1.0,
      forward_facing=True, rawnerf_mode=True, data_loss_type='rawnerf',
      apply_bayer_mask=True, llff_use_all_images_for_training=False,
      llffhold=4, max_steps=10, lr_delay_steps=0)

  ds = datasets.load_dataset('train', raw_scene, config)
  # Demosaicked images in [0, ~1], exposure metadata threaded through.
  assert ds.images.shape[-1] == 3
  assert ds.metadata is not None
  assert 'exposure_idx' in ds.metadata and 'exposure_values' in ds.metadata
  # Brightest shutter (1/100) is exposure index 0 with value 1.
  assert ds.metadata['exposure_values'].max() == 1.0
  assert callable(ds.metadata['postprocess_fn'])

  batch = next(ds)
  # Bayer lossmult: exactly one active channel per ray.
  lm = np.array(batch.rays.lossmult)
  np.testing.assert_array_equal(lm.sum(-1), 1)
  assert batch.rays.exposure_idx is not None
  assert batch.rays.exposure_values is not None

  # One rawnerf-loss training step end-to-end.
  mesh = mesh_lib.create_mesh()
  rng = jax.random.PRNGKey(0)
  _, state, _, train_pstep, _ = train_lib.setup_model(
      config, rng, mesh=mesh, dataset=ds)
  state = jax.device_put(state, mesh_lib.replicated(mesh))
  gbatch = mesh_lib.shard_batch_to_global(mesh, batch)
  state, stats, _ = train_pstep(rng, state, gbatch, 0.5, 1.0)
  assert np.isfinite(float(stats['loss']))


def test_raw_postprocess_fn_roundtrip(raw_scene):
  config = configs_lib.Config(
      dataset_loader='llff', batch_size=64, factor=1, near=0.0, far=1.0,
      forward_facing=True, rawnerf_mode=True, llffhold=4)
  ds = datasets.load_dataset('test', raw_scene, config)
  img = ds.images[0]
  srgb = np.array(ds.metadata['postprocess_fn'](img))
  assert srgb.shape == img.shape
  assert srgb.min() >= 0 and srgb.max() <= 1


def test_device_cast_renderer_matches_host_with_exposures(raw_scene):
  """DeviceImageRenderer must replicate _make_ray_batch's exposure
  selection (per-camera metadata exposure_idx / exposure_values) — pinned
  against the host-cast ImageRenderer on a camera whose exposure index is
  NOT zero, so a wrong selection rule actually changes the pixels."""
  from multinerf_tpu.models import nerf as models

  ginlite.parse_config_files_and_bindings(
      [], ['PropMLP.net_depth = 1', 'PropMLP.net_width = 8',
           'NerfMLP.net_depth = 1', 'NerfMLP.net_width = 8',
           'NerfMLP.rgb_activation = @math.safe_exp',
           'NerfMLP.rgb_padding = 0.', 'NerfMLP.rgb_bias = -5.',
           'Model.num_prop_samples = 4', 'Model.num_nerf_samples = 4',
           'Model.num_levels = 2', 'Model.learned_exposure_scaling = True'])
  config = configs_lib.Config(
      dataset_loader='llff', batch_size=64, factor=1, near=0.0, far=1.0,
      forward_facing=True, rawnerf_mode=True, data_loss_type='rawnerf',
      llff_use_all_images_for_training=False, llffhold=2, max_steps=10,
      lr_delay_steps=0, render_chunk_size=64)
  # llffhold=2 puts img_0 (shutter 1/100, exposure_idx 0) AND img_2
  # (shutter 1/400, exposure_idx 1) in the test split.
  ds = datasets.load_dataset('test', raw_scene, config)
  assert ds.size >= 2
  exp_idx = np.asarray(ds.metadata['exposure_idx'])
  assert exp_idx[1] != exp_idx[0], 'fixture must span exposure indices'

  mesh = mesh_lib.create_mesh()
  _, state, render_pfn, _, _ = train_lib.setup_model(
      config, jax.random.PRNGKey(0), mesh=mesh, dataset=ds)
  state = jax.device_put(state, mesh_lib.replicated(mesh))

  host = models.ImageRenderer(render_pfn, config, mesh=mesh)
  device = models.DeviceImageRenderer(render_pfn, config, ds, mesh=mesh)
  assert device.supports()

  for cam_idx in (0, 1):
    batch = ds.generate_ray_batch(cam_idx)
    want = host(state.params, 1.0, batch.rays)
    got = device(state.params, 1.0, cam_idx)
    np.testing.assert_allclose(got['rgb'], want['rgb'], atol=2e-3)
