"""Tests for the RawNeRF raw-data pipeline."""

import jax.numpy as jnp
import numpy as np

from multinerf_tpu.data import raw


def test_bayer_mask_pattern():
  x, y = np.meshgrid(np.arange(4), np.arange(4), indexing='xy')
  mask = raw.pixels_to_bayer_mask(x, y)
  # Exactly one channel active per pixel.
  np.testing.assert_array_equal(mask.sum(-1), 1)
  assert mask[0, 0, 0] == 1  # Red at top-left.
  assert mask[0, 1, 1] == 1 and mask[1, 0, 1] == 1  # Greens.
  assert mask[1, 1, 2] == 1  # Blue at bottom-right.


def _mosaic(rgb):
  """Forward-mosaic an RGB image into an RGGB Bayer pattern."""
  h, w, _ = rgb.shape
  bayer = np.zeros((h, w), rgb.dtype)
  bayer[0::2, 0::2] = rgb[0::2, 0::2, 0]
  bayer[0::2, 1::2] = rgb[0::2, 1::2, 1]
  bayer[1::2, 0::2] = rgb[1::2, 0::2, 1]
  bayer[1::2, 1::2] = rgb[1::2, 1::2, 2]
  return bayer


def test_demosaic_recovers_smooth_image():
  """On a smooth image, demosaic(mosaic(x)) ~= x away from wrap edges."""
  h = w = 32
  yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                       indexing='ij')
  rgb = np.stack([0.3 + 0.3 * xx, 0.5 * yy, 0.2 + 0.2 * xx * yy],
                 -1).astype(np.float32)
  bayer = _mosaic(rgb)
  out = np.array(raw.bilinear_demosaic(bayer, xnp=np))
  # Ignore the wrap-around border.
  np.testing.assert_allclose(out[2:-2, 2:-2], rgb[2:-2, 2:-2], atol=0.02)


def test_demosaic_jax_matches_numpy():
  rng = np.random.RandomState(0)
  bayer = rng.rand(16, 16).astype(np.float32)
  a = np.array(raw.bilinear_demosaic_jax(jnp.array(bayer)))
  b = raw.bilinear_demosaic(bayer, xnp=np)
  np.testing.assert_allclose(a, b, atol=1e-6)


def test_postprocess_raw_ranges():
  rng = np.random.RandomState(1)
  img = rng.rand(8, 8, 3).astype(np.float32)
  out = np.array(raw.postprocess_raw(img, np.eye(3), exposure=1.0))
  assert out.min() >= 0 and out.max() <= 1
  # Brighter exposure target darkens the output.
  out2 = np.array(raw.postprocess_raw(img, np.eye(3), exposure=2.0))
  assert out2.mean() < out.mean()


def test_process_exif():
  exifs = [{
      'BlackLevel': 64,
      'WhiteLevel': 1023,
      'AsShotNeutral': '0.5 1.0 0.6',
      'ColorMatrix2': ' '.join(str(x) for x in np.eye(3).ravel()),
      'NoiseProfile': '0.001 0.0001',
      'ShutterSpeed': f'1/{n}',
  } for n in [100, 100, 400]]
  meta = raw.process_exif(exifs)
  np.testing.assert_allclose(meta['ShutterSpeed'], [0.01, 0.01, 0.0025])
  assert meta['cam2rgb'].shape == (3, 3, 3)
  # cam2rgb must invert the white balance scaling: cam2rgb @ camwb2cam = row
  # normalized inverse; check finiteness + invertibility.
  assert np.all(np.isfinite(meta['cam2rgb']))
  for m in meta['cam2rgb']:
    assert abs(np.linalg.det(m)) > 1e-6


def test_exposure_indexing_logic():
  """Shutter speeds map to exposure indices, brightest first."""
  exifs = [{
      'BlackLevel': 0, 'WhiteLevel': 1,
      'AsShotNeutral': '1 1 1',
      'ColorMatrix2': ' '.join(str(x) for x in np.eye(3).ravel()),
      'ShutterSpeed': f'1/{n}',
  } for n in [100, 400, 100]]
  meta = raw.process_exif(exifs)
  shutter_speeds = meta['ShutterSpeed']
  unique_shutters = np.sort(np.unique(shutter_speeds))[::-1]
  assert unique_shutters[0] == 0.01  # Slowest = brightest = index 0.
  exposure_values = shutter_speeds / unique_shutters[0]
  np.testing.assert_allclose(exposure_values, [1.0, 0.25, 1.0])


def test_match_images_affine():
  rng = np.random.RandomState(2)
  gt = rng.rand(16, 16, 3)
  est = 2.5 * gt + 0.1  # Pure affine distortion.
  matched = np.array(raw.match_images_affine(est, gt))
  np.testing.assert_allclose(matched, gt, atol=1e-5)
