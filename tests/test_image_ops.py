"""Tests for ops.image_ops: metrics, sRGB, SSIM, color correction."""

import jax.numpy as jnp
import numpy as np

from multinerf_tpu.ops import image_ops


def test_psnr_mse_roundtrip():
  mse = jnp.array([1e-4, 1e-2, 0.5])
  np.testing.assert_allclose(
      np.array(image_ops.psnr_to_mse(image_ops.mse_to_psnr(mse))), np.array(mse),
      rtol=1e-4)
  # Known value: mse=0.01 -> 20dB.
  assert abs(float(image_ops.mse_to_psnr(jnp.array(0.01))) - 20.0) < 1e-4


def test_ssim_dssim_roundtrip():
  s = jnp.array([-0.5, 0.0, 0.7, 1.0])
  np.testing.assert_allclose(
      np.array(image_ops.dssim_to_ssim(image_ops.ssim_to_dssim(s))),
      np.array(s), rtol=1e-6)


def test_srgb_roundtrip():
  x = jnp.linspace(0.0, 1.0, 256)
  y = image_ops.srgb_to_linear(image_ops.linear_to_srgb(x))
  np.testing.assert_allclose(np.array(y), np.array(x), atol=1e-4)
  # Known anchor points of the sRGB curve.
  assert abs(float(image_ops.linear_to_srgb(jnp.array(0.0)))) < 1e-6
  assert abs(float(image_ops.linear_to_srgb(jnp.array(1.0))) - 1.0) < 1e-5
  assert abs(float(image_ops.linear_to_srgb(jnp.array(0.5))) - 0.7354) < 1e-3


def test_downsample():
  rng = np.random.RandomState(0)
  img = rng.rand(8, 12, 3).astype(np.float32)
  out = image_ops.downsample(img, 4)
  assert out.shape == (2, 3, 3)
  np.testing.assert_allclose(out[0, 0], img[:4, :4].mean((0, 1)), rtol=1e-5)


def _ssim_naive(img0, img1, max_val=1.0, filter_size=11, filter_sigma=1.5,
                k1=0.01, k2=0.03):
  """Straightforward loop/numpy reference for SSIM (VALID padding)."""
  off = np.arange(filter_size) - (filter_size - 1) / 2
  g = np.exp(-0.5 * (off / filter_sigma)**2)
  g /= g.sum()
  kern = np.outer(g, g)

  def filt(im):
    h, w = im.shape[:2]
    k = filter_size
    out = np.zeros((h - k + 1, w - k + 1) + im.shape[2:])
    for i in range(out.shape[0]):
      for j in range(out.shape[1]):
        patch = im[i:i + k, j:j + k]
        out[i, j] = np.tensordot(kern, patch, axes=([0, 1], [0, 1]))
    return out

  mu0, mu1 = filt(img0), filt(img1)
  s00 = filt(img0 * img0) - mu0**2
  s11 = filt(img1 * img1) - mu1**2
  s01 = filt(img0 * img1) - mu0 * mu1
  c1, c2 = (k1 * max_val)**2, (k2 * max_val)**2
  num = (2 * mu0 * mu1 + c1) * (2 * s01 + c2)
  den = (mu0**2 + mu1**2 + c1) * (s00 + s11 + c2)
  return (num / den).mean()


def test_ssim_identity():
  rng = np.random.RandomState(1)
  img = rng.rand(24, 24, 3).astype(np.float32)
  assert abs(float(image_ops.ssim(img, img)) - 1.0) < 1e-5


def test_ssim_matches_naive_reference():
  rng = np.random.RandomState(2)
  img0 = rng.rand(20, 22, 3).astype(np.float32)
  img1 = np.clip(img0 + rng.randn(20, 22, 3).astype(np.float32) * 0.1, 0, 1)
  got = float(image_ops.ssim(img0, img1))
  want = _ssim_naive(img0, img1)
  assert abs(got - want) < 1e-4


def test_ssim_closed_form_constant_images():
  """Analytic anchor no implementation detail can fake.

  For constant images x=a, y=b every windowed mean is exactly the constant
  and every windowed (co)variance exactly zero — independent of padding
  convention, window shape, or normalization — so SSIM collapses to the
  closed-form luminance term (2ab + C1)/(a^2 + b^2 + C1) (Wang et al. 2004
  Eq. 6 with the contrast/structure terms at their C2/C2 limit).  Pins the
  constants and their placement against the published formula, guarding
  the shared-misunderstanding risk of two in-house implementations
  (dm_pix/skimage are absent from this environment by design).
  """
  for a, b in [(0.25, 0.75), (0.0, 1.0), (0.4, 0.4)]:
    img0 = np.full((24, 24, 3), a, np.float32)
    img1 = np.full((24, 24, 3), b, np.float32)
    c1 = 0.01**2
    want = (2 * a * b + c1) / (a * a + b * b + c1)
    got = float(image_ops.ssim(img0, img1))
    # float32 moment cancellation (filt(x^2) - mu^2 ~ 1e-8 against
    # C2 = 9e-4) leaves ~1e-4 of noise; a misplaced constant would be
    # off by >1e-2.
    assert abs(got - want) < 3e-4, (a, b, got, want)


def test_ssim_decreases_with_noise():
  rng = np.random.RandomState(3)
  img = rng.rand(32, 32, 3).astype(np.float32)
  s_small = float(image_ops.ssim(img, np.clip(img + 0.01, 0, 1)))
  s_big = float(image_ops.ssim(img, np.clip(img + 0.3, 0, 1)))
  # f32 cancellation in E[x^2]-mu^2 can push SSIM epsilon above 1.
  assert s_big < s_small <= 1.0 + 1e-3


def test_color_correct_recovers_linear_warp():
  rng = np.random.RandomState(4)
  ref = rng.rand(16, 16, 3).astype(np.float32) * 0.8 + 0.1
  img = np.clip(ref * 0.7 + 0.05, 0, 1).astype(np.float32)
  corrected = np.array(image_ops.color_correct(jnp.array(img), jnp.array(ref)))
  assert np.abs(corrected - ref).mean() < 0.01


def test_metric_harness():
  rng = np.random.RandomState(5)
  img = rng.rand(24, 24, 3).astype(np.float32)
  harness = image_ops.MetricHarness()
  out = harness(jnp.array(img), jnp.array(img))
  assert out['ssim'] > 0.9999
  assert out['psnr'] > 80
