"""Image transforms and quality metrics (PSNR / SSIM / color correction).

Functional parity with ``internal/image.py`` of google-research/multinerf.
SSIM is implemented in-repo (the reference wraps dm_pix.ssim, image.py:131)
with the standard Wang et al. settings — 11x11 Gaussian window, sigma 1.5,
k1=0.01, k2=0.03, VALID padding — matching tf.image.ssim / dm_pix defaults.
"""

from __future__ import annotations

import types
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

_Array = Union[np.ndarray, jnp.ndarray]


def mse_to_psnr(mse):
  """PSNR for a given MSE, assuming max pixel value 1."""
  return -10.0 / jnp.log(10.0) * jnp.log(mse)


def psnr_to_mse(psnr):
  """MSE for a given PSNR, assuming max pixel value 1."""
  return jnp.exp(-0.1 * jnp.log(10.0) * psnr)


def ssim_to_dssim(ssim):
  """Structural dissimilarity from SSIM."""
  return (1 - ssim) / 2


def dssim_to_ssim(dssim):
  """SSIM from structural dissimilarity."""
  return 1 - 2 * dssim


def linear_to_srgb(linear: _Array, eps: Optional[float] = None,
                   xnp: types.ModuleType = jnp) -> _Array:
  """sRGB OETF; assumes linear in [0, 1] (https://en.wikipedia.org/wiki/SRGB)."""
  if eps is None:
    eps = xnp.finfo(xnp.float32).eps
  srgb0 = 323 / 25 * linear
  srgb1 = (211 * xnp.maximum(eps, linear)**(5 / 12) - 11) / 200
  return xnp.where(linear <= 0.0031308, srgb0, srgb1)


def srgb_to_linear(srgb: _Array, eps: Optional[float] = None,
                   xnp: types.ModuleType = jnp) -> _Array:
  """Inverse sRGB OETF; assumes srgb in [0, 1]."""
  if eps is None:
    eps = xnp.finfo(xnp.float32).eps
  linear0 = 25 / 323 * srgb
  linear1 = xnp.maximum(eps, (200 * srgb + 11) / 211)**(12 / 5)
  return xnp.where(srgb <= 0.04045, linear0, linear1)


def downsample(img, factor):
  """Area downsample; factor must evenly divide the image height and width."""
  sh = img.shape
  if not (sh[0] % factor == 0 and sh[1] % factor == 0):
    raise ValueError(
        f'Downsampling factor {factor} does not evenly divide image '
        f'shape {sh[:2]}')
  img = img.reshape(
      (sh[0] // factor, factor, sh[1] // factor, factor) + sh[2:])
  return img.mean((1, 3))


def color_correct(img, ref, num_iters=5, eps=0.5 / 255):
  """Fit a per-channel quadratic color transform warping img toward ref.

  Saturated pixels are masked out of the least-squares fit; because the
  saturation set changes as the fit improves, the solve is iterated.

  Runs entirely on the host in numpy: the reference (image.py:81-124
  there) interleaves device ops with host lstsq calls, which on this
  stack costs ~15 device round-trips (plus sync asserts) per frame —
  ~2 s/frame through the TPU tunnel regardless of image size.  Here one
  evaluation is a handful of BLAS calls over [num_pixels, 10] matrices.
  """
  if img.shape[-1] != ref.shape[-1]:
    raise ValueError(
        f"img's {img.shape[-1]} and ref's {ref.shape[-1]} channels must match")
  num_channels = img.shape[-1]
  img_mat = np.asarray(img).reshape([-1, num_channels])
  ref_mat = np.asarray(ref).reshape([-1, num_channels])

  def is_unclipped(z):  # Pixels near the [0, 1] rails carry no signal.
    return (z >= eps) & (z <= 1 - eps)

  mask0 = is_unclipped(img_mat)
  for _ in range(num_iters):
    # Quadratic expansion of each pixel: upper-triangular channel products,
    # then the linear terms, then a bias.
    quads = [img_mat[:, c:c + 1] * img_mat[:, c:] for c in range(num_channels)]
    a_mat = np.concatenate(quads + [img_mat, np.ones_like(img_mat[:, :1])],
                           axis=-1)
    warp = []
    for c in range(num_channels):
      b = ref_mat[:, c]
      mask = mask0[:, c] & is_unclipped(img_mat[:, c]) & is_unclipped(b)
      w = np.linalg.lstsq(np.where(mask[:, None], a_mat, 0),
                          np.where(mask, b, 0), rcond=-1)[0]
      assert np.isfinite(w).all()
      warp.append(w)
    img_mat = np.clip(a_mat @ np.stack(warp, axis=-1), 0, 1)
  return img_mat.reshape(img.shape)


def _gaussian_kernel1d(filter_size: int, filter_sigma: float) -> jnp.ndarray:
  """Normalized 1D Gaussian window."""
  offsets = jnp.arange(filter_size, dtype=jnp.float32) - (filter_size - 1) / 2
  g = jnp.exp(-0.5 * (offsets / filter_sigma)**2)
  return g / jnp.sum(g)


def _filter2d(img, kernel1d):
  """Separable VALID 2D filtering of an [H, W, C] (or [H, W]) image."""
  squeeze = img.ndim == 2
  if squeeze:
    img = img[..., None]
  # [H, W, C] -> depthwise conv via feature_group_count.
  hwc = img[None]  # [1, H, W, C]
  c = hwc.shape[-1]
  kh = jnp.tile(kernel1d[:, None, None, None], (1, 1, 1, c))  # [K,1,1,C]
  kw = jnp.tile(kernel1d[None, :, None, None], (1, 1, 1, c))  # [1,K,1,C]
  dn = jax.lax.conv_dimension_numbers(hwc.shape, kh.shape,
                                      ('NHWC', 'HWIO', 'NHWC'))
  # HIGHEST precision: TPU convs default to bf16 passes, which visibly
  # biases the variance terms (E[x^2] - mu^2) in SSIM.
  out = jax.lax.conv_general_dilated(
      hwc, kh, (1, 1), 'VALID', dimension_numbers=dn, feature_group_count=c,
      precision=jax.lax.Precision.HIGHEST)
  out = jax.lax.conv_general_dilated(
      out, kw, (1, 1), 'VALID', dimension_numbers=dn, feature_group_count=c,
      precision=jax.lax.Precision.HIGHEST)
  out = out[0]
  return out[..., 0] if squeeze else out


def ssim(img0, img1, max_val=1.0, filter_size=11, filter_sigma=1.5,
         k1=0.01, k2=0.03, return_map=False):
  """Structural similarity (Wang et al. 2004) between two images.

  Args:
    img0, img1: [H, W, C] or [H, W] images in [0, max_val].
    max_val: dynamic range of the inputs.
    filter_size, filter_sigma: Gaussian window parameters.
    k1, k2: stabilization constants.
    return_map: return the per-pixel SSIM map instead of its mean.

  Returns:
    Scalar mean SSIM (or the SSIM map over the VALID region).
  """
  img0 = jnp.asarray(img0, jnp.float32)
  img1 = jnp.asarray(img1, jnp.float32)
  kernel = _gaussian_kernel1d(filter_size, filter_sigma)

  mu0 = _filter2d(img0, kernel)
  mu1 = _filter2d(img1, kernel)
  mu00 = mu0 * mu0
  mu11 = mu1 * mu1
  mu01 = mu0 * mu1
  sigma00 = _filter2d(img0 * img0, kernel) - mu00
  sigma11 = _filter2d(img1 * img1, kernel) - mu11
  sigma01 = _filter2d(img0 * img1, kernel) - mu01

  c1 = (k1 * max_val)**2
  c2 = (k2 * max_val)**2
  numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
  denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
  ssim_map = numer / denom
  return ssim_map if return_map else jnp.mean(ssim_map)


class MetricHarness:
  """Evaluates PSNR, SSIM (and LPIPS when weights are configured) between a
  predicted and ground-truth image."""

  def __init__(self, lpips_weights_path=None):
    self.ssim_fn = jax.jit(ssim)
    from multinerf_tpu.ops import lpips as lpips_lib
    self.lpips_fn = lpips_lib.try_load(lpips_weights_path)

  def __call__(self, rgb_pred, rgb_gt, name_fn=lambda s: s):
    psnr = float(mse_to_psnr(((rgb_pred - rgb_gt)**2).mean()))
    ssim_val = float(self.ssim_fn(rgb_pred, rgb_gt))
    out = {name_fn('psnr'): psnr, name_fn('ssim'): ssim_val}
    if self.lpips_fn is not None:
      out[name_fn('lpips')] = self.lpips_fn(
          jnp.asarray(rgb_pred, jnp.float32), jnp.asarray(rgb_gt, jnp.float32))
    return out


def make_postprocess_fns(config, dataset):
  """(tonemap fn, color-correction fn) for a dataset's color space.

  Shared by the eval and render drivers so the rawnerf tonemap hookup
  lives in exactly one place (reference keeps copies in eval.py:57-60 and
  render.py:129 there).
  """
  if config.rawnerf_mode:
    postprocess_fn = dataset.metadata['postprocess_fn']
  else:
    postprocess_fn = lambda z: z
  if config.eval_raw_affine_cc:
    from multinerf_tpu.data import raw as raw_lib
    cc_fn = raw_lib.match_images_affine
  else:
    cc_fn = color_correct
  return postprocess_fn, cc_fn
