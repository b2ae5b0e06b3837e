"""RobustNeRF inlier/outlier masking over patch-structured residuals.

Functional parity with ``internal/robustnerf.py`` of google-research/multinerf
(arxiv.org/abs/2302.00833): per-pixel thresholding against a running loss
quantile, a box-filter neighborhood vote, and an inner-patch vote; the next
step's threshold is returned in stats and threaded back through the training
loop.
"""

from __future__ import annotations

from typing import Mapping, Tuple

import jax.numpy as jnp
from jax import lax

_EPS = 1e-3


def _inner_patch_mask(inner, outer, dtype=jnp.float32):
  """[1, outer, outer, 1] mask that is 1 on the centered inner square."""
  lo = (outer - inner) // 2
  hi = outer - (inner + lo)
  return jnp.pad(jnp.ones((1, inner, inner, 1), dtype=dtype),
                 ((0, 0), (lo, hi), (lo, hi), (0, 0)))


def robustnerf_mask(errors: jnp.ndarray, loss_threshold, config
                    ) -> Tuple[jnp.ndarray, Mapping[str, jnp.ndarray]]:
  """Compute the RobustNeRF inlier mask for a batch of error patches.

  Args:
    errors: f32[n, h, w, c] per-subpixel squared errors.
    loss_threshold: scalar; pixels with error below it count as inliers.
    config: Config with the robustnerf_* hyperparameters.

  Returns:
    (mask broadcastable to errors, stats dict incl. 'loss_threshold' = the
    inlier quantile of this batch, to be used as the next step's threshold).
  """
  dtype = errors.dtype
  error_per_pixel = jnp.mean(errors, axis=-1, keepdims=True)  # [n,h,w,1]
  stats = {
      'loss_threshold': jnp.quantile(error_per_pixel,
                                     config.robustnerf_inlier_quantile),
  }
  mask = jnp.ones_like(error_per_pixel, dtype=dtype)

  if config.enable_robustnerf_loss:
    if config.robustnerf_inner_patch_size > config.patch_size:
      raise ValueError(
          'patch_size must be >= robustnerf_inner_patch_size.')

    is_inlier_pixel = (error_per_pixel < loss_threshold).astype(dtype)
    stats['is_inlier_loss'] = jnp.mean(is_inlier_pixel)

    # Neighborhood vote: fxf box filter, then binarize at the smoothed
    # inlier quantile (>= that fraction of neighbors must be inliers).
    f = config.robustnerf_smoothed_filter_size
    window = jnp.ones((1, 1, f, f)) / (f * f)
    neighbors = lax.conv(jnp.transpose(is_inlier_pixel, [0, 3, 1, 2]),
                         window, (1, 1), 'SAME')
    neighbors = jnp.transpose(neighbors, [0, 2, 3, 1])
    has_inlier_neighbors = (
        neighbors > 1 - config.robustnerf_smoothed_inlier_quantile
    ).astype(dtype)
    stats['has_inlier_neighbors'] = jnp.mean(has_inlier_neighbors)
    is_inlier_pixel = (
        has_inlier_neighbors + is_inlier_pixel > _EPS).astype(dtype)

    # Patch vote: the whole inner patch goes in or out together.
    inner_mask = _inner_patch_mask(config.robustnerf_inner_patch_size,
                                   config.patch_size)
    is_inlier_patch = jnp.mean(is_inlier_pixel, axis=[1, 2], keepdims=True)
    is_inlier_patch = (
        is_inlier_patch > 1 - config.robustnerf_inner_patch_inlier_quantile
    ).astype(dtype) * inner_mask
    stats['is_inlier_patch'] = jnp.mean(is_inlier_patch)

    # Inlier by any criterion.
    mask = (is_inlier_patch + is_inlier_pixel > _EPS).astype(dtype)

  stats['mask'] = jnp.mean(mask)
  return mask, stats
