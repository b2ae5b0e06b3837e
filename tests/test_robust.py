"""Tests for the RobustNeRF mask."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from multinerf_tpu import configs as configs_lib
from multinerf_tpu import robust


def _config(**kw):
  base = dict(patch_size=16, enable_robustnerf_loss=True,
              robustnerf_inlier_quantile=0.5,
              robustnerf_inner_patch_size=8,
              robustnerf_smoothed_filter_size=3,
              robustnerf_smoothed_inlier_quantile=0.5,
              robustnerf_inner_patch_inlier_quantile=0.5)
  base.update(kw)
  return configs_lib.Config(**base)


def test_disabled_mask_is_all_ones():
  errors = jnp.ones((4, 16, 16, 3)) * 0.5
  mask, stats = robust.robustnerf_mask(
      errors, 1.0, _config(enable_robustnerf_loss=False))
  np.testing.assert_allclose(np.array(mask), 1.0)
  assert 'loss_threshold' in stats


def test_outlier_patch_masked_out():
  """A patch of huge errors gets masked; clean patches stay in."""
  rng = np.random.RandomState(0)
  errors = rng.rand(4, 16, 16, 3).astype(np.float32) * 0.01
  errors[0] += 10.0  # Patch 0 is all outliers.
  mask, stats = robust.robustnerf_mask(jnp.array(errors), 0.05, _config())
  mask = np.array(mask)
  assert mask[0].mean() < 0.05
  assert mask[1:].mean() > 0.95
  # Threshold for the next step is the quantile of this batch's errors.
  assert 0 < float(stats['loss_threshold']) < 10


def test_isolated_outlier_pixel_survives_by_neighborhood_vote():
  """A single bad pixel amid good neighbors is kept (diffusion vote)."""
  errors = np.full((1, 16, 16, 3), 0.001, np.float32)
  errors[0, 8, 8] = 5.0
  mask, _ = robust.robustnerf_mask(jnp.array(errors), 0.05, _config())
  assert np.array(mask)[0, 8, 8] == 1.0


def test_mask_stats_present():
  errors = jnp.ones((2, 16, 16, 3)) * 0.01
  _, stats = robust.robustnerf_mask(errors, 0.05, _config())
  for k in ['loss_threshold', 'is_inlier_loss', 'has_inlier_neighbors',
            'is_inlier_patch', 'mask']:
    assert k in stats
