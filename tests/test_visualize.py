"""Smoke tests for the visualization suite."""

import jax.numpy as jnp
import numpy as np

from multinerf_tpu.utils import visualize as vis


def _fake_rendering(h=24, w=32, n_rays=8, n_levels=2):
  rng = np.random.RandomState(0)
  rendering = {
      'rgb': jnp.array(rng.rand(h, w, 3), jnp.float32),
      'acc': jnp.array(rng.rand(h, w), jnp.float32),
      'distance_mean': jnp.array(1 + rng.rand(h, w) * 4, jnp.float32),
      'distance_median': jnp.array(1 + rng.rand(h, w) * 4, jnp.float32),
      'distance_percentile_5': jnp.array(1 + rng.rand(h, w), jnp.float32),
      'distance_percentile_95': jnp.array(4 + rng.rand(h, w), jnp.float32),
      'normals': jnp.array(rng.rand(h, w, 3) * 2 - 1, jnp.float32),
      'roughness': jnp.array(rng.rand(h, w, 1), jnp.float32),
  }
  # Per-level ray bundles.
  rendering['ray_sdist'] = [
      jnp.array(np.sort(rng.rand(n_rays, 9), -1), jnp.float32)
      for _ in range(n_levels)
  ]
  rendering['ray_weights'] = [
      jnp.array(rng.rand(n_rays, 8) * 0.1, jnp.float32)
      for _ in range(n_levels)
  ]
  rendering['ray_rgbs'] = [
      jnp.array(rng.rand(n_rays, 8, 3), jnp.float32)
      for _ in range(n_levels)
  ]
  return rendering


class _FakeRays:

  def __init__(self, h, w):
    rng = np.random.RandomState(1)
    self.origins = jnp.array(rng.rand(h, w, 3), jnp.float32)
    self.directions = jnp.array(rng.rand(h, w, 3), jnp.float32)


def test_visualize_suite_produces_images():
  h, w = 24, 32
  rendering = _fake_rendering(h, w)
  suite = vis.visualize_suite(rendering, _FakeRays(h, w))
  for key in ['color', 'acc', 'color_matte', 'depth_mean', 'depth_median',
              'depth_triplet', 'coords_mod', 'normals', 'roughness']:
    assert key in suite, key
    img = np.array(suite[key])
    assert np.all(np.isfinite(img)), key
    assert img.shape[:2] == (h, w) or key in ('acc',), key
  # Ray strip charts exist and are image-shaped.
  assert np.array(suite['ray_colors']).ndim == 3
  assert np.array(suite['ray_weights']).ndim == 3


def test_sinebow_and_matte():
  h = jnp.linspace(0, 1, 16)
  colors = np.array(vis.sinebow(h))
  assert colors.shape == (16, 3)
  assert colors.min() >= 0 and colors.max() <= 1

  img = jnp.ones((16, 16, 3)) * 0.5
  acc = jnp.zeros((16, 16))
  matted = np.array(vis.matte(img, acc))
  # Fully transparent: pure checkerboard of 0.8/1.0.
  assert np.allclose(np.sort(np.unique(matted)), [0.8, 1.0], atol=1e-6)


def test_visualize_cmap_bounds():
  rng = np.random.RandomState(2)
  value = jnp.array(rng.rand(16, 16), jnp.float32)
  weight = jnp.ones((16, 16))
  out = np.array(vis.visualize_cmap(value, weight, vis._get_cmap('turbo')))
  assert out.shape == (16, 16, 3)
  assert np.all((out >= 0) & (out <= 1))
