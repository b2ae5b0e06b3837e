"""Tests for ops.rendering: frustum moments, alpha weights, compositing."""

import jax.numpy as jnp
import numpy as np

from multinerf_tpu.ops import rendering


def _frustum_moments_numerical(d, t0, t1, base_radius, n=4000):
  """Monte-Carlo moments of points uniformly distributed in a conical frustum.

  Samples distances with pdf ~ t^2 (uniform density in the cone volume) and
  radii uniform in the disc of radius base_radius * t.
  """
  rng = np.random.RandomState(0)
  # Inverse-CDF sample of pdf ~ t^2 on [t0, t1].
  u = rng.rand(n)
  t = (u * (t1**3 - t0**3) + t0**3) ** (1 / 3)
  # Uniform in the disc perpendicular to d.
  theta = rng.rand(n) * 2 * np.pi
  r = base_radius * t * np.sqrt(rng.rand(n))
  # Build an orthonormal frame around d.
  d = np.asarray(d, np.float64)
  dn = d / np.linalg.norm(d)
  a = np.array([1.0, 0, 0]) if abs(dn[0]) < 0.9 else np.array([0, 1.0, 0])
  e1 = np.cross(dn, a)
  e1 /= np.linalg.norm(e1)
  e2 = np.cross(dn, e1)
  pts = (t[:, None] * d[None, :] +
         (r * np.cos(theta))[:, None] * e1[None, :] +
         (r * np.sin(theta))[:, None] * e2[None, :])
  return pts.mean(0), np.cov(pts.T)


def test_conical_frustum_moments_match_monte_carlo():
  d = np.array([0.3, -0.7, 0.6], np.float32)
  t0, t1, radius = 2.0, 3.0, 0.1
  mean, cov = rendering.conical_frustum_to_gaussian(
      jnp.array(d), jnp.array(t0), jnp.array(t1), jnp.array(radius),
      diag=False)
  want_mean, want_cov = _frustum_moments_numerical(d, t0, t1, radius, n=400000)
  np.testing.assert_allclose(np.array(mean)[0], want_mean, rtol=2e-3,
                             atol=1e-3)
  np.testing.assert_allclose(np.array(cov)[0], want_cov, rtol=0.05, atol=2e-4)


def test_conical_frustum_stable_matches_unstable_in_safe_range():
  d = jnp.array([[0.0, 0.0, 1.0]])
  t0 = jnp.array([[1.0]])
  t1 = jnp.array([[1.5]])
  r = jnp.array([[0.05]])
  m_s, c_s = rendering.conical_frustum_to_gaussian(d, t0, t1, r, diag=True,
                                                   stable=True)
  m_u, c_u = rendering.conical_frustum_to_gaussian(d, t0, t1, r, diag=True,
                                                   stable=False)
  np.testing.assert_allclose(np.array(m_s), np.array(m_u), rtol=1e-4)
  np.testing.assert_allclose(np.array(c_s), np.array(c_u), rtol=1e-2,
                             atol=1e-7)


def test_cylinder_moments():
  """Cylinder moments have textbook closed forms: uniform in t and disc."""
  d = jnp.array([0.0, 0.0, 2.0])  # Unnormalized direction.
  t0, t1, radius = 1.0, 3.0, 0.5
  mean, cov = rendering.cylinder_to_gaussian(
      d, jnp.array(t0), jnp.array(t1), jnp.array(radius), diag=True)
  # Mean at the midpoint along d.
  np.testing.assert_allclose(np.array(mean)[0], [0, 0, 2.0 * 2.0], atol=1e-6)
  # Var along z: Var[t]*dz^2 = ((t1-t0)^2/12) * 4; var in x/y: r^2/4.
  np.testing.assert_allclose(
      np.array(cov)[0],
      [radius**2 / 4, radius**2 / 4, (t1 - t0)**2 / 12 * 4.0], rtol=1e-5)


def test_cast_rays_shapes_and_offsets():
  b, s = 6, 9
  tdist = jnp.broadcast_to(jnp.linspace(1.0, 4.0, s + 1), (b, s + 1))
  origins = jnp.ones((b, 3)) * 5.0
  directions = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (b, 1))
  radii = jnp.full((b, 1), 0.01)
  means, covs = rendering.cast_rays(tdist, origins, directions, radii, 'cone',
                                    diag=False)
  assert means.shape == (b, s, 3)
  assert covs.shape == (b, s, 3, 3)
  # Means offset by origins.
  assert np.all(np.array(means)[..., 0] == 5.0)


def test_alpha_weights_zero_density():
  tdist = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (2, 5))
  dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))
  density = jnp.zeros((2, 4))
  weights, alpha, trans = rendering.compute_alpha_weights(
      density, tdist, dirs)
  np.testing.assert_allclose(np.array(weights), 0)
  np.testing.assert_allclose(np.array(trans), 1)


def test_alpha_weights_sum_to_one_when_opaque():
  rng = np.random.RandomState(0)
  tdist = jnp.array(np.sort(rng.rand(4, 9), -1), jnp.float32)
  dirs = jnp.array(rng.randn(4, 3), jnp.float32)
  density = jnp.array(rng.rand(4, 8), jnp.float32)
  weights, _, _ = rendering.compute_alpha_weights(
      density, tdist, dirs, opaque_background=True)
  np.testing.assert_allclose(np.array(weights).sum(-1), 1.0, rtol=1e-5)


def test_alpha_weights_match_naive_compositing():
  rng = np.random.RandomState(1)
  tdist = np.sort(rng.rand(8, 6).astype(np.float32) * 3, -1)
  dirs = rng.randn(8, 3).astype(np.float32)
  density = rng.rand(8, 5).astype(np.float32) * 2
  weights, alpha, trans = rendering.compute_alpha_weights(
      jnp.array(density), jnp.array(tdist), jnp.array(dirs))
  # Naive sequential compositing.
  delta = np.diff(tdist, axis=-1) * np.linalg.norm(dirs, axis=-1)[:, None]
  a = 1 - np.exp(-density * delta)
  t_acc = np.ones((8,))
  for i in range(5):
    np.testing.assert_allclose(np.array(weights)[:, i], t_acc * a[:, i],
                               rtol=1e-4, atol=1e-6)
    t_acc = t_acc * (1 - a[:, i])


def test_volumetric_rendering_full_and_empty():
  b, s = 4, 8
  tdist = jnp.broadcast_to(jnp.linspace(1.0, 2.0, s + 1), (b, s + 1))
  rgbs = jnp.ones((b, s, 3)) * 0.5
  t_far = jnp.full((b, 1), 2.0)

  # Empty scene: output is the background color.
  w0 = jnp.zeros((b, s))
  out = rendering.volumetric_rendering(rgbs, w0, tdist, jnp.array(0.25),
                                       t_far, compute_extras=True)
  np.testing.assert_allclose(np.array(out['rgb']), 0.25, atol=1e-6)
  np.testing.assert_allclose(np.array(out['acc']), 0.0, atol=1e-6)

  # Fully opaque first sample: output is the sample color.
  w1 = jnp.concatenate([jnp.ones((b, 1)), jnp.zeros((b, s - 1))], -1)
  out = rendering.volumetric_rendering(rgbs, w1, tdist, jnp.array(0.25),
                                       t_far, compute_extras=True)
  np.testing.assert_allclose(np.array(out['rgb']), 0.5, atol=1e-6)
  np.testing.assert_allclose(np.array(out['acc']), 1.0, atol=1e-6)
  # Median distance falls in the first interval.
  assert np.all(np.array(out['distance_median']) <= tdist[0, 1])


def test_volumetric_rendering_extras_composited():
  b, s = 2, 4
  tdist = jnp.broadcast_to(jnp.linspace(0.0, 1.0, s + 1), (b, s + 1))
  rgbs = jnp.zeros((b, s, 3))
  w = jnp.full((b, s), 0.25)
  t_far = jnp.ones((b, 1))
  extras = {'normals': jnp.ones((b, s, 3)), 'skipme': None}
  out = rendering.volumetric_rendering(rgbs, w, tdist, jnp.array(0.0), t_far,
                                       compute_extras=True, extras=extras)
  np.testing.assert_allclose(np.array(out['normals']), 1.0, atol=1e-6)
  assert 'skipme' not in out
