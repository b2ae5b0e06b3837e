"""Tests for ops.ref_utils: reflections and directional encodings."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special

from multinerf_tpu.ops import ref_utils


def _scipy_sph_harm(m, l, polar, azim):
  """Y_l^m with scipy, handling the sph_harm -> sph_harm_y API migration."""
  if hasattr(scipy.special, 'sph_harm_y'):
    return scipy.special.sph_harm_y(l, m, polar, azim)
  return scipy.special.sph_harm(m, l, azim, polar)


def test_reflect_preserves_angle_and_norm():
  rng = np.random.RandomState(0)
  normals = rng.randn(128, 3)
  normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
  dirs = rng.randn(128, 3).astype(np.float32)
  refl = np.array(ref_utils.reflect(jnp.array(dirs), jnp.array(normals)))
  # Same angle with the normal and same length.
  np.testing.assert_allclose((refl * normals).sum(-1), (dirs * normals).sum(-1),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.linalg.norm(refl, axis=-1),
                             np.linalg.norm(dirs, axis=-1), rtol=1e-4)


def test_l2_normalize():
  rng = np.random.RandomState(1)
  x = rng.randn(64, 3).astype(np.float32)
  n = np.array(ref_utils.l2_normalize(jnp.array(x)))
  np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)
  # Zero input stays finite.
  z = np.array(ref_utils.l2_normalize(jnp.zeros((2, 3))))
  assert np.all(np.isfinite(z))


def test_compute_weighted_mae():
  n = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (10, 1))
  # 90-degree error everywhere.
  n_gt = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (10, 1))
  w = np.ones((10,), np.float32)
  mae = float(ref_utils.compute_weighted_mae(
      jnp.array(w), jnp.array(n), jnp.array(n_gt)))
  assert abs(mae - 90.0) < 1e-3


def test_dir_enc_matches_scipy_spherical_harmonics():
  """Real-recurrence SH == scipy's complex Y_l^m (reference convention)."""
  rng = np.random.RandomState(2)
  shape = (7, 9)
  theta = rng.uniform(0, np.pi, shape)          # polar
  phi = rng.uniform(0, 2 * np.pi, shape)        # azimuth
  xyz = np.stack([np.sin(theta) * np.cos(phi),
                  np.sin(theta) * np.sin(phi),
                  np.cos(theta)], axis=-1).astype(np.float32)

  deg_view = 5
  got = np.array(ref_utils.generate_dir_enc_fn(deg_view)(jnp.array(xyz)))

  ml_array = ref_utils.get_ml_array(deg_view)
  want = np.stack(
      [_scipy_sph_harm(m, l, theta, phi) for m, l in ml_array.T], axis=-1)
  want = np.concatenate([np.real(want), np.imag(want)], axis=-1)
  np.testing.assert_allclose(got, want, atol=0.02)
  assert not np.any(np.isnan(got))


def test_ide_attenuates_with_roughness():
  """Higher kappa_inv (rougher) shrinks high-frequency SH components."""
  xyz = jnp.array([[0.3, -0.5, 0.81]])
  xyz = ref_utils.l2_normalize(xyz)
  ide_fn = ref_utils.generate_ide_fn(4)
  sharp = np.array(ide_fn(xyz, jnp.array([[0.0]])))
  rough = np.array(ide_fn(xyz, jnp.array([[1.0]])))
  assert np.mean(np.abs(rough)) < np.mean(np.abs(sharp))
  # kappa_inv=0 must equal the non-integrated encoding.
  de = np.array(ref_utils.generate_dir_enc_fn(4)(xyz))
  np.testing.assert_allclose(sharp, de, atol=1e-6)


def test_ide_jittable_and_grad_finite():
  xyz = ref_utils.l2_normalize(jnp.array([[0.2, 0.4, 0.88]]))
  ide_fn = ref_utils.generate_ide_fn(3)
  out = jax.jit(ide_fn)(xyz, jnp.array([[0.1]]))
  assert np.all(np.isfinite(np.array(out)))
  g = jax.grad(lambda v: jnp.sum(ide_fn(v, jnp.array([[0.1]]))))(xyz)
  assert np.all(np.isfinite(np.array(g)))
