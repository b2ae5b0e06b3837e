"""Tests for ops.coord: contraction, Gaussian warps, ray warps, IPE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu.ops import coord
from multinerf_tpu.ops import mathx


def test_contract_identity_inside_unit_ball():
  rng = np.random.RandomState(0)
  x = rng.randn(1000, 3).astype(np.float32)
  x = x / np.maximum(1.0, np.linalg.norm(x, axis=-1, keepdims=True) + 1e-3)
  z = np.array(coord.contract(jnp.array(x)))
  np.testing.assert_allclose(z, x, atol=1e-6)


def test_contract_bounded_by_two():
  rng = np.random.RandomState(1)
  x = (rng.randn(1000, 3) * 100).astype(np.float32)
  z = np.array(coord.contract(jnp.array(x)))
  assert np.all(np.linalg.norm(z, axis=-1) < 2 + 1e-5)


def test_contract_roundtrip():
  rng = np.random.RandomState(2)
  x = (rng.randn(1000, 3) * np.exp(rng.randn(1000, 1) * 2)).astype(np.float32)
  z = coord.contract(jnp.array(x))
  x2 = np.array(coord.inv_contract(z))
  np.testing.assert_allclose(x2, x, rtol=1e-3, atol=1e-4)


def test_contract_gradient_finite_at_origin():
  g = jax.jacobian(coord.contract)(jnp.zeros(3))
  assert np.all(np.isfinite(np.array(g)))


def test_contract_gaussian_matches_autodiff_linearization():
  """Analytic Jacobian warp == jax.linearize reference (the hot-path swap)."""
  rng = np.random.RandomState(3)
  mean = (rng.randn(64, 3) * np.exp(rng.randn(64, 1))).astype(np.float32)
  a = rng.randn(64, 3, 3).astype(np.float32) * 0.1
  cov = a @ np.swapaxes(a, -1, -2)

  got_mean, got_cov = coord.contract_gaussian(jnp.array(mean), jnp.array(cov))

  def linearize_ref(fn, m, c):
    fn_mean, lin_fn = jax.linearize(fn, m)
    fn_cov = jax.vmap(lin_fn, -1, -2)(jax.vmap(lin_fn, -1, -2)(c))
    return fn_mean, fn_cov

  want_mean, want_cov = linearize_ref(
      coord.contract, jnp.array(mean), jnp.array(cov))
  np.testing.assert_allclose(np.array(got_mean), np.array(want_mean),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.array(got_cov), np.array(want_cov),
                             rtol=1e-3, atol=1e-5)


def test_track_linearize_dispatches_and_agrees():
  rng = np.random.RandomState(4)
  mean = (rng.randn(8, 3) * 3).astype(np.float32)
  a = rng.randn(8, 3, 3).astype(np.float32) * 0.05
  cov = a @ np.swapaxes(a, -1, -2)
  m1, c1 = coord.track_linearize(coord.contract, jnp.array(mean),
                                 jnp.array(cov))
  # A lambda is not `contract`, so this exercises the generic path.
  m2, c2 = coord.track_linearize(lambda x: coord.contract(x),
                                 jnp.array(mean), jnp.array(cov))
  np.testing.assert_allclose(np.array(m1), np.array(m2), rtol=1e-4, atol=1e-6)
  np.testing.assert_allclose(np.array(c1), np.array(c2), rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize('fn', [None, 'piecewise', jnp.reciprocal, jnp.log,
                                jnp.exp, jnp.sqrt, jnp.square])
def test_ray_warps_roundtrip_and_endpoints(fn):
  # exp overflows f32 for large t, so keep its domain modest.
  far_val = 8.0 if fn is jnp.exp else 100.0
  near, far = jnp.array([0.4]), jnp.array([far_val])
  t_to_s, s_to_t = coord.construct_ray_warps(fn, near, far)
  assert abs(float(t_to_s(near)[0]) - 0.0) < 1e-5
  assert abs(float(t_to_s(far)[0]) - 1.0) < 1e-5
  t = jnp.linspace(0.5, 0.9 * far_val, 64)
  np.testing.assert_allclose(
      np.array(s_to_t(t_to_s(t))), np.array(t), rtol=1e-3, atol=1e-3)


def test_expected_sin_monte_carlo():
  rng = np.random.RandomState(5)
  mean, var = 0.7, 0.3
  got = float(coord.expected_sin(jnp.array(mean), jnp.array(var)))
  samples = rng.normal(mean, np.sqrt(var), size=2000000)
  want = np.sin(samples).mean()
  assert abs(got - want) < 1e-3


def test_integrated_pos_enc_zero_var_is_pos_enc():
  rng = np.random.RandomState(6)
  x = rng.randn(32, 3).astype(np.float32)
  ipe = coord.integrated_pos_enc(jnp.array(x), jnp.zeros_like(jnp.array(x)),
                                 0, 4)
  pe = coord.pos_enc(jnp.array(x), 0, 4, append_identity=False)
  np.testing.assert_allclose(np.array(ipe), np.array(pe), atol=1e-5)


def test_integrated_pos_enc_attenuates_with_var():
  x = jnp.ones((4, 3))
  lo = coord.integrated_pos_enc(x, 0.01 * jnp.ones_like(x), 0, 6)
  hi = coord.integrated_pos_enc(x, 10.0 * jnp.ones_like(x), 0, 6)
  assert float(jnp.mean(jnp.abs(hi))) < float(jnp.mean(jnp.abs(lo)))


def test_integrated_pos_enc_lifted_matches_composed():
  """Folded-scaling featurization == lift_and_diagonalize + IPE."""
  rng = np.random.RandomState(8)
  mean = (rng.randn(64, 3) * 2).astype(np.float32)
  a = rng.randn(64, 3, 3).astype(np.float32) * 0.05
  cov = a @ np.swapaxes(a, -1, -2)
  basis = rng.randn(3, 7).astype(np.float32)
  lm, lv = coord.lift_and_diagonalize(jnp.array(mean), jnp.array(cov),
                                      jnp.array(basis))
  want = coord.integrated_pos_enc(lm, lv, 0, 8)
  got = coord.integrated_pos_enc_lifted(jnp.array(mean), jnp.array(cov),
                                        basis, 0, 8)
  # f32 summation-order noise is amplified by the 2^d frequency scaling.
  np.testing.assert_allclose(np.array(got), np.array(want), atol=2e-4)
  # Gradients flow (Ref-NeRF path) and match.
  g_want = jax.grad(lambda m: coord.integrated_pos_enc(
      *coord.lift_and_diagonalize(m, jnp.array(cov), jnp.array(basis)),
      0, 4).sum())(jnp.array(mean))
  g_got = jax.grad(lambda m: coord.integrated_pos_enc_lifted(
      m, jnp.array(cov), basis, 0, 4).sum())(jnp.array(mean))
  np.testing.assert_allclose(np.array(g_got), np.array(g_want), rtol=1e-3,
                             atol=1e-3)


def test_ipe_recurrence_matches_direct_formulation():
  """Double-angle/squaring IPE == the direct exp/sin evaluation.

  Stresses the recurrence where its float drift is worst: a full 12-degree
  band, unwarped (large) means, plus the zero-covariance corner (IPE must
  degrade to plain PE exactly: the exp recurrence keeps 1.0 bit-exact
  through squarings).
  """
  import os
  rng = np.random.RandomState(3)
  mean = jnp.array((rng.randn(128, 3) * 50).astype(np.float32))
  a = rng.randn(128, 3, 3).astype(np.float32) * 0.02
  cov = jnp.array(a @ np.swapaxes(a, -1, -2))
  basis = rng.randn(3, 21).astype(np.float32)

  got = coord._integrated_pos_enc_lifted_recurrence(mean, cov, basis, 0, 12)
  os.environ['MULTINERF_IPE_RECURRENCE'] = '0'
  try:
    want = coord.integrated_pos_enc_lifted(mean, cov, basis, 0, 12)
  finally:
    del os.environ['MULTINERF_IPE_RECURRENCE']
  # At |mean|~50 the anchor args reach ~2000 where sin itself carries
  # ~arg*eps ≈ 2.4e-4 of error, so the bound reflects both paths' noise.
  np.testing.assert_allclose(np.array(got), np.array(want),
                             rtol=1e-3, atol=5e-4)

  # Zero covariance = plain PE: nothing attenuates the top octaves, so use
  # contraction-domain means (radius <= 2, the only regime where those
  # octaves are meaningful — at |2^11 * arg| ~ 1e5+ BOTH formulations are
  # limited by f32 range reduction, not by the recurrence).
  mean_c = jnp.array((rng.randn(128, 3) * 0.8).astype(np.float32))
  zero_cov = jnp.zeros_like(cov)
  got0 = coord._integrated_pos_enc_lifted_recurrence(
      mean_c, zero_cov, basis, 0, 12)
  os.environ['MULTINERF_IPE_RECURRENCE'] = '0'
  try:
    want0 = coord.integrated_pos_enc_lifted(mean_c, zero_cov, basis, 0, 12)
  finally:
    del os.environ['MULTINERF_IPE_RECURRENCE']
  np.testing.assert_allclose(np.array(got0), np.array(want0),
                             rtol=1e-3, atol=1e-3)

  g_got = jax.grad(lambda m: coord._integrated_pos_enc_lifted_recurrence(
      m, cov, basis, 0, 12).sum())(mean)
  os.environ['MULTINERF_IPE_RECURRENCE'] = '0'
  try:
    g_want = jax.grad(lambda m: coord.integrated_pos_enc_lifted(
        m, cov, basis, 0, 12).sum())(mean)
  finally:
    del os.environ['MULTINERF_IPE_RECURRENCE']
  np.testing.assert_allclose(np.array(g_got), np.array(g_want),
                             rtol=5e-3, atol=5e-3)


def test_lift_and_diagonalize():
  rng = np.random.RandomState(7)
  mean = rng.randn(16, 3).astype(np.float32)
  a = rng.randn(16, 3, 3).astype(np.float32)
  cov = a @ np.swapaxes(a, -1, -2)
  basis = rng.randn(3, 7).astype(np.float32)
  m, v = coord.lift_and_diagonalize(jnp.array(mean), jnp.array(cov),
                                    jnp.array(basis))
  want_m = mean @ basis
  want_v = np.einsum('ij,bjk,ki->bi', basis.T, cov, basis)
  np.testing.assert_allclose(np.array(m), want_m, rtol=1e-4, atol=1e-4)
  np.testing.assert_allclose(np.array(v), want_v, rtol=1e-3, atol=1e-3)


def test_ipe_lifted_bf16_out_dtype():
  """The bf16 storage path (what production TPU MLPs request via
  out_dtype) is exercised on CPU too: values equal the f32 path to bf16
  rounding, dtype is honored by both formulations, and the default stays
  full f32 (the cast is the caller's opt-in, not backend magic)."""
  import os
  rng = np.random.RandomState(9)
  mean = jnp.array((rng.randn(64, 3) * 0.8).astype(np.float32))
  a = rng.randn(64, 3, 3).astype(np.float32) * 0.02
  cov = jnp.array(a @ np.swapaxes(a, -1, -2))
  basis = rng.randn(3, 21).astype(np.float32)

  f32 = coord.integrated_pos_enc_lifted(mean, cov, basis, 0, 12)
  assert f32.dtype == jnp.float32  # Default: no cast.

  bf16 = coord.integrated_pos_enc_lifted(mean, cov, basis, 0, 12,
                                         out_dtype=jnp.bfloat16)
  assert bf16.dtype == jnp.bfloat16
  np.testing.assert_allclose(
      np.array(bf16, np.float32), np.array(f32), rtol=1e-2, atol=1e-2)

  os.environ['MULTINERF_IPE_RECURRENCE'] = '0'
  try:
    direct = coord.integrated_pos_enc_lifted(mean, cov, basis, 0, 12,
                                             out_dtype=jnp.bfloat16)
  finally:
    del os.environ['MULTINERF_IPE_RECURRENCE']
  assert direct.dtype == jnp.bfloat16
  np.testing.assert_allclose(
      np.array(direct, np.float32), np.array(bf16, np.float32),
      rtol=1e-2, atol=1e-2)
