"""Equivalence tests: fused featurization kernel == jnp pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu.ops import geopoly
from multinerf_tpu.ops.pallas import featurize


def _gaussians(n, seed=0, spread=3.0):
  rng = np.random.RandomState(seed)
  means = (rng.randn(n, 3) * spread).astype(np.float32)
  a = rng.randn(n, 3, 3).astype(np.float32) * 0.05
  covs = a @ np.swapaxes(a, -1, -2)
  return jnp.array(means), jnp.array(covs)


@pytest.mark.parametrize('use_contract', [True, False])
@pytest.mark.parametrize('shape,subdiv', [('icosahedron', 2),
                                          ('octahedron', 1)])
def test_fused_matches_reference(use_contract, shape, subdiv):
  basis = jnp.array(geopoly.generate_basis(shape, subdiv)).T
  means, covs = _gaussians(256)
  got = featurize.fused_ipe_features(means, covs, basis, 0, 8,
                                     use_contract=use_contract,
                                     interpret=True)
  want = featurize.reference_ipe_features(means, covs, basis, 0, 8,
                                          use_contract=use_contract)
  # Different (equally valid) f32 summation orders in the basis lift shift
  # sin arguments by ~1e-6, amplified by the 2^d frequency scaling.
  np.testing.assert_allclose(np.array(got), np.array(want), atol=2e-4)


def test_fused_high_degrees_and_batch_dims():
  basis = jnp.array(geopoly.generate_basis('icosahedron', 2)).T
  means, covs = _gaussians(512, seed=1, spread=50.0)  # Far samples.
  means = means.reshape(16, 32, 3)
  covs = covs.reshape(16, 32, 3, 3)
  got = featurize.fused_ipe_features(means, covs, basis, 0, 16,
                                     use_contract=True, interpret=True)
  want = featurize.reference_ipe_features(means, covs, basis, 0, 16,
                                          use_contract=True)
  assert got.shape == want.shape == (16, 32, 2 * 21 * 16)
  # At deg 15 the frequency scale is 2^15: f32 lift noise (~1e-6) becomes
  # ~3e-2 in the sin argument; the IPE attenuation keeps those features
  # near zero, so a loose atol still pins the implementation.
  np.testing.assert_allclose(np.array(got), np.array(want), atol=5e-3)


def test_fused_bf16_output_close():
  basis = jnp.array(geopoly.generate_basis('octahedron', 1)).T
  means, covs = _gaussians(128, seed=2)
  got = featurize.fused_ipe_features(means, covs, basis, 0, 8,
                                     out_dtype=jnp.bfloat16, interpret=True)
  want = featurize.reference_ipe_features(means, covs, basis, 0, 8)
  assert got.dtype == jnp.bfloat16
  np.testing.assert_allclose(np.array(got, np.float32), np.array(want),
                             atol=1e-2)


def test_fused_zero_covariance_is_posenc():
  """Zero covariance disables integration (disable_integration path)."""
  from multinerf_tpu.ops import coord
  basis = jnp.array(geopoly.generate_basis('octahedron', 1)).T
  means, _ = _gaussians(64, seed=3, spread=0.5)
  covs = jnp.zeros((64, 3, 3))
  got = featurize.fused_ipe_features(means, covs, basis, 0, 4,
                                     use_contract=False, interpret=True)
  lm = means @ basis
  want = coord.pos_enc(lm, 0, 4, append_identity=False)
  np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-5)


def test_fused_grads_are_cut():
  """No gradient flows into means/covs (forward-only contract)."""
  basis = jnp.array(geopoly.generate_basis('octahedron', 1)).T
  means, covs = _gaussians(64, seed=4)

  def f(m):
    return featurize.fused_ipe_features(m, covs, basis, 0, 4,
                                        interpret=True).sum()

  g = jax.grad(f)(means)
  np.testing.assert_allclose(np.array(g), 0.0)
