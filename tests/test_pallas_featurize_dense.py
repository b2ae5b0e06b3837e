"""Equivalence tests for the fused featurize->Dense Pallas kernel.

Run interpreted on the CPU mesh (tests/conftest.py); the kernel's compiled
behavior is exercised on the real chip by bench.py and the verify recipes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu.ops import coord
from multinerf_tpu.ops.pallas import featurize_dense as fd


def _inputs(n=640, width=64, seed=0, scale=2.0):
  rng = np.random.RandomState(seed)
  means = jnp.array((rng.randn(n, 3) * scale).astype(np.float32))
  a = rng.randn(n, 3, 3).astype(np.float32) * 0.05
  covs = jnp.array(a @ np.swapaxes(a, -1, -2))
  basis = rng.randn(3, 21).astype(np.float32)
  kernel = jnp.array(rng.randn(2 * 12 * 21, width).astype(np.float32) * 0.05)
  bias = jnp.array(rng.randn(width).astype(np.float32) * 0.1)
  return means, covs, basis, kernel, bias


@pytest.mark.parametrize('use_contract', [True, False])
def test_fused_forward_matches_twin(use_contract):
  means, covs, basis, kernel, bias = _inputs()
  got = fd.featurize_dense(means, covs, kernel, bias, basis, 0, 12,
                           use_contract=use_contract, interpret=True)
  want = fd.featurize_dense_reference(means, covs, kernel, bias, basis,
                                      0, 12, use_contract=use_contract)
  assert got.shape == want.shape == (640, 64)
  # Twin features are f32 on CPU while the kernel stores bf16: tolerance
  # covers bf16 rounding of ~500-term dot products.
  np.testing.assert_allclose(np.array(got), np.array(want),
                             rtol=2e-2, atol=5e-2)


def test_fused_forward_batch_shape_and_padding():
  # n=100 forces the internal pad-to-256 path; batch dims are restored.
  means, covs, basis, kernel, bias = _inputs(n=100)
  got = fd.featurize_dense(means.reshape(4, 25, 3), covs.reshape(4, 25, 3, 3),
                           kernel, bias, basis, 0, 12, interpret=True)
  want = fd.featurize_dense_reference(means, covs, kernel, bias, basis, 0, 12)
  assert got.shape == (4, 25, 64)
  np.testing.assert_allclose(np.array(got).reshape(100, 64), np.array(want),
                             rtol=2e-2, atol=5e-2)


def test_fused_gradients_match_twin():
  means, covs, basis, kernel, bias = _inputs(n=512, width=32)

  def loss_fused(k, b):
    out = fd.featurize_dense(means, covs, k, b, basis, 0, 12,
                             interpret=True)
    return jnp.sum(jnp.sin(out))

  def loss_twin(k, b):
    out = fd.featurize_dense_reference(means, covs, k, b, basis, 0, 12)
    return jnp.sum(jnp.sin(out))

  (dk_f, db_f) = jax.grad(loss_fused, argnums=(0, 1))(kernel, bias)
  (dk_t, db_t) = jax.grad(loss_twin, argnums=(0, 1))(kernel, bias)
  # dW accumulates [F, T] @ [T, W] over tiles in f32; twin backward runs the
  # same contraction in XLA.  bf16 feature rounding dominates the tolerance.
  np.testing.assert_allclose(np.array(db_f), np.array(db_t),
                             rtol=1e-3, atol=1e-3)
  np.testing.assert_allclose(np.array(dk_f), np.array(dk_t),
                             rtol=5e-2, atol=8e-2)


def test_fused_inputs_get_zero_gradients():
  means, covs, basis, kernel, bias = _inputs(n=256, width=16)
  g = jax.grad(lambda m: jnp.sum(fd.featurize_dense(
      m, covs, kernel, bias, basis, 0, 12, interpret=True)))(means)
  np.testing.assert_array_equal(np.array(g), 0.0)


def test_fused_mlp_param_compatible_and_equivalent():
  """The fused MLP consumes the UNFUSED MLP's variables unchanged (param
  names/shapes identical) and produces the same densities/colors to bf16
  matmul rounding — including through the decomposed skip layer."""
  from multinerf_tpu import configs  # noqa: F401 -- registers @references.
  from multinerf_tpu.models import mlp  # noqa: F401 -- registers NerfMLP.
  from multinerf_tpu import ginlite
  ginlite.clear_config()
  ginlite.parse_config_files_and_bindings(
      [], ['NerfMLP.net_depth = 6', 'NerfMLP.net_width = 32',
           'NerfMLP.skip_layer = 2', 'NerfMLP.bottleneck_width = 16',
           'NerfMLP.net_width_viewdirs = 16',
           'NerfMLP.disable_density_normals = True',
           'NerfMLP.warp_fn = @coord.contract'])
  try:
    mlp_plain = ginlite.make('NerfMLP').clone(use_fused_featurize=False)
    mlp_fused = ginlite.make('NerfMLP').clone(use_fused_featurize=True)
  finally:
    ginlite.clear_config()

  rng = np.random.RandomState(5)
  means = jnp.array((rng.randn(8, 16, 3) * 2).astype(np.float32))
  a = rng.randn(8, 16, 3, 3).astype(np.float32) * 0.05
  covs = jnp.array(a @ np.swapaxes(a, -1, -2))
  vd = jnp.array(rng.randn(8, 3).astype(np.float32))
  vd /= jnp.linalg.norm(vd, axis=-1, keepdims=True)

  variables = mlp_plain.init(jax.random.PRNGKey(0), None, (means, covs),
                             viewdirs=vd)
  variables_f = mlp_fused.init(jax.random.PRNGKey(0), None, (means, covs),
                               viewdirs=vd)
  flat = jax.tree_util.tree_map(lambda x: x.shape, variables)
  flat_f = jax.tree_util.tree_map(lambda x: x.shape, variables_f)
  assert jax.tree_util.tree_structure(flat) == (
      jax.tree_util.tree_structure(flat_f))
  assert flat == flat_f

  out_plain = mlp_plain.apply(variables, None, (means, covs), viewdirs=vd)
  out_fused = mlp_fused.apply(variables, None, (means, covs), viewdirs=vd)
  np.testing.assert_allclose(np.array(out_fused['density']),
                             np.array(out_plain['density']),
                             rtol=5e-2, atol=5e-2)
  np.testing.assert_allclose(np.array(out_fused['rgb']),
                             np.array(out_plain['rgb']),
                             rtol=5e-2, atol=5e-2)

  # Gradients flow to every parameter in fused mode (kernel + bias of the
  # fused layers included).
  def loss(vs):
    o = mlp_fused.apply(vs, None, (means, covs), viewdirs=vd)
    return jnp.mean(o['rgb'] ** 2) + jnp.mean(o['density'] ** 2)
  g = jax.grad(loss)(variables)
  leaves = jax.tree_util.tree_leaves(
      jax.tree_util.tree_map(lambda x: float(jnp.sum(jnp.abs(x))), g))
  assert all(np.isfinite(leaves))
  assert sum(v > 0 for v in leaves) >= len(leaves) - 1  # bias of last head
                                                        # may be tiny but >0.


def test_fused_matches_unfused_model_chain():
  """Against the production unfused chain (track_linearize + lifted IPE +
  f32 Dense): agreement to bf16-rounding tolerance, which is exactly the
  difference XLA's one-pass matmul would introduce anyway."""
  means, covs, basis, kernel, bias = _inputs(n=256, width=32)
  got = fd.featurize_dense(means, covs, kernel, bias, basis, 0, 12,
                           use_contract=True, interpret=True)
  m, c = coord.track_linearize(coord.contract, means, covs)
  feats = coord.integrated_pos_enc_lifted(m, c, basis, 0, 12)
  want = feats @ kernel + bias
  np.testing.assert_allclose(np.array(got), np.array(want),
                             rtol=3e-2, atol=8e-2)
