"""Equivalence tests for the fully-fused density MLP kernel.

Kernel (interpreted on CPU) vs its jnp twin, for values AND every
weight/bias gradient — the twin itself is pinned against the real flax MLP
in test_models.py (fused-vs-unfused parity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu.ops.pallas import density_mlp


def _setup(n=640, depth=4, width=64, num_feats_basis=21, seed=0):
  rng = np.random.RandomState(seed)
  means = jnp.array(rng.randn(n, 3).astype(np.float32) * 2.0)
  a = rng.randn(n, 3, 3).astype(np.float32) * 0.05
  covs = jnp.array(a @ np.swapaxes(a, -1, -2))
  basis = rng.randn(3, num_feats_basis).astype(np.float32)
  c0 = 2 * 12 * num_feats_basis
  ws, bs = [], []
  c_in = c0
  for _ in range(depth):
    ws.append(jnp.array(rng.randn(c_in, width).astype(np.float32) /
                        np.sqrt(c_in)))
    bs.append(jnp.array(rng.randn(width).astype(np.float32) * 0.01))
    c_in = width
  wd = jnp.array(rng.randn(width, 1).astype(np.float32) / np.sqrt(width))
  bd = jnp.array(np.float32(0.1))
  return means, covs, basis, ws, bs, wd, bd


@pytest.mark.parametrize('use_contract', [True, False])
def test_fused_density_mlp_matches_twin(use_contract):
  means, covs, basis, ws, bs, wd, bd = _setup()
  got = density_mlp.density_mlp(means, covs, ws, bs, wd, bd, basis,
                                use_contract=use_contract, interpret=True)
  want = density_mlp.density_mlp_reference(means, covs, ws, bs, wd, bd,
                                           basis, use_contract=use_contract)
  assert got.shape == want.shape == (means.shape[0],)
  np.testing.assert_allclose(np.array(got), np.array(want), rtol=2e-2,
                             atol=2e-2)


def test_fused_density_mlp_batch_shape_and_padding():
  # Non-multiple-of-256 n exercises the padding path; [B, S] batch dims.
  means, covs, basis, ws, bs, wd, bd = _setup(n=600)
  means2 = means.reshape(30, 20, 3)
  covs2 = covs.reshape(30, 20, 3, 3)
  got = density_mlp.density_mlp(means2, covs2, ws, bs, wd, bd, basis,
                                interpret=True)
  assert got.shape == (30, 20)
  flat = density_mlp.density_mlp(means, covs, ws, bs, wd, bd, basis,
                                 interpret=True)
  np.testing.assert_allclose(np.array(got).reshape(-1), np.array(flat),
                             rtol=1e-5, atol=1e-6)


def test_fused_density_mlp_gradients_match_twin():
  means, covs, basis, ws, bs, wd, bd = _setup(n=512)

  def loss_fused(params):
    ws_, bs_, wd_, bd_ = params
    out = density_mlp.density_mlp(means, covs, ws_, bs_, wd_, bd_, basis,
                                  interpret=True)
    return jnp.sum(jnp.sin(out) * jnp.arange(out.shape[0]) / out.shape[0])

  def loss_twin(params):
    ws_, bs_, wd_, bd_ = params
    out = density_mlp.density_mlp_reference(means, covs, ws_, bs_, wd_, bd_,
                                            basis)
    return jnp.sum(jnp.sin(out) * jnp.arange(out.shape[0]) / out.shape[0])

  params = (tuple(ws), tuple(bs), wd, bd)
  g_fused = jax.grad(loss_fused)(params)
  g_twin = jax.grad(loss_twin)(params)
  flat_f, _ = jax.tree_util.tree_flatten(g_fused)
  flat_t, _ = jax.tree_util.tree_flatten(g_twin)
  assert len(flat_f) == len(flat_t)
  for gf, gt in zip(flat_f, flat_t):
    scale = max(1e-3, float(jnp.abs(gt).max()))
    np.testing.assert_allclose(np.array(gf), np.array(gt), rtol=5e-2,
                               atol=5e-2 * scale)


def test_fused_density_mlp_input_grads_are_cut():
  means, covs, basis, ws, bs, wd, bd = _setup(n=256)
  g = jax.grad(lambda m: density_mlp.density_mlp(
      m, covs, ws, bs, wd, bd, basis, interpret=True).sum())(means)
  np.testing.assert_array_equal(np.array(g), 0.0)


def test_full_density_fusion_param_compatible_and_equivalent():
  """A density-only MLP (PropMLP shape: disable_rgb, no normal heads, no
  in-trunk skip) runs ENTIRELY in the fused kernel; its param tree is
  identical to the unfused module's, outputs match to bf16 rounding, and
  gradients reach every weight and bias."""
  from multinerf_tpu import configs  # noqa: F401 -- registers @references.
  from multinerf_tpu.models import mlp as mlp_lib  # noqa: F401
  from multinerf_tpu import ginlite
  ginlite.clear_config()
  ginlite.parse_config_files_and_bindings(
      [], ['PropMLP.net_depth = 4', 'PropMLP.net_width = 32',
           'PropMLP.disable_rgb = True',
           'PropMLP.disable_density_normals = True',
           'PropMLP.warp_fn = @coord.contract'])
  try:
    mlp_plain = ginlite.make('PropMLP').clone(use_fused_featurize=False)
    mlp_fused = ginlite.make('PropMLP').clone(use_fused_featurize=True)
  finally:
    ginlite.clear_config()

  rng = np.random.RandomState(7)
  means = jnp.array((rng.randn(8, 16, 3) * 2).astype(np.float32))
  a = rng.randn(8, 16, 3, 3).astype(np.float32) * 0.05
  covs = jnp.array(a @ np.swapaxes(a, -1, -2))

  variables = mlp_plain.init(jax.random.PRNGKey(0), None, (means, covs))
  variables_f = mlp_fused.init(jax.random.PRNGKey(0), None, (means, covs))
  shapes = jax.tree_util.tree_map(lambda x: x.shape, variables)
  shapes_f = jax.tree_util.tree_map(lambda x: x.shape, variables_f)
  assert shapes == shapes_f

  # The fused module consumes the PLAIN module's variables unchanged.
  out_plain = mlp_plain.apply(variables, None, (means, covs))
  out_fused = mlp_fused.apply(variables, None, (means, covs))
  np.testing.assert_allclose(np.array(out_fused['density']),
                             np.array(out_plain['density']),
                             rtol=5e-2, atol=5e-2)

  def loss(vs, m):
    return jnp.mean(m.apply(vs, None, (means, covs))['density'] ** 2)
  g_fused = jax.grad(lambda v: loss(v, mlp_fused))(variables)
  g_plain = jax.grad(lambda v: loss(v, mlp_plain))(variables)
  fl_f, tree_f = jax.tree_util.tree_flatten(g_fused)
  fl_p, tree_p = jax.tree_util.tree_flatten(g_plain)
  assert tree_f == tree_p
  for gf, gp in zip(fl_f, fl_p):
    assert np.isfinite(np.array(gf)).all()
    scale = max(1e-3, float(jnp.abs(gp).max()))
    np.testing.assert_allclose(np.array(gf), np.array(gp), rtol=8e-2,
                               atol=8e-2 * scale)
