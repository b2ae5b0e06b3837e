"""Equivalence tests for the fused int8 trunk (interpret mode on CPU).

Forward: kernel vs the jnp twin (same per-sample quantization law;
tolerances allow for the featurization paths' bf16-level differences
propagating through round()), and vs the exact f32 trunk within the
expected quantization error band.  Backward: weight/bias gradients track
the f32 autodiff of the unquantized trunk (STE contract), and means/covs
receive exact zeros.  The MLP integration test pins checkpoint
compatibility: identical param trees across int8-fused / unfused paths.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu.ops import coord
from multinerf_tpu.ops import geopoly
from multinerf_tpu.ops.pallas import int8_trunk as i8t


def _setup(depth=3, width=64, skip=(2,), n=512, seed=0):
  rs = np.random.RandomState(seed)
  basis = np.array(geopoly.generate_basis('icosahedron', 2)).T  # [3, 21]
  num_feats = 2 * 4 * basis.shape[-1]  # min_deg 0, max_deg 4.
  means = jnp.asarray(rs.randn(n, 3) * 2.0, jnp.float32)
  covs = jnp.asarray(
      np.einsum('nij,nkj->nik', rs.randn(n, 3, 3) * 0.1,
                rs.randn(n, 3, 3) * 0.1) + 0.01 * np.eye(3), jnp.float32)
  ws, bs = [], []
  for l in range(depth):
    rows = num_feats if l == 0 else (
        width + num_feats if l in skip else width)
    ws.append(jnp.asarray(rs.randn(rows, width) / np.sqrt(rows),
                          jnp.float32))
    bs.append(jnp.asarray(rs.randn(width) * 0.01, jnp.float32))
  return means, covs, ws, bs, basis


def _f32_trunk(means, covs, ws, bs, basis, skip, max_deg=4):
  """Unquantized f32 twin (the STE target for gradient checks)."""
  m, c = coord.contract_gaussian(means, covs)
  f = coord._integrated_pos_enc_lifted_recurrence(m, c, basis, 0, max_deg)
  f = f.astype(jnp.float32)
  width = ws[-1].shape[-1]
  x = jnp.maximum(f @ ws[0] + bs[0], 0.0)
  for l in range(1, len(ws)):
    y = x @ ws[l][:width]
    if l in set(skip):
      y = y + f @ ws[l][width:]
    x = jnp.maximum(y + bs[l], 0.0)
  return x


@pytest.mark.parametrize('skip', [(), (2,)])
def test_forward_matches_twin_and_f32(skip):
  means, covs, ws, bs, basis = _setup(skip=skip)
  got = i8t.int8_trunk(means, covs, ws, bs, basis, min_deg=0, max_deg=4,
                       use_contract=True, skip_layers=skip, interpret=True)
  twin = i8t.int8_trunk_reference(means, covs, ws, bs, basis, min_deg=0,
                                  max_deg=4, use_contract=True,
                                  skip_layers=skip)
  f32 = _f32_trunk(means, covs, ws, bs, basis, skip)
  got = np.asarray(got, np.float32)
  twin = np.asarray(twin, np.float32)
  f32 = np.asarray(f32)
  assert got.dtype == np.float32 and got.shape == f32.shape
  # Kernel vs twin: same quantization law; residual differences come from
  # the two featurization implementations' bf16-level deltas flipping
  # round() by one quantum.
  rel_twin = np.linalg.norm(got - twin) / max(np.linalg.norm(twin), 1e-6)
  assert rel_twin < 0.02, rel_twin
  # Kernel vs exact f32: the quantization error band.
  rel_f32 = np.linalg.norm(got - f32) / max(np.linalg.norm(f32), 1e-6)
  assert rel_f32 < 0.06, rel_f32


def test_forward_batched_shape():
  means, covs, ws, bs, basis = _setup(n=512)
  got = i8t.int8_trunk(means.reshape(8, 64, 3),
                       covs.reshape(8, 64, 3, 3), ws, bs, basis,
                       min_deg=0, max_deg=4, skip_layers=(2,),
                       interpret=True)
  assert got.shape == (8, 64, ws[-1].shape[-1])


@pytest.mark.parametrize('skip', [(), (2,)])
def test_gradients_track_f32_autodiff(skip):
  means, covs, ws, bs, basis = _setup(skip=skip)
  rs = np.random.RandomState(1)
  co = jnp.asarray(rs.randn(means.shape[0], ws[-1].shape[-1]), jnp.float32)

  def loss_q(ws, bs):
    out = i8t.int8_trunk(means, covs, ws, bs, basis, min_deg=0, max_deg=4,
                         skip_layers=skip, interpret=True)
    return jnp.sum(out.astype(jnp.float32) * co)

  def loss_f(ws, bs):
    return jnp.sum(_f32_trunk(means, covs, ws, bs, basis, skip) * co)

  (dws_q, dbs_q) = jax.grad(loss_q, argnums=(0, 1))(tuple(ws), tuple(bs))
  (dws_f, dbs_f) = jax.grad(loss_f, argnums=(0, 1))(tuple(ws), tuple(bs))
  for l, (gq, gf) in enumerate(zip(dws_q, dws_f)):
    rel = (np.linalg.norm(np.asarray(gq) - np.asarray(gf)) /
           max(np.linalg.norm(np.asarray(gf)), 1e-6))
    assert rel < 0.15, (l, rel)
    # Direction agreement is what optimization needs.
    cos = np.sum(np.asarray(gq) * np.asarray(gf)) / max(
        np.linalg.norm(np.asarray(gq)) * np.linalg.norm(np.asarray(gf)),
        1e-12)
    assert cos > 0.98, (l, cos)
  for l, (gq, gf) in enumerate(zip(dbs_q, dbs_f)):
    rel = (np.linalg.norm(np.asarray(gq) - np.asarray(gf)) /
           max(np.linalg.norm(np.asarray(gf)), 1e-6))
    assert rel < 0.15, (l, rel)


def test_means_covs_get_zero_cotangents():
  means, covs, ws, bs, basis = _setup()

  def loss(means, covs):
    out = i8t.int8_trunk(means, covs, ws, bs, basis, min_deg=0, max_deg=4,
                         skip_layers=(2,), interpret=True)
    return jnp.sum(out.astype(jnp.float32))

  gm, gc = jax.grad(loss, argnums=(0, 1))(means, covs)
  assert np.all(np.asarray(gm) == 0)
  assert np.all(np.asarray(gc) == 0)


def test_mlp_int8_fused_param_tree_matches_unfused():
  """trunk_dtype='int8' + forced fused featurize declares the exact same
  param tree as the unfused path -> checkpoints interchangeable."""
  from multinerf_tpu.models import mlp as mlp_lib

  def build(fused):
    return mlp_lib.MLP(
        net_depth=3, net_width=64, bottleneck_width=16,
        net_width_viewdirs=16, deg_view=2, skip_layer=2,
        disable_density_normals=True, trunk_dtype='int8',
        warp_fn=coord.contract, use_fused_featurize=fused)

  rng = jax.random.PRNGKey(0)
  means = jax.random.normal(rng, (16, 4, 3))
  covs = jnp.broadcast_to(0.01 * jnp.eye(3), (16, 4, 3, 3))
  viewdirs = jnp.broadcast_to(jnp.array([0., 0., 1.]), (16, 3))
  v_fused = build(True).init(rng, None, (means, covs), viewdirs=viewdirs)
  v_unfused = build(False).init(rng, None, (means, covs), viewdirs=viewdirs)
  t1 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_fused)
  t2 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_unfused)
  assert t1 == t2
  # And the fused path runs + produces finite density on the same params.
  out = build(True).apply(v_unfused, None, (means, covs), viewdirs=viewdirs)
  assert np.all(np.isfinite(np.asarray(out['density'])))


@pytest.mark.parametrize('skip', [(), (2,)])
def test_hybrid_forward_identical_to_int8(skip):
  """bwd_bf16 changes ONLY the backward: forwards are bit-identical."""
  means, covs, ws, bs, basis = _setup(skip=skip)
  kw = dict(min_deg=0, max_deg=4, skip_layers=skip, interpret=True)
  a = i8t.int8_trunk(means, covs, ws, bs, basis, **kw)
  b = i8t.int8_trunk(means, covs, ws, bs, basis, bwd_bf16=True, **kw)
  np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize('skip', [(), (2,)])
def test_hybrid_gradients_consistent_with_int8_and_f32(skip):
  """The hybrid backward shares the int8 backward's forward recompute
  (identical activations and relu masks — forwards are bit-equal), so the
  two backwards must agree up to the int8 path's gradient-quantization
  noise (~1-2%); and like the int8 backward it must track f32 autodiff of
  the unquantized trunk within the established STE band."""
  means, covs, ws, bs, basis = _setup(skip=skip)
  rs = np.random.RandomState(1)
  co = jnp.asarray(rs.randn(means.shape[0], ws[-1].shape[-1]), jnp.float32)

  def loss(ws, bs, bwd_bf16):
    out = i8t.int8_trunk(means, covs, ws, bs, basis, min_deg=0, max_deg=4,
                         skip_layers=skip, interpret=True,
                         bwd_bf16=bwd_bf16)
    return jnp.sum(out.astype(jnp.float32) * co)

  def loss_f(ws, bs):
    return jnp.sum(_f32_trunk(means, covs, ws, bs, basis, skip) * co)

  (dws_h, dbs_h) = jax.grad(loss, argnums=(0, 1))(tuple(ws), tuple(bs),
                                                  True)
  (dws_q, dbs_q) = jax.grad(loss, argnums=(0, 1))(tuple(ws), tuple(bs),
                                                  False)
  (dws_f, dbs_f) = jax.grad(loss_f, argnums=(0, 1))(tuple(ws), tuple(bs))
  for l, (gh, gq) in enumerate(zip(dws_h + dbs_h, dws_q + dbs_q)):
    rel = (np.linalg.norm(np.asarray(gh) - np.asarray(gq)) /
           max(np.linalg.norm(np.asarray(gq)), 1e-6))
    assert rel < 0.05, (l, rel)
  for l, (gh, gf) in enumerate(zip(dws_h + dbs_h, dws_f + dbs_f)):
    rel = (np.linalg.norm(np.asarray(gh) - np.asarray(gf)) /
           max(np.linalg.norm(np.asarray(gf)), 1e-6))
    assert rel < 0.15, (l, rel)
  for l, (gh, gf) in enumerate(zip(dws_h, dws_f)):
    cos = np.sum(np.asarray(gh) * np.asarray(gf)) / max(
        np.linalg.norm(np.asarray(gh)) * np.linalg.norm(np.asarray(gf)),
        1e-12)
    assert cos > 0.98, (l, cos)


def test_mlp_int8_hybrid_param_tree_and_forward():
  """trunk_dtype='int8_hybrid' shares the int8 param tree (checkpoints
  interchangeable) and its forward equals trunk_dtype='int8' exactly."""
  from multinerf_tpu.models import mlp as mlp_lib

  def build(dtype):
    return mlp_lib.MLP(
        net_depth=3, net_width=64, bottleneck_width=16,
        net_width_viewdirs=16, deg_view=2, skip_layer=2,
        disable_density_normals=True, trunk_dtype=dtype,
        warp_fn=coord.contract, use_fused_featurize=True)

  rng = jax.random.PRNGKey(0)
  means = jax.random.normal(rng, (16, 4, 3))
  covs = jnp.broadcast_to(0.01 * jnp.eye(3), (16, 4, 3, 3))
  viewdirs = jnp.broadcast_to(jnp.array([0., 0., 1.]), (16, 3))
  v8 = build('int8').init(rng, None, (means, covs), viewdirs=viewdirs)
  vh = build('int8_hybrid').init(rng, None, (means, covs),
                                 viewdirs=viewdirs)
  t8 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v8)
  th = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vh)
  assert t8 == th
  out8 = build('int8').apply(v8, None, (means, covs), viewdirs=viewdirs)
  outh = build('int8_hybrid').apply(v8, None, (means, covs),
                                    viewdirs=viewdirs)
  np.testing.assert_array_equal(np.asarray(out8['density']),
                                np.asarray(outh['density']))
