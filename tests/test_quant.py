"""Int8 quantized-matmul correctness (ops/quant.py).

The int8 trunk is a TPU-only performance subsystem with no reference
counterpart; these tests pin its numerics on CPU: quantization round-trip
error bounds, forward/backward closeness to the exact f32 matmul, STE
gradient shapes/dtypes, nn.Dense param-tree compatibility, and an
end-to-end MLP forward + gradient sanity check under trunk_dtype='int8'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu.ops import quant


def test_absmax_quantize_roundtrip():
  rng = np.random.RandomState(0)
  v = rng.randn(64, 32).astype(np.float32) * 3.0
  q, s = quant.absmax_quantize(jnp.asarray(v), axis=-1)
  assert q.dtype == jnp.int8
  recon = np.asarray(q, np.float32) * np.asarray(s)
  # Max error is half a quantization step = scale / 2, per row.
  err = np.abs(recon - v)
  assert np.all(err <= np.asarray(s)[:, 0][:, None] * 0.5 + 1e-7)
  # Extremes hit +-127 exactly.
  assert np.asarray(jnp.abs(q).max(axis=-1)).min() == 127


def test_absmax_quantize_zero_slice():
  v = jnp.zeros((4, 8))
  q, s = quant.absmax_quantize(v, axis=-1)
  assert np.all(np.asarray(q) == 0)
  assert np.all(np.isfinite(np.asarray(s)))


def test_int8_matmul_forward_close_to_f32():
  rng = np.random.RandomState(1)
  x = rng.randn(128, 96).astype(np.float32)
  w = (rng.randn(96, 80).astype(np.float32) /
       np.sqrt(96))  # fan-in scaled like trained weights
  y = np.asarray(quant.int8_matmul(jnp.asarray(x), jnp.asarray(w)))
  y_ref = x @ w
  # Absmax-int8 with per-slice scales: relative error on the order of the
  # quantization step x sqrt(K); ~1% relative Frobenius error in practice.
  rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
  assert rel < 0.02, rel


def test_int8_matmul_gradients_close_to_f32():
  rng = np.random.RandomState(2)
  x = jnp.asarray(rng.randn(64, 48).astype(np.float32))
  w = jnp.asarray(rng.randn(48, 32).astype(np.float32) / 7.0)
  co = jnp.asarray(rng.randn(64, 32).astype(np.float32))

  def loss_q(x, w):
    return jnp.sum(quant.int8_matmul(x, w) * co)

  def loss_f(x, w):
    return jnp.sum((x @ w) * co)

  gx_q, gw_q = jax.grad(loss_q, argnums=(0, 1))(x, w)
  gx_f, gw_f = jax.grad(loss_f, argnums=(0, 1))(x, w)
  for gq, gf in ((gx_q, gx_f), (gw_q, gw_f)):
    rel = (np.linalg.norm(np.asarray(gq) - np.asarray(gf)) /
           np.linalg.norm(np.asarray(gf)))
    assert rel < 0.03, rel


def test_int8_matmul_under_jit_and_vmapless_shapes():
  x = jnp.ones((8, 16))
  w = jnp.ones((16, 4)) * 0.5
  y = jax.jit(quant.int8_matmul)(x, w)
  np.testing.assert_allclose(np.asarray(y), np.full((8, 4), 8.0), rtol=1e-6)


def test_quant_dense_param_tree_matches_nn_dense():
  from flax import linen as nn
  x = jnp.ones((4, 12))
  qd = quant.QuantDense(features=6, name='Dense_0')
  d = nn.Dense(features=6, name='Dense_0')
  vq = qd.init(jax.random.PRNGKey(0), x)
  vd = d.init(jax.random.PRNGKey(0), x)
  flat_q = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vq)
  flat_d = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vd)
  assert flat_q == flat_d
  # Same init stream -> identical initial params.
  np.testing.assert_array_equal(
      np.asarray(vq['params']['kernel']), np.asarray(vd['params']['kernel']))


@pytest.mark.parametrize('width', [64])
def test_mlp_int8_trunk_forward_and_grad(width):
  """MLP with trunk_dtype='int8': finite outputs, grads flow, and the
  density field tracks the f32 trunk within quantization noise."""
  from multinerf_tpu.models import mlp as mlp_lib

  def build(dtype):
    return mlp_lib.MLP(
        net_depth=2, net_width=width, bottleneck_width=16,
        net_width_viewdirs=16, deg_view=2, disable_density_normals=True,
        trunk_dtype=dtype, use_fused_featurize=False)

  rng = jax.random.PRNGKey(3)
  means = jax.random.normal(rng, (32, 4, 3))
  covs = jnp.broadcast_to(0.01 * jnp.eye(3), (32, 4, 3, 3))
  viewdirs = jnp.broadcast_to(jnp.array([0., 0., 1.]), (32, 3))

  m8 = build('int8')
  m32 = build('float32')
  variables = m32.init(rng, None, (means, covs), viewdirs=viewdirs)
  out8 = m8.apply(variables, None, (means, covs), viewdirs=viewdirs)
  out32 = m32.apply(variables, None, (means, covs), viewdirs=viewdirs)
  assert np.all(np.isfinite(np.asarray(out8['density'])))
  d8, d32 = np.asarray(out8['density']), np.asarray(out32['density'])
  # Same params, same featurization; only the two hidden matmuls (and the
  # tiny view branch) are quantized.
  assert np.corrcoef(d8.ravel(), d32.ravel())[0, 1] > 0.99

  def loss(v):
    out = m8.apply(v, None, (means, covs), viewdirs=viewdirs)
    return jnp.mean(out['density']) + jnp.mean(out['rgb'])

  grads = jax.grad(loss)(variables)
  leaves = jax.tree_util.tree_leaves(grads)
  assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
  # Hidden-layer kernels receive nonzero gradient through the int8 path.
  gsum = sum(float(jnp.abs(g).sum()) for g in leaves)
  assert gsum > 0


def test_int8_matmul_hybrid_forward_identical_grads_tighter():
  """Hybrid: forward bit-identical to int8_matmul; backward unquantized
  bf16 — gradient error vs f32 must be well inside the int8 band."""
  rng = np.random.RandomState(3)
  x = jnp.asarray(rng.randn(64, 48).astype(np.float32))
  w = jnp.asarray(rng.randn(48, 32).astype(np.float32) / 7.0)
  co = jnp.asarray(rng.randn(64, 32).astype(np.float32))

  np.testing.assert_array_equal(
      np.asarray(quant.int8_matmul_hybrid(x, w)),
      np.asarray(quant.int8_matmul(x, w)))

  gx_h, gw_h = jax.grad(
      lambda x, w: jnp.sum(quant.int8_matmul_hybrid(x, w) * co),
      argnums=(0, 1))(x, w)
  gx_f, gw_f = jax.grad(
      lambda x, w: jnp.sum((x @ w) * co), argnums=(0, 1))(x, w)
  # dW is the exact bf16 x^T g (no quantization at all) -> ~bf16 rounding.
  rel_w = (np.linalg.norm(np.asarray(gw_h) - np.asarray(gw_f)) /
           np.linalg.norm(np.asarray(gw_f)))
  assert rel_w < 0.01, rel_w
  # dx flows through the DEQUANTIZED weights (exact linearization of the
  # quantized forward): bounded by the weight quantization step.
  rel_x = (np.linalg.norm(np.asarray(gx_h) - np.asarray(gx_f)) /
           np.linalg.norm(np.asarray(gx_f)))
  assert rel_x < 0.015, rel_x


def test_quant_dense_hybrid_param_tree_and_forward():
  rng = jax.random.PRNGKey(0)
  x = jax.random.normal(rng, (32, 24))
  m8 = quant.QuantDense(features=16)
  mh = quant.QuantDense(features=16, hybrid=True)
  v8 = m8.init(rng, x)
  vh = mh.init(rng, x)
  assert (jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v8) ==
          jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vh))
  np.testing.assert_array_equal(np.asarray(m8.apply(v8, x)),
                                np.asarray(mh.apply(v8, x)))
