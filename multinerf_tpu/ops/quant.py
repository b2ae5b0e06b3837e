"""Int8 quantized matmul for the wide MLP trunk.

The flagship NerfMLP trunk is compute-bound at the bf16 MXU roofline
(docs/DESIGN.md round-3 profile): at batch 4096 x 32 samples the 8x1024
trunk's matmuls are ~2/3 of the whole train step, and neither fusion nor
layout can shrink work that is already MXU-saturated.  The one remaining
hardware lever on v5e is the int8 MXU path, which runs at 2x the bf16 MACs
(394 vs 197 TOPS peak).

This module implements **dynamically quantized int8 matmuls** with
per-row / per-channel symmetric scales:

* forward:  y = (q8(x) @ q8(w)) * sx * sw, accumulated in int32 on the MXU;
* backward: both gradient matmuls (dx = g @ w^T, dw = x^T @ g) run int8 the
  same way, re-quantizing each operand along its contraction axis.

Scale choices follow the standard absmax recipe: each operand is scaled
per-slice *along the contraction axis* (rows of x, columns of w), so the
int32 accumulator of any output element sees a single (sx * sw) factor and
dequantization is a rank-1 outer product — no per-element rescale work
inside the MXU loop.

Rounding is round-to-nearest (ties-to-even via jnp.round).  Straight-
through estimation: the backward pass differentiates y = x @ w as if the
forward were exact, which is the usual quantization-aware-training
contract; rounding noise enters only through the quantized values
themselves.

There is no reference counterpart (google-research/multinerf computes
everything in f32 under pmap); this subsystem exists for the TPU rebuild's
performance contract.  It is opt-in via ``MLP.trunk_dtype = 'int8'`` and
carries its own quality-guardrail evidence (scripts/cull_quality_experiment
--trunk_dtype int8) like every other hot-path rewrite in the tree.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# One absmax floor for every scale: keeps all-zero slices (dead channels,
# zero-padded rows) from dividing by zero while mapping them to q = 0.
_SCALE_FLOOR = 1e-30


def absmax_quantize(v, axis):
  """Symmetric int8 quantization along ``axis``.

  Args:
    v: float array.
    axis: axis (or axes tuple) reduced to ONE scale per remaining slice;
      must be the contraction axis of the matmul the result feeds.

  Returns:
    (q, scale): int8 values and the f32 scale, keepdims-shaped so that
    ``q.astype(f32) * scale`` reconstructs v up to rounding.
  """
  v = v.astype(jnp.float32)
  scale = jnp.maximum(
      jnp.max(jnp.abs(v), axis=axis, keepdims=True), _SCALE_FLOOR) / 127.0
  q = jnp.round(v / scale).astype(jnp.int8)
  return q, scale


def _int8_dot(aq, bq):
  """int8 x int8 -> int32 matmul ([N, K] @ [K, M]); hits the 2x MXU path."""
  return jax.lax.dot_general(
      aq, bq, (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.int32)


@jax.custom_vjp
def int8_matmul(x, w):
  """y = x @ w with both operands dynamically quantized to int8.

  x: [N, K] activations (any float dtype), quantized per-row.
  w: [K, M] weights (f32 master copy), quantized per-output-channel.
  Returns f32 [N, M].
  """
  xq, sx = absmax_quantize(x, axis=-1)       # [N, K], [N, 1]
  wq, sw = absmax_quantize(w, axis=0)        # [K, M], [1, M]
  return _int8_dot(xq, wq).astype(jnp.float32) * (sx * sw)


def _int8_matmul_fwd(x, w):
  return int8_matmul(x, w), (x, w)


def _int8_matmul_bwd(res, g):
  x, w = res
  g = g.astype(jnp.float32)
  # dx[n, k] = sum_m g[n, m] w[k, m]: contract over m -> quantize g per-row
  # and w per-row (axis=1).
  gq_m, sg_m = absmax_quantize(g, axis=-1)   # [N, M], [N, 1]
  wq_m, sw_m = absmax_quantize(w, axis=1)    # [K, M], [K, 1]
  dx = _int8_dot(gq_m, wq_m.T).astype(jnp.float32) * (sg_m * sw_m.T)
  # dw[k, m] = sum_n x[n, k] g[n, m]: contract over n -> quantize both
  # per-column (axis=0).
  xq_n, sx_n = absmax_quantize(x, axis=0)    # [N, K], [1, K]
  gq_n, sg_n = absmax_quantize(g, axis=0)    # [N, M], [1, M]
  dw = _int8_dot(xq_n.T, gq_n).astype(jnp.float32) * (sx_n.T * sg_n)
  return dx.astype(x.dtype), dw


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


@jax.custom_vjp
def int8_matmul_hybrid(x, w):
  """int8 forward (identical values to int8_matmul), bf16 backward.

  The backward runs both gradient matmuls UNQUANTIZED in bf16, with dx
  propagated through the forward's own dequantized weights (q8(w) * sw) —
  the exact linearization of the quantized forward, with no gradient
  quantization noise (VERDICT r4 #1b hybrid probe).
  """
  return int8_matmul(x, w)


def _int8_matmul_hybrid_fwd(x, w):
  wq, sw = absmax_quantize(w, axis=0)
  xq, sx = absmax_quantize(x, axis=-1)
  y = _int8_dot(xq, wq).astype(jnp.float32) * (sx * sw)
  return y, (x, wq.astype(jnp.float32) * sw)


def _int8_matmul_hybrid_bwd(res, g):
  x, w_deq = res
  g16 = g.astype(jnp.bfloat16)
  dx = jax.lax.dot_general(
      g16, w_deq.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
  dw = jax.lax.dot_general(
      x.astype(jnp.bfloat16), g16, (((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  return dx.astype(x.dtype), dw


int8_matmul_hybrid.defvjp(_int8_matmul_hybrid_fwd, _int8_matmul_hybrid_bwd)


class QuantDense(nn.Module):
  """Drop-in ``nn.Dense`` with an int8-quantized matmul.

  The param tree ({kernel [in, out] f32, bias [out] f32}) is byte-identical
  to ``nn.Dense`` under the same name, so checkpoints written with any
  trunk_dtype restore into any other — the quantization is computation
  state, not model state.

  Output is cast to ``out_dtype`` (default bf16, matching the bf16 trunk's
  activation-storage savings); the dequantization scales themselves are
  always applied in f32.
  """
  features: int
  kernel_init: Any = nn.initializers.lecun_normal()
  out_dtype: Any = jnp.bfloat16
  hybrid: bool = False  # int8 forward, unquantized bf16 backward.

  @nn.compact
  def __call__(self, x):
    kernel = self.param('kernel', self.kernel_init,
                        (x.shape[-1], self.features))
    bias = self.param('bias', nn.initializers.zeros, (self.features,))
    lead = x.shape[:-1]
    matmul = int8_matmul_hybrid if self.hybrid else int8_matmul
    y = matmul(x.reshape(-1, x.shape[-1]), kernel)
    y = (y + bias).astype(self.out_dtype)
    return y.reshape(lead + (self.features,))
