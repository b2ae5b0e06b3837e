"""Fused (contract -> lift -> IPE) -> first-Dense-matmul Pallas kernel.

The IPE feature tensor is the widest intermediate of the whole model
(``[rays*samples, 2*L*D]`` — 0.5 GB per proposal level at the flagship
batch) and XLA materializes it in HBM twice over: once as a deg-major
concatenate of narrow per-degree blocks (sublane-unaligned writes, ~2.4 ms
each on v5e) and once more when the trunk's first matmul and the skip
connection read it back.  The features are also *pure recomputable
function* of the 12 floats (mean, cov) per sample.

This kernel therefore never writes them: per tile of samples it computes
the contraction warp, the basis lift, and the recurrence-form IPE (see
``coord._integrated_pos_enc_lifted_recurrence``) entirely in VMEM — in a
TRANSPOSED [features, tile] layout so the 21-wide per-degree blocks fill
the lanes — and immediately contracts them with the consuming Dense kernel
on the MXU, emitting only the [tile, width] pre-activation output.  The
trunk's skip connection reuses the same kernel on its own slice of the
skip layer's weights (``concat([x, feats]) @ W == x @ W_x + feats @ W_f``),
so the features never exist in HBM at any point of the forward or backward
pass.

Gradient policy: a custom VJP carries gradients to (kernel, bias) only —
dW recomputes the features tile-by-tile in a second Pallas kernel and
accumulates ``feats @ dy`` across the grid; db is one XLA reduction.  The
inputs are stop-gradient (every ``disable_density_normals`` config; same
policy and reasoning as the reference's stop_gradient on sampled positions,
google-research/multinerf internal/models.py:200-201).  Ref-NeRF
(density-gradient normals differentiate featurization w.r.t. means) keeps
the jnp path.

Numerics: features are cast to bf16 before the MXU dot, exactly what XLA's
DEFAULT one-pass matmul precision does to its inputs, so outputs match the
unfused path to bf16 rounding.  Equivalence tests:
tests/test_pallas_featurize_dense.py (interpreted on CPU).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32_EPS = float(jnp.finfo(jnp.float32).eps)
_TRIG_PERIOD = 100.0 * np.pi
_ANCHOR_EVERY = 4  # Degrees between exact sin/cos/exp re-anchoring.


def _safe_sin(x):
  return jnp.sin(jnp.where(jnp.abs(x) < _TRIG_PERIOD, x, x % _TRIG_PERIOD))


def _safe_cos(x):
  return jnp.cos(jnp.where(jnp.abs(x) < _TRIG_PERIOD, x, x % _TRIG_PERIOD))


def _tile_features_t(m_t, c9_t, basis_t, bb_t, min_deg, max_deg,
                     use_contract):
  """Features for one tile, transposed: [2*D*L, T] bf16.

  Args:
    m_t:  [3, T] sample means (world space), rows = coordinates.
    c9_t: [9, T] row-major covariances.
    basis_t: [L, 3] basis (transposed, includes 2^min_deg scaling).
    bb_t: [L, 9] vec(b_l b_l^T) rows (includes 4^min_deg scaling).
  """
  rows_m = [m_t[i:i + 1, :] for i in range(3)]
  rows_c = [c9_t[i:i + 1, :] for i in range(9)]

  if use_contract:
    # Analytic contract() Gaussian warp (ops.coord.contract_gaussian):
    # outside the unit ball f(x) = g x, J = g I + k x x^T, cov' = J cov J^T.
    r_sq = jnp.maximum(_F32_EPS, sum(r * r for r in rows_m))
    r = jnp.sqrt(r_sq)
    g = (2 * r - 1) / r_sq
    k = (2 - 2 * r) / (r_sq * r_sq)
    inside = r_sq <= 1.0
    mvec = [sum(rows_c[3 * i + j] * rows_m[j] for j in range(3))
            for i in range(3)]
    xcx = sum(rows_m[i] * mvec[i] for i in range(3))
    new_c = []
    for i in range(3):
      for j in range(3):
        cij = (g * g * rows_c[3 * i + j] +
               g * k * (rows_m[i] * mvec[j] + mvec[i] * rows_m[j]) +
               k * k * xcx * rows_m[i] * rows_m[j])
        new_c.append(jnp.where(inside, rows_c[3 * i + j], cij))
    rows_c = new_c
    rows_m = [jnp.where(inside, rows_m[i], g * rows_m[i]) for i in range(3)]

  # Lift, transposed: args0 [L, T] = B_t @ m, var0 [L, T] = BB_t @ vec(cov).
  args0 = sum(basis_t[:, i:i + 1] * rows_m[i] for i in range(3))
  var0 = sum(bb_t[:, i:i + 1] * rows_c[i] for i in range(9))

  num_degs = max_deg - min_deg
  sins, coss = [], []
  s = c = e = None
  for d in range(num_degs):
    if d % _ANCHOR_EVERY == 0:
      freq = float(2.0 ** d)
      a = args0 if d == 0 else freq * args0
      s, c = _safe_sin(a), _safe_cos(a)
      e = jnp.exp((-0.5 * freq * freq) * var0)
    else:
      s, c = 2.0 * (s * c), 1.0 - 2.0 * (s * s)
      e2 = e * e
      e = e2 * e2
    sins.append(e * s)
    coss.append(e * c)
  return jnp.concatenate(sins + coss, axis=0).astype(jnp.bfloat16)


def _fwd_kernel(m_ref, c9_ref, bt_ref, bbt_ref, w_ref, b_ref, out_ref, *,
                min_deg, max_deg, use_contract):
  feats = _tile_features_t(m_ref[:], c9_ref[:], bt_ref[:], bbt_ref[:],
                           min_deg, max_deg, use_contract)
  acc = jax.lax.dot_general(
      feats, w_ref[:], (((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)  # [T, W]
  out_ref[:] = acc + b_ref[:]


def _dw_kernel(m_ref, c9_ref, bt_ref, bbt_ref, g_ref, dw_ref, *,
               min_deg, max_deg, use_contract):
  @pl.when(pl.program_id(0) == 0)
  def _init():
    dw_ref[:] = jnp.zeros_like(dw_ref)

  feats = _tile_features_t(m_ref[:], c9_ref[:], bt_ref[:], bbt_ref[:],
                           min_deg, max_deg, use_contract)
  dw_ref[:] += jax.lax.dot_general(
      feats, g_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)  # [F, W]


def _pick_tile(n: int, prefer: int = 1024) -> int:
  # The in-context sweep on v5e (scripts/tile_sweep.py) measured 1024 as
  # the best sample tile for this kernel family and the fused density MLP
  # (+2.6% uncull / +2.2% culled whole-step vs 512; 2048 exceeds VMEM).
  # The int8 trunk keeps prefer=512 (heavier per-tile footprint, unswept).
  # MULTINERF_PALLAS_TILE overrides for experiments.
  pref = int(os.environ.get('MULTINERF_PALLAS_TILE', '0') or 0) or prefer
  choices = (pref, 512, 256, 128)
  for tile in choices:
    if n % tile == 0:
      return tile
  return 0  # Caller pads.


@functools.lru_cache(maxsize=32)
def _make_fn(basis_bytes, basis_shape, min_deg, max_deg, use_contract,
             interpret):
  """Build the custom-VJP fused op for one (basis, band, warp) combo."""
  basis = np.frombuffer(basis_bytes, dtype=np.float32).reshape(basis_shape)
  num_dims = basis.shape[-1]
  num_degs = max_deg - min_deg
  num_feats = 2 * num_degs * num_dims
  base = 2.0 ** min_deg
  # Keep the cached constants NUMPY: this closure outlives any single jit
  # trace (lru_cache), and a jnp array materialized during tracing is a
  # constant-folded tracer whose reuse in a later trace raises
  # UnexpectedTracerError.  Each pallas_call converts them per-trace.
  basis_t = np.asarray(base * basis.T, np.float32)  # [L, 3]
  bb_t = np.asarray(
      (base * base) *
      np.einsum('ik,jk->kij', basis, basis).reshape(num_dims, 9), np.float32)

  def _prep(means, covs):
    n = means.shape[0]
    tile = _pick_tile(n)
    if tile == 0:
      pad = (-n) % 256
      means = jnp.pad(means, ((0, pad), (0, 0)))
      covs = jnp.pad(covs, ((0, pad), (0, 0)))
      tile = _pick_tile(n + pad)
    return means.T, covs.T, tile  # [3, n_pad], [9, n_pad]

  def _forward(means, covs, w_bf, bias):
    n = means.shape[0]
    width = w_bf.shape[-1]
    m_t, c9_t, tile = _prep(means, covs)
    n_pad = m_t.shape[-1]
    kern = functools.partial(_fwd_kernel, min_deg=min_deg, max_deg=max_deg,
                             use_contract=use_contract)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_pad, width), jnp.float32),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_dims, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_dims, 9), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_feats, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(m_t, c9_t, basis_t, bb_t, w_bf, bias[None, :])
    return out[:n]

  def _grad_w(means, covs, g):
    width = g.shape[-1]
    m_t, c9_t, tile = _prep(means, covs)
    n_pad = m_t.shape[-1]
    g_bf = jnp.pad(g, ((0, n_pad - g.shape[0]), (0, 0))).astype(jnp.bfloat16)
    kern = functools.partial(_dw_kernel, min_deg=min_deg, max_deg=max_deg,
                             use_contract=use_contract)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((num_feats, width), jnp.float32),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_dims, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_dims, 9), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_feats, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(m_t, c9_t, basis_t, bb_t, g_bf)

  @jax.custom_vjp
  def fused(means, covs, kernel, bias):
    return _forward(means, covs, kernel.astype(jnp.bfloat16), bias)

  def fused_fwd(means, covs, kernel, bias):
    out = _forward(means, covs, kernel.astype(jnp.bfloat16), bias)
    return out, (means, covs)

  def fused_bwd(res, g):
    means, covs = res
    dw = _grad_w(means, covs, g)
    db = g.sum(axis=0)
    # Inputs are stop-gradient by contract (disable_density_normals).
    return (jnp.zeros_like(means), jnp.zeros_like(covs), dw, db)

  fused.defvjp(fused_fwd, fused_bwd)
  return fused


def featurize_dense(means, covs, kernel, bias, basis, min_deg=0, max_deg=12,
                    use_contract=True, interpret=False):
  """Fused featurize + Dense: [..., 3],[...,3,3] -> [..., width].

  Equivalent (to bf16 matmul rounding) to::

      m, c = track_linearize(contract, means, covs)   # if use_contract
      feats = integrated_pos_enc_lifted(m, c, basis, min_deg, max_deg)
      out = feats @ kernel + bias

  Gradients flow to (kernel, bias) only; means/covs receive zeros (callers
  must be under stop_gradient semantics — see module docstring).
  """
  basis = np.asarray(basis, np.float32)
  fn = _make_fn(basis.tobytes(), basis.shape, int(min_deg), int(max_deg),
                bool(use_contract), bool(interpret))
  batch_shape = means.shape[:-1]
  out = fn(jax.lax.stop_gradient(means.reshape(-1, 3)),
           jax.lax.stop_gradient(covs.reshape(-1, 9)), kernel, bias)
  return out.reshape(batch_shape + (kernel.shape[-1],))


def featurize_dense_reference(means, covs, kernel, bias, basis, min_deg=0,
                              max_deg=12, use_contract=True):
  """jnp twin (recurrence features + bf16 dot), for equivalence tests."""
  from multinerf_tpu.ops import coord
  if use_contract:
    means, covs = coord.contract_gaussian(means, covs)
  feats = coord._integrated_pos_enc_lifted_recurrence(
      means, covs, basis, min_deg, max_deg).astype(jnp.bfloat16)
  out = jax.lax.dot_general(
      feats, kernel.astype(jnp.bfloat16),
      (((feats.ndim - 1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  return out + bias
