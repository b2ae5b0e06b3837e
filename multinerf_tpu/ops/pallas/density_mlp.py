"""Fully-fused density MLP: (contract -> lift -> IPE) -> trunk -> density.

The flat-GEMM PropMLP layers are HBM-bandwidth-bound, not compute-bound:
each [n, 256] activation costs ~0.54 GB of f32 read+write traffic per
layer while carrying only ~34 GFLOP (measured 0.82 ms/layer on v5e — the
bandwidth floor — versus a 0.18 ms MXU floor).  A density-only MLP
(``disable_rgb`` proposal levels: the reference evaluates the same
trunk shape at internal/models.py:441-460 with the rgb branch off) has a
12-float input and a 1-float output per sample, so the whole network fits
the bandwidth budget of its INPUT if nothing else touches HBM.

This kernel runs featurization (recurrence IPE, transposed [C, T] layout —
see featurize_dense.py) plus the entire trunk and the density head in VMEM
per sample tile: HBM traffic is means+covs in, raw density out.  Weights
(~0.65 MB bf16 at 4x256) stay resident.  The custom VJP recomputes the
forward per tile and accumulates every layer's (dW, db) across the grid —
the same stop-gradient-inputs contract as featurize_dense.py (gradients
w.r.t. sample positions are cut; valid in every disable_density_normals
config).

Numerics: matmuls take bf16 inputs with f32 accumulation, exactly XLA's
DEFAULT one-pass precision on the unfused path.  Equivalence tests:
tests/test_pallas_density_mlp.py (interpreted on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multinerf_tpu.ops.pallas.featurize_dense import (_pick_tile,
                                                      _tile_features_t)


def _trunk_forward(feats, ws, bs):
  """[C0, T] features -> list of [W, T] activations (bf16-in matmuls)."""
  acts = []
  x = feats  # bf16 [C0, T]
  for w, b in zip(ws, bs):
    pre = jax.lax.dot_general(
        w, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [W, T]
    x = jnp.maximum(pre + b, 0.0)
    acts.append(x)
    x = x.astype(jnp.bfloat16)
  return acts


def _density_row(act, wd, bd):
  """[W, T] trunk output -> [1, T] raw density (reduction, no matmul).

  Inputs round to bf16 first so the result matches the unfused path's
  bf16-in head matmul.
  """
  a = act.astype(jnp.bfloat16).astype(jnp.float32)
  w = wd.astype(jnp.bfloat16).astype(jnp.float32)
  return jnp.sum(a * w, axis=0, keepdims=True) + bd


def _fwd_kernel(m_ref, c9_ref, bt_ref, bbt_ref, *refs, num_layers, min_deg,
                max_deg, use_contract):
  w_refs = refs[:num_layers]
  b_refs = refs[num_layers:2 * num_layers]
  wd_ref, bd_ref, out_ref = refs[2 * num_layers:]
  feats = _tile_features_t(m_ref[:], c9_ref[:], bt_ref[:], bbt_ref[:],
                           min_deg, max_deg, use_contract)
  acts = _trunk_forward(feats, [w[:] for w in w_refs],
                        [b[:] for b in b_refs])
  out_ref[:] = _density_row(acts[-1], wd_ref[:], bd_ref[0, 0])


def _bwd_kernel(m_ref, c9_ref, bt_ref, bbt_ref, *refs, num_layers, min_deg,
                max_deg, use_contract):
  w_refs = refs[:num_layers]
  b_refs = refs[num_layers:2 * num_layers]
  wd_ref, g_ref = refs[2 * num_layers:2 * num_layers + 2]
  out_refs = refs[2 * num_layers + 2:]  # dW x L, db x L, dwd, dbd

  @pl.when(pl.program_id(0) == 0)
  def _init():
    for r in out_refs:
      r[:] = jnp.zeros_like(r)

  feats = _tile_features_t(m_ref[:], c9_ref[:], bt_ref[:], bbt_ref[:],
                           min_deg, max_deg, use_contract)
  acts = _trunk_forward(feats, [w[:] for w in w_refs],
                        [b[:] for b in b_refs])

  g = g_ref[:]  # [1, T] cotangent of raw density.
  dwd_ref, dbd_ref = out_refs[2 * num_layers:]
  dwd_ref[:] += jnp.sum(acts[-1] * g, axis=-1, keepdims=True)  # [W, 1]
  dbd_ref[:] += jnp.sum(g, axis=-1, keepdims=True)  # [1, 1]

  # Backprop through the trunk; dA in f32 [W, T].
  da = wd_ref[:] * g * (acts[-1] > 0)
  for l in range(num_layers - 1, -1, -1):
    x_in = feats if l == 0 else acts[l - 1].astype(jnp.bfloat16)
    # dW_l [C_in, W] += x_in @ da^T ; db_l [1, W] += sum_T da.
    out_refs[l][:] += jax.lax.dot_general(
        x_in, da.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_refs[num_layers + l][:] += jnp.sum(da, axis=-1)[None, :]
    if l > 0:
      # da_{l-1} = (W_l @ da) * relu'(act_{l-1}).
      da = jax.lax.dot_general(
          w_refs[l][:], da.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32) * (acts[l - 1] > 0)


@functools.lru_cache(maxsize=16)
def _make_fn(basis_bytes, basis_shape, min_deg, max_deg, use_contract,
             num_layers, width, interpret):
  """Build the custom-VJP fused density MLP for one static config."""
  basis = np.frombuffer(basis_bytes, dtype=np.float32).reshape(basis_shape)
  num_dims = basis.shape[-1]
  num_feats = 2 * (max_deg - min_deg) * num_dims
  base = 2.0 ** min_deg
  # NUMPY constants: this closure outlives traces (see featurize_dense).
  basis_t = np.asarray(base * basis.T, np.float32)
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
    return means.T, covs.T, tile

  def _const_specs(tile):
    return [
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((num_dims, 3), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((num_dims, 9), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]

  def _weight_specs():
    specs = []
    for l in range(num_layers):
      c_in = num_feats if l == 0 else width
      specs.append(pl.BlockSpec((c_in, width), lambda i: (0, 0),
                                memory_space=pltpu.VMEM))
    for _ in range(num_layers):
      # Biases ride transposed like everything else: [W, 1] broadcasts
      # over the tile dim of the [W, T] pre-activations.
      specs.append(pl.BlockSpec((width, 1), lambda i: (0, 0),
                                memory_space=pltpu.VMEM))
    return specs

  def _forward(means, covs, ws_bf, bs, wd, bd):
    n = means.shape[0]
    m_t, c9_t, tile = _prep(means, covs)
    n_pad = m_t.shape[-1]
    kern = functools.partial(_fwd_kernel, num_layers=num_layers,
                             min_deg=min_deg, max_deg=max_deg,
                             use_contract=use_contract)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        grid=(n_pad // tile,),
        in_specs=_const_specs(tile) + _weight_specs() + [
            pl.BlockSpec((width, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(m_t, c9_t, basis_t, bb_t, *ws_bf, *[b[:, None] for b in bs],
      wd, bd.reshape(1, 1))
    return out[0, :n]

  def _grad(means, covs, ws_bf, bs, wd, g):
    m_t, c9_t, tile = _prep(means, covs)
    n_pad = m_t.shape[-1]
    g_pad = jnp.pad(g, (0, n_pad - g.shape[0]))[None, :]
    kern = functools.partial(_bwd_kernel, num_layers=num_layers,
                             min_deg=min_deg, max_deg=max_deg,
                             use_contract=use_contract)
    out_shapes, out_specs = [], []
    for l in range(num_layers):
      c_in = num_feats if l == 0 else width
      out_shapes.append(jax.ShapeDtypeStruct((c_in, width), jnp.float32))
      out_specs.append(pl.BlockSpec((c_in, width), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM))
    for _ in range(num_layers):
      out_shapes.append(jax.ShapeDtypeStruct((1, width), jnp.float32))
      out_specs.append(pl.BlockSpec((1, width), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM))
    out_shapes += [jax.ShapeDtypeStruct((width, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    out_specs += [pl.BlockSpec((width, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
    # The backward re-runs the forward per tile; biases are passed so the
    # recomputed activations (and relu masks) match the forward exactly.
    outs = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid=(n_pad // tile,),
        in_specs=_const_specs(tile) + _weight_specs() + [
            pl.BlockSpec((width, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(m_t, c9_t, basis_t, bb_t, *ws_bf, *[b[:, None] for b in bs], wd,
      g_pad)
    dws = outs[:num_layers]
    dbs = [o[0] for o in outs[num_layers:2 * num_layers]]
    dwd = outs[2 * num_layers]
    dbd = outs[2 * num_layers + 1].reshape(())
    return dws, dbs, dwd, dbd

  @jax.custom_vjp
  def fused(means, covs, ws, bs, wd, bd):
    return _forward(means, covs, tuple(w.astype(jnp.bfloat16) for w in ws),
                    bs, wd, bd)

  def fused_fwd(means, covs, ws, bs, wd, bd):
    out = _forward(means, covs, tuple(w.astype(jnp.bfloat16) for w in ws),
                   bs, wd, bd)
    return out, (means, covs, ws, bs, wd)

  def fused_bwd(res, g):
    means, covs, ws, bs, wd = res
    dws, dbs, dwd, dbd = _grad(
        means, covs, tuple(w.astype(jnp.bfloat16) for w in ws), bs, wd, g)
    return (jnp.zeros_like(means), jnp.zeros_like(covs), tuple(dws),
            tuple(dbs), dwd, dbd)

  fused.defvjp(fused_fwd, fused_bwd)
  return fused


def density_mlp(means, covs, ws, bs, wd, bd, basis, min_deg=0, max_deg=12,
                use_contract=True, interpret=False):
  """Fused featurize + trunk + density head.

  Equivalent (to bf16 matmul rounding) to::

      m, c = track_linearize(contract, means, covs)       # if use_contract
      x = integrated_pos_enc_lifted(m, c, basis, min_deg, max_deg)
      for w, b in zip(ws, bs): x = relu(x @ w + b)
      raw_density = (x @ wd + bd)[..., 0]

  Args:
    means: [..., 3]; covs: [..., 3, 3] (stop-gradient semantics).
    ws/bs: trunk kernels [C_in, W] / biases [W] (uniform width W).
    wd/bd: density head [W, 1] kernel and scalar bias.

  Gradients flow to every weight/bias; means/covs receive zeros.
  """
  basis = np.asarray(basis, np.float32)
  fn = _make_fn(basis.tobytes(), basis.shape, int(min_deg), int(max_deg),
                bool(use_contract), len(ws), ws[-1].shape[-1],
                bool(interpret))
  batch_shape = means.shape[:-1]
  out = fn(jax.lax.stop_gradient(means.reshape(-1, 3)),
           jax.lax.stop_gradient(covs.reshape(-1, 9)),
           tuple(ws), tuple(bs), wd, bd)
  return out.reshape(batch_shape)


def density_mlp_reference(means, covs, ws, bs, wd, bd, basis, min_deg=0,
                          max_deg=12, use_contract=True):
  """jnp twin (recurrence features + bf16 dots), for equivalence tests."""
  from multinerf_tpu.ops import coord
  if use_contract:
    means, covs = coord.contract_gaussian(means, covs)
  x = coord._integrated_pos_enc_lifted_recurrence(
      means, covs, basis, min_deg, max_deg).astype(jnp.bfloat16)
  for w, b in zip(ws, bs):
    pre = jax.lax.dot_general(
        x, w.astype(jnp.bfloat16), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b
    x = jnp.maximum(pre, 0.0).astype(jnp.bfloat16)
  return (jax.lax.dot_general(
      x, wd.astype(jnp.bfloat16), (((x.ndim - 1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32) + bd)[..., 0]
