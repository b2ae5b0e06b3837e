"""Fused int8 NerfMLP trunk: featurize -> L trunk layers -> final activation.

Why this kernel exists: the flagship 8x1024 trunk is compute-bound at the
bf16 MXU roofline, and v5e's int8 MXU path runs 2x the bf16 MACs.  The
XLA-level int8 layer (ops/quant.py QuantDense) measured SLOWER in-context
than bf16 (71.5k vs 74.3k rays/s on the 360 step): each layer's dynamic
quantization (absmax reduce + round/cast) and int32->f32 dequant epilogue
are extra full-size HBM passes that eat the MXU gain.  Fused per sample
tile in VMEM those passes are register traffic: HBM sees only means/covs
in and the final [N, W] activation out, and the hidden-layer dots run
int8.

Quantization scheme (ops/quant.py's contract, finer-grained):

* weights: quantized ONCE per step outside the kernel (XLA, ~10 MB) —
  symmetric per-OUTPUT-channel (scales over the contraction axis) for the
  forward, plus a second per-INPUT-channel copy for the backward's dx
  matmul, exactly like quant._int8_matmul_bwd's (wq, sw)/(wq_m, sw_m).
* activations: per-sample absmax scales computed in VMEM per tile (the
  transposed [W, T] layout makes that a per-column scale).
* backward: both gradient matmuls run int8 with per-tile scales — dW
  contracts over the tile's T samples with per-row scales on both
  operands; dx contracts over output channels with per-in weight scales
  and per-column gradient scales.  Per-tile quantization is strictly
  finer-grained than the XLA path's whole-batch scales.
* hybrid mode (``bwd_bf16=True``, MLP.trunk_dtype='int8_hybrid'): the
  forward stays int8 but the backward's dW/dx dots run bf16 with NO
  gradient quantization — dx flows through the forward's own dequantized
  weights (w_q * sw), so it is the exact linearization of the quantized
  forward.  This also drops the second per-input-channel weight copy from
  the backward's DMA set.  Probes whether the int8 training wash
  (docs/DESIGN.md round 3) was the backward's quantization overhead/noise
  rather than the int8 MACs themselves (VERDICT r4 #1b).
* dots accumulate int32 on the MXU; dequantization is a rank-1 scale
  multiply fused into the relu epilogue in registers.

Layer structure mirrors models/mlp.py's fused-featurize path exactly
(reference MLP: google-research/multinerf internal/models.py:401-424):
layer 0 is featurize->dense in bf16 (features exist only in VMEM, as in
featurize_dense.py), skip-point layers re-featurize and add a bf16
feats-projection, every other hidden layer runs int8.  The density /
bottleneck / rgb heads stay OUTSIDE in f32 XLA.

Gradient contract: same stop-gradient semantics as the other fused
kernels — means/covs receive zero cotangents (requires
disable_density_normals and inputs_have_stop_gradient); the backward
recomputes the forward per tile, so activations never hit HBM.

Equivalence: tests/test_pallas_int8_trunk.py (interpret mode on CPU)
against the jnp twin `int8_trunk_reference`.
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

_SCALE_FLOOR = 1e-30


def _qcols(x):
  """Quantize [R, T] per COLUMN (scale over rows) -> (int8, [1, T] f32)."""
  s = jnp.maximum(jnp.max(jnp.abs(x), axis=0, keepdims=True),
                  _SCALE_FLOOR) / 127.0
  return jnp.round(x / s).astype(jnp.int8), s


def _qrows(x):
  """Quantize [R, T] per ROW (scale over columns) -> (int8, [R, 1] f32)."""
  s = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True),
                  _SCALE_FLOOR) / 127.0
  return jnp.round(x / s).astype(jnp.int8), s


def _dot_i8(a, b, dims):
  return jax.lax.dot_general(a, b, (dims, ((), ())),
                             preferred_element_type=jnp.int32)


def _dot_bf16(a, b, dims):
  return jax.lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                             (dims, ((), ())),
                             preferred_element_type=jnp.float32)


def quantize_weights(ws, width):
  """Per-step weight quantization (XLA, outside the kernel).

  Args:
    ws: trunk kernels. ws[0] [C0, W] stays bf16. Hidden ws[l] [W, W] and
      skip ws[l] [W + C0, W] (only the leading [W] x-part is quantized;
      the feats tail stays bf16).
    width: trunk width W (the x-part row count).

  Returns:
    A flat list of per-layer ref tuples:
      layer 0:   (w0_bf16,)
      hidden:    (w_q, sw [1, W], wq2, sw2 [W, 1])
      skip:      (w_q, sw, wq2, sw2, w_tail_bf16 [C0, W])
  """
  out = []
  for l, w in enumerate(ws):
    if l == 0:
      out.append((w.astype(jnp.bfloat16),))
      continue
    x_part, tail = w[:width], w[width:]
    sw = jnp.maximum(jnp.max(jnp.abs(x_part), axis=0, keepdims=True),
                     _SCALE_FLOOR) / 127.0
    w_q = jnp.round(x_part / sw).astype(jnp.int8)
    sw2 = jnp.maximum(jnp.max(jnp.abs(x_part), axis=1, keepdims=True),
                      _SCALE_FLOOR) / 127.0
    wq2 = jnp.round(x_part / sw2).astype(jnp.int8)
    if tail.shape[0]:
      out.append((w_q, sw, wq2, sw2, tail.astype(jnp.bfloat16)))
    else:
      out.append((w_q, sw, wq2, sw2))
  return out


def _tile_forward(feats, layers, bs, num_layers, skip_set):
  """One tile's trunk forward: [C0, T] feats -> list of f32 [W, T] acts.

  ``layers[l]`` tuples are (w_q, sw[, w_tail]) in the forward kernel and
  (w_q, sw, wq2, sw2[, w_tail]) in the backward (which recomputes the
  forward); the skip-layer feats projection is always the LAST element.
  """
  acts = []
  (w0,) = layers[0]
  x = jnp.maximum(_dot_bf16(w0, feats, ((0,), (0,))) + bs[0], 0.0)
  acts.append(x)
  for l in range(1, num_layers):
    w_q, sw = layers[l][0], layers[l][1]
    x_q, sx = _qcols(x)
    y = _dot_i8(w_q, x_q, ((0,), (0,))).astype(jnp.float32) * (sw.T * sx)
    if l in skip_set:
      y = y + _dot_bf16(layers[l][-1], feats, ((0,), (0,)))
    x = jnp.maximum(y + bs[l], 0.0)
    acts.append(x)
  return acts


def _unpack(refs, num_layers, arity):
  layers, idx = [], 0
  for l in range(num_layers):
    layers.append(tuple(r[:] for r in refs[idx:idx + arity[l]]))
    idx += arity[l]
  bs = [r[:] for r in refs[idx:idx + num_layers]]
  return layers, bs, refs[idx + num_layers:]


def _fwd_kernel(m_ref, c9_ref, bt_ref, bbt_ref, *refs, num_layers, min_deg,
                max_deg, use_contract, arity, skip_set):
  layers, bs, (out_ref,) = _unpack(refs, num_layers, arity)
  feats = _tile_features_t(m_ref[:], c9_ref[:], bt_ref[:], bbt_ref[:],
                           min_deg, max_deg, use_contract)
  acts = _tile_forward(feats, layers, bs, num_layers, skip_set)
  out_ref[:] = acts[-1].T.astype(jnp.bfloat16)


def _bwd_kernel(m_ref, c9_ref, bt_ref, bbt_ref, *refs, num_layers, min_deg,
                max_deg, use_contract, arity, skip_set, bwd_bf16=False):
  layers, bs, rest = _unpack(refs, num_layers, arity)
  g_ref = rest[0]
  out_refs = rest[1:]  # dW x L then db x L, grid-accumulated.

  @pl.when(pl.program_id(0) == 0)
  def _init():
    for r in out_refs:
      r[:] = jnp.zeros_like(r)

  feats = _tile_features_t(m_ref[:], c9_ref[:], bt_ref[:], bbt_ref[:],
                           min_deg, max_deg, use_contract)
  acts = _tile_forward(feats, layers, bs, num_layers, skip_set)

  da = g_ref[:].T.astype(jnp.float32)  # [W, T] cotangent of the final act.
  for l in range(num_layers - 1, -1, -1):
    da = da * (acts[l] > 0)  # post-relu cotangent -> pre-activation.
    if l == 0:
      out_refs[0][:] += _dot_bf16(feats, da.T, ((1,), (0,)))
    elif bwd_bf16:
      # Hybrid: unquantized bf16 gradient gemm (straight-through dW).
      dw = _dot_bf16(acts[l - 1], da.T, ((1,), (0,)))
      if l in skip_set:
        dw = jnp.concatenate(
            [dw, _dot_bf16(feats, da.T, ((1,), (0,)))], axis=0)
      out_refs[l][:] += dw
    else:
      x_in = acts[l - 1]
      # NN-layout int8 gemm for dW: transpose da in f32 FIRST (VPU), so
      # both int8 operands contract over adjacent dims — an NT int8 dot
      # (contract over both operands' last dims) forces a slow int8
      # transpose inside the MXU pipeline.
      xr_q, sxr = _qrows(x_in)
      da_t = da.T  # [T, W]
      dat_q, sdat = _qcols(da_t)  # Per-column == per-output-channel.
      dw = (_dot_i8(xr_q, dat_q, ((1,), (0,))).astype(jnp.float32) *
            (sxr * sdat))
      if l in skip_set:
        dw = jnp.concatenate(
            [dw, _dot_bf16(feats, da_t, ((1,), (0,)))], axis=0)
      out_refs[l][:] += dw
    out_refs[num_layers + l][:] += jnp.sum(da, axis=-1)[None, :]
    if l > 0:
      if bwd_bf16:
        # Exact dx of the quantized forward: propagate through the SAME
        # dequantized weights the forward used (w_q * sw), in bf16.
        w_q, sw = layers[l][0], layers[l][1]
        da = _dot_bf16(w_q.astype(jnp.float32) * sw, da, ((1,), (0,)))
      else:
        wq2, sw2 = layers[l][2], layers[l][3]
        dac_q, sdac = _qcols(da)
        da = (_dot_i8(wq2, dac_q, ((1,), (0,))).astype(jnp.float32) *
              (sw2 * sdac))


@functools.lru_cache(maxsize=8)
def _make_fn(basis_bytes, basis_shape, min_deg, max_deg, use_contract,
             num_layers, width, skip_layers, num_feats_expected, interpret,
             bwd_bf16=False):
  """Build the custom-VJP fused int8 trunk for one static config."""
  basis = np.frombuffer(basis_bytes, dtype=np.float32).reshape(basis_shape)
  num_dims = basis.shape[-1]
  num_feats = 2 * (max_deg - min_deg) * num_dims
  assert num_feats == num_feats_expected
  base = 2.0 ** min_deg
  # NUMPY constants: the lru_cached closure outlives traces.
  basis_t = np.asarray(base * basis.T, np.float32)
  bb_t = np.asarray(
      (base * base) *
      np.einsum('ik,jk->kij', basis, basis).reshape(num_dims, 9), np.float32)
  skip_set = frozenset(skip_layers)
  # Forward kernels take (w_q, sw[, w_tail]); the int8 backward
  # additionally DMAs the per-input-channel copies (wq2, sw2) for its dx
  # matmuls.  The hybrid backward propagates dx through the forward's own
  # (w_q, sw), so its DMA set equals the forward's.
  arity_fwd = tuple(1 if l == 0 else (3 if l in skip_set else 2)
                    for l in range(num_layers))
  if bwd_bf16:
    arity_bwd = arity_fwd
  else:
    arity_bwd = tuple(1 if l == 0 else (5 if l in skip_set else 4)
                      for l in range(num_layers))
  # The backward holds every layer's dW accumulator in VMEM (~34 MB at
  # 8x1024) — beyond Mosaic's default scoped-vmem budget, within v5e's
  # 128 MB.  Leave headroom for acts + weights + double buffering.
  compiler_params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

  def _prep(means, covs):
    n = means.shape[0]
    # prefer=512: this kernel holds the whole 8-layer trunk's weights plus
    # int8/bf16 activation copies per tile — the 1024 tile that wins for
    # the lighter bf16 kernels is unswept (and VMEM-riskier) here.
    tile = _pick_tile(n, prefer=512)
    if tile == 0:
      pad = (-n) % 256
      means = jnp.pad(means, ((0, pad), (0, 0)))
      covs = jnp.pad(covs, ((0, pad), (0, 0)))
      tile = _pick_tile(n + pad, prefer=512)
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

  def _layer_specs(for_bwd):
    whole = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    specs = []
    for l in range(num_layers):
      if l == 0:
        specs.append(whole((num_feats, width)))
        continue
      specs += [whole((width, width)), whole((1, width))]
      if for_bwd and not bwd_bf16:
        specs += [whole((width, width)), whole((width, 1))]
      if l in skip_set:
        specs.append(whole((num_feats, width)))
    specs += [whole((width, 1))] * num_layers  # Biases, [W, 1].
    return specs

  def _flatten_layers(qlayers, bs, for_bwd):
    flat = []
    for l, t in enumerate(qlayers):
      if l == 0 or (for_bwd and not bwd_bf16):
        flat.extend(t)
      else:
        flat.extend((t[0], t[1]) + ((t[4],) if l in skip_set else ()))
    flat.extend(b[:, None] for b in bs)
    return flat

  def _dw_shapes_specs():
    whole = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    shapes, specs = [], []
    for l in range(num_layers):
      c_in = num_feats if l == 0 else (
          width + num_feats if l in skip_set else width)
      shapes.append(jax.ShapeDtypeStruct((c_in, width), jnp.float32))
      specs.append(whole((c_in, width)))
    for _ in range(num_layers):
      shapes.append(jax.ShapeDtypeStruct((1, width), jnp.float32))
      specs.append(whole((1, width)))
    return shapes, specs

  def _forward(means, covs, qlayers, bs):
    n = means.shape[0]
    m_t, c9_t, tile = _prep(means, covs)
    n_pad = m_t.shape[-1]
    kern = functools.partial(_fwd_kernel, num_layers=num_layers,
                             min_deg=min_deg, max_deg=max_deg,
                             use_contract=use_contract, arity=arity_fwd,
                             skip_set=skip_set)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_pad, width), jnp.bfloat16),
        grid=(n_pad // tile,),
        in_specs=_const_specs(tile) + _layer_specs(for_bwd=False),
        out_specs=pl.BlockSpec((tile, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=compiler_params,
        interpret=interpret,
    )(m_t, c9_t, basis_t, bb_t, *_flatten_layers(qlayers, bs, False))
    return out[:n]

  def _grad(means, covs, qlayers, bs, g):
    m_t, c9_t, tile = _prep(means, covs)
    n_pad = m_t.shape[-1]
    g_pad = jnp.pad(g, ((0, n_pad - g.shape[0]), (0, 0)))
    kern = functools.partial(_bwd_kernel, num_layers=num_layers,
                             min_deg=min_deg, max_deg=max_deg,
                             use_contract=use_contract, arity=arity_bwd,
                             skip_set=skip_set, bwd_bf16=bwd_bf16)
    out_shapes, out_specs = _dw_shapes_specs()
    outs = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid=(n_pad // tile,),
        in_specs=_const_specs(tile) + _layer_specs(for_bwd=True) + [
            pl.BlockSpec((tile, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        compiler_params=compiler_params,
        interpret=interpret,
    )(m_t, c9_t, basis_t, bb_t, *_flatten_layers(qlayers, bs, True), g_pad)
    dws = outs[:num_layers]
    dbs = [o[0] for o in outs[num_layers:]]
    return dws, dbs

  @jax.custom_vjp
  def fused(means, covs, ws, bs):
    return _forward(means, covs, tuple(quantize_weights(ws, width)), bs)

  def fused_fwd(means, covs, ws, bs):
    qlayers = tuple(quantize_weights(ws, width))
    return _forward(means, covs, qlayers, bs), (means, covs, ws, bs)

  def fused_bwd(res, g):
    means, covs, ws, bs = res
    qlayers = tuple(quantize_weights(ws, width))
    dws, dbs = _grad(means, covs, qlayers, bs, g)
    return (jnp.zeros_like(means), jnp.zeros_like(covs), tuple(dws),
            tuple(dbs))

  fused.defvjp(fused_fwd, fused_bwd)
  return fused


def int8_trunk(means, covs, ws, bs, basis, min_deg=0, max_deg=12,
               use_contract=True, skip_layers=(), interpret=False,
               bwd_bf16=False):
  """Fused featurize + int8 trunk; returns the final activation.

  Equivalent (to int8 quantization of the hidden layers; layer 0 and the
  skip-layer feats projections at bf16) to models/mlp.py's fused-featurize
  trunk::

      m, c = track_linearize(contract, means, covs)    # if use_contract
      f = integrated_pos_enc_lifted(m, c, basis, min_deg, max_deg)
      x = relu(f @ ws[0] + bs[0])
      for l in 1..L-1:
        xx = concat([x, f]) if l in skip_layers else x
        x = relu(quant_matmul(xx, ws[l]) + bs[l])
      return x                                         # [N, W] bf16

  Args:
    means: [..., 3]; covs: [..., 3, 3] (stop-gradient semantics).
    ws: trunk kernels; ws[0] [C0, W]; skip layers [W + C0, W]; else [W, W].
    bs: biases [W].
    skip_layers: static layer indices (models/mlp.py: i with
      (i - 1) % skip_layer == 0 and i > 1).
    bwd_bf16: hybrid mode — int8 forward, UNQUANTIZED bf16 backward (see
      module docstring).

  Gradients flow to every weight/bias; means/covs receive zeros.
  """
  basis = np.asarray(basis, np.float32)
  width = ws[-1].shape[-1]
  num_feats = 2 * (max_deg - min_deg) * basis.shape[-1]
  fn = _make_fn(basis.tobytes(), basis.shape, int(min_deg), int(max_deg),
                bool(use_contract), len(ws), width,
                tuple(sorted(int(s) for s in skip_layers)), num_feats,
                bool(interpret), bool(bwd_bf16))
  batch_shape = means.shape[:-1]
  out = fn(jax.lax.stop_gradient(means.reshape(-1, 3)),
           jax.lax.stop_gradient(covs.reshape(-1, 9)),
           tuple(ws), tuple(bs))
  return out.reshape(batch_shape + (width,))


def int8_trunk_reference(means, covs, ws, bs, basis, min_deg=0, max_deg=12,
                         use_contract=True, skip_layers=()):
  """jnp twin of the FORWARD (per-sample scales are tile-independent)."""
  from multinerf_tpu.ops import coord
  if use_contract:
    means, covs = coord.contract_gaussian(means, covs)
  f = coord._integrated_pos_enc_lifted_recurrence(
      means, covs, basis, min_deg, max_deg).astype(jnp.bfloat16)
  width = ws[-1].shape[-1]
  x = jnp.maximum(
      jax.lax.dot_general(f, ws[0].astype(jnp.bfloat16),
                          (((f.ndim - 1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32) + bs[0], 0.0)
  for l in range(1, len(ws)):
    x_part = ws[l][:width]
    sw = jnp.maximum(jnp.max(jnp.abs(x_part), axis=0, keepdims=True),
                     _SCALE_FLOOR) / 127.0
    w_q = jnp.round(x_part / sw).astype(jnp.int8)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     _SCALE_FLOOR) / 127.0
    x_q = jnp.round(x / sx).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * (sx * sw)
    if l in set(skip_layers):
      y = y + jax.lax.dot_general(
          f, ws[l][width:].astype(jnp.bfloat16),
          (((f.ndim - 1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32)
    x = jnp.maximum(y + bs[l], 0.0)
  return x.astype(jnp.bfloat16)
