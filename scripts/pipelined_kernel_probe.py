"""Probe: can sub-tile software pipelining overlap featurize (VPU) with
the trunk matmuls (MXU) inside the fused density-MLP kernel?

prop_kernel_probe.py attributed the fused kernel's gap to an aggressive
recompute roofline (~0.56 ms fwd / ~0.77 ms bwd per level at 360 prop
shapes) to featurize/epilogue VPU work serialized with the MXU inside
each sample tile (docs/DESIGN.md "PropMLP kernel roofline attribution").
This probe measures experimental kernel variants that split each tile
into sub-chunks and interleave featurize(chunk k+1) with the trunk dots
of chunk k, giving Mosaic's scheduler the dataflow freedom to co-issue
VPU and MXU work.  Production kernels are untouched; a variant only
graduates into ops/pallas/density_mlp.py if it wins here AND passes the
equivalence tests.

Timing: chained iterations inside one jitted fori_loop, slope between two
iteration counts (the axon tunnel makes per-dispatch timing meaningless).

Usage: python scripts/pipelined_kernel_probe.py [--n 262144] [--subs 256,512]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multinerf_tpu.ops.pallas import density_mlp as dm
from multinerf_tpu.ops.pallas.featurize_dense import (_pick_tile,
                                                      _tile_features_t)

DEPTH, WIDTH, MAXDEG = 4, 256, 12


def _trunk_forward(feats, ws, bs):
  acts = []
  x = feats
  for w, b in zip(ws, bs):
    pre = jax.lax.dot_general(
        w, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    x = jnp.maximum(pre + b, 0.0)
    acts.append(x)
    x = x.astype(jnp.bfloat16)
  return acts


def _density_row(act, wd, bd):
  a = act.astype(jnp.bfloat16).astype(jnp.float32)
  w = wd.astype(jnp.bfloat16).astype(jnp.float32)
  return jnp.sum(a * w, axis=0, keepdims=True) + bd


def _fwd_kernel_pipe(m_ref, c9_ref, bt_ref, bbt_ref, *refs, num_layers,
                     min_deg, max_deg, sub):
  """Forward with featurize(chunk k+1) textually ahead of trunk(chunk k)."""
  w_refs = refs[:num_layers]
  b_refs = refs[num_layers:2 * num_layers]
  wd_ref, bd_ref, out_ref = refs[2 * num_layers:]
  ws = [w[:] for w in w_refs]
  bs = [b[:] for b in b_refs]
  tile = m_ref.shape[-1]
  n_chunks = tile // sub

  def feat(k):
    sl = slice(k * sub, (k + 1) * sub)
    return _tile_features_t(m_ref[:, sl], c9_ref[:, sl], bt_ref[:],
                            bbt_ref[:], min_deg, max_deg, True)

  feats = feat(0)
  for k in range(n_chunks):
    nxt = feat(k + 1) if k + 1 < n_chunks else None
    acts = _trunk_forward(feats, ws, bs)
    out_ref[:, k * sub:(k + 1) * sub] = _density_row(
        acts[-1], wd_ref[:], bd_ref[0, 0])
    feats = nxt


def _bwd_kernel_pipe(m_ref, c9_ref, bt_ref, bbt_ref, *refs, num_layers,
                     min_deg, max_deg, sub):
  """Backward (recompute + grads) with chunked featurize interleaving."""
  w_refs = refs[:num_layers]
  b_refs = refs[num_layers:2 * num_layers]
  wd_ref, g_ref = refs[2 * num_layers:2 * num_layers + 2]
  out_refs = refs[2 * num_layers + 2:-1]
  gw_scratch = refs[-1]

  @pl.when(pl.program_id(0) == 0)
  def _init():
    for r in out_refs:
      r[:] = jnp.zeros_like(r)

  ws = [w[:] for w in w_refs]
  bs = [b[:] for b in b_refs]
  wd = wd_ref[:]
  g = g_ref[:]
  tile = m_ref.shape[-1]
  width = wd_ref.shape[0]
  n_chunks = tile // sub
  dwd_ref, dbd_ref = out_refs[2 * num_layers:]
  # Mosaic cannot broadcast a lane-sliced [1, sub] row.  Materialize the
  # broadcast cotangent into VMEM scratch once per tile; per-chunk REF
  # slices then load with native offset layouts.
  gw_scratch[:] = jnp.broadcast_to(g, (width, tile))
  dbd_ref[:] += jnp.sum(g, axis=-1, keepdims=True)

  def feat(k):
    sl = slice(k * sub, (k + 1) * sub)
    return _tile_features_t(m_ref[:, sl], c9_ref[:, sl], bt_ref[:],
                            bbt_ref[:], min_deg, max_deg, True)

  feats = feat(0)
  for k in range(n_chunks):
    nxt = feat(k + 1) if k + 1 < n_chunks else None
    acts = _trunk_forward(feats, ws, bs)
    gw = gw_scratch[:, k * sub:(k + 1) * sub]
    dwd_ref[:] += jnp.sum(acts[-1] * gw, axis=-1, keepdims=True)
    da = wd * gw * (acts[-1] > 0)
    for l in range(num_layers - 1, -1, -1):
      x_in = feats if l == 0 else acts[l - 1].astype(jnp.bfloat16)
      out_refs[l][:] += jax.lax.dot_general(
          x_in, da.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32)
      out_refs[num_layers + l][:] += jnp.sum(da, axis=-1)[None, :]
      if l > 0:
        da = jax.lax.dot_general(
            w_refs[l][:], da.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (acts[l - 1] > 0)
    feats = nxt


def _const_specs_for(num_dims, tile):
  return [
      pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
      pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
      pl.BlockSpec((num_dims, 3), lambda i: (0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((num_dims, 9), lambda i: (0, 0),
                   memory_space=pltpu.VMEM),
  ]


def _weight_specs_for(num_layers, num_feats, width):
  specs = []
  for l in range(num_layers):
    c_in = num_feats if l == 0 else width
    specs.append(pl.BlockSpec((c_in, width), lambda i: (0, 0),
                              memory_space=pltpu.VMEM))
  for _ in range(num_layers):
    specs.append(pl.BlockSpec((width, 1), lambda i: (0, 0),
                              memory_space=pltpu.VMEM))
  return specs


def _basis_consts(basis_bytes, basis_shape, min_deg, max_deg):
  basis = np.frombuffer(basis_bytes, dtype=np.float32).reshape(basis_shape)
  num_dims = basis.shape[-1]
  num_feats = 2 * (max_deg - min_deg) * num_dims
  base = 2.0 ** min_deg
  basis_t = np.asarray(base * basis.T, np.float32)
  bb_t = np.asarray(
      (base * base) *
      np.einsum('ik,jk->kij', basis, basis).reshape(num_dims, 9), np.float32)
  return num_dims, num_feats, basis_t, bb_t


@functools.lru_cache(maxsize=8)
def _make_pipe_fwd(basis_bytes, basis_shape, min_deg, max_deg, num_layers,
                   width, sub):
  num_dims, num_feats, basis_t, bb_t = _basis_consts(
      basis_bytes, basis_shape, min_deg, max_deg)

  _const_specs = functools.partial(_const_specs_for, num_dims)
  _weight_specs = functools.partial(_weight_specs_for, num_layers,
                                    num_feats, width)

  def forward(means, covs, ws_bf, bs, wd, bd):
    n = means.shape[0]
    m_t, c9_t = means.T, covs.T
    tile = _pick_tile(n)
    kern = functools.partial(_fwd_kernel_pipe, num_layers=num_layers,
                             min_deg=min_deg, max_deg=max_deg, sub=sub)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid=(n // tile,),
        in_specs=_const_specs(tile) + _weight_specs() + [
            pl.BlockSpec((width, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(m_t, c9_t, basis_t, bb_t, *ws_bf, *[b[:, None] for b in bs],
      wd, bd.reshape(1, 1))
    return out[0]

  return forward


@functools.lru_cache(maxsize=8)
def _make_pipe_bwd(basis_bytes, basis_shape, min_deg, max_deg, num_layers,
                   width, sub):
  num_dims, num_feats, basis_t, bb_t = _basis_consts(
      basis_bytes, basis_shape, min_deg, max_deg)
  _const_specs = functools.partial(_const_specs_for, num_dims)
  _weight_specs = functools.partial(_weight_specs_for, num_layers,
                                    num_feats, width)

  def grad(means, covs, ws_bf, bs, wd, g):
    n = means.shape[0]
    m_t, c9_t = means.T, covs.T
    tile = _pick_tile(n)
    kern = functools.partial(_bwd_kernel_pipe, num_layers=num_layers,
                             min_deg=min_deg, max_deg=max_deg, sub=sub)
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
    return pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid=(n // tile,),
        in_specs=_const_specs(tile) + _weight_specs() + [
            pl.BlockSpec((width, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((width, tile), jnp.float32)],
    )(m_t, c9_t, basis_t, bb_t, *ws_bf, *[b[:, None] for b in bs], wd,
      g[None, :])

  return grad


def timed_slope(fn, iters_lo=4, iters_hi=24):
  def run(iters):
    @jax.jit
    def go(s0):
      return jax.lax.fori_loop(0, iters, lambda i, s: fn(s), s0)
    float(go(0.0))
    t0 = time.perf_counter()
    float(go(0.0))
    return time.perf_counter() - t0

  lo, hi = run(iters_lo), run(iters_hi)
  return (hi - lo) / (iters_hi - iters_lo)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--n', type=int, default=262144)
  ap.add_argument('--subs', default='256,512')
  args = ap.parse_args()

  from multinerf_tpu.ops import geopoly
  basis = np.array(geopoly.generate_basis('icosahedron', 2), np.float32).T
  nfeat = 2 * MAXDEG * basis.shape[-1]

  key = jax.random.PRNGKey(0)
  km, kc, *kw = jax.random.split(key, 2 + DEPTH + 1)
  n = args.n
  means = jax.random.normal(km, (n, 3)) * 2.0
  a = jax.random.normal(kc, (n, 3, 3)) * 0.02
  covs = (a @ jnp.swapaxes(a, -1, -2) + 1e-6 * jnp.eye(3)).reshape(n, 9)
  ws, bs, cin = [], [], nfeat
  for l in range(DEPTH):
    ws.append(jax.random.normal(kw[l], (cin, WIDTH)) / np.sqrt(cin))
    bs.append(jnp.zeros((WIDTH,)))
    cin = WIDTH
  wd = jax.random.normal(kw[-1], (WIDTH, 1)) * 0.05
  bd = jnp.zeros(())
  ws_bf = tuple(w.astype(jnp.bfloat16) for w in ws)

  def baseline(s):
    out = dm.density_mlp(means * (1 + s * 1e-30), covs.reshape(n, 3, 3),
                         ws, bs, wd, bd, basis, 0, MAXDEG,
                         use_contract=True)
    return jnp.sum(out) * 1e-30

  sec = timed_slope(baseline)
  print(f'production fwd       {sec * 1e3:8.3f} ms/iter', flush=True)
  base_ref = dm.density_mlp(means, covs.reshape(n, 3, 3), ws, bs, wd, bd,
                            basis, 0, MAXDEG, use_contract=True)

  # Production bwd baseline: grad of the fused op w.r.t. first weight.
  def baseline_bwd(s):
    def loss(w0):
      return jnp.sum(dm.density_mlp(means, covs.reshape(n, 3, 3),
                                    [w0] + ws[1:], bs, wd, bd, basis, 0,
                                    MAXDEG, use_contract=True))
    g = jax.grad(loss)(ws[0] * (1 + s * 1e-30))
    return jnp.sum(g) * 1e-30

  sec = timed_slope(baseline_bwd)
  print(f'production bwd       {sec * 1e3:8.3f} ms/iter  '
        f'(bwd kernel alone: fwd custom call is DCEd)', flush=True)

  gvec = jnp.ones((n,), jnp.float32)
  # Production-gradient oracle for dW_0 under the same sum-loss cotangent.
  ref_dw0 = jax.grad(lambda w0: jnp.sum(dm.density_mlp(
      means, covs.reshape(n, 3, 3), [w0] + ws[1:], bs, wd, bd, basis, 0,
      MAXDEG, use_contract=True)))(ws[0])

  for sub in [int(x) for x in args.subs.split(',') if x]:
    fwd = _make_pipe_fwd(basis.tobytes(), basis.shape, 0, MAXDEG, DEPTH,
                         WIDTH, sub)

    # Numerics check vs production before timing.
    got = fwd(means, covs, ws_bf, bs, wd, bd)
    err = float(jnp.max(jnp.abs(got - base_ref)))
    def pipe(s, fwd=fwd):
      out = fwd(means * (1 + s * 1e-30), covs, ws_bf, bs, wd, bd)
      return jnp.sum(out) * 1e-30

    sec = timed_slope(pipe)
    print(f'pipelined fwd sub={sub:4d}  {sec * 1e3:8.3f} ms/iter  '
          f'(max |err| vs production {err:.2e})', flush=True)

    bwd = _make_pipe_bwd(basis.tobytes(), basis.shape, 0, MAXDEG, DEPTH,
                         WIDTH, sub)
    grads = bwd(means, covs, ws_bf, bs, wd, gvec)
    gerr = (float(jnp.max(jnp.abs(grads[0] - ref_dw0))) /
            (1e-6 + float(jnp.max(jnp.abs(ref_dw0)))))
    def pipe_bwd(s, bwd=bwd):
      outs = bwd(means * (1 + s * 1e-30), covs, ws_bf, bs, wd, gvec)
      return jnp.sum(outs[0]) * 1e-30

    sec = timed_slope(pipe_bwd)
    print(f'pipelined bwd sub={sub:4d}  {sec * 1e3:8.3f} ms/iter  '
          f'(dW0 rel err vs production {gerr:.2e})', flush=True)

  # Re-measure production at the END: if this differs from the first
  # measurement, the run has order/clock drift and only paired same-slot
  # comparisons are meaningful.
  sec = timed_slope(baseline)
  print(f'production fwd (re)  {sec * 1e3:8.3f} ms/iter', flush=True)


if __name__ == '__main__':
  main()
