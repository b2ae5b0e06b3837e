"""Decompose the fused PropMLP kernel's step cost at 360 prop shapes.

The round-3 profile (docs/DESIGN.md "uncull floor") measured the fused
density-MLP kernels at 1.73 ms fwd + 3.49 ms bwd per level while the pure
matmul roofline for the same FLOPs is ~0.59 / ~1.77 ms — i.e. the prop
levels run ~3x off roofline and are ~1/3 of the CULLED step.  This probe
times the variants needed to attribute the gap:

  fused_fwd / fused_train   the production Pallas kernel.  NOTE:
                            fused_train times the bwd kernel ALONE — with
                            the forward value unused XLA DCEs the fwd
                            custom call (the custom VJP's residuals are
                            only the inputs); see DESIGN.md.
  floor_fwd / floor_train   XLA bf16 matmul chain on PREcomputed features
                            (the achievable matmul floor, no featurize)
  xla_fwd / xla_train       the unfused XLA twin (contract + recurrence
                            IPE + dots) — what fusion is bought against

Timing: chained iterations inside one jitted fori_loop (each iteration's
input is perturbed by the previous scalar result, serializing the chain),
slope between two iteration counts — the tunnel makes per-dispatch timing
meaningless (CLAUDE.md), this cancels it.

Usage: python scripts/prop_kernel_probe.py [--n 262144] [--tile 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multinerf_tpu.ops.pallas import density_mlp as dm

DEPTH, WIDTH, MAXDEG = 4, 256, 12
BASIS = np.eye(3, dtype=np.float32)  # overridden by --basis icosahedron
NFEAT = 2 * MAXDEG * 3


def make_inputs(n, key):
  km, kc, kf, *kw = jax.random.split(key, 3 + DEPTH + 1)
  means = jax.random.normal(km, (n, 3)) * 2.0
  # PSD covariances with realistic conical scale.
  a = jax.random.normal(kc, (n, 3, 3)) * 0.02
  covs = a @ jnp.swapaxes(a, -1, -2) + 1e-6 * jnp.eye(3)
  feats = jax.random.normal(kf, (n, NFEAT)).astype(jnp.bfloat16)
  ws, bs, cin = [], [], NFEAT
  for l in range(DEPTH):
    ws.append(jax.random.normal(kw[l], (cin, WIDTH)) / np.sqrt(cin))
    bs.append(jnp.zeros((WIDTH,)))
    cin = WIDTH
  wd = jax.random.normal(kw[-1], (WIDTH, 1)) * 0.05
  bd = jnp.zeros(())
  return means, covs, feats, ws, bs, wd, bd


def timed_slope(fn, iters_lo=4, iters_hi=24):
  """Seconds per iteration via two chained-loop lengths."""

  def run(iters):
    @jax.jit
    def go(s0):
      return jax.lax.fori_loop(0, iters, lambda i, s: fn(s), s0)
    float(go(0.0))  # compile + warm
    t0 = time.perf_counter()
    float(go(0.0))
    return time.perf_counter() - t0

  lo, hi = run(iters_lo), run(iters_hi)
  return (hi - lo) / (iters_hi - iters_lo)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--n', type=int, default=262144)
  ap.add_argument('--tile', type=int, default=0,
                  help='MULTINERF_PALLAS_TILE override')
  ap.add_argument('--only', default='',
                  help='comma-separated subset of variant names')
  ap.add_argument('--basis', default='identity',
                  choices=['identity', 'icosahedron'],
                  help='icosahedron = the real 360 MLP lifted basis (21-dim)')
  args = ap.parse_args()
  if args.tile:
    os.environ['MULTINERF_PALLAS_TILE'] = str(args.tile)
  global BASIS, NFEAT
  if args.basis == 'icosahedron':
    from multinerf_tpu.ops import geopoly
    BASIS = np.array(geopoly.generate_basis('icosahedron', 2),
                     np.float32).T  # (3, 21), as MLP.pos_basis_t
    NFEAT = 2 * MAXDEG * BASIS.shape[-1]

  means, covs, feats, ws, bs, wd, bd = make_inputs(
      args.n, jax.random.PRNGKey(0))

  def fused_fwd(s):
    out = dm.density_mlp(means * (1 + s * 1e-30), covs, ws, bs, wd, bd,
                         BASIS, 0, MAXDEG, use_contract=True)
    return jnp.sum(out) * 1e-30

  def fused_train(s):
    def loss(w0):
      return jnp.sum(dm.density_mlp(means, covs, [w0] + ws[1:], bs, wd, bd,
                                    BASIS, 0, MAXDEG, use_contract=True))
    g = jax.grad(loss)(ws[0] * (1 + s * 1e-30))
    return jnp.sum(g) * 1e-30

  def _chain(x, w0):
    for w, b in zip([w0] + ws[1:], bs):
      pre = jax.lax.dot_general(
          x, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32) + b
      x = jnp.maximum(pre, 0.0).astype(jnp.bfloat16)
    return jnp.sum(jax.lax.dot_general(
        x, wd.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bd)

  def floor_fwd(s):
    return _chain(feats * (1 + s * 1e-30).astype(jnp.bfloat16), ws[0]) * 1e-30

  def floor_train(s):
    g = jax.grad(lambda w0: _chain(feats, w0))(ws[0] * (1 + s * 1e-30))
    return jnp.sum(g) * 1e-30

  def xla_fwd(s):
    out = dm.density_mlp_reference(means * (1 + s * 1e-30), covs, ws, bs,
                                   wd, bd, BASIS, 0, MAXDEG,
                                   use_contract=True)
    return jnp.sum(out) * 1e-30

  def xla_train(s):
    def loss(w0):
      return jnp.sum(dm.density_mlp_reference(
          means, covs, [w0] + ws[1:], bs, wd, bd, BASIS, 0, MAXDEG,
          use_contract=True))
    g = jax.grad(loss)(ws[0] * (1 + s * 1e-30))
    return jnp.sum(g) * 1e-30

  variants = dict(fused_fwd=fused_fwd, fused_train=fused_train,
                  floor_fwd=floor_fwd, floor_train=floor_train,
                  xla_fwd=xla_fwd, xla_train=xla_train)
  pick = [v for v in args.only.split(',') if v] or list(variants)
  results = {}
  for name in pick:
    sec = timed_slope(variants[name])
    results[name] = sec
    print(f'{name:14s} {sec * 1e3:8.3f} ms/iter', flush=True)
  if 'fused_fwd' in results and 'floor_fwd' in results:
    print(f'featurize+fusion overhead fwd: '
          f'{(results["fused_fwd"] - results["floor_fwd"]) * 1e3:.3f} ms')
  if 'fused_train' in results and 'floor_train' in results:
    print(f'featurize+fusion overhead train: '
          f'{(results["fused_train"] - results["floor_train"]) * 1e3:.3f} ms')


if __name__ == '__main__':
  main()
