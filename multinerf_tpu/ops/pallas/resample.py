"""Fused inverse-CDF interval resampling as one Pallas TPU kernel.

The per-level resampling chain (reference stepfun.py:153-263 feeding
models.py:189) is softmax -> clamped cumsum -> inverse-CDF interpolation ->
interval construction.  In XLA that is ~10 separate HBM-roundtripping ops
per level, with the interpolation lowered as four masked max/min reductions
over a [rays, bins, samples] tensor (math.py:108-127).

This kernel runs the whole chain VMEM-resident per block of rays:

* the CDF comes from a lower-triangular matmul on the MXU (a [n, n] ones
  triangle beats a lane-axis cumsum on TPU),
* the inverse-CDF bracket search is a static sweep over fenceposts with
  running select updates (2(n+1) VPU selects on [block, samples] tiles)
  instead of materializing the 3D comparison tensor,
* midpoints/clamping produce the output fenceposts in the same kernel.

Semantics match ``stepfun.sample_intervals`` bit-for-eps: same jitter
conventions, same clamping, same degenerate-bin handling; the equivalence
test lives in tests/test_pallas_resample.py.  No VJP is needed: sampled
fenceposts are stop-gradient'ed by the model (reference models.py:200-201).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def _resample_kernel(t_ref, logits_ref, u_ref, out_ref, *, domain):
  """One block of rays: logits + fenceposts + uniforms -> new fenceposts."""
  t = t_ref[:]            # [R, n+1]
  logits = logits_ref[:]  # [R, n]
  u = u_ref[:]            # [R, m]
  n = logits.shape[-1]
  m = u.shape[-1]

  # Softmax over bins (guarding the all--inf row like jax.nn.softmax).
  lmax = jnp.max(logits, axis=-1, keepdims=True)
  unnorm = jnp.exp(logits - jax.lax.stop_gradient(lmax))
  w = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)

  # CDF fenceposts: [0, min(1, cumsum(w[:-1])), 1], via a strictly-lower-
  # triangular ones matmul (cw_full[i] = sum_{j<i} w[j]) on the MXU.
  zeros = jnp.zeros_like(w[..., :1])
  ones = jnp.ones_like(w[..., :1])
  if n == 1:
    # One bin (the model's first level): the CDF is exactly [0, 1] and the
    # interior slice below would be zero-width (Mosaic rejects size-0
    # vectors).
    cw = jnp.concatenate([zeros, ones], axis=-1)
  else:
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tri = (rows < cols).astype(jnp.float32)  # [n, n]: j feeds i > j.
    # HIGHEST precision: a bf16 single-pass CDF shifts inverse-CDF samples
    # by ~1e-2; the [R, n] x [n, n] matmul is tiny so f32 passes are free.
    csum = jnp.dot(w, tri, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # [R, n]
    cw_mid = jnp.minimum(1.0, csum[..., 1:])  # interior fenceposts (n-1).
    cw = jnp.concatenate([zeros, cw_mid, ones], axis=-1)  # [R, n+1]

  # Inverse-CDF bracketing: running-select sweep over the n+1 fenceposts.
  # The ascending index finds the last fencepost with cw <= u; the mirrored
  # descending index the first with cw > u.  fori_loop (not a Python loop)
  # keeps Mosaic from stacking one temporary per unrolled step in VMEM, and
  # the per-step fencepost column is extracted with a one-hot lane reduction
  # (Mosaic forbids dynamic lane-dim slices at non-128 offsets).
  # Initialization reproduces interp_sorted's clamping (out-of-range queries
  # clamp to the first/last fencepost).
  rows_r = cw.shape[0]
  lane = jax.lax.broadcasted_iota(jnp.int32, (1, n + 1), 1)

  def column(vals, j):
    sel = (lane == j).astype(vals.dtype)
    return jnp.sum(vals * sel, axis=-1, keepdims=True)

  def sweep(j, carry):
    lo_cw, lo_t, hi_cw, hi_t = carry
    cw_j = column(cw, j)
    t_j = column(t, j)
    mask = cw_j <= u
    lo_cw = jnp.where(mask, cw_j, lo_cw)
    lo_t = jnp.where(mask, t_j, lo_t)
    k = n - j
    cw_k = column(cw, k)
    t_k = column(t, k)
    mask_hi = cw_k > u
    hi_cw = jnp.where(mask_hi, cw_k, hi_cw)
    hi_t = jnp.where(mask_hi, t_k, hi_t)
    return lo_cw, lo_t, hi_cw, hi_t

  init = (jnp.broadcast_to(cw[..., :1], (rows_r, m)),
          jnp.broadcast_to(t[..., :1], (rows_r, m)),
          jnp.broadcast_to(cw[..., -1:], (rows_r, m)),
          jnp.broadcast_to(t[..., -1:], (rows_r, m)))
  lo_cw, lo_t, hi_cw, hi_t = jax.lax.fori_loop(0, n + 1, sweep, init)

  frac = (u - lo_cw) / (hi_cw - lo_cw)
  frac = jnp.clip(jnp.nan_to_num(frac, nan=0.0), 0.0, 1.0)
  centers = lo_t + frac * (hi_t - lo_t)  # [R, m]

  # Intervals spanning midpoints; endpoint fenceposts reflect the adjacent
  # midpoint around the first/last center, clamped to the domain.
  mid = 0.5 * (centers[..., 1:] + centers[..., :-1])
  minval, maxval = domain
  first = jnp.maximum(minval, 2 * centers[..., :1] - mid[..., :1])
  last = jnp.minimum(maxval, 2 * centers[..., -1:] - mid[..., -1:])
  out_ref[:] = jnp.concatenate([first, mid, last], axis=-1)


def _pick_block(batch: int) -> int:
  for block in (256, 128, 64, 32, 16, 8):
    if batch % block == 0:
      return block
  return batch


@functools.partial(jax.jit, static_argnames=('domain', 'interpret'))
def resample_intervals_pallas(t, logits, u, domain=(0.0, 1.0),
                              interpret=False):
  """Kernel launcher: (t [B, n+1], logits [B, n], u [B, m]) -> [B, m+1]."""
  batch = t.shape[0]
  block = _pick_block(batch)
  m = u.shape[-1]
  kernel = functools.partial(_resample_kernel, domain=domain)
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((batch, m + 1), t.dtype),
      grid=(batch // block,),
      in_specs=[
          pl.BlockSpec((block, t.shape[-1]), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((block, logits.shape[-1]), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((block, m), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((block, m + 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      interpret=interpret,
  )(t, logits, u)


def _stratified_u(rng, batch_shape, num_samples, single_jitter):
  """Stratified uniforms with the reference's jitter conventions.

  Matches stepfun.sample (reference stepfun.py:191-210) with
  deterministic_center=True in the rng=None case.
  """
  eps = _F32_EPS
  if rng is None:
    pad = 1 / (2 * num_samples)
    u = jnp.linspace(pad, 1.0 - pad - eps, num_samples)
    u = jnp.broadcast_to(u, batch_shape + (num_samples,))
  else:
    u_max = eps + (1 - eps) / num_samples
    max_jitter = (1 - u_max) / (num_samples - 1) - eps
    d = 1 if single_jitter else num_samples
    u = (jnp.linspace(0, 1 - u_max, num_samples) +
         jax.random.uniform(rng, batch_shape + (d,), maxval=max_jitter))
    u = jnp.broadcast_to(u, batch_shape + (num_samples,))
  return u


def sample_intervals_fused(rng, t, w_logits, num_samples, single_jitter=False,
                           domain=(0.0, 1.0), interpret=False):
  """Drop-in fused replacement for ``stepfun.sample_intervals``.

  Flattens any leading batch dims, launches the kernel, and restores shape.
  `domain` must be finite (the model always passes the normalized [near_s, 1]
  domain; the reference's infinite default never reaches TPU training).
  """
  if num_samples <= 1:
    raise ValueError(f'num_samples must be > 1, got {num_samples}.')
  # The kernel has no JVP/VJP rule; sampling is always used under
  # stop_gradient by the model (stop_level_grad), so cut gradients at the
  # kernel boundary rather than after it.
  t = jax.lax.stop_gradient(t)
  w_logits = jax.lax.stop_gradient(w_logits)
  batch_shape = t.shape[:-1]
  u = _stratified_u(rng, batch_shape, num_samples, single_jitter)

  t2 = t.reshape((-1, t.shape[-1]))
  logits2 = w_logits.reshape((-1, w_logits.shape[-1]))
  u2 = u.reshape((-1, num_samples))
  out = resample_intervals_pallas(
      t2, logits2, u2,
      domain=(float(domain[0]), float(domain[1])),
      interpret=interpret)
  return out.reshape(batch_shape + (num_samples + 1,))
