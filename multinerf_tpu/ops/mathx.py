"""Numerically-safe math primitives and schedules.

Functional parity targets (semantics, not code) in the reference:
``internal/math.py`` of google-research/multinerf. Key contracts:

* TPU transcendentals NaN out for huge args, so trig is range-reduced
  (reference: math.py:26-38) and exp is clamped with a straight-through
  gradient (math.py:41-54).
* ``jnp.matmul`` on TPU defaults to bf16 passes; metric-critical matmuls must
  request full f32 (math.py:21-23).
* ``interp_sorted`` is the TPU-friendly inverse-CDF interpolation
  (math.py:108-127): instead of gathers it brute-forces interval location via
  masked reductions, which XLA maps onto the VPU far better than scatter/
  gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# sin/cos on TPU lose accuracy (and may NaN) outside a modest range; fold
# inputs into [-100pi, 100pi) first.
_TRIG_PERIOD = 100.0 * jnp.pi

# exp(89.) overflows f32.
_EXP_CLAMP = 88.0


def matmul_hp(a, b):
  """f32 (HIGHEST) precision matmul; TPU matmul defaults to bf16 passes."""
  return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def safe_sin(x):
  """sin(x) that stays finite for arbitrarily large x on TPU."""
  return jnp.sin(jnp.where(jnp.abs(x) < _TRIG_PERIOD, x, x % _TRIG_PERIOD))


def safe_cos(x):
  """cos(x) that stays finite for arbitrarily large x on TPU."""
  return jnp.cos(jnp.where(jnp.abs(x) < _TRIG_PERIOD, x, x % _TRIG_PERIOD))


@jax.custom_jvp
def safe_exp(x):
  """exp(x) with finite output and nonzero gradient for large x."""
  return jnp.exp(jnp.minimum(x, _EXP_CLAMP))


@safe_exp.defjvp
def _safe_exp_jvp(primals, tangents):
  # Gradient is exp(min(x, clamp)) rather than 0 past the clamp, so large
  # activations keep receiving a (large) corrective signal.
  (x,), (x_dot,) = primals, tangents
  y = safe_exp(x)
  return y, y * x_dot


def log_lerp(t, v0, v1):
  """Interpolate log-linearly from v0 (t=0) to v1 (t=1); t clipped to [0,1]."""
  if v0 <= 0 or v1 <= 0:
    raise ValueError(f'Interpolants {v0} and {v1} must be positive.')
  lv0, lv1 = jnp.log(v0), jnp.log(v1)
  return jnp.exp(jnp.clip(t, 0, 1) * (lv1 - lv0) + lv0)


def learning_rate_decay(step, lr_init, lr_final, max_steps,
                        lr_delay_steps=0, lr_delay_mult=1):
  """Log-linear lr decay with an optional sine-eased warmup.

  Matches the reference schedule (math.py:66-98): lr(0)=lr_init,
  lr(max_steps)=lr_final, log-linear in between; if lr_delay_steps > 0 the
  rate is scaled by lr_delay_mult at step 0 easing to 1 by lr_delay_steps.
  """
  if lr_delay_steps > 0:
    delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
        0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
  else:
    delay = 1.0
  return delay * log_lerp(step / max_steps, lr_init, lr_final)


def interp_gather(x, xp, fp):
  """Gather-based batched jnp.interp (fast on GPU, slow on TPU)."""
  flat = [v.reshape([-1, v.shape[-1]]) for v in (x, xp, fp)]
  return jax.vmap(jnp.interp)(*flat).reshape(x.shape)


def interp_sorted(x, xp, fp):
  """Batched linear interpolation where `x`, `xp`, `fp` are all sorted.

  Gather-free: builds the (num_fence x num_query) comparison mask once and
  extracts the bracketing fenceposts with masked max/min reductions — O(n^2)
  compares on the VPU instead of O(n log n) gathers that serialize on TPU.
  Out-of-range queries clamp to the first/last fencepost (like jnp.interp).

  Args:
    x:  [..., num_query] query points (sorted, but only xp/fp must be).
    xp: [..., num_fence] fencepost x coordinates, sorted ascending.
    fp: [..., num_fence] fencepost values, sorted ascending.

  Returns:
    [..., num_query] interpolated values.
  """
  # ge[..., i, j] == xp[i] <= x[j]: last True row brackets query j from below.
  ge = x[..., None, :] >= xp[..., :, None]

  def bracket(vals):
    lo = jnp.max(jnp.where(ge, vals[..., None], vals[..., :1, None]), axis=-2)
    hi = jnp.min(jnp.where(ge, vals[..., -1:, None], vals[..., None]), axis=-2)
    return lo, hi

  fp0, fp1 = bracket(fp)
  xp0, xp1 = bracket(xp)
  frac = jnp.clip(jnp.nan_to_num((x - xp0) / (xp1 - xp0), nan=0.0), 0, 1)
  return fp0 + frac * (fp1 - fp0)
