"""Coordinate-space warps and ray-distance parameterizations.

Functional parity with ``internal/coord.py`` of google-research/multinerf,
with one deliberate TPU-first divergence: warping Gaussians through the
scene contraction uses an *analytic* Jacobian (``contract_gaussian``) instead
of ``jax.linearize`` + double ``vmap`` (reference coord.py:39-60).  The
closed form is a handful of fused VPU ops per sample instead of a re-traced
JVP pair, and is verified against the autodiff path in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multinerf_tpu.ops import mathx

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def contract(x):
  """mip-NeRF 360 scene contraction (Eq 10 of arxiv.org/abs/2111.12077).

  Identity inside the unit ball; maps all of space into radius-2 ball.
  """
  # Clamping to eps keeps gradients finite at x == 0.
  r_sq = jnp.maximum(_F32_EPS, jnp.sum(x**2, axis=-1, keepdims=True))
  scale = (2 * jnp.sqrt(r_sq) - 1) / r_sq
  return jnp.where(r_sq <= 1, x, scale * x)


def inv_contract(z):
  """Inverse of contract()."""
  r_sq = jnp.maximum(_F32_EPS, jnp.sum(z**2, axis=-1, keepdims=True))
  return jnp.where(r_sq <= 1, z, z / (2 * jnp.sqrt(r_sq) - r_sq))


def contract_gaussian(mean, cov):
  """Analytically warp Gaussians (mean, cov) through contract().

  For r > 1, contract(x) = g(r) x with g = (2r - 1)/r^2, whose Jacobian is
  J = g I + c x x^T with c = (2 - 2r)/r^4.  Then cov' = J cov J^T expands to
      g^2 cov + g c (x m^T + m x^T) + c^2 (x^T cov x) x x^T,  m = cov x,
  all cheap batched VPU ops — no linearization pass (cf. reference
  coord.py:39-60 which traces fn twice through vmapped JVPs).

  Args:
    mean: [..., 3] Gaussian means.
    cov:  [..., 3, 3] full covariance matrices.

  Returns:
    (contract(mean), warped covariance [..., 3, 3]).
  """
  r_sq = jnp.maximum(_F32_EPS, jnp.sum(mean**2, axis=-1, keepdims=True))
  r = jnp.sqrt(r_sq)
  g = (2 * r - 1) / r_sq
  c = (2 - 2 * r) / (r_sq * r_sq)

  inside = r_sq <= 1
  new_mean = jnp.where(inside, mean, g * mean)

  m = jnp.einsum('...ij,...j->...i', cov, mean)   # cov @ x
  xcx = jnp.sum(mean * m, axis=-1)                # x^T cov x
  outer_xm = mean[..., :, None] * m[..., None, :]
  outer_xx = mean[..., :, None] * mean[..., None, :]
  g_ = g[..., None]
  c_ = c[..., None]
  new_cov = (g_**2 * cov
             + g_ * c_ * (outer_xm + jnp.swapaxes(outer_xm, -1, -2))
             + c_**2 * xcx[..., None, None] * outer_xx)
  new_cov = jnp.where(inside[..., None], cov, new_cov)
  return new_mean, new_cov


def track_linearize(fn, mean, cov):
  """Warp Gaussians through fn by linearizing around each mean.

  Cov[f(x)] ~= J cov J^T with J the Jacobian of fn at mean.  Dispatches to
  the analytic fast path for the scene contraction; arbitrary warps fall
  back to ``jax.linearize`` with the JVP vmapped over covariance columns.
  """
  if (len(mean.shape) + 1) != len(cov.shape):
    raise ValueError('cov must be a full (non-diagonal) covariance.')
  import os
  if (fn is contract and
      os.environ.get('MULTINERF_REFERENCE_ALGOS') != '1'):
    return contract_gaussian(mean, cov)
  fn_mean, lin = jax.linearize(fn, mean)
  fn_cov = jax.vmap(lin, -1, -2)(jax.vmap(lin, -1, -2)(cov))
  return fn_mean, fn_cov


def construct_ray_warps(fn, t_near, t_far):
  """Bijection between metric ray distance t and normalized distance s.

  s = (fwd(t) - fwd(near)) / (fwd(far) - fwd(near)) for a monotone curve
  `fwd` (see text near Eq 11 of arxiv.org/abs/2111.12077).

  Args:
    fn: None (identity), the string 'piecewise', or a curve function with a
      recognized inverse (jnp.reciprocal/log/exp/sqrt/square).
    t_near, t_far: near/far plane distances (broadcastable tensors).

  Returns:
    (t_to_s, s_to_t) function pair.
  """
  if fn is None:
    fwd, inv = (lambda x: x), (lambda x: x)
  elif fn == 'piecewise':
    # Identity near the camera, 1/x far away; allows t_near == 0.
    fwd = lambda x: jnp.where(x < 1, 0.5 * x, 1 - 0.5 / x)
    inv = lambda x: jnp.where(x < 0.5, 2 * x, 0.5 / (1 - x))
  else:
    inverses = {
        'reciprocal': jnp.reciprocal,
        'log': jnp.exp,
        'exp': jnp.log,
        'sqrt': jnp.square,
        'square': jnp.sqrt,
    }
    fwd = fn
    inv = inverses[fn.__name__]

  s_near, s_far = fwd(t_near), fwd(t_far)
  t_to_s = lambda t: (fwd(t) - s_near) / (s_far - s_near)
  s_to_t = lambda s: inv(s * s_far + (1 - s) * s_near)
  return t_to_s, s_to_t


def expected_sin(mean, var):
  """E[sin(x)] for x ~ N(mean, var)."""
  return jnp.exp(-0.5 * var) * mathx.safe_sin(mean)


def integrated_pos_enc(mean, var, min_deg, max_deg):
  """Integrated positional encoding (mip-NeRF Eq 14).

  Encodes each coordinate with sin at scales 2^[min_deg, max_deg), attenuated
  by the Gaussian's variance at that scale; the cos half is sin shifted by
  pi/2 so one fused expected_sin covers both.

  Args:
    mean: [..., d] coordinate means.
    var:  [..., d] per-coordinate variances (diagonalized).
    min_deg, max_deg: frequency band [2^min_deg, 2^max_deg).

  Returns:
    [..., 2 * d * (max_deg - min_deg)] features.
  """
  scales = 2.0 ** jnp.arange(min_deg, max_deg)
  shape = mean.shape[:-1] + (-1,)
  sm = jnp.reshape(mean[..., None, :] * scales[:, None], shape)
  sv = jnp.reshape(var[..., None, :] * scales[:, None] ** 2, shape)
  return expected_sin(
      jnp.concatenate([sm, sm + 0.5 * jnp.pi], axis=-1),
      jnp.concatenate([sv, sv], axis=-1))


def lift_and_diagonalize(mean, cov, basis):
  """Project (mean, cov) onto `basis` columns, keeping only diag variances."""
  lifted_mean = mathx.matmul_hp(mean, basis)
  lifted_var = jnp.sum(basis * mathx.matmul_hp(cov, basis), axis=-2)
  return lifted_mean, lifted_var


def integrated_pos_enc_lifted(mean, cov, basis, min_deg, max_deg,
                              out_dtype=None):
  """Fused lift_and_diagonalize + integrated_pos_enc (TPU fast path).

  Folds the per-degree frequency scaling INTO the projection matrices:
      sin-args[f=(d,l)] = mean . (2^d b_l)        (one [., 3]x[3, D*L] matmul)
      vars[f=(d,l)]     = vec(cov) . (4^d b_l (x) b_l)   ([., 9]x[9, D*L])
  so the whole featurization is two flat matmuls plus elementwise exp/sin
  that XLA fuses into a handful of full-width passes — instead of the
  narrow [., L] intermediates + reshapes of the composed form (which cost
  ~4x more wall time on TPU).  Output is bit-identical in layout and equal
  to float tolerance to
      integrated_pos_enc(*lift_and_diagonalize(mean, cov, basis), ...).

  By default the per-degree transcendentals are replaced with double-angle /
  squaring recurrences (see ``_integrated_pos_enc_lifted_recurrence``); set
  ``MULTINERF_IPE_RECURRENCE=0`` for the direct exp/sin formulation.

  Args:
    mean: [..., 3] Gaussian means.
    cov:  [..., 3, 3] full covariances.
    basis: [3, L] projection basis (host-side numpy or jnp).
    min_deg, max_deg: frequency band.
    out_dtype: optional storage dtype for the returned features.  None
      keeps f32.  Pass jnp.bfloat16 when the consumer is a default-
      precision TPU matmul (which rounds its inputs to bf16 anyway): the
      cast is then numerically free and halves the feature tensor's HBM
      traffic.  The cast is the CALLER'S choice — this is a math utility
      and stays full precision unless asked.

  Returns:
    [..., 2 * L * (max_deg - min_deg)] features.
  """
  import os
  if (os.environ.get('MULTINERF_IPE_RECURRENCE', '1') != '0' and
      (max_deg - min_deg) > 2):
    return _integrated_pos_enc_lifted_recurrence(mean, cov, basis, min_deg,
                                                 max_deg, out_dtype=out_dtype)
  basis = np.asarray(basis)
  degs = np.arange(min_deg, max_deg)
  scales = 2.0 ** degs
  # [3, D*L], deg-major: columns (d*L + l) = 2^d * b[:, l].
  b_scaled = np.concatenate([basis * s for s in scales], axis=-1)
  # [9, D*L]: columns = 4^d * vec(b_l b_l^T).
  bb = np.einsum('ik,jk->ijk', basis, basis).reshape(9, basis.shape[-1])
  bb_scaled = np.concatenate([bb * (s * s) for s in scales], axis=-1)

  args = mathx.matmul_hp(mean, jnp.asarray(b_scaled, jnp.float32))
  cov_flat = cov.reshape(cov.shape[:-2] + (9,))
  var = mathx.matmul_hp(cov_flat, jnp.asarray(bb_scaled, jnp.float32))
  atten = jnp.exp(-0.5 * var)
  feats = jnp.concatenate(
      [atten * mathx.safe_sin(args),
       atten * mathx.safe_sin(args + 0.5 * jnp.pi)], axis=-1)
  return feats if out_dtype is None else feats.astype(out_dtype)


def _integrated_pos_enc_lifted_recurrence(mean, cov, basis, min_deg, max_deg,
                                          anchor_every=4, out_dtype=None):
  """Lifted IPE with degree recurrences instead of per-degree transcendentals.

  The frequency octaves are exact doublings, so adjacent degrees are related
  algebraically:

      sin(2^{d+1} a) = 2 sin(2^d a) cos(2^d a)
      cos(2^{d+1} a) = 1 - 2 sin^2(2^d a)
      exp(-4^{d+1} v / 2) = exp(-4^d v / 2) ** 4     (two squarings)

  Only every ``anchor_every``-th degree evaluates sin/cos/exp directly (which
  also bounds the recurrence's float drift at ~2^anchor_every * eps); the
  degrees in between are a handful of VPU multiplies.  This removes ~3/4 of
  the transcendental work in the forward pass and *all* of it from the
  backward pass (the cosines that d/dx sin needs already exist as recurrence
  state), on the op the reference evaluates literally per degree
  (google-research/multinerf internal/coord.py:107-133, math.py:26-38).

  The per-degree blocks are only L≈21 features wide, which would waste 5/6
  of each 128-lane VPU word, so everything here runs TRANSPOSED — [L, N]
  with the flattened batch in the lane dimension — and one final transpose
  restores the caller's layout (deg-major features, sin half then cos half,
  identical to the direct formulation).

  Args:
    mean: [..., 3] Gaussian means.
    cov:  [..., 3, 3] full covariances.
    basis: [3, L] projection basis (host-side numpy or jnp).
    min_deg, max_deg: frequency band.
    anchor_every: degrees between exact re-anchoring evaluations.

  Returns:
    [..., 2 * L * (max_deg - min_deg)] features.
  """
  basis = np.asarray(basis, np.float32)  # [3, L]
  num_dims = basis.shape[-1]
  num_degs = max_deg - min_deg
  batch_shape = mean.shape[:-1]

  base_scale = 2.0 ** min_deg
  basis_t = jnp.asarray(base_scale * basis.T)  # [L, 3]
  # [L, 9]: row l = vec(b_l b_l^T), so var = bb_t @ vec(cov).
  bb_t = jnp.asarray(
      (base_scale * base_scale) *
      np.einsum('ik,jk->kij', basis, basis).reshape(num_dims, 9))

  mean_flat = mean.reshape(-1, 3)
  cov_flat = cov.reshape(-1, 9)
  # Transposed projections: [L, N] with the big batch dim in the lanes.
  args0 = jnp.einsum('lk,nk->ln', basis_t, mean_flat,
                     precision=jax.lax.Precision.HIGHEST)
  var0 = jnp.einsum('lk,nk->ln', bb_t, cov_flat,
                    precision=jax.lax.Precision.HIGHEST)

  sins, coss = [], []
  s = c = e = None
  for d in range(num_degs):
    if d % anchor_every == 0:
      freq = 2.0 ** d
      a = args0 if d == 0 else freq * args0
      s, c = mathx.safe_sin(a), mathx.safe_cos(a)
      # Variances are >= 0 so the argument is <= 0: no overflow clamp needed.
      e = jnp.exp((-0.5 * freq * freq) * var0)
    else:
      s, c = 2.0 * (s * c), 1.0 - 2.0 * (s * s)
      e2 = e * e
      e = e2 * e2
    sins.append(e * s)
    coss.append(e * c)

  feat_t = jnp.concatenate(sins + coss, axis=0)  # [2*D*L, N], deg-major.
  if out_dtype is not None:
    # e.g. bf16 when the consumer is a default-precision TPU matmul (which
    # rounds to bf16 anyway): numerically free there, halves the HBM
    # traffic of the transpose and of the trunk's first layer.  Explicitly
    # the caller's choice (see integrated_pos_enc_lifted).
    feat_t = feat_t.astype(out_dtype)
  return feat_t.T.reshape(batch_shape + (2 * num_degs * num_dims,))


def pos_enc(x, min_deg, max_deg, append_identity=True):
  """Classic NeRF positional encoding (no integration)."""
  scales = 2.0 ** jnp.arange(min_deg, max_deg)
  shape = x.shape[:-1] + (-1,)
  sx = jnp.reshape(x[..., None, :] * scales[:, None], shape)
  # Unlike IPE this uses raw sin: inputs here are bounded (unit directions).
  feats = jnp.sin(jnp.concatenate([sx, sx + 0.5 * jnp.pi], axis=-1))
  if append_identity:
    return jnp.concatenate([x, feats], axis=-1)
  return feats
