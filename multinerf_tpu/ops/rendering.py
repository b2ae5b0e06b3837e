"""Ray casting (frustum -> Gaussian) and volumetric rendering.

Functional parity with ``internal/render.py`` of google-research/multinerf:
stable conical-frustum moment matching (render.py:44-78, Eq 7 of
arxiv.org/abs/2103.13415), cylinder moments (render.py:81-100), alpha
compositing weights with an opaque-background option (render.py:130-151),
and the full rendering dictionary (render.py:154-213).

Everything here is elementwise/cumsum chains over [rays, samples] blocks —
XLA fuses it well; the Pallas variants (fused with the loss terms) live in
``ops/pallas``.
"""

from __future__ import annotations

import jax.numpy as jnp

from multinerf_tpu.ops import stepfun

_F32_EPS = float(jnp.finfo(jnp.float32).eps)


def lift_gaussian(d, t_mean, t_var, r_var, diag):
  """Lift a 1D Gaussian along ray direction d into 3D (mean, cov).

  Decomposes the covariance into a component along d (t_var) and an isotropic
  component in the plane perpendicular to d (r_var).
  """
  mean = d[..., None, :] * t_mean[..., None]
  dir_sq_norm = jnp.maximum(1e-10, jnp.sum(d**2, axis=-1, keepdims=True))

  if diag:
    along_diag = d**2
    perp_diag = 1 - along_diag / dir_sq_norm
    cov_diag = (t_var[..., None] * along_diag[..., None, :] +
                r_var[..., None] * perp_diag[..., None, :])
    return mean, cov_diag

  along_outer = d[..., :, None] * d[..., None, :]
  eye = jnp.eye(d.shape[-1])
  perp_outer = eye - d[..., :, None] * (d / dir_sq_norm)[..., None, :]
  cov = (t_var[..., None, None] * along_outer[..., None, :, :] +
         r_var[..., None, None] * perp_outer[..., None, :, :])
  return mean, cov


def conical_frustum_to_gaussian(d, t0, t1, base_radius, diag, stable=True):
  """Moment-match a conical frustum along ray d to a Gaussian.

  `base_radius` is the cone radius at distance 1; d need not be unit length.
  The `stable` form (Eq 7, mip-NeRF) is reparameterized by the frustum
  midpoint/half-width to avoid catastrophic cancellation; stable=False keeps
  the textbook Eq 37-39 form for testing only.
  """
  if stable:
    mid = (t0 + t1) / 2
    half = (t1 - t0) / 2
    denom = jnp.maximum(_F32_EPS, 3 * mid**2 + half**2)
    t_mean = mid + (2 * mid * half**2) / denom
    t_var = half**2 / 3 - (4 / 15) * half**4 * (12 * mid**2 - half**2) / denom**2
    r_var = mid**2 / 4 + (5 / 12) * half**2 - (4 / 15) * half**4 / denom
  else:
    t_mean = (3 * (t1**4 - t0**4)) / (4 * (t1**3 - t0**3))
    r_var = 3 / 20 * (t1**5 - t0**5) / (t1**3 - t0**3)
    t_second_moment = 3 / 5 * (t1**5 - t0**5) / (t1**3 - t0**3)
    t_var = t_second_moment - t_mean**2
  r_var = r_var * base_radius**2
  return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cylinder_to_gaussian(d, t0, t1, radius, diag):
  """Moment-match a cylinder section along ray d to a Gaussian."""
  t_mean = (t0 + t1) / 2
  r_var = radius**2 / 4
  t_var = (t1 - t0)**2 / 12
  return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cast_rays(tdist, origins, directions, radii, ray_shape, diag=True):
  """Turn per-ray distance intervals into world-space Gaussians.

  Args:
    tdist: [..., s+1] fencepost distances along each ray.
    origins, directions: [..., 3] ray parameterization (directions unscaled).
    radii: [..., 1] base radii of the cone/cylinder footprint.
    ray_shape: 'cone' or 'cylinder'.
    diag: return diagonal covariances if True, else full 3x3.

  Returns:
    (means [..., s, 3], covs [..., s, 3{,3}]).
  """
  t0, t1 = tdist[..., :-1], tdist[..., 1:]
  if ray_shape == 'cone':
    to_gaussian = conical_frustum_to_gaussian
  elif ray_shape == 'cylinder':
    to_gaussian = cylinder_to_gaussian
  else:
    raise ValueError(f"ray_shape must be 'cone' or 'cylinder', got {ray_shape}")
  means, covs = to_gaussian(directions, t0, t1, radii, diag)
  means = means + origins[..., None, :]
  return means, covs


def compute_alpha_weights(density, tdist, dirs, opaque_background=False):
  """Alpha-compositing weights from densities over distance intervals.

  Returns (weights, alpha, transmittance).  With opaque_background the last
  interval is treated as infinitely wide so weights sum to exactly 1.
  """
  t_delta = tdist[..., 1:] - tdist[..., :-1]
  delta = t_delta * jnp.linalg.norm(dirs[..., None, :], axis=-1)
  optical_depth = density * delta

  if opaque_background:
    optical_depth = jnp.concatenate(
        [optical_depth[..., :-1],
         jnp.full_like(optical_depth[..., -1:], jnp.inf)], axis=-1)

  alpha = 1 - jnp.exp(-optical_depth)
  transmittance = jnp.exp(-jnp.concatenate(
      [jnp.zeros_like(optical_depth[..., :1]),
       jnp.cumsum(optical_depth[..., :-1], axis=-1)], axis=-1))
  weights = alpha * transmittance
  return weights, alpha, transmittance


def volumetric_rendering(rgbs, weights, tdist, bg_rgbs, t_far, compute_extras,
                         extras=None):
  """Composite per-sample colors/values into per-ray renderings.

  Args:
    rgbs: [..., s, 3] per-sample colors.
    weights: [..., s] compositing weights.
    tdist: [..., s+1] fencepost distances.
    bg_rgbs: background color(s), broadcastable to [..., 3].
    t_far: [..., 1] far plane (used as the final distance fencepost).
    compute_extras: also produce acc/distance stats and composited extras.
    extras: optional dict of [..., s, c] per-sample values to composite.

  Returns:
    dict with 'rgb' and, when compute_extras, 'acc', 'distance_mean',
    'distance_median', 'distance_percentile_{5,95}', plus composited extras.
  """
  rendering = {}

  acc = weights.sum(axis=-1)
  bg_weight = jnp.maximum(0, 1 - acc[..., None])
  rendering['rgb'] = (weights[..., None] * rgbs).sum(axis=-2) + bg_weight * bg_rgbs

  if compute_extras:
    rendering['acc'] = acc

    if extras is not None:
      for k, v in extras.items():
        if v is not None:
          rendering[k] = (weights[..., None] * v).sum(axis=-2)

    def acc_weighted_mean(x):
      return (weights * x).sum(axis=-1) / jnp.maximum(_F32_EPS, acc)
    midpoints = 0.5 * (tdist[..., :-1] + tdist[..., 1:])
    # Log-space expectation for stability over huge depth ranges.
    rendering['distance_mean'] = jnp.clip(
        jnp.nan_to_num(jnp.exp(acc_weighted_mean(jnp.log(midpoints))), nan=jnp.inf),
        tdist[..., 0], tdist[..., -1])

    # Pad with a far-plane fencepost carrying the background weight so the
    # weight vector sums to exactly 1 before taking percentiles.
    fence_dists = jnp.concatenate([tdist, t_far], axis=-1)
    fence_weights = jnp.concatenate([weights, bg_weight], axis=-1)
    ps = [5, 50, 95]
    pct = stepfun.weighted_percentile(fence_dists, fence_weights, ps)
    for i, p in enumerate(ps):
      name = 'median' if p == 50 else f'percentile_{p}'
      rendering[f'distance_{name}'] = pct[..., i]

  return rendering
