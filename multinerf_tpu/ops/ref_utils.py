"""Reflection directions and (integrated) directional encodings for Ref-NeRF.

Functional parity with ``internal/ref_utils.py`` of google-research/multinerf
(Eq 6-8 of arxiv.org/abs/2112.03907), with a TPU-first divergence: the
spherical-harmonic phase factor (x + iy)^m is evaluated with a *real-valued
recurrence* instead of complex powers (reference ref_utils.py:146).  TPU has
no native complex arithmetic — XLA decomposes complex64 into pairs of real
ops with redundant terms — whereas the recurrence is 4 fused VPU mul/adds
per order and is tested against scipy's spherical harmonics.
"""

from __future__ import annotations

import math as pymath

import jax.numpy as jnp
import numpy as np

from multinerf_tpu.ops import mathx


def reflect(viewdirs, normals):
  """Reflect view directions about unit normals: u = 2(n.v)n - v."""
  return 2.0 * jnp.sum(
      normals * viewdirs, axis=-1, keepdims=True) * normals - viewdirs


def l2_normalize(x, eps=float(jnp.finfo(jnp.float32).eps)):
  """Normalize x to unit length along the last axis (grad-safe at 0)."""
  return x / jnp.sqrt(jnp.maximum(jnp.sum(x**2, axis=-1, keepdims=True), eps))


def compute_weighted_mae(weights, normals, normals_gt):
  """Weighted mean angular error in degrees; normals assumed unit length."""
  one_eps = 1 - float(jnp.finfo(jnp.float32).eps)
  angles = jnp.arccos(
      jnp.clip((normals * normals_gt).sum(-1), -one_eps, one_eps))
  return (weights * angles).sum() / weights.sum() * 180.0 / jnp.pi


def generalized_binomial_coeff(a, k):
  """Generalized binomial coefficient C(a, k) for real a."""
  return np.prod(a - np.arange(k)) / pymath.factorial(k)


def assoc_legendre_coeff(l, m, k):
  """Coefficient of cos^k sin^m in the associated Legendre polynomial P_l^m."""
  return ((-1)**m * 2**l * pymath.factorial(l) / pymath.factorial(k) /
          pymath.factorial(l - k - m) *
          generalized_binomial_coeff(0.5 * (l + k + m - 1.0), l))


def sph_harm_coeff(l, m, k):
  """Real spherical harmonic coefficient for the (l, m, k) term."""
  return (np.sqrt(
      (2.0 * l + 1.0) * pymath.factorial(l - m) /
      (4.0 * np.pi * pymath.factorial(l + m))) * assoc_legendre_coeff(l, m, k))


def get_ml_array(deg_view):
  """All (m, l) pairs used by the encoding: l in {1,2,...,2^(deg-1)}, m<=l."""
  ml_list = []
  for i in range(deg_view):
    l = 2**i
    for m in range(l + 1):  # Nonnegative m; real/imag parts split later.
      ml_list.append((m, l))
  return np.array(ml_list).T


def generate_ide_fn(deg_view):
  """Build the integrated directional encoding (IDE) function.

  The IDE is the expectation of real spherical harmonics under a von
  Mises-Fisher distribution over directions: SH attenuated by
  exp(-sigma_l * kappa_inv) (Eq 6-8 of arxiv.org/abs/2112.03907).

  Args:
    deg_view: number of SH degree octaves (l = 1, 2, ..., 2^(deg_view-1)).

  Returns:
    fn(xyz [..., 3], kappa_inv [..., 1]) -> [..., 2 * num_components].
  """
  if deg_view > 5:
    raise ValueError('Only deg_view of at most 5 is numerically stable.')

  ml_array = get_ml_array(deg_view)
  l_max = 2**(deg_view - 1)

  # mat[k, i]: coefficient of z^k for component i; (vmz @ mat) gives the
  # z-dependent (polar) part of each SH component.
  mat = np.zeros((l_max + 1, ml_array.shape[1]))
  for i, (m, l) in enumerate(ml_array.T):
    for k in range(l - m + 1):
      mat[k, i] = sph_harm_coeff(l, m, k)

  m_per_col = ml_array[0, :]  # Azimuthal order of each component.
  sigma = 0.5 * ml_array[1, :] * (ml_array[1, :] + 1)  # vMF attenuation rate.

  def integrated_dir_enc_fn(xyz, kappa_inv):
    """IDE of directions xyz with vMF concentration 1/kappa_inv."""
    x = xyz[..., 0:1]
    y = xyz[..., 1:2]
    z = xyz[..., 2:3]

    # Polar part: Vandermonde in z against the coefficient matrix.
    vmz = jnp.concatenate([z**i for i in range(mat.shape[0])], axis=-1)
    polar = mathx.matmul_hp(vmz, jnp.asarray(mat))

    # Azimuthal part: Re/Im of (x + iy)^m via a real recurrence
    # (re,im)_{m+1} = (re*x - im*y, re*y + im*x) — 4 VPU ops per order
    # instead of complex64 power chains.
    re_pows = [jnp.ones_like(x)]
    im_pows = [jnp.zeros_like(x)]
    for _ in range(l_max):
      re, im = re_pows[-1], im_pows[-1]
      re_pows.append(re * x - im * y)
      im_pows.append(re * y + im * x)
    re_all = jnp.concatenate(re_pows, axis=-1)
    im_all = jnp.concatenate(im_pows, axis=-1)
    # Static (trace-time) column selection by azimuthal order m.
    re_m = re_all[..., m_per_col]
    im_m = im_all[..., m_per_col]

    atten = jnp.exp(-sigma * kappa_inv)
    return jnp.concatenate(
        [re_m * polar * atten, im_m * polar * atten], axis=-1)

  return integrated_dir_enc_fn


def generate_dir_enc_fn(deg_view):
  """Non-integrated directional encoding: IDE at zero inverse-concentration."""
  ide_fn = generate_ide_fn(deg_view)
  return lambda xyz: ide_fn(xyz, jnp.zeros_like(xyz[..., :1]))
