"""Fused Gaussian-sample featurization (contract -> lift -> IPE) kernel.

The per-level featurization chain — analytic contraction warp of each sample
Gaussian, projection onto the geodesic basis, and integrated positional
encoding (reference coord.py:39-133 feeding models.py:441-452) — is pure
elementwise/transcendental work, but in XLA it materializes ~10 intermediate
[rays*samples, 2*L*D]-sized tensors in HBM (~9.5ms per proposal level on
v5e; the widest tensors are 0.5 GB).

This kernel computes the whole chain VMEM-resident per tile of samples and
writes ONLY the final feature tensor, so the op is bounded by the output
write (plus ~0.3ms of VPU transcendentals).

Gradient policy: in every ``disable_density_normals`` configuration (360,
blender, llff, raw) no gradient flows into means/covs — the sample positions
are downstream of a stop_gradient (models.py:200-201 in the reference) and
ray geometry is data.  The kernel therefore ships forward-only and cuts
gradients at its inputs; Ref-NeRF (density-gradient normals differentiate
the chain w.r.t. means) keeps the jnp path.

Feature layout matches ``coord.integrated_pos_enc`` exactly:
[sin(2^0 lm)...sin(2^{D-1} lm) | cos(2^0 lm)...], each block deg-major over
the L basis directions — equivalence-tested in tests/test_pallas_featurize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32_EPS = float(jnp.finfo(jnp.float32).eps)
_TRIG_PERIOD = 100.0 * np.pi


def _safe_sin(x):
  return jnp.sin(jnp.where(jnp.abs(x) < _TRIG_PERIOD, x, x % _TRIG_PERIOD))


def _tile_features(m, c9, basis, min_deg, max_deg, use_contract):
  """Featurize one tile: m [T, 3], c9 [T, 9] (row-major cov), basis [3, L]."""
  cols_m = [m[:, i:i + 1] for i in range(3)]
  cols_c = [c9[:, i:i + 1] for i in range(9)]

  if use_contract:
    # Analytic contract() Gaussian warp (see ops.coord.contract_gaussian):
    # outside the unit ball f(x) = g x, J = g I + k x x^T,
    # g = (2r-1)/r^2, k = (2-2r)/r^4;  cov' = J cov J^T.
    r_sq = jnp.maximum(_F32_EPS,
                       sum(cols_m[i] * cols_m[i] for i in range(3)))
    r = jnp.sqrt(r_sq)
    g = (2 * r - 1) / r_sq
    k = (2 - 2 * r) / (r_sq * r_sq)
    inside = r_sq <= 1.0

    # mvec = cov @ x ;  xcx = x^T cov x.
    mvec = [sum(cols_c[3 * i + j] * cols_m[j] for j in range(3))
            for i in range(3)]
    xcx = sum(cols_m[i] * mvec[i] for i in range(3))

    new_c = []
    for i in range(3):
      for j in range(3):
        cij = (g * g * cols_c[3 * i + j] +
               g * k * (cols_m[i] * mvec[j] + mvec[i] * cols_m[j]) +
               k * k * xcx * cols_m[i] * cols_m[j])
        new_c.append(jnp.where(inside, cols_c[3 * i + j], cij))
    cols_c = new_c
    cols_m = [jnp.where(inside, cols_m[i], g * cols_m[i]) for i in range(3)]

  # Lift onto the basis with explicit f32 mul-adds (full precision, no MXU
  # bf16 passes): lm_k = sum_i m_i B_ik ; lv_k = sum_ij B_ik B_jk cov_ij.
  b_rows = [basis[i:i + 1, :] for i in range(3)]  # each [1, L]
  lm = sum(cols_m[i] * b_rows[i] for i in range(3))  # [T, L]
  lv = 0.0
  for i in range(3):
    for j in range(3):
      lv = lv + (b_rows[i] * b_rows[j]) * cols_c[3 * i + j]

  # IPE: E[sin(2^d lm)] = exp(-0.5 4^d lv) sin(2^d lm); cos = sin(x + pi/2).
  sin_parts = []
  cos_parts = []
  for d in range(min_deg, max_deg):
    scale = float(2.0 ** d)
    sm = lm * scale
    atten = jnp.exp(-0.5 * scale * scale * lv)
    sin_parts.append(atten * _safe_sin(sm))
    cos_parts.append(atten * _safe_sin(sm + 0.5 * np.pi))
  return jnp.concatenate(sin_parts + cos_parts, axis=-1)


def _featurize_kernel(m_ref, c9_ref, basis_ref, out_ref, *, min_deg, max_deg,
                      use_contract, out_dtype):
  feats = _tile_features(m_ref[:], c9_ref[:], basis_ref[:], min_deg, max_deg,
                         use_contract)
  out_ref[:] = feats.astype(out_dtype)


def _pick_tile(n: int) -> int:
  # Mosaic stacks the unrolled per-degree temporaries in VMEM; 256 rows
  # keeps a max_deg=16 icosahedron featurization comfortably under 16M.
  for tile in (256, 128, 64, 32, 16, 8):
    if n % tile == 0:
      return tile
  return n


@functools.partial(
    jax.jit,
    static_argnames=('min_deg', 'max_deg', 'use_contract', 'out_dtype',
                     'interpret'))
def fused_ipe_features(means, covs, basis, min_deg=0, max_deg=12,
                       use_contract=True, out_dtype=jnp.float32,
                       interpret=False):
  """(means [..., 3], covs [..., 3, 3], basis [3, L]) -> [..., 2*L*D].

  Forward-only (gradients are cut at the inputs; see module docstring).
  """
  means = jax.lax.stop_gradient(means)
  covs = jax.lax.stop_gradient(covs)
  batch_shape = means.shape[:-1]
  n = int(np.prod(batch_shape))
  m2 = means.reshape(n, 3)
  c9 = covs.reshape(n, 9)
  L = basis.shape[-1]
  D = max_deg - min_deg
  F = 2 * L * D

  tile = _pick_tile(n)
  kernel = functools.partial(
      _featurize_kernel, min_deg=min_deg, max_deg=max_deg,
      use_contract=use_contract, out_dtype=out_dtype)
  out = pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((n, F), out_dtype),
      grid=(n // tile,),
      in_specs=[
          pl.BlockSpec((tile, 3), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile, 9), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((3, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((tile, F), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      interpret=interpret,
  )(m2, c9, jnp.asarray(basis, jnp.float32))
  return out.reshape(batch_shape + (F,))


def reference_ipe_features(means, covs, basis, min_deg=0, max_deg=12,
                           use_contract=True):
  """jnp twin of fused_ipe_features (the pre-fusion pipeline)."""
  from multinerf_tpu.ops import coord
  if use_contract:
    means, covs = coord.track_linearize(coord.contract, means, covs)
  lm, lv = coord.lift_and_diagonalize(means, covs, basis)
  return coord.integrated_pos_enc(lm, lv, min_deg, max_deg)
