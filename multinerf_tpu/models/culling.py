"""Occupancy-grid empty-space culling for the final NeRF level.

The reference evaluates its widest MLP on every resampled interval of every
ray (google-research/multinerf internal/models.py:147-204) — on real scenes
most of that work lands in free space that contributes nothing to the
render.  This subsystem maintains a coarse density grid over the
*contraction* domain (``coord.contract`` maps all of space into the
radius-2 ball, so one fixed [-2, 2]^3 grid covers every scene
parameterization), updated online from the training samples themselves and
periodically refreshed by probing the density MLP at cell centers, and
evaluates the NerfMLP only on samples whose cell clears a density
threshold.

TPU-first mechanics: jit needs static shapes, so per-step culling is a
batch-wide *compaction to fixed capacity* — a cumsum over the keep mask
assigns each kept sample a slot in a ``capacity``-sized buffer, the MLP runs
on the compact buffer, and a trash-slot gather scatters results back (culled
samples read a fill value: raw density -> 0 after activation, rgb -> 0, so
they drop out of volumetric rendering exactly).  Everything is
gather/scatter + one cumsum; the savings are the (1 - capacity_frac) of
8x1024 NerfMLP matmul FLOPs that never run.

All of it is gated behind ``Config.occupancy_culling`` (off by default: it
changes the *work*, not the math, and needs quality validation per scene
family — see tests/test_culling.py for the dummy-scene PSNR evidence).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from multinerf_tpu.ops import coord


def cell_ids(means, resolution: int):
  """Map world-space points to flat grid-cell ids via the contraction.

  Args:
    means: [..., 3] sample positions (unwarped world space).
    resolution: grid resolution R (grid covers [-2, 2]^3 contracted space).

  Returns:
    [...] int32 flat cell ids in [0, R^3).
  """
  z = coord.contract(means)  # All of space -> radius-2 ball.
  u = (z + 2.0) * (resolution / 4.0)
  ijk = jnp.clip(u.astype(jnp.int32), 0, resolution - 1)
  return (ijk[..., 0] * resolution + ijk[..., 1]) * resolution + ijk[..., 2]


def lookup(grid, means, resolution: int):
  """Gather per-sample grid densities ([...] floats) at sample positions."""
  return grid[cell_ids(means, resolution)]


def keep_mask(occ, config, t_edges=None, dirs=None):
  """Per-sample keep decision from looked-up cell occupancies.

  Two rules (``Config.occupancy_keep_rule``):

  * ``'density'``: occ > occupancy_threshold.  A single global density
    threshold — simple, but mis-calibrated for unbounded scenes: in the
    contraction domain one far-shell cell spans a huge world volume, so a
    fixed density cut prices a meter of near content the same as a
    kilometer of background.
  * ``'alpha'``: keep iff the sample's own interval could contribute more
    than ``occupancy_alpha_eps`` of alpha:  1 - exp(-occ * delta) > eps,
    i.e. occ * delta > -log1p(-eps), with delta the interval's world-space
    length (same delta as rendering.compute_alpha_weights:110-112).  This
    is the principled per-sample bound: occ is the cell's EMA-max density,
    an overestimate of the sample's density, so a skipped sample's true
    alpha is < eps — each skip perturbs the composited color by less than
    eps (times transmittance).  Wide far-field intervals automatically get
    a proportionally lower density cut; narrow near-field intervals a
    higher one, which is what lowers keep fractions on dense scenes.

  Args:
    occ: [..., S] looked-up cell occupancy densities.
    config: Config (occupancy_keep_rule / threshold / alpha_eps).
    t_edges: [..., S+1] interval edges in ray-t units ('alpha' rule only).
    dirs: [..., 3] UNNORMALIZED ray directions ('alpha' rule only).

  Returns:
    [..., S] bool keep mask.
  """
  if config.occupancy_keep_rule == 'alpha':
    t_delta = t_edges[..., 1:] - t_edges[..., :-1]
    delta = t_delta * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    return occ * delta > -np.log1p(-config.occupancy_alpha_eps)
  if config.occupancy_keep_rule != 'density':
    raise ValueError(
        f'Unknown occupancy_keep_rule {config.occupancy_keep_rule!r}; '
        "expected 'density' or 'alpha'.")
  return occ > config.occupancy_threshold


def update_grid(grid, cells, densities, decay: float):
  """EMA-max occupancy update from a batch of evaluated samples.

  grid <- max(decay * grid, max over batch samples landing in each cell).
  Cells nothing landed in simply decay, so stale geometry fades out; the
  periodic ``refresh_grid`` probe is what lets culled cells recover.
  """
  densities = jax.lax.stop_gradient(densities)
  hit = jnp.zeros_like(grid).at[cells.reshape(-1)].max(densities.reshape(-1))
  return jnp.maximum(grid * decay, hit)


def make_refresh_fn(model, config, mesh=None, jit=True):
  """Whole-grid refresh: probe the NerfMLP density at cell centers.

  Recovery path for wrongly-culled cells (their samples never reach the MLP
  again, so the online update alone can only decay them).  Costs one
  density-trunk evaluation per grid cell — amortized over
  ``occupancy_grid_refresh_every`` steps it is <1% of training compute.

  Returns a function (variables, rng) -> new_grid; ``jit=False`` returns
  the raw python function for embedding into a larger jit (the scan-stepped
  device data plane runs it under lax.cond inside the scan body).
  """
  resolution = config.occupancy_grid_resolution
  num_cells = resolution ** 3
  cell_size = 4.0 / resolution

  def refresh(variables, rng):
    ids = jnp.arange(num_cells, dtype=jnp.int32)
    k = ids % resolution
    j = (ids // resolution) % resolution
    i = ids // (resolution * resolution)
    centers_c = (jnp.stack([i, j, k], axis=-1) + 0.5) * cell_size - 2.0
    # Jitter within the cell so repeated refreshes probe different points.
    centers_c += jax.random.uniform(
        rng, centers_c.shape, minval=-0.5, maxval=0.5) * cell_size
    # The MLP featurizes in world space (it applies its own warp); the grid
    # is indexed in contracted space, so probe at the uncontracted centers.
    # Guard the inverse against the contraction boundary.
    r = jnp.linalg.norm(centers_c, axis=-1, keepdims=True)
    centers_c = jnp.where(r < 1.98, centers_c, centers_c * (1.98 / r))
    means = coord.inv_contract(centers_c)
    covs = jnp.broadcast_to(
        (0.25 * cell_size) ** 2 * jnp.eye(3), means.shape + (3,))
    # Density-only probe clone: the skipped rgb/view-branch Dense calls come
    # AFTER the trunk+density head in call order, so the trunk's flax
    # auto-numbered param names still line up with the trained ones.
    from multinerf_tpu import ginlite
    mlp = ginlite.make('NerfMLP').clone(
        disable_rgb=True, disable_density_normals=True)
    if 'NerfMLP_0' not in variables['params']:
      raise KeyError(
          "Occupancy grid refresh expects the final-level MLP under "
          "params['NerfMLP_0'] (flax auto-naming of Model's first NerfMLP); "
          f"found {sorted(variables['params'])}. If Model renamed its MLPs, "
          'update culling.make_refresh_fn to match.')
    density = mlp.apply(
        {'params': variables['params']['NerfMLP_0']},
        None, (means[:, None, :], covs[:, None, :, :]))['density'][:, 0]
    old = variables['occupancy']['grid']
    return jnp.maximum(old * config.occupancy_grid_decay, density)

  del model  # The probe is rebuilt from gin so it always matches NerfMLP.
  return jax.jit(refresh) if jit else refresh


import functools


def _shear_flat(x2, b: int, s: int):
  """[b, s] -> [n] in the diagonal-interleave order, gather-free.

  out[q * b + r] = x2[r, (q + r) % s] — the same sequence a gather by
  ``_interleave_perm(b, s)[0]`` produces, but built from s static slices
  of a doubled transpose (per-element gathers of [n] arrays are
  HBM-sector-bound on TPU, ~1 ms per 131k elements; these slices are
  bandwidth-priced).  Requires b % s == 0.
  """
  g = b // s
  xt = x2.T  # [s, b]
  d = jnp.concatenate([xt, xt], axis=0).reshape(2 * s, g, s)
  cols = [d[j:j + s, :, j] for j in range(s)]  # each [s, g]
  return jnp.stack(cols, axis=-1).reshape(-1)  # [s, g, s(j)] -> [n]


def _unshear_flat(y, b: int, s: int):
  """Inverse of ``_shear_flat``: [n] interleave order -> [n] sample order.

  out[r * s + jj] = y[((jj - r) % s) * b + r].  Requires b % s == 0.
  """
  g = b // s
  sp = y.reshape(s, b)  # [q, r]
  e = jnp.concatenate([sp, sp], axis=0).reshape(2 * s, g, s)
  cols = [e[(s - j) % s:(s - j) % s + s, :, j] for j in range(s)]
  z3 = jnp.stack(cols, axis=-1)  # [jj, t, j]
  return z3.transpose(1, 2, 0).reshape(-1)  # [(t, j) = r, jj] -> [n]


@functools.lru_cache(maxsize=8)
def _interleave_perm(b: int, s: int):
  """Static diagonal-interleave permutation (and inverse) for [b, s] flat.

  Position i of the permuted order visits ray (i % b), sample
  ((i // b + i % b) % s).  Host-side numpy: both directions are
  constant-index gathers under jit.
  """
  i = np.arange(b * s)
  r = i % b
  perm = (r * s + (i // b + r) % s).astype(np.int32)
  inv_perm = np.zeros_like(perm)
  inv_perm[perm] = i.astype(np.int32)
  return perm, inv_perm


@jax.custom_vjp
def _gather_rows(ext, slot, inv):
  """ext[slot] with a gather-based VJP.

  The compaction's slot map is injective below the trash slot and ``inv``
  is its exact inverse (every slot < cap has exactly one writer — kept
  samples first, refill after), so the cotangent of ``ext`` rows 0..cap-1
  is simply ``g[inv]`` — a [cap]-row gather instead of the [n]-element
  scatter-add autodiff would emit (measured 1.3 ms at the flagship batch).
  Row cap is the constant fill row; its cotangent is discarded.
  """
  return ext[slot]


def _gather_rows_fwd(ext, slot, inv):
  return ext[slot], (slot, inv)


def _gather_rows_bwd(res, g):
  slot, inv = res
  d_rows = g[inv]  # [cap, ...]
  d_ext = jnp.concatenate(
      [d_rows, jnp.zeros_like(d_rows[:1])], axis=0)
  return d_ext, None, None


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def _round_capacity(n: int, frac: float) -> int:
  """Static compact-buffer size: a multiple of 256, in [256, n]."""
  c = int(n * frac)
  c = max(256, (c // 256) * 256)
  return min(c, n)


def apply_culled(mlp, key, gaussians, keep, capacity_frac: float,
                 viewdirs=None, imageplane=None, glo_vec=None,
                 exposure=None, cells=None) -> Dict[str, Any]:
  """Run `mlp` on the kept samples only, compacted to a static capacity.

  Args:
    mlp: the MLP module (bound call signature as in models/mlp.py).
    key: rng for the MLP's stochastic bits.
    gaussians: (means [B, S, 3], covs [B, S, 3, 3]).
    keep: [B, S] bool — samples whose cell clears the occupancy threshold.
    capacity_frac: compact buffer size as a fraction of B*S.  Kept samples
      beyond capacity are dropped in a diagonally interleaved order (spread
      across rays and depths); train.py's self-gating keeps this regime
      rare by only engaging culling while the measured keep fraction fits
      the capacity.
    viewdirs/imageplane/glo_vec/exposure: per-RAY conditioning ([B, ...]),
      gathered per compacted sample.
    cells: optional [B, S] int32 occupancy-cell ids.  When given, the
      output carries COMPACT grid-update feedback ('occ_cells' /
      'occ_density' over the [capacity] evaluated samples only) — the
      culled samples' zero densities contribute nothing to the EMA-max
      update, so scattering them is pure overhead (~0.6 ms at the
      flagship batch).

  Returns:
    ray_results dict with every field scattered back to [B, S, ...]; culled
    samples (those not among the `capacity` evaluated: kept samples first,
    spare slots refilled with below-threshold samples) hold density 0 /
    rgb 0 / zero aux fields.  'occ_keep_frac' reports the fraction of
    samples whose cell cleared the threshold (the number to watch when
    tuning capacity).
  """
  means, covs = gaussians
  batch_shape = means.shape[:-2]
  s = means.shape[-2]
  means = means.reshape((-1, s, 3))
  covs = covs.reshape((-1, s, 3, 3))
  keep = keep.reshape((-1, s))
  flatten_ray = lambda x: None if x is None else x.reshape(
      (-1,) + x.shape[len(batch_shape):])
  viewdirs = flatten_ray(viewdirs)
  imageplane = flatten_ray(imageplane)
  glo_vec = flatten_ray(glo_vec)
  exposure = flatten_ray(exposure)
  b = means.shape[0]
  n = b * s
  cap = _round_capacity(n, capacity_frac)

  keep_flat = keep.reshape(n)

  # Slot assignment runs in a diagonally interleaved order: position i
  # visits ray (i % b), sample (i // b + i % b) % s.  When more samples are
  # kept than the capacity holds, the overflow therefore drops a subset
  # SPREAD across rays AND sample depths — never every sample of the
  # trailing rays (which would zero whole pixels each step and wreck
  # training), and never systematically the far samples.
  # The permutation (and its inverse) are pure functions of the static
  # shape: slice-built shears when b % s == 0 (the production regime),
  # constant-index gathers otherwise.
  perm, inv_perm = _interleave_perm(b, s)
  shearable = b % s == 0
  if shearable:
    keep_p = _shear_flat(keep, b, s)
  else:
    keep_p = keep_flat[perm]
  pos = jnp.cumsum(keep_p) - 1
  kept_p = keep_p & (pos < cap)
  # Spare-capacity refill: slots the kept samples don't use evaluate
  # below-threshold samples instead of idling.  Those samples keep
  # receiving gradients and their cells keep receiving grid updates, so a
  # stale grid self-heals and the worst case (nothing kept) degrades to
  # "evaluate an arbitrary capacity-sized subset", never to a black frame.
  num_kept = jnp.minimum(pos[-1] + 1, cap)
  pos_fill = num_kept + jnp.cumsum(~keep_p) - 1
  fill_p = (~keep_p) & (pos_fill < cap)
  slot_p = jnp.where(
      kept_p, pos, jnp.where(fill_p, pos_fill, cap)).astype(jnp.int32)
  # Back to sample order: slot[perm[i]] = slot_p[i]  ==  slot_p[inv_perm].
  slot = _unshear_flat(slot_p, b, s) if shearable else slot_p[inv_perm]

  # Inverse map: slot -> flat sample index.
  inv = jnp.zeros((cap + 1,), jnp.int32).at[slot_p].set(
      jnp.asarray(perm), mode='drop')[:cap]
  ray_idx = inv // s

  # ONE dynamic row gather for all 12 floats of sample geometry (two
  # separate [cap, 3] / [cap, 3, 3] gathers cost ~2x on TPU: random row
  # gathers are sector-bound, not byte-bound).
  packed = jnp.concatenate(
      [means.reshape(n, 3), covs.reshape(n, 9)], axis=-1)
  c_packed = packed[inv]
  c_means = c_packed[:, None, :3]
  c_covs = c_packed[:, 3:].reshape(cap, 1, 3, 3)

  # Per-ray conditioning: flatten leading ray dims, gather by ray index.
  gather_ray = lambda x: None if x is None else x.reshape(
      (b,) + x.shape[1:])[ray_idx]

  results = mlp(
      key,
      (c_means, c_covs),
      viewdirs=gather_ray(viewdirs),
      imageplane=gather_ray(imageplane),
      glo_vec=gather_ray(glo_vec),
      exposure=gather_ray(exposure),
  )

  fills = {'density': 0.0, 'rgb': 0.0, 'raw_grad_density': 0.0,
           'grad_pred': 0.0, 'normals': 0.0, 'normals_pred': 0.0,
           'roughness': 0.0}

  # Scatter-back: pack every same-dtype vector/scalar field into ONE
  # [cap + 1, C] buffer (fill row last) and do a single dynamic row gather,
  # then split columns.  Separate narrow gathers are sector-bound.
  packable, rest = [], {}
  for name, val in results.items():
    if val is None:
      rest[name] = None
      continue
    flat = val.reshape((cap,) + val.shape[2:])  # Drop the size-1 sample dim.
    if flat.ndim <= 2 and flat.dtype == jnp.float32:
      packable.append((name, flat.reshape(cap, -1), flat.shape[1:]))
    else:
      rest[name] = flat

  out = {}
  if packable:
    cols = jnp.concatenate([f for _, f, _ in packable], axis=-1)
    fill_row = jnp.concatenate(
        [jnp.full((1, f.shape[-1]), fills.get(nm, 0.0), jnp.float32)
         for nm, f, _ in packable], axis=-1)
    gathered = _gather_rows(
        jnp.concatenate([cols, fill_row], axis=0), slot, inv)
    ofs = 0
    for name, f, shape in packable:
      w = f.shape[-1]
      out[name] = gathered[:, ofs:ofs + w].reshape(
          batch_shape + (s,) + shape)
      ofs += w
  for name, flat in rest.items():
    if flat is None:
      out[name] = None
      continue
    fill = jnp.full((1,) + flat.shape[1:], fills.get(name, 0.0), flat.dtype)
    ext = jnp.concatenate([flat, fill], axis=0)  # [cap + 1, ...]
    out[name] = _gather_rows(ext, slot, inv).reshape(
        batch_shape + (s,) + flat.shape[1:])
  out['occ_keep_frac'] = jnp.mean(keep_flat.astype(jnp.float32))
  if cells is not None:
    out['occ_cells'] = cells.reshape(n)[inv]
    out['occ_density'] = jax.lax.stop_gradient(
        results['density'].reshape(cap))
  return out
