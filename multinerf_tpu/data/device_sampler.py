"""Device-resident training data plane.

The reference streams ray batches from a host thread (numpy ray casting +
H2D copy of ~60 bytes/ray, datasets.py:451-504 + utils.py:125-128 of
google-research/multinerf); its fastest mode still ships compact pixel
records from the host each step (``cast_rays_in_train_step``).

This module removes the host from the steady-state loop entirely: the whole
image set and the camera table live in HBM, and each training step — inside
the same jit as the model — draws pixel coordinates with the on-device
threefry PRNG, gathers RGB supervision, and casts rays.  The host's only
per-step job is bumping a scalar.  Multi-host runs give each process its own
image shard (sampling is process-local, like the reference's per-host numpy
seeds, train.py:48).

Generalizes the reference's ``cast_rays_in_train_step`` fast path
(datasets.py:431-433, train_utils.py:267-268) to the full batch pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multinerf_tpu.data import cameras as camera_lib
from multinerf_tpu.data import raw
from multinerf_tpu.data import types


class DeviceDataPlane:
  """Holds a dataset's images/cameras in HBM and samples batches in-jit."""

  def __init__(self, dataset, config, mesh=None):
    """Upload a loaded Dataset's arrays to device.

    Args:
      dataset: a data.datasets.Dataset (train split) whose images fit HBM.
      config: the framework Config.
      mesh: optional mesh; images are replicated (they are read-only).
    """
    self.config = config
    self.camtype = dataset.camtype
    self._patch_size = max(config.patch_size, 1)
    self._batch_size = config.batch_size // jax.process_count()
    self._num_patches = self._batch_size // self._patch_size**2
    self._n_images = dataset.images.shape[0]
    self._height = dataset.height
    self._width = dataset.width
    self._border = config.num_border_pixels_to_mask
    self._single_image = config.batching == 'single_image'
    self._apply_bayer_mask = config.apply_bayer_mask
    self.near = dataset.near
    self.far = dataset.far

    put = jnp.asarray
    self.images = put(dataset.images.astype(np.float32))
    self.cameras = tuple(
        put(x) if isinstance(x, np.ndarray) else x for x in dataset.cameras)
    self.exposures = (None if dataset.exposures is None
                      else put(dataset.exposures))
    self.metadata = None
    if dataset.metadata is not None:
      self.metadata = {
          k: put(dataset.metadata[k])
          for k in ['exposure_idx', 'exposure_values']
      }

  def sample_batch(self, rng) -> types.Batch:
    """Draw one training batch fully on device (call inside jit).

    Returns a Batch whose rays are fully cast (world-space Rays).
    """
    key_cam, key_x, key_y = jax.random.split(rng, 3)
    ps = self._patch_size
    n_patches = self._num_patches

    lower = self._border
    upper_x = self._width - self._border - ps + 1
    upper_y = self._height - self._border - ps + 1
    pix_x = jax.random.randint(key_x, (n_patches, 1, 1), lower, upper_x)
    pix_y = jax.random.randint(key_y, (n_patches, 1, 1), lower, upper_y)
    dx = jnp.arange(ps)[None, None, :]
    dy = jnp.arange(ps)[None, :, None]
    pix_x = pix_x + dx  # [P, 1, ps] -> broadcast [P, ps, ps]
    pix_y = pix_y + dy
    pix_x = jnp.broadcast_to(pix_x, (n_patches, ps, ps))
    pix_y = jnp.broadcast_to(pix_y, (n_patches, ps, ps))

    if self._single_image:
      cam_idx = jnp.broadcast_to(
          jax.random.randint(key_cam, (1,), 0, self._n_images)[0],
          (n_patches, 1, 1))
    else:
      cam_idx = jax.random.randint(key_cam, (n_patches, 1, 1), 0,
                                   self._n_images)
    cam_idx_b = jnp.broadcast_to(cam_idx, (n_patches, ps, ps))

    rgb = self.images[cam_idx_b, pix_y, pix_x]

    broadcast_scalar = lambda x: jnp.broadcast_to(
        x, (n_patches, ps, ps))[..., None]
    if self._apply_bayer_mask:
      lossmult = raw.pixels_to_bayer_mask(pix_x, pix_y, xnp=jnp)
    else:
      lossmult = broadcast_scalar(1.0)

    ray_kwargs = dict(
        lossmult=lossmult,
        near=broadcast_scalar(self.near),
        far=broadcast_scalar(self.far),
        cam_idx=broadcast_scalar(cam_idx).astype(jnp.int32),
    )
    if self.metadata is not None:
      for k in ['exposure_idx', 'exposure_values']:
        ray_kwargs[k] = broadcast_scalar(self.metadata[k][cam_idx_b])
    elif self.exposures is not None:
      ray_kwargs['exposure_values'] = broadcast_scalar(
          self.exposures[cam_idx_b])

    pixels = types.Pixels(pix_x, pix_y, **ray_kwargs)
    rays = camera_lib.cast_ray_batch(self.cameras, pixels, self.camtype,
                                     xnp=jnp)
    return types.Batch(rays=rays, rgb=rgb)


def create_device_train_step(model, config, plane: DeviceDataPlane, mesh):
  """Jit a training step that samples its own batch from HBM.

  The returned step takes (rng, state, train_frac, loss_threshold) only;
  there is no host batch argument at all.
  """
  from multinerf_tpu import train_lib
  from multinerf_tpu.parallel import mesh as mesh_lib

  base_step = train_lib.create_train_step(model, config, mesh, jit=False,
                                          stats_arg=True)

  def step(rng, state, train_frac, loss_threshold, compute_stats):
    rng, key = jax.random.split(rng)
    batch = plane.sample_batch(key)
    return base_step(rng, state, batch, train_frac, loss_threshold,
                     compute_stats)

  repl = mesh_lib.replicated(mesh)
  return jax.jit(step, in_shardings=(repl, None, None, None, None),
                 donate_argnums=(0, 1))


def create_scan_train_step(model, config, plane: DeviceDataPlane, mesh,
                           num_steps: int):
  """Jit `num_steps` whole optimizer steps as ONE lax.scan.

  Only possible with the device data plane (no per-step host input): the
  scan body samples its batch, runs fwd/bwd/adam, and threads state + rng.
  Removes all per-step host dispatch; stats come back stacked [num_steps,...]
  (the caller's print window should be a multiple of num_steps).

  train_frac is interpolated linearly across the inner steps from the
  (start_step, max_steps) pair passed at call time.

  With ``Config.occupancy_culling`` the whole culling protocol runs
  device-side inside the scan: the full step and one culled step per
  capacity-ladder rung are compiled, a ``lax.switch`` picks per inner step,
  the periodic density-grid refresh runs under its own cond at the
  configured cadence, and self-gating (engage the smallest rung whose
  capacity fits the measured keep fraction, uncull above the top rung)
  updates a carried branch index at refresh steps — the exact protocol
  train.py runs host-side at scan_steps == 1.
  """
  from multinerf_tpu import train_lib
  from multinerf_tpu.models import culling
  from multinerf_tpu.parallel import mesh as mesh_lib

  base_step = train_lib.create_train_step(model, config, mesh, jit=False,
                                          stats_arg=True)
  cull = bool(config.occupancy_culling)
  if cull:
    ladder = tuple(sorted(config.occupancy_capacity_ladder or
                          (config.occupancy_capacity_frac,)))
    step_variants = [base_step] + [
        train_lib.create_train_step(model, config, mesh, jit=False, cull=cap,
                                    stats_arg=True)
        for cap in ladder]
    ladder_caps = np.asarray(ladder, np.float32)
    refresh = culling.make_refresh_fn(model, config, mesh, jit=False)

  def multi_step(rng, state, start_step, loss_threshold, cull_idx):
    def body(carry, i):
      rng, state, loss_threshold, cull_idx = carry
      rng, key = jax.random.split(rng)
      batch = plane.sample_batch(key)
      step_i = start_step + i
      train_frac = jnp.clip((step_i - 1) / (config.max_steps - 1), 0, 1)
      # Whole-tree statistics (grad/weight/update norms) only on the steps
      # whose values the TB contract actually logs (train.py print cadence);
      # the lax.cond inside the step skips ~3 ms of HBM passes elsewhere.
      # Also on each window's FIRST step (i == 0) so a resume-misaligned
      # flush window always contains at least one computed row — train.py's
      # decimation mask marks the same rows.
      compute_stats = ((step_i % config.print_every == 0) |
                       (step_i == 1) | (i == 0))
      if cull:
        branch = jnp.where(step_i > config.occupancy_warmup_steps,
                           cull_idx, 0)
        state, stats, rng = jax.lax.switch(
            branch, step_variants,
            rng, state, batch, train_frac, loss_threshold, compute_stats)
        at_refresh = step_i % config.occupancy_grid_refresh_every == 0
        rng, key_probe = jax.random.split(rng)
        new_grid = jax.lax.cond(
            at_refresh,
            lambda p, k: refresh(p, k),
            lambda p, k: p['occupancy']['grid'],
            state.params, key_probe)
        state = state.replace(
            params={**state.params, 'occupancy': {'grid': new_grid}})
        # Smallest fitting rung (ladder sorted ascending; argmax finds the
        # first True); 0 = uncull when even the top rung is too small.
        fits = stats['occ_keep_frac'] <= ladder_caps
        fitted_idx = jnp.where(jnp.any(fits),
                               1 + jnp.argmax(fits), 0).astype(jnp.int32)
        cull_idx = jnp.where(at_refresh, fitted_idx, cull_idx)
      else:
        state, stats, rng = base_step(rng, state, batch, train_frac,
                                      loss_threshold, compute_stats)
      if config.enable_robustnerf_loss:
        loss_threshold = stats['loss_threshold']
      return (rng, state, loss_threshold, cull_idx), stats

    carry = (rng, state, loss_threshold,
             jnp.asarray(cull_idx, jnp.int32))
    (rng, state, loss_threshold, cull_idx), stats = jax.lax.scan(
        body, carry, jnp.arange(num_steps))
    # cull_idx is threaded back to the caller so the gate persists across
    # scan windows (a window may contain no refresh step).
    return state, stats, rng, loss_threshold, cull_idx

  repl = mesh_lib.replicated(mesh)
  return jax.jit(multi_step,
                 in_shardings=(repl, None, None, None, None),
                 donate_argnums=(0, 1))
