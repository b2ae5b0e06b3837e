"""Tests for the device-resident data plane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu import configs as configs_lib
from multinerf_tpu import ginlite
from multinerf_tpu import train_lib
from multinerf_tpu.data import datasets
from multinerf_tpu.data import device_sampler
from multinerf_tpu.parallel import mesh as mesh_lib


@pytest.fixture(autouse=True)
def _clean_gin():
  ginlite.clear_config()
  yield
  ginlite.clear_config()


def _tiny_model_bindings():
  ginlite.parse_config_files_and_bindings(
      [], ['PropMLP.net_depth = 2', 'PropMLP.net_width = 16',
           'NerfMLP.net_depth = 2', 'NerfMLP.net_width = 16',
           'Model.num_prop_samples = 8', 'Model.num_nerf_samples = 4',
           'Model.num_levels = 2'])


def test_device_batch_matches_host_structure():
  config = configs_lib.Config(dataset_loader='dummy', batch_size=128,
                              near=0.5, far=10.0, data_loss_type='mse')
  dataset = datasets.load_dataset('train', '', config)
  plane = device_sampler.DeviceDataPlane(dataset, config)

  batch_dev = jax.jit(plane.sample_batch)(jax.random.PRNGKey(0))
  batch_host = next(dataset)

  # Same pytree structure and per-leaf shapes.
  dev_leaves = jax.tree_util.tree_map(lambda x: x.shape, batch_dev.rays)
  host_leaves = jax.tree_util.tree_map(lambda x: x.shape, batch_host.rays)
  assert dev_leaves == host_leaves
  assert batch_dev.rgb.shape == batch_host.rgb.shape

  # Sampled rays point at real pixels: gathered rgb equals a host gather at
  # the same coordinates cast through the same cameras.
  rays = batch_dev.rays
  # Viewdirs are unit length, radii positive.
  np.testing.assert_allclose(
      np.linalg.norm(np.array(rays.viewdirs), axis=-1), 1.0, rtol=1e-4)
  assert np.all(np.array(rays.radii) > 0)


def test_device_batch_respects_borders_and_patches():
  config = configs_lib.Config(dataset_loader='dummy', batch_size=64,
                              patch_size=4, num_border_pixels_to_mask=2,
                              near=0.5, far=10.0)
  dataset = datasets.load_dataset('train', '', config)
  plane = device_sampler.DeviceDataPlane(dataset, config)
  batch = jax.jit(plane.sample_batch)(jax.random.PRNGKey(1))
  # Patch-structured [P, ps, ps, c].
  assert batch.rgb.shape == (4, 4, 4, 3)
  # Patches are contiguous pixel blocks.
  px = np.array(batch.rays.cam_idx)  # cam idx uniform within a patch
  for p in range(4):
    assert np.unique(px[p]).size == 1


def test_device_rgb_gather_matches_source_images():
  config = configs_lib.Config(dataset_loader='dummy', batch_size=64,
                              near=0.5, far=10.0)
  dataset = datasets.load_dataset('train', '', config)
  plane = device_sampler.DeviceDataPlane(dataset, config)
  # Reconstruct pixel coordinates from the Rays' imageplane is indirect;
  # instead sample Pixels by reaching into the plane internals via a tiny
  # wrapper that returns them alongside.
  key = jax.random.PRNGKey(2)
  batch = jax.jit(plane.sample_batch)(key)
  # Every gathered rgb value exists in the source image set.
  rgbs = np.array(batch.rgb).reshape(-1, 3)
  source = dataset.images.reshape(-1, 3)
  # Match each sampled rgb to some source pixel exactly.
  for v in rgbs[:8]:
    assert np.any(np.all(np.isclose(source, v, atol=1e-6), axis=-1))


def test_training_with_device_plane_decreases_loss():
  _tiny_model_bindings()
  config = configs_lib.Config(dataset_loader='dummy', batch_size=256,
                              data_loss_type='mse', near=0.5, far=10.0,
                              lr_init=2e-3, lr_final=2e-4, max_steps=40,
                              lr_delay_steps=0, device_data_plane=True)
  mesh = mesh_lib.create_mesh()
  dataset = datasets.load_dataset('train', '', config)
  rng = jax.random.PRNGKey(0)
  model, state, _, _, _ = train_lib.setup_model(config, rng, mesh=mesh,
                                                dataset=dataset)
  plane = device_sampler.DeviceDataPlane(dataset, config, mesh)
  step_fn = device_sampler.create_device_train_step(model, config, plane,
                                                    mesh)
  state = jax.device_put(state, mesh_lib.replicated(mesh))
  losses = []
  for step in range(1, 41):
    state, stats, rng = step_fn(rng, state, (step - 1) / 39, 1.0)
    losses.append(float(stats['loss']))
  assert np.isfinite(losses).all()
  assert np.mean(losses[-8:]) < 0.8 * np.mean(losses[:4]), losses


def test_scan_train_step_matches_single_steps():
  """K scanned steps behave like K sequential steps (loss decreases)."""
  _tiny_model_bindings()
  config = configs_lib.Config(dataset_loader='dummy', batch_size=128,
                              data_loss_type='mse', near=0.5, far=10.0,
                              lr_init=2e-3, lr_final=2e-4, max_steps=64,
                              lr_delay_steps=0, device_data_plane=True)
  mesh = mesh_lib.create_mesh()
  dataset = datasets.load_dataset('train', '', config)
  rng = jax.random.PRNGKey(0)
  model, state, _, _, _ = train_lib.setup_model(config, rng, mesh=mesh,
                                                dataset=dataset)
  plane = device_sampler.DeviceDataPlane(dataset, config, mesh)
  scan_fn = device_sampler.create_scan_train_step(model, config, plane,
                                                  mesh, num_steps=8)
  state = jax.device_put(state, mesh_lib.replicated(mesh))
  all_losses = []
  loss_threshold = 1.0
  for outer in range(8):
    start_step = 1 + outer * 8
    state, stats, rng, loss_threshold, _ = scan_fn(
        rng, state, start_step, loss_threshold, jnp.asarray(False))
    losses = np.array(stats['loss'])
    assert losses.shape == (8,)
    all_losses.extend(losses.tolist())
  assert np.isfinite(all_losses).all()
  assert np.mean(all_losses[-16:]) < 0.8 * np.mean(all_losses[:8])


def test_scan_train_step_with_culling_protocol_in_scan():
  """The device-side culling protocol: warmup -> refresh -> self-gated
  culled steps over a CAPACITY LADDER, all inside one lax.scan (no host
  involvement).  Training must stay finite/improving through the in-scan
  switch, the gate index must thread across windows, and the grid must
  populate."""
  _tiny_model_bindings()
  config = configs_lib.Config(
      dataset_loader='dummy', batch_size=256, data_loss_type='mse',
      near=0.5, far=10.0, lr_init=2e-3, lr_final=2e-4, max_steps=64,
      lr_delay_steps=0, device_data_plane=True, steps_per_jit_call=8,
      occupancy_culling=True, occupancy_grid_resolution=16,
      occupancy_warmup_steps=16, occupancy_grid_refresh_every=8,
      occupancy_capacity_frac=0.75,
      occupancy_capacity_ladder=(0.5, 0.75),
      occupancy_threshold=1e-4)
  mesh = mesh_lib.create_mesh()
  dataset = datasets.load_dataset('train', '', config)
  rng = jax.random.PRNGKey(0)
  model, state, _, _, _ = train_lib.setup_model(config, rng, mesh=mesh,
                                                dataset=dataset)
  plane = device_sampler.DeviceDataPlane(dataset, config, mesh)
  scan_fn = device_sampler.create_scan_train_step(model, config, plane,
                                                  mesh, num_steps=8)
  state = jax.device_put(state, mesh_lib.replicated(mesh))
  all_losses, keep_fracs = [], []
  loss_threshold = 1.0
  cull_engaged = jnp.asarray(False)
  for outer in range(8):
    start_step = 1 + outer * 8
    state, stats, rng, loss_threshold, cull_engaged = scan_fn(
        rng, state, start_step, loss_threshold, cull_engaged)
    all_losses.extend(np.array(stats['loss']).tolist())
    keep_fracs.extend(np.array(stats['occ_keep_frac']).tolist())
  assert np.isfinite(all_losses).all()
  # The dummy scene has density everywhere, so once the grid populates the
  # keep fraction approaches 1 and the gate DISENGAGES culling (the honest
  # outcome for an un-cullable scene); before the grid warms it is 0 and
  # culling engages after warmup.  Either way training must improve.
  assert np.mean(all_losses[-16:]) < 0.9 * np.mean(all_losses[:8])
  grid = np.array(state.params['occupancy']['grid'])
  assert (grid > 0).any()
  assert np.isfinite(keep_fracs).all()
