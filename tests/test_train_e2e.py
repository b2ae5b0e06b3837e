"""End-to-end training-slice tests on the virtual 8-device CPU mesh.

What the reference never had (SURVEY.md section 4): a tiny train-step
integration test that checks loss decreases, plus multi-device sharding
coverage.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu import configs as configs_lib
from multinerf_tpu import ginlite
from multinerf_tpu import train_lib
from multinerf_tpu.data import datasets
from multinerf_tpu.models import nerf as models
from multinerf_tpu.parallel import mesh as mesh_lib


@pytest.fixture(autouse=True)
def _clean_gin():
  ginlite.clear_config()
  yield
  ginlite.clear_config()


def tiny_config(**overrides):
  ginlite.parse_config_files_and_bindings(
      [], ['PropMLP.net_depth = 2', 'PropMLP.net_width = 16',
           'NerfMLP.net_depth = 2', 'NerfMLP.net_width = 16',
           'Model.num_prop_samples = 8', 'Model.num_nerf_samples = 4',
           'Model.num_levels = 2'])
  kwargs = dict(
      dataset_loader='dummy',
      batch_size=256,
      render_chunk_size=128,
      data_loss_type='mse',
      near=0.5,
      far=10.0,
      lr_init=2e-3,
      lr_final=2e-4,
      max_steps=50,
      lr_delay_steps=0,
  )
  kwargs.update(overrides)
  return configs_lib.Config(**kwargs)


def test_train_loss_decreases_and_sharding():
  config = tiny_config()
  assert jax.device_count() == 8, 'conftest must provide 8 CPU devices'
  mesh = mesh_lib.create_mesh()
  dataset = datasets.load_dataset('train', '', config)

  rng = jax.random.PRNGKey(0)
  model, state, render_eval_pfn, train_pstep, lr_fn = train_lib.setup_model(
      config, rng, mesh=mesh, dataset=dataset)

  state = jax.device_put(state, mesh_lib.replicated(mesh))

  losses = []
  for step, batch in zip(range(1, 51), dataset):
    gbatch = mesh_lib.shard_batch_to_global(mesh, batch)
    # The batch must actually be sharded over the data axis.
    if step == 1:
      shard_shapes = [s.data.shape for s in gbatch.rgb.addressable_shards]
      assert len(shard_shapes) == 8
      assert all(s[0] == config.batch_size // 8 for s in shard_shapes)
    train_frac = jnp.clip((step - 1) / (config.max_steps - 1), 0, 1)
    state, stats, rng = train_pstep(rng, state, gbatch, train_frac, 1.0)
    losses.append(float(stats['loss']))

  assert np.isfinite(losses).all()
  # Loss at the end must beat the start by a clear margin.
  assert np.mean(losses[-10:]) < 0.8 * np.mean(losses[:5]), losses
  # PSNR is logged and finite.
  assert np.isfinite(float(stats['psnr']))


def test_render_image_full_pipeline():
  config = tiny_config()
  mesh = mesh_lib.create_mesh()
  dataset = datasets.load_dataset('test', '', config)

  rng = jax.random.PRNGKey(0)
  _, state, render_eval_pfn, _, _ = train_lib.setup_model(
      config, rng, mesh=mesh, dataset=dataset)

  test_case = next(dataset)
  import functools
  rendering = models.render_image(
      functools.partial(render_eval_pfn, state.params, 1.0),
      test_case.rays, None, config, verbose=False)

  h, w = dataset.height, dataset.width
  assert rendering['rgb'].shape == (h, w, 3)
  assert rendering['acc'].shape == (h, w)
  assert rendering['distance_mean'].shape == (h, w)
  assert np.isfinite(np.array(rendering['rgb'])).all()
  # Ray visualization bundles: one list entry per level.
  assert len(rendering['ray_sdist']) == 2


@pytest.mark.parametrize('chunk_size', [96, 248])
def test_render_image_scanned_matches_loop(chunk_size):
  """The single-dispatch lax.scan render must equal the chunk loop exactly
  (same jitted chunk renderer, same chunking).  chunk_size=96 on the dummy
  16x16 image exercises num_chunks=3 + 32 rays of padding; 248 leaves the
  last chunk with only 8 real rays — fewer than vis_num_rays — pinning
  that edge-padded duplicates stay out of the ray vis bundles.  (Both
  sizes are multiples of the 8-device mesh: a non-divisible chunk rounds
  down in the scanned path but pads up per chunk in the loop, shifting
  the vis-bundle chunk boundaries — images stay equal, bundles sample
  different rays.)"""
  config = tiny_config(render_chunk_size=chunk_size)
  mesh = mesh_lib.create_mesh()
  dataset = datasets.load_dataset('test', '', config)

  rng = jax.random.PRNGKey(0)
  _, state, render_eval_pfn, _, _ = train_lib.setup_model(
      config, rng, mesh=mesh, dataset=dataset)

  import functools
  test_case = next(dataset)
  render = functools.partial(
      models.render_image, functools.partial(render_eval_pfn, state.params,
                                             1.0),
      test_case.rays, None, verbose=False)
  scanned = render(config)
  looped = render(dataclasses.replace(config, render_scan_chunks=False))

  assert set(scanned) == set(looped)
  for k in looped:
    if k.startswith('ray_'):
      # Same levels; both paths share chunk boundaries and the bundle
      # subsample permutation.
      assert len(scanned[k]) == len(looped[k])
      for a, b in zip(scanned[k], looped[k]):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=2e-3, atol=1e-5, err_msg=k)
    else:
      # XLA fuses the chunk program differently inside lax.scan than as a
      # standalone dispatch; normalization-heavy outputs (normals) wobble
      # at the few-ulp level. Identical math, not identical fusion.
      np.testing.assert_allclose(np.array(scanned[k]), np.array(looped[k]),
                                 rtol=2e-3, atol=1e-5, err_msg=k)


def test_cast_rays_in_train_step_path():
  """The compact Pixels path must agree with host-side ray casting."""
  config = tiny_config(cast_rays_in_train_step=True)
  mesh = mesh_lib.create_mesh()
  dataset = datasets.load_dataset('train', '', config)
  batch = next(dataset)
  # Batch rays are compact Pixels, not Rays.
  from multinerf_tpu.data import types
  assert isinstance(batch.rays, types.Pixels)

  from multinerf_tpu.data import cameras as camera_lib
  rays_np = camera_lib.cast_ray_batch(dataset.cameras, batch.rays,
                                      dataset.camtype, xnp=np)
  rays_jnp = jax.jit(
      lambda px: camera_lib.cast_ray_batch(
          jax.tree_util.tree_map(jnp.asarray, dataset.cameras),
          px, dataset.camtype, xnp=jnp))(batch.rays)
  np.testing.assert_allclose(np.array(rays_jnp.origins), rays_np.origins,
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.array(rays_jnp.directions),
                             rays_np.directions, rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.array(rays_jnp.radii), rays_np.radii,
                             rtol=1e-4, atol=1e-6)

  # And training steps run on the Pixels path.
  rng = jax.random.PRNGKey(0)
  _, state, _, train_pstep, _ = train_lib.setup_model(
      config, rng, mesh=mesh, dataset=dataset)
  state = jax.device_put(state, mesh_lib.replicated(mesh))
  gbatch = mesh_lib.shard_batch_to_global(mesh, batch)
  state, stats, rng = train_pstep(rng, state, gbatch, 0.5, 1.0)
  assert np.isfinite(float(stats['loss']))


def test_model_parallel_mesh_compiles():
  """Tensor parallelism: paired col->row kernels, sharded opt state, and
  loss parity with the pure-DP run on identical weights and batch."""
  ginlite.clear_config()
  ginlite.parse_config_files_and_bindings(
      [], ['PropMLP.net_depth = 2', 'PropMLP.net_width = 16',
           'NerfMLP.net_depth = 2', 'NerfMLP.net_width = 512',
           'Model.num_prop_samples = 8', 'Model.num_nerf_samples = 4',
           'Model.num_levels = 2'])
  config = configs_lib.Config(
      dataset_loader='dummy', batch_size=64, data_loss_type='mse',
      near=0.5, far=10.0, max_steps=10, lr_delay_steps=0,
      randomized=False)
  mesh = mesh_lib.create_mesh(model_parallel=2)
  assert mesh.shape['data'] == 4 and mesh.shape['model'] == 2
  dataset = datasets.load_dataset('train', '', config)

  rng = jax.random.PRNGKey(0)
  _, state, _, train_pstep, _ = train_lib.setup_model(
      config, rng, mesh=mesh, dataset=dataset)

  shardings = mesh_lib.infer_tree_shardings(state, mesh,
                                            min_dim_to_shard=256)
  specs = [s.spec for s in jax.tree_util.tree_leaves(
      shardings, is_leaf=lambda x: hasattr(x, 'spec'))]
  # The Megatron pairing must produce BOTH column- and row-parallel kernels.
  from jax.sharding import PartitionSpec as P
  assert any(s == P(None, 'model') for s in specs), specs
  assert any(s == P('model', None) for s in specs), specs

  replicated_bytes = 3 * mesh_lib.per_chip_bytes(
      jax.device_put(state.params, mesh_lib.replicated(mesh)))
  tp_state = jax.device_put(state, shardings)
  # Sharding Adam's mu/nu alongside params must actually cut per-chip bytes.
  tp_bytes = (mesh_lib.per_chip_bytes(tp_state.params) +
              mesh_lib.per_chip_bytes(tp_state.opt_state))
  assert tp_bytes < 0.75 * replicated_bytes, (tp_bytes, replicated_bytes)

  batch = next(dataset)
  gbatch = mesh_lib.shard_batch_to_global(mesh, batch)
  _, tp_stats, _ = train_pstep(jax.random.PRNGKey(1), tp_state, gbatch, 0.5,
                               1.0)
  tp_loss = float(tp_stats['loss'])
  assert np.isfinite(tp_loss)

  # A/B: the same step on a pure-DP mesh from identical weights and batch.
  dp_mesh = mesh_lib.create_mesh()
  _, dp_state, _, dp_pstep, _ = train_lib.setup_model(
      config, jax.random.PRNGKey(0), mesh=dp_mesh, dataset=dataset)
  dp_state = jax.device_put(dp_state, mesh_lib.replicated(dp_mesh))
  dp_batch = mesh_lib.shard_batch_to_global(dp_mesh, batch)
  _, dp_stats, _ = dp_pstep(jax.random.PRNGKey(1), dp_state, dp_batch, 0.5,
                            1.0)
  np.testing.assert_allclose(tp_loss, float(dp_stats['loss']),
                             rtol=1e-5, atol=1e-6)


def test_robustnerf_training_path():
  """Patch batches + robustnerf loss + threshold feedback loop."""
  ginlite.clear_config()
  ginlite.parse_config_files_and_bindings(
      [], ['PropMLP.net_depth = 2', 'PropMLP.net_width = 16',
           'NerfMLP.net_depth = 2', 'NerfMLP.net_width = 16',
           'Model.num_prop_samples = 8', 'Model.num_nerf_samples = 4',
           'Model.num_levels = 2'])
  config = configs_lib.Config(
      dataset_loader='dummy', batch_size=1024, patch_size=8,
      data_loss_type='robustnerf', enable_robustnerf_loss=True,
      robustnerf_inlier_quantile=0.8, robustnerf_inner_patch_size=4,
      near=0.5, far=10.0, max_steps=20, lr_delay_steps=0)
  mesh = mesh_lib.create_mesh()
  dataset = datasets.load_dataset('train', '', config)
  rng = jax.random.PRNGKey(0)
  _, state, _, train_pstep, _ = train_lib.setup_model(
      config, rng, mesh=mesh, dataset=dataset)
  state = jax.device_put(state, mesh_lib.replicated(mesh))
  loss_threshold = 1.0
  thresholds = [loss_threshold]
  for step, batch in zip(range(1, 6), dataset):
    gbatch = mesh_lib.shard_batch_to_global(mesh, batch)
    state, stats, rng = train_pstep(rng, state, gbatch, 0.5, loss_threshold)
    # The threshold feedback loop: next threshold = this batch's quantile.
    loss_threshold = float(stats['loss_threshold'])
    thresholds.append(loss_threshold)
    assert np.isfinite(float(stats['loss']))
    assert 0 <= float(stats['mask']) <= 1
  # Thresholds adapt (not stuck at the init value).
  assert thresholds[-1] != 1.0
