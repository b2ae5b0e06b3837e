"""ImageRenderer contract: compile-once, params-as-arguments, parity.

The round-3 render surface retraced per frame because the scan body
closed over a fresh partial; these tests pin the round-4 fix so it can't
regress: one cached whole-image function per shape, new params flowing
through WITHOUT retracing, and output parity with the one-shot
render_image wrapper.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu import configs as configs_lib
from multinerf_tpu import ginlite
from multinerf_tpu import train_lib
from multinerf_tpu.data import types
from multinerf_tpu.models import nerf as models
from multinerf_tpu.parallel import mesh as mesh_lib

TINY = [
    'PropMLP.net_depth = 2', 'PropMLP.net_width = 16',
    'PropMLP.disable_density_normals = True', 'PropMLP.disable_rgb = True',
    'NerfMLP.net_depth = 2', 'NerfMLP.net_width = 16',
    'NerfMLP.disable_density_normals = True',
    'Model.num_prop_samples = 8', 'Model.num_nerf_samples = 4',
    'Model.num_levels = 2',
]


def frame_rays(h, w, seed=3):
  rs = np.random.RandomState(seed)
  n = h * w
  d = rs.randn(n, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  return types.Rays(
      origins=(rs.randn(n, 3).astype(np.float32) * 0.1).reshape(h, w, 3),
      directions=d.reshape(h, w, 3),
      viewdirs=d.reshape(h, w, 3),
      radii=np.full((h, w, 1), 1e-2, np.float32),
      imageplane=np.zeros((h, w, 2), np.float32),
      lossmult=np.ones((h, w, 1), np.float32),
      near=np.full((h, w, 1), 0.5, np.float32),
      far=np.full((h, w, 1), 10.0, np.float32),
      cam_idx=np.zeros((h, w, 1), np.int32))


@pytest.fixture(scope='module')
def setup():
  ginlite.clear_config()
  ginlite.parse_config_files_and_bindings([], TINY)
  config = configs_lib.Config(near=0.5, far=10.0, batch_size=64,
                              render_chunk_size=64)
  mesh = mesh_lib.create_mesh()
  _, state, render_pfn, _, _ = train_lib.setup_model(
      config, jax.random.PRNGKey(0), mesh=mesh)
  state = jax.device_put(state, mesh_lib.replicated(mesh))
  return config, mesh, state, render_pfn


def test_matches_one_shot_render_image(setup):
  config, mesh, state, render_pfn = setup
  rays = frame_rays(8, 16)
  renderer = models.ImageRenderer(render_pfn, config, mesh=mesh)
  got = renderer(state.params, 1.0, rays)

  import functools
  want = models.render_image(
      functools.partial(render_pfn, state.params, 1.0), rays, None, config,
      verbose=False, mesh=mesh)
  np.testing.assert_allclose(got['rgb'], want['rgb'], atol=1e-6)
  np.testing.assert_allclose(got['acc'], want['acc'], atol=1e-6)
  assert got['rgb'].shape == (8, 16, 3)


def test_compiles_once_per_shape_and_params_are_arguments(setup):
  config, mesh, state, render_pfn = setup
  renderer = models.ImageRenderer(render_pfn, config, mesh=mesh)
  rays = frame_rays(8, 16)

  out_a = renderer(state.params, 1.0, rays)
  assert len(renderer._whole_fns) == 1
  fn = renderer._whole_fns[(8, 16)]
  first_traces = fn._cache_size()

  # Different params through the SAME compiled fn must change the output
  # (params are arguments, not baked constants) without re-tracing.
  zeroed = jax.tree_util.tree_map(jnp.zeros_like, state.params)
  out_b = renderer(zeroed, 1.0, rays)
  assert fn._cache_size() == first_traces
  assert len(renderer._whole_fns) == 1
  assert not np.allclose(out_a['rgb'], out_b['rgb'])

  # Repeated same-shape frames: still one cache entry, one trace.
  renderer(state.params, 0.5, rays)
  assert fn._cache_size() == first_traces

  # A second shape compiles its own fn; the first stays cached.
  renderer(state.params, 1.0, frame_rays(16, 8))
  assert set(renderer._whole_fns) == {(8, 16), (16, 8)}


def test_fetch_false_returns_device_arrays(setup):
  config, mesh, state, render_pfn = setup
  renderer = models.ImageRenderer(render_pfn, config, mesh=mesh)
  out = renderer(state.params, 1.0, frame_rays(8, 8), fetch=False)
  assert isinstance(out['rgb'], jax.Array)
  fetched = jax.device_get(out)
  assert np.isfinite(fetched['rgb']).all()


def test_device_camera_renderer_matches_host_ray_path(setup):
  """DeviceImageRenderer (in-jit ray casting from stored cameras) must
  reproduce ImageRenderer fed the dataset's host-cast rays."""
  import dataclasses as dc
  from multinerf_tpu.data import datasets

  config, mesh, state, render_pfn = setup
  config = dc.replace(config, dataset_loader='dummy_sphere', near=2.0,
                      far=6.0, render_chunk_size=256)
  dataset = datasets.load_dataset('test', '', config)

  host = models.ImageRenderer(render_pfn, config, mesh=mesh)
  device = models.DeviceImageRenderer(render_pfn, config, dataset,
                                      mesh=mesh)
  assert device.supports()

  for cam_idx in (0, 3):
    batch = dataset.generate_ray_batch(cam_idx)
    want = host(state.params, 1.0, batch.rays)
    got = device(state.params, 1.0, cam_idx)
    np.testing.assert_allclose(got['rgb'], want['rgb'], atol=2e-3)
    np.testing.assert_allclose(got['acc'], want['acc'], atol=2e-3)
    np.testing.assert_allclose(got['distance_mean'], want['distance_mean'],
                               rtol=1e-2, atol=1e-2)


def test_scan_and_loop_paths_agree_through_renderer(setup):
  """Multi-chunk frame: renderer output equals the loop render path."""
  config, mesh, state, render_pfn = setup
  rays = frame_rays(16, 16)  # 256 rays over chunk 64 -> 4 chunks.
  renderer = models.ImageRenderer(render_pfn, config, mesh=mesh)
  got = renderer(state.params, 1.0, rays)

  import functools
  loop_config = dataclasses.replace(config, render_scan_chunks=False)
  want = models.render_image(
      functools.partial(render_pfn, state.params, 1.0), rays, None,
      loop_config, verbose=False, mesh=mesh)
  np.testing.assert_allclose(got['rgb'], np.asarray(want['rgb']), atol=1e-5)
  np.testing.assert_allclose(got['distance_mean'],
                             np.asarray(want['distance_mean']), atol=1e-4)


def test_render_many_matches_per_frame_calls(setup):
  """The K-frame batched dispatch must reproduce K single dispatches."""
  import dataclasses as dc
  from multinerf_tpu.data import datasets

  config, mesh, state, render_pfn = setup
  config = dc.replace(config, dataset_loader='dummy_sphere', near=2.0,
                      far=6.0, render_chunk_size=256)
  dataset = datasets.load_dataset('test', '', config)
  device = models.DeviceImageRenderer(render_pfn, config, dataset,
                                      mesh=mesh)
  cams = [0, 2, 5]
  stacked = device.render_many(state.params, 1.0, cams)
  assert stacked['rgb'].shape[0] == len(cams)
  for row, cam_idx in enumerate(cams):
    single = device(state.params, 1.0, cam_idx)
    np.testing.assert_allclose(stacked['rgb'][row], single['rgb'],
                               atol=1e-6)
    np.testing.assert_allclose(stacked['acc'][row], single['acc'],
                               atol=1e-6)
  # One compiled fn per K, cached.
  device.render_many(state.params, 1.0, [1, 3, 4])
  assert set(device._many_fns) == {3}
