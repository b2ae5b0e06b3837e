"""The multi-level NeRF model (proposal hierarchy) and full-image rendering.

Capability parity with the reference ``Model`` (``internal/models.py:48-312``
of google-research/multinerf): per-level dilate -> anneal -> resample ->
stop-grad -> s_to_t -> cast Gaussians -> MLP -> alpha weights -> background
-> RawNeRF exposure scaling -> volumetric rendering, with GLO embeddings and
learned exposure scaling.

TPU-first divergences:

* ``render_image`` (reference models.py:625-706) drives a *jit+NamedSharding*
  render function over the global device mesh rather than pmap + host-side
  shard/unshard/all_gather: chunks are global arrays sharded on the data
  axis, results come back as one global array per chunk.
* Rays are cast with full covariances only when a warp needs them; the
  analytic contract path consumes them on-chip without an autodiff pass.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multinerf_tpu import ginlite
from multinerf_tpu.data import types
from multinerf_tpu.models import culling
from multinerf_tpu.models.mlp import NerfMLP, PropMLP, random_split
from multinerf_tpu.ops import coord
from multinerf_tpu.ops import rendering
from multinerf_tpu.ops import stepfun


def _schlick_ease(t, slope):
  """Schlick's bias curve, easing the resample-weight anneal in over
  training: 0 -> 0, 1 -> 1, with `slope` controlling how fast the middle
  ramps."""
  return (slope * t) / ((slope - 1) * t + 1)


@ginlite.configurable(name='Model')
class Model(nn.Module):
  """A mip-NeRF 360 model containing all MLPs."""
  config: Any = None  # The framework Config (set at construction).
  num_prop_samples: int = 64  # Samples per proposal level.
  num_nerf_samples: int = 32  # Samples for the final nerf level.
  num_levels: int = 3  # Sampling levels (3 == 2 proposals + 1 nerf).
  bg_intensity_range: Tuple[float, ...] = (1.0, 1.0)  # Background color range.
  anneal_slope: float = 10.0  # Higher = more rapid weight annealing.
  stop_level_grad: bool = True  # Don't backprop across sampling levels.
  use_viewdirs: bool = True  # Condition color on view directions.
  raydist_fn: Callable[..., Any] = None  # Curve for ray-distance warping.
  ray_shape: str = 'cone'  # 'cone' or 'cylinder'.
  disable_integration: bool = False  # Use PE instead of IPE.
  single_jitter: bool = True  # One jitter per ray instead of per sample.
  dilation_multiplier: float = 0.5  # Relative interval dilation.
  dilation_bias: float = 0.0025  # Absolute interval dilation.
  num_glo_features: int = 0  # GLO vector length; 0 disables.
  num_glo_embeddings: int = 1000  # Max number of train images for GLO.
  learned_exposure_scaling: bool = False  # RawNeRF learned exposure scaling.
  near_anneal_rate: Optional[float] = None  # Near-bound anneal-in rate.
  near_anneal_init: float = 0.95  # Initial normalized near bound.
  single_mlp: bool = False  # Use NerfMLP for proposal levels too.
  resample_padding: float = 0.0  # Histogram padding during resampling.
  use_gpu_resampling: bool = False  # Gather-based resampling (GPU-fast).
  opaque_background: bool = False  # Treat background as opaque.

  @nn.compact
  def __call__(self, rng, rays, train_frac, compute_extras, zero_glo=True,
               cull=False):
    """Render a batch of rays through all sampling levels.

    Args:
      rng: rng for stochastic sampling, or None for deterministic output.
      rays: types.Rays pytree.
      train_frac: fraction of training complete, in [0, 1].
      compute_extras: compute extra visualization/stat quantities.
      zero_glo: feed zero GLO vectors (used at eval, where cam_idx is
        meaningless for training embeddings).
      cull: (static) evaluate the final level through the occupancy-grid
        compaction (models/culling.py). Requires Config.occupancy_culling
        (which allocates the grid); train.py turns this on after the
        grid-warmup steps. A float selects that capacity fraction (the
        gate's capacity-ladder variants); True uses
        Config.occupancy_capacity_frac.

    Returns:
      (renderings, ray_history): per-level rendering dicts and raw results.
    """
    # NOTE: construction order matters if weights are being regularized by
    # module name.
    nerf_mlp = ginlite.make('NerfMLP')
    if not self.stop_level_grad:
      # Without the per-level stop_gradient, gradients legitimately flow
      # from each level's density back through the sample positions into
      # the previous level's MLP.  The fused Pallas kernels cut exactly
      # that path (they return zero cotangents for means/covs), so tell
      # the MLPs their inputs are NOT stop-gradded; their fused-eligibility
      # check then falls back to the XLA path.
      nerf_mlp = nerf_mlp.clone(inputs_have_stop_gradient=False)
    prop_mlp = nerf_mlp if self.single_mlp else ginlite.make('PropMLP')
    if not self.single_mlp and not self.stop_level_grad:
      prop_mlp = prop_mlp.clone(inputs_have_stop_gradient=False)

    track_occupancy = (self.config is not None and
                       getattr(self.config, 'occupancy_culling', False))
    if track_occupancy:
      grid_res = self.config.occupancy_grid_resolution
      occupancy_grid = self.variable(
          'occupancy', 'grid',
          lambda: jnp.zeros((grid_res ** 3,), jnp.float32))
    if cull and not track_occupancy:
      raise ValueError('cull=True requires Config.occupancy_culling.')

    if self.num_glo_features > 0:
      if not zero_glo:
        glo_vecs = nn.Embed(self.num_glo_embeddings, self.num_glo_features)
        glo_vec = glo_vecs(rays.cam_idx[..., 0])
      else:
        glo_vec = jnp.zeros(rays.origins.shape[:-1] + (self.num_glo_features,))
    else:
      glo_vec = None

    if self.learned_exposure_scaling:
      # Per-exposure RGB scaling offsets, zero-init so scaling starts at 1.
      exposure_scaling_offsets = nn.Embed(
          self.num_glo_embeddings,
          features=3,
          embedding_init=jax.nn.initializers.zeros,
          name='exposure_scaling_offsets')

    _, s_to_t = coord.construct_ray_warps(self.raydist_fn, rays.near,
                                          rays.far)

    # Normalized per-ray sampling domain, annealed in from near_anneal_init
    # when near_anneal_rate is set.
    if self.near_anneal_rate is None:
      init_s_near = 0.0
    else:
      init_s_near = jnp.clip(1 - train_frac / self.near_anneal_rate, 0,
                             self.near_anneal_init)
    init_s_far = 1.0
    # The running histogram: knot vector over normalized ray distance plus
    # one weight per interval.  Starts as a single all-mass interval
    # spanning the whole domain; each level resamples it finer.
    s_edges = jnp.concatenate([
        jnp.full_like(rays.near, init_s_near),
        jnp.full_like(rays.far, init_s_far)
    ], axis=-1)
    hist_weights = jnp.ones_like(rays.near)
    resolution_so_far = 1  # Product of sample counts of finished levels.

    ray_history = []
    renderings = []
    for level in range(self.num_levels):
      final_level = level == self.num_levels - 1
      level_samples = (self.num_nerf_samples if final_level
                       else self.num_prop_samples)

      if level > 0 and (self.dilation_bias > 0 or
                        self.dilation_multiplier > 0):
        # Anti-alias the incoming histogram: widen every interval by an
        # absolute bias plus a multiple of the mean interval span at the
        # hierarchy's resolution so far, then drop the two domain-edge
        # knots the dilation introduced.
        pad = (self.dilation_bias +
               self.dilation_multiplier * (init_s_far - init_s_near) /
               resolution_so_far)
        s_edges, hist_weights = stepfun.max_dilate_weights(
            s_edges, hist_weights, pad,
            domain=(init_s_near, init_s_far),
            renormalize=True)
        s_edges = s_edges[..., 1:-1]
        hist_weights = hist_weights[..., 1:-1]
      resolution_so_far *= level_samples

      ease = (_schlick_ease(train_frac, self.anneal_slope)
              if self.anneal_slope > 0 else 1.0)
      # Annealed weights in log space (weights**ease); zero-width
      # intervals are pinned to -inf so resampling never lands in them.
      log_resample_weights = jnp.where(
          s_edges[..., 1:] > s_edges[..., :-1],
          ease * jnp.log(hist_weights + self.resample_padding), -jnp.inf)

      key, rng = random_split(rng)
      s_edges = stepfun.sample_intervals(
          key, s_edges, log_resample_weights, level_samples,
          single_jitter=self.single_jitter,
          domain=(init_s_near, init_s_far),
          use_gpu_resampling=self.use_gpu_resampling)
      if self.stop_level_grad:
        # Gradients through sampling destabilize optimization.
        s_edges = jax.lax.stop_gradient(s_edges)

      t_edges = s_to_t(s_edges)
      gaussians = rendering.cast_rays(
          t_edges, rays.origins, rays.directions, rays.radii,
          self.ray_shape, diag=False)
      if self.disable_integration:
        # Zero covariance turns IPE into plain PE.
        gaussians = (gaussians[0], jnp.zeros_like(gaussians[1]))

      mlp = nerf_mlp if final_level else prop_mlp
      key, rng = random_split(rng)
      if cull and final_level:
        # Empty-space culling: only samples whose occupancy cell clears the
        # density threshold reach the (8x1024) NerfMLP, compacted
        # batch-wide to a static-capacity buffer (models/culling.py).
        # The FINAL level only: per-sample culling pays where the
        # per-sample work dwarfs the compaction's data plumbing; for the
        # fully-fused proposal MLPs the 262k-scale gathers/scatters cost
        # MORE than the matmuls they skip (profiled; docs/DESIGN.md).
        cells = culling.cell_ids(gaussians[0], grid_res)
        occ = occupancy_grid.value[cells]
        keep = culling.keep_mask(occ, self.config, t_edges=t_edges,
                                 dirs=rays.directions)
        if self.opaque_background:
          # The terminal interval's alpha is forced to 1 regardless of its
          # density (rendering.compute_alpha_weights), so a culled last
          # sample would paint the whole ray with the rgb fill (black).
          keep = keep.at[..., -1].set(True)
        ray_results = culling.apply_culled(
            mlp, key, gaussians,
            keep=keep,
            capacity_frac=(cull if isinstance(cull, float)
                           else self.config.occupancy_capacity_frac),
            viewdirs=rays.viewdirs if self.use_viewdirs else None,
            imageplane=rays.imageplane,
            glo_vec=glo_vec,
            exposure=rays.exposure_values,
            # Compact grid feedback: only the evaluated samples' densities
            # can exceed the EMA-max floor; scattering the zero-filled
            # culled samples is pure overhead.
            cells=cells if track_occupancy else None,
        )
      else:
        ray_results = mlp(
            key,
            gaussians,
            viewdirs=rays.viewdirs if self.use_viewdirs else None,
            imageplane=rays.imageplane,
            glo_vec=glo_vec if final_level else None,
            exposure=rays.exposure_values,
        )
        if track_occupancy and final_level:
          # Online grid feedback for the training step (consumed by
          # train_lib; stop-gradded scalars, no effect on the loss).  The
          # culled branch exports the compact versions instead.
          ray_results['occ_cells'] = culling.cell_ids(gaussians[0],
                                                      grid_res)
          ray_results['occ_density'] = jax.lax.stop_gradient(
              ray_results['density'])
          # Measured even while not culling: train.py engages the culled
          # step only once this fits a ladder capacity — culling a scene
          # whose occupied fraction exceeds capacity would drop LIVE
          # samples and bias the learned field.
          occ = culling.lookup(occupancy_grid.value, gaussians[0], grid_res)
          ray_results['occ_keep_frac'] = jnp.mean(
              culling.keep_mask(occ, self.config, t_edges=t_edges,
                                dirs=rays.directions).astype(jnp.float32))

      hist_weights = rendering.compute_alpha_weights(
          ray_results['density'], t_edges, rays.directions,
          opaque_background=self.opaque_background)[0]

      # Background color: fixed, midpoint (deterministic), or sampled.
      lo, hi = self.bg_intensity_range[0], self.bg_intensity_range[1]
      if lo == hi:
        bg_rgbs = lo
      elif rng is None:
        bg_rgbs = (lo + hi) / 2
      else:
        key, rng = random_split(rng)
        bg_rgbs = jax.random.uniform(
            key, shape=hist_weights.shape[:-1] + (3,), minval=lo, maxval=hi)

      # RawNeRF exposure logic.
      if rays.exposure_idx is not None:
        ray_results['rgb'] *= rays.exposure_values[..., None, :]
        if self.learned_exposure_scaling:
          exposure_idx = rays.exposure_idx[..., 0]
          # Index 0 is pinned to scale 1: it anchors scene brightness.
          mask = exposure_idx > 0
          scaling = 1 + mask[..., None] * exposure_scaling_offsets(
              exposure_idx)
          ray_results['rgb'] *= scaling[..., None, :]

      rendering_out = rendering.volumetric_rendering(
          ray_results['rgb'],
          hist_weights,
          t_edges,
          bg_rgbs,
          rays.far,
          compute_extras,
          extras={
              k: v for k, v in ray_results.items()
              if k.startswith('normals') or k in ['roughness']
          })

      if compute_extras:
        # A small bag of rays for strip-chart visualization; 'ray_' prefixed
        # keys are treated as ray bundles downstream, not image buffers.
        n = self.config.vis_num_rays if self.config is not None else 16
        rendering_out['ray_sdist'] = s_edges.reshape(
            [-1, s_edges.shape[-1]])[:n, :]
        rendering_out['ray_weights'] = hist_weights.reshape(
            [-1, hist_weights.shape[-1]])[:n, :]
        rgb = ray_results['rgb']
        rendering_out['ray_rgbs'] = rgb.reshape(
            (-1,) + rgb.shape[-2:])[:n, :, :]

      renderings.append(rendering_out)
      ray_results['sdist'] = jnp.copy(s_edges)
      ray_results['weights'] = jnp.copy(hist_weights)
      ray_history.append(ray_results)

    if compute_extras:
      # Proposal colors are meaningless; replace their ray_rgbs with the
      # final level's average color for visualization.
      final_weights = [r['ray_weights'] for r in renderings]
      rgbs = [r['ray_rgbs'] for r in renderings]
      final_rgb = jnp.sum(rgbs[-1] * final_weights[-1][..., None], axis=-2)
      for i in range(len(renderings) - 1):
        renderings[i]['ray_rgbs'] = jnp.broadcast_to(
            final_rgb[:, None, :], rgbs[i].shape)

    return renderings, ray_history


def construct_model(rng, rays, config):
  """Build a Model from gin bindings and initialize its parameters."""
  # Initialize with a tiny slice of rays to minimize init memory.
  ray = jax.tree_util.tree_map(
      lambda x: jnp.reshape(x, [-1, x.shape[-1]])[:10], rays)
  model = ginlite.make('Model', config=config)
  init_variables = model.init(
      rng,
      rng=None,
      rays=ray,
      train_frac=1.0,
      compute_extras=False,
      zero_glo=model.num_glo_features == 0)
  return model, init_variables


def _keep_chunk_outputs(renderings, config):
  """Final-level image buffers + every level's capped ray vis bundles."""
  out = dict(renderings[-1])
  for k in renderings[0]:
    if k.startswith('ray_'):
      out[k] = [r[k][:config.vis_num_rays] for r in renderings]
  return out


def _subsample_ray_bundles(rendering, config):
  """Deterministically cut concatenated per-chunk bundles to one bundle."""
  keys = [k for k in rendering if k.startswith('ray_')]
  if keys:
    num_bundle_rays = rendering[keys[0]][0].shape[0]
    ray_idx = jax.random.permutation(jax.random.PRNGKey(0), num_bundle_rays)
    ray_idx = ray_idx[:config.vis_num_rays]
    for k in keys:
      rendering[k] = [r[ray_idx] for r in rendering[k]]
  return rendering


def _plan_chunks(config, num_rays):
  """(chunk, num_chunks, padding): device-divisible whole-image chunking.

  Chunks must be device-divisible for even sharding, and never render
  more padding than one device-multiple past the image.
  """
  n_dev = jax.device_count()
  chunk = min(config.render_chunk_size, -(-num_rays // n_dev) * n_dev)
  chunk = max(n_dev, chunk // n_dev * n_dev)
  num_chunks = -(-num_rays // chunk)
  return chunk, num_chunks, num_chunks * chunk - num_rays


def _assemble_image(outs, config, height, width, chunk, num_chunks,
                    padding):
  """Scan outputs [num_chunks, chunk, ...] -> one [H, W] rendering dict."""
  num_rays = height * width
  # The last chunk's real ray count: its vis bundle must not include the
  # edge-padded duplicate rays.
  last_real = min(config.vis_num_rays, chunk - padding)

  def cat_bundles(r):
    # [num_chunks, vis, ...] -> concatenated over chunks, padded rows of
    # the final chunk dropped.
    head = r[:-1].reshape((-1,) + r.shape[2:])
    return jnp.concatenate([head, r[-1][:last_real]], axis=0)

  rendering = {}
  for k, z in outs.items():
    if k.startswith('ray_'):
      rendering[k] = [cat_bundles(r) for r in z]
    else:
      flat = z.reshape((num_chunks * chunk,) + z.shape[2:])[:num_rays]
      rendering[k] = flat.reshape((height, width) + flat.shape[1:])
  return _subsample_ray_bundles(rendering, config)


class ImageRenderer:
  """Compile-once whole-image renderer: ONE device dispatch per frame.

  Eval and render jobs draw many frames of the same shape, so everything
  shape-dependent is paid once per (height, width): the chunking plan, the
  lax.scan over stacked ray chunks, and the on-device post-processing
  (strip padding, reshape to H x W, concatenate/subsample vis bundles) are
  all traced into a single cached jitted function.  Per frame the host
  only reshapes numpy rays, ships them in one transfer, and fires one
  call — params and train_frac are real arguments, so nothing retraces as
  the checkpoint advances.

  This replaces the reference's chunked host loop (models.py:625-706 of
  google-research/multinerf: per-chunk pmap dispatch + host unshard +
  host concatenate), which bills a host round trip per chunk — ruinous on
  a remotely-attached TPU and wasteful everywhere else.

  Usage::

    renderer = ImageRenderer(render_eval_pfn, config, mesh=mesh)
    rendering = renderer(state.params, train_frac, rays, rng=None)

  With ``fetch=False`` the result stays on device, letting a caller
  pipeline frames: dispatch frame n+1, then device_get frame n while the
  chip renders.
  """

  def __init__(self, render_fn, config, mesh=None):
    """Args:
      render_fn: (params, train_frac, rng, rays_chunk) -> (renderings,
        history); typically the jitted fn from train_lib.create_render_fn.
      config: Config (render_chunk_size, vis_num_rays).
      mesh: the device mesh; required multi-process, recommended whenever
        more than one device should share the frame.
    """
    self._render_fn = render_fn
    self._config = config
    self._mesh = mesh
    self._whole_fns = {}  # (height, width) -> jitted whole-image fn.

  def _plan(self, num_rays):
    return _plan_chunks(self._config, num_rays)

  def _build(self, height, width):
    config = self._config
    render_fn = self._render_fn
    chunk, num_chunks, padding = self._plan(height * width)

    def whole_image(params, train_frac, rng, stacked):
      def body(carry, chunk_rays):
        renderings, _ = render_fn(params, train_frac, rng, chunk_rays)
        return carry, _keep_chunk_outputs(renderings, config)

      _, outs = jax.lax.scan(body, None, stacked)
      return _assemble_image(outs, config, height, width, chunk,
                             num_chunks, padding)

    out_shardings = None
    if self._mesh is not None and jax.process_count() > 1:
      # Results must be addressable on every process.
      from multinerf_tpu.parallel import mesh as mesh_lib
      out_shardings = mesh_lib.replicated(self._mesh)
    return jax.jit(whole_image, out_shardings=out_shardings)

  def _stack_rays(self, rays, num_rays):
    """[num_rays, ...] numpy rays -> [num_chunks, chunk, ...] on device."""
    import numpy as np
    chunk, num_chunks, padding = self._plan(num_rays)

    if jax.process_count() > 1:
      # Every process holds the same full-image rays; each contributes its
      # slice of every chunk's rows to ONE global array sharded over the
      # data axis.
      from multinerf_tpu.parallel import mesh as mesh_lib
      from jax.sharding import NamedSharding, PartitionSpec
      per = chunk // jax.process_count()
      start = jax.process_index() * per

      def put(r):
        r = np.asarray(r)
        if padding:
          r = np.pad(r, ((0, padding), (0, 0)), mode='edge')
        local = r.reshape((num_chunks, chunk) + r.shape[1:])
        local = local[:, start:start + per]
        spec = PartitionSpec(None, mesh_lib.DATA_AXIS,
                             *([None] * (local.ndim - 2)))
        return jax.make_array_from_process_local_data(
            NamedSharding(self._mesh, spec), local)

      return jax.tree_util.tree_map(put, rays)

    def stack(r):
      r = np.asarray(r)
      if padding:
        r = np.pad(r, ((0, padding), (0, 0)), mode='edge')
      return r.reshape((num_chunks, chunk) + r.shape[1:])

    stacked = jax.tree_util.tree_map(stack, rays)
    if self._mesh is not None:
      # Commit with an explicit data-axis sharding so the frame spreads
      # over the mesh (and ships in one batched transfer) instead of
      # landing on the default device.
      from multinerf_tpu.parallel import mesh as mesh_lib
      from jax.sharding import NamedSharding, PartitionSpec
      stacked = jax.device_put(
          stacked,
          jax.tree_util.tree_map(
              lambda r: NamedSharding(
                  self._mesh,
                  PartitionSpec(None, mesh_lib.DATA_AXIS,
                                *([None] * (r.ndim - 2)))), stacked))
    return stacked

  def __call__(self, params, train_frac, rays, rng=None, fetch=True):
    """Render one [H, W] frame.

    Args:
      params: model variables (replicated across the mesh).
      train_frac: fraction of training complete.
      rays: [H, W, ...] Rays pytree (host numpy preferred).
      rng: rng key or None (deterministic).
      fetch: transfer the result to host.  False returns device arrays so
        callers can overlap the next frame's dispatch with this fetch.

    Returns:
      dict of [H, W, c] image buffers plus 'ray_' visualization bundles.
    """
    height, width = rays.origins.shape[:2]
    num_rays = height * width
    rays = jax.tree_util.tree_map(
        lambda r: r.reshape((num_rays,) + r.shape[2:]), rays)
    key = (height, width)
    if key not in self._whole_fns:
      self._whole_fns[key] = self._build(height, width)
    stacked = self._stack_rays(rays, num_rays)
    rendering = self._whole_fns[key](params, train_frac, rng, stacked)
    return jax.device_get(rendering) if fetch else rendering


class DeviceImageRenderer:
  """Whole-image renderer that casts rays ON DEVICE from stored cameras.

  ImageRenderer ships pre-cast [H*W] ray pytrees from the host every
  frame (~30 MB per 512x512 frame); this variant uploads the dataset's
  cameras once and each frame costs ONE int32 (the camera index) up and
  the rendering dict down — the eval/render-side analog of the training
  device data plane (data/device_sampler.py).  Reference contrast: its
  render path re-ships every chunk's rays from the host
  (models.py:652-671 there).

  Pixel coordinates are generated in-jit per chunk, cast through
  cameras.cast_ray_batch with xnp=jnp (the same geometry the host path
  runs in numpy), rendered, and assembled exactly like ImageRenderer.

  Not applicable to spherical/pano rendering (Dataset._render_spherical)
  — callers fall back to ImageRenderer there; see supports().
  """

  def __init__(self, render_fn, config, dataset, mesh=None):
    from multinerf_tpu.data import cameras as camera_lib
    self._camera_lib = camera_lib
    self._render_fn = render_fn
    self._config = config
    self._mesh = mesh
    self._camtype = dataset.camtype
    self._height, self._width = dataset.height, dataset.width
    self._near, self._far = float(dataset.near), float(dataset.far)
    self._whole_fn = None
    self._many_fns = {}  # K -> jitted K-frame batched renderer.

    import numpy as np
    pixtocams, camtoworlds, distortion_params, pixtocam_ndc = (
        dataset.cameras)
    self._cameras = (
        jnp.asarray(np.asarray(pixtocams, np.float32)),
        jnp.asarray(np.asarray(camtoworlds, np.float32)),
        distortion_params,
        None if pixtocam_ndc is None else jnp.asarray(pixtocam_ndc))

    # Per-camera exposure fields, uploaded once.  The selection/precedence
    # rules live in Dataset.exposure_records (shared with the host path's
    # _make_ray_batch) — evaluated here for every camera at once.
    n_cams = np.asarray(camtoworlds).shape[0]
    self._exposure_idx = None
    self._exposure_values = None
    records = dataset.exposure_records(np.arange(n_cams))
    if 'exposure_idx' in records:
      self._exposure_idx = jnp.asarray(np.broadcast_to(
          np.asarray(records['exposure_idx'], np.int32), (n_cams,)))
    if 'exposure_values' in records:
      self._exposure_values = jnp.asarray(np.broadcast_to(
          np.asarray(records['exposure_values'], np.float32), (n_cams,)))
    self._spherical = getattr(dataset, '_render_spherical', False)

  def supports(self):
    """Device casting covers every projective camera; pano rays do not
    route through cast_ray_batch."""
    return not self._spherical

  def _cast_chunk(self, chunk_start, chunk, cam_idx):
    """Rays for [chunk_start, chunk_start+chunk), clamped at the image
    end (the clamp replicates the host path's edge-padding; padded rows
    are dropped at assembly)."""
    num_rays = self._height * self._width
    flat = jnp.minimum(chunk_start + jnp.arange(chunk), num_rays - 1)
    pix_x = (flat % self._width).astype(jnp.int32)
    pix_y = (flat // self._width).astype(jnp.int32)
    ones = jnp.ones((chunk, 1), jnp.float32)
    kw = dict(
        lossmult=ones,
        near=self._near * ones,
        far=self._far * ones,
        cam_idx=jnp.full((chunk, 1), cam_idx, jnp.int32))
    if self._exposure_idx is not None:
      kw['exposure_idx'] = jnp.full((chunk, 1),
                                    self._exposure_idx[cam_idx], jnp.int32)
    if self._exposure_values is not None:
      kw['exposure_values'] = self._exposure_values[cam_idx] * ones
    pixels = types.Pixels(pix_x, pix_y, **kw)
    return self._camera_lib.cast_ray_batch(self._cameras, pixels,
                                           self._camtype, xnp=jnp)

  def _whole_image_core(self, params, train_frac, rng, cam_idx):
    """Traceable one-frame render: chunk scan + on-device assembly."""
    config = self._config
    render_fn = self._render_fn
    height, width = self._height, self._width
    chunk, num_chunks, padding = _plan_chunks(config, height * width)

    def body(carry, chunk_i):
      rays = self._cast_chunk(chunk_i * chunk, chunk, cam_idx)
      renderings, _ = render_fn(params, train_frac, rng, rays)
      return carry, _keep_chunk_outputs(renderings, config)

    _, outs = jax.lax.scan(body, None, jnp.arange(num_chunks))
    return _assemble_image(outs, config, height, width, chunk,
                           num_chunks, padding)

  def _out_shardings(self):
    if self._mesh is not None and jax.process_count() > 1:
      from multinerf_tpu.parallel import mesh as mesh_lib
      return mesh_lib.replicated(self._mesh)
    return None

  def _build(self):
    return jax.jit(self._whole_image_core,
                   out_shardings=self._out_shardings())

  def __call__(self, params, train_frac, cam_idx, rng=None, fetch=True):
    """Render the dataset's camera `cam_idx` (one scalar to the device)."""
    if self._whole_fn is None:
      self._whole_fn = self._build()
    rendering = self._whole_fn(params, train_frac, rng,
                               jnp.int32(cam_idx))
    return jax.device_get(rendering) if fetch else rendering

  def render_many(self, params, train_frac, cam_indices, rng=None,
                  fetch=True):
    """Render several cameras in ONE dispatch + ONE fetch.

    Small frames are dispatch-latency-bound (at 64x64 the ~18 ms of
    compute is dwarfed by per-frame host round trips — DESIGN.md round-4
    measurement), so an outer lax.scan over camera indices amortizes the
    round trip across the batch: the host ships one small int32 vector and
    fetches one stacked rendering dict for all K frames.

    Args:
      params, train_frac, rng: as __call__.
      cam_indices: sequence of dataset camera indices (length K; one
        compiled function is cached per distinct K).

    Returns:
      dict of [K, H, W, c] stacked buffers (+ stacked vis bundles).
    """
    import numpy as np
    cam_indices = jnp.asarray(np.asarray(cam_indices, np.int32))
    k = int(cam_indices.shape[0])
    if k not in self._many_fns:
      def many(params, train_frac, rng, cams):
        def frame(carry, cam_idx):
          return carry, self._whole_image_core(params, train_frac, rng,
                                               cam_idx)
        _, outs = jax.lax.scan(frame, None, cams)
        return outs
      self._many_fns[k] = jax.jit(many,
                                  out_shardings=self._out_shardings())
    rendering = self._many_fns[k](params, train_frac, rng, cam_indices)
    return jax.device_get(rendering) if fetch else rendering


def render_image(render_fn, rays: types.Rays, rng, config,
                 verbose: bool = True, mesh=None, fetch: bool = True):
  """Render all pixels of one image (one-shot convenience wrapper).

  Production surfaces that render many frames (eval.py, render.py,
  train.py's in-train eval) should construct an ImageRenderer once and
  reuse it — this wrapper builds a fresh one per call, so every call pays
  tracing.

  Args:
    render_fn: jitted function (rng, rays-chunk) -> (renderings, history)
      operating on global arrays sharded over the mesh's data axis.
    rays: [H, W, ...] Rays pytree for the full image.
    rng: rng or None.
    config: Config (render_chunk_size, vis_num_rays, render_scan_chunks).
    verbose: print progress.
    mesh: required under multi-process JAX — each process passes the full
      image rays and chunks are assembled into global arrays
      (every process must call this; results are addressable on all).
    fetch: transfer the result to host (the production default).  False
      returns device arrays — benchmarks chain a scalar off them so a
      slow host link doesn't masquerade as render time.

  Returns:
    dict of [H, W, c] image buffers plus 'ray_' visualization bundles.
  """
  height, width = rays.origins.shape[:2]
  num_rays = height * width

  multiprocess = jax.process_count() > 1
  if multiprocess and mesh is None:
    raise ValueError('render_image requires `mesh` under multi-process JAX.')

  if config.render_scan_chunks:
    renderer = ImageRenderer(
        lambda params, train_frac, key, chunk_rays: render_fn(key,
                                                              chunk_rays),
        config, mesh=mesh)
    return renderer(None, None, rays, rng=rng, fetch=fetch)

  rays = jax.tree_util.tree_map(lambda r: r.reshape((num_rays, -1)), rays)

  # Chunks must be divisible by the device count for even sharding.
  chunk_size = config.render_chunk_size
  n_dev = jax.device_count()

  chunks = []
  idx0s = range(0, num_rays, chunk_size)
  for i_chunk, idx0 in enumerate(idx0s):
    if verbose and i_chunk % max(1, len(idx0s) // 10) == 0:
      print(f'Rendering chunk {i_chunk}/{len(idx0s) - 1}')
    chunk_rays = jax.tree_util.tree_map(
        lambda r: r[idx0:idx0 + chunk_size], rays)
    actual = chunk_rays.origins.shape[0]
    padding = (-actual) % n_dev
    if padding:
      chunk_rays = jax.tree_util.tree_map(
          lambda r: jnp.pad(r, ((0, padding), (0, 0)), mode='edge'),
          chunk_rays)

    if multiprocess:
      # Every process holds the same full-image rays; carve out this
      # process's slice and assemble the global sharded chunk.
      from multinerf_tpu.parallel import mesh as mesh_lib
      import numpy as np
      per_proc = chunk_rays.origins.shape[0] // jax.process_count()
      start = jax.process_index() * per_proc
      local = jax.tree_util.tree_map(
          lambda r: np.asarray(r[start:start + per_proc]), chunk_rays)
      chunk_rays = mesh_lib.shard_batch_to_global(mesh, local)

    chunk_renderings, _ = render_fn(rng, chunk_rays)
    # Stay on device: no per-chunk host fetch.  Dispatches queue
    # asynchronously, so the loop's only host work is slicing ray pytrees;
    # the single transfer happens once at the end (on the tunnelled-TPU
    # platform each fetch costs a full round trip, which used to serialize
    # every chunk).
    if padding:
      chunk_renderings = jax.tree_util.tree_map(
          lambda v: v[:-padding] if v.shape[0] == actual + padding else v,
          chunk_renderings)

    # Keep the final level's image buffers and every level's ray bundles.
    # Bundles are vis-only: cap them at vis_num_rays per chunk on device so
    # a full-resolution render doesn't hold [num_rays, samples] histograms.
    chunks.append(_keep_chunk_outputs(chunk_renderings, config))

  rendering = jax.tree_util.tree_map(
      lambda *args: jnp.concatenate(args), *chunks)
  for k, z in rendering.items():
    if not k.startswith('ray_'):
      rendering[k] = z.reshape((height, width) + z.shape[1:])

  rendering = _subsample_ray_bundles(rendering, config)

  # ONE host transfer for the whole image.
  if fetch:
    rendering = jax.device_get(rendering)

  return rendering
