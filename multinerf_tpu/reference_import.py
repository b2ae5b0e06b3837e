"""Import the read-only reference checkout as a benchmark/parity oracle.

The reference (google-research/multinerf at /root/reference) is pure JAX
except for a few dependencies absent here (gin, dm_pix, rawpy); this module
installs minimal stand-ins for those and imports the reference's modules so
they can be *executed* — never copied — as the honest baseline:

* ``bench.py`` times the reference's actual pmap train step
  (reference train_utils.py:221-346) on the same chip as ours.
* The head-to-head quality harness trains the reference stack on the same
  synthetic scenes to compare PSNR trajectories.
* Parity tests use the same import path as a numerical oracle.
"""

from __future__ import annotations

import os
import sys
import types
from typing import Any

REFERENCE_PATH = os.environ.get('MULTINERF_REFERENCE', '/root/reference')

# ---------------------------------------------------------------------------
# The blender_refnerf.gin / llff_raw.gin A/B surfaces, SINGLE-SOURCED.
# These dicts mirror the reference gin files' bindings (our checked-in
# configs/blender_refnerf.gin and configs/llff_raw.gin are binding-identical
# to the reference's); every ours-vs-reference arch harness (bench.py
# build_arch, scripts/head_to_head.py, build_reference_arch_step below)
# must read THESE so the two sides cannot drift apart independently.
# `rgb_activation` for the raw arch is filled in per-stack (each side's own
# safe_exp) and therefore lives outside the shared dict.
# ---------------------------------------------------------------------------

REFNERF_NERF_KW = dict(
    net_depth=8, net_width=256, net_depth_viewdirs=8,
    basis_shape='octahedron', basis_subdivisions=1,
    disable_density_normals=False, enable_pred_normals=True,
    use_directional_enc=True, use_reflections=True, deg_view=5,
    enable_pred_roughness=True, use_diffuse_color=True,
    use_specular_tint=True, use_n_dot_v=True, bottleneck_width=128,
    density_bias=0.5, max_deg_point=16)
REFNERF_MODEL_KW = dict(
    num_levels=2, single_mlp=True, num_prop_samples=128,
    num_nerf_samples=128, anneal_slope=0.0, dilation_multiplier=0.0,
    dilation_bias=0.0, single_jitter=False, resample_padding=0.01)
# Loss/optimizer Config fields shared verbatim by both stacks' builders.
REFNERF_LOSS_KW = dict(
    distortion_loss_mult=0.0, orientation_loss_mult=0.1,
    orientation_loss_target='normals_pred',
    predicted_normal_loss_mult=3e-4, orientation_coarse_loss_mult=0.01,
    predicted_normal_coarse_loss_mult=3e-5, interlevel_loss_mult=0.0,
    data_coarse_loss_mult=0.1, adam_eps=1e-8)

RAW_NERF_KW = dict(
    net_depth=8, net_width=256, basis_shape='octahedron',
    basis_subdivisions=1, disable_density_normals=True,
    max_deg_point=16, rgb_padding=0.0, rgb_bias=-5.0, density_noise=1.0,
    weight_init='glorot_uniform')
RAW_MODEL_KW = dict(
    num_levels=2, single_mlp=True, num_prop_samples=128,
    num_nerf_samples=128, opaque_background=True,
    learned_exposure_scaling=True, ray_shape='cylinder',
    anneal_slope=0.0, dilation_multiplier=0.0, dilation_bias=0.0,
    single_jitter=False)
RAW_LOSS_KW = dict(
    rawnerf_mode=True, data_loss_type='rawnerf', apply_bayer_mask=True,
    interlevel_loss_mult=0.0, distortion_loss_mult=0.01,
    data_coarse_loss_mult=0.1, grad_max_norm=0.1, grad_max_val=0.1,
    adam_eps=1e-8)


def reference_available() -> bool:
  return os.path.isdir(os.path.join(REFERENCE_PATH, 'internal'))


def install_stubs() -> None:
  """Register import-time stand-ins for the reference's absent deps."""
  if 'gin' not in sys.modules:
    gin = types.ModuleType('gin')
    gin.configurable = lambda *a, **k: (a[0] if a and callable(a[0])
                                        else (lambda cls: cls))
    config = types.ModuleType('gin.config')
    config.external_configurable = lambda fn, module=None: fn
    gin.config = config
    gin.add_config_file_search_path = lambda *a, **k: None
    gin.parse_config_files_and_bindings = lambda *a, **k: None
    gin.config_str = lambda: ''
    gin.operative_config_str = lambda: ''
    sys.modules['gin'] = gin
    sys.modules['gin.config'] = config
  if 'dm_pix' not in sys.modules:
    dm_pix = types.ModuleType('dm_pix')
    dm_pix.ssim = lambda a, b: 0.0
    sys.modules['dm_pix'] = dm_pix
  if 'rawpy' not in sys.modules:
    rawpy = types.ModuleType('rawpy')
    def _unavailable(*_a, **_k):
      raise ImportError('rawpy is not available in this environment')
    rawpy.imread = _unavailable
    sys.modules['rawpy'] = rawpy
  if 'pycolmap' not in sys.modules:
    # The reference vendors pycolmap as a git submodule that is empty in
    # this checkout; its datasets.py imports it unconditionally but only
    # calls it when parsing real COLMAP scenes, which the bench never does.
    pycolmap = types.ModuleType('pycolmap')
    class _SceneManagerUnavailable:  # noqa: N801
      def __init__(self, *_a, **_k):
        raise ImportError('pycolmap is not available in this environment')
    pycolmap.SceneManager = _SceneManagerUnavailable
    sys.modules['pycolmap'] = pycolmap


def import_reference() -> Any:
  """Import the reference's `internal` modules; returns a namespace.

  The returned object has attributes models, configs, utils, train_utils,
  coord, stepfun, math, camera_utils, image.
  """
  if not reference_available():
    raise ImportError(f'reference checkout not found at {REFERENCE_PATH}')
  install_stubs()
  if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)
  from internal import camera_utils  # noqa: PLC0415
  from internal import configs  # noqa: PLC0415
  from internal import coord  # noqa: PLC0415
  from internal import image  # noqa: PLC0415
  from internal import math  # noqa: PLC0415
  from internal import models  # noqa: PLC0415
  from internal import stepfun  # noqa: PLC0415
  from internal import train_utils  # noqa: PLC0415
  from internal import utils  # noqa: PLC0415
  return types.SimpleNamespace(
      models=models, configs=configs, utils=utils, train_utils=train_utils,
      coord=coord, stepfun=stepfun, math=math, camera_utils=camera_utils,
      image=image)


def _build_360_model(batch_size: int, seed: int = 0):
  """Shared 360-config model/rays/variables assembly for both builders.

  Reproduces what reference train.py:60-130 + train_utils.py:399-419 set up
  (model from configs/360.gin bindings) without gin: the 360.gin MLP/Model
  bindings are baked in via subclass defaults.
  """
  import jax
  import jax.numpy as jnp
  import numpy as np

  ref = import_reference()

  # configs/360.gin model bindings (reference configs/360.gin:6-18).
  nerf_kw = dict(warp_fn=ref.coord.contract, net_depth=8, net_width=1024,
                 disable_density_normals=True)
  prop_kw = dict(warp_fn=ref.coord.contract, net_depth=4, net_width=256,
                 disable_density_normals=True, disable_rgb=True)
  base_mlp = ref.models.MLP
  ref.models.NerfMLP = lambda: base_mlp(**nerf_kw)
  ref.models.PropMLP = lambda: base_mlp(**prop_kw)

  config = ref.configs.Config(near=0.2, far=1e6, batch_size=batch_size)
  model = ref.models.Model(config=config, raydist_fn=jnp.reciprocal,
                           opaque_background=True)

  rng = jax.random.PRNGKey(seed)
  rs = np.random.RandomState(seed)
  d = rs.randn(batch_size, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  ray_kwargs = dict(
      origins=rs.randn(batch_size, 3).astype(np.float32) * 0.1,
      directions=d,
      viewdirs=d,
      radii=np.full((batch_size, 1), 1e-3, np.float32),
      imageplane=np.zeros((batch_size, 2), np.float32),
      lossmult=np.ones((batch_size, 1), np.float32),
      near=np.full((batch_size, 1), 0.2, np.float32),
      far=np.full((batch_size, 1), 1e6, np.float32),
      cam_idx=np.zeros((batch_size, 1), np.int32))

  init_rays = jax.tree_util.tree_map(
      lambda x: jnp.asarray(x[:10]), ref.utils.Rays(**ray_kwargs))
  variables = model.init(rng, rng=None, rays=init_rays, train_frac=1.0,
                         compute_extras=False, zero_glo=True)
  return ref, config, model, variables, ray_kwargs


def build_reference_360_render(batch_size: int, seed: int = 0):
  """The reference's ACTUAL pmap eval-render fn on the 360 config.

  Returns (render_pfn, variables, sharded_rays, ref): call
  ``render_pfn(variables, 1.0, None, sharded_rays)`` ->
  (renderings list, ray_history).  ``sharded_rays`` carry ``batch_size``
  synthetic rays laid out [n_devices, batch/n_devices, ...] the way the
  reference's render_image shards chunks (models.py:650-671).
  """
  import jax

  ref, config, model, variables, ray_kwargs = _build_360_model(
      batch_size, seed)
  render_pfn = ref.train_utils.create_render_fn(model)
  rays = ref.utils.Rays(**ray_kwargs)
  sharded_rays = ref.utils.shard(rays)
  return render_pfn, variables, sharded_rays, ref


def build_reference_360_image_render(seed: int = 0):
  """The reference's PRODUCTION whole-image render path on the 360 config.

  This is the path eval.py:101 and render.py:155 actually drive:
  ``models.render_image`` (models.py:625-706) — per-chunk host loop, pmap
  dispatch per chunk, per-chunk unshard, host-side concatenation — around
  the pmap render fn (train_utils.py:377-396).

  Returns (render_frame, ref, config): ``render_frame(rays_hw, rng=None)``
  renders one [H, W] frame and returns the host rendering dict.
  """
  import functools
  import jax

  ref, config, model, variables, _ = _build_360_model(16, seed)
  render_pfn = ref.train_utils.create_render_fn(model)

  def render_frame(rays_hw, rng=None):
    rendering = ref.models.render_image(
        functools.partial(render_pfn, variables, 1.0), rays_hw, rng,
        config, verbose=False)
    return jax.device_get(rendering)

  return render_frame, ref, config


def substitute_real_ide() -> None:
  """Swap the reference's complex-power IDE for our real-valued one.

  The axon TPU backend has no complex64 support (probed:
  scripts/refnerf_tpu_diag.py — complex pow/matmul raise UNIMPLEMENTED,
  and the resulting backend error poisons subsequent fetches in the same
  client), while the reference's IDE computes (x+iy)^m via complex powers
  (reference ref_utils.py:146).  Our recurrence IDE is value-identical
  (pinned to atol 2e-5 at deg_view 2/4/5 against the reference's own
  function on CPU — tests/test_reference_parity.py), so substituting it
  lets the reference Ref-NeRF stack execute on this chip with every other
  line its own.  Callers must record the substitution in their output.
  """
  import_reference()  # Ensures the checkout is importable.
  from multinerf_tpu.ops import ref_utils as our_ref_utils
  import internal.ref_utils as ref_refutils_mod  # noqa: PLC0415
  ref_refutils_mod.generate_ide_fn = our_ref_utils.generate_ide_fn


def build_reference_arch_step(arch: str, batch_size: int, seed: int = 0):
  """The reference's ACTUAL pmap train step at a non-360 flagship arch.

  ``arch``:
    'refnerf'  the blender_refnerf.gin model/loss surface (reference
               configs/blender_refnerf.gin): single shared 8x256 MLP with
               density-gradient normals (models.py:473-492 vmapped
               value_and_grad), predicted normals, IDE (ref_utils.py:
               98-159), reflections/diffuse/tint/n-dot-v heads, and the
               orientation + predicted-normal losses
               (train_utils.py:162-197).
    'raw'      the llff_raw.gin surface (reference configs/llff_raw.gin):
               single shared 8x256 MLP, cylinder rays, exp RGB
               activation, density noise, learned exposure scaling, and
               the rawnerf data loss (train_utils.py:90-110).

  Returns (train_pstep, replicated_state, sharded_batch, rngs) with the
  same calling convention as build_reference_360_step.
  """
  import flax
  import jax
  import jax.numpy as jnp
  import math as _stdlib_math
  import numpy as np

  # The reference spells stdlib math as np.math (a numpy<2 alias) in its
  # IDE coefficient table (ref_utils.py:80); restore the alias so the
  # checkout executes as-is under numpy 2.
  if not hasattr(np, 'math'):
    np.math = _stdlib_math

  ref = import_reference()
  base_mlp = ref.models.MLP

  if arch == 'refnerf' and jax.default_backend() != 'cpu':
    substitute_real_ide()  # No complex64 on the TPU backend (see helper).

  if arch == 'refnerf':
    nerf_kw = dict(REFNERF_NERF_KW)
    config_kw = dict(near=2.0, far=6.0, batch_size=batch_size,
                     data_loss_type='mse', **REFNERF_LOSS_KW)
    model_kw = dict(REFNERF_MODEL_KW)
    exposure = False
  elif arch == 'raw':
    nerf_kw = dict(RAW_NERF_KW, rgb_activation=ref.math.safe_exp)
    config_kw = dict(near=0.0, far=1.0, batch_size=batch_size,
                     **RAW_LOSS_KW)
    model_kw = dict(RAW_MODEL_KW)
    exposure = True
  else:
    raise ValueError(f'unknown arch {arch!r}')

  ref.models.NerfMLP = lambda: base_mlp(**nerf_kw)
  ref.models.PropMLP = lambda: base_mlp(net_depth=4, net_width=256,
                                        disable_density_normals=True,
                                        disable_rgb=True)

  config = ref.configs.Config(**config_kw)
  model = ref.models.Model(config=config, **model_kw)

  rng = jax.random.PRNGKey(seed)
  rs = np.random.RandomState(seed)
  d = rs.randn(batch_size, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  ray_kwargs = dict(
      origins=rs.randn(batch_size, 3).astype(np.float32) * 0.1,
      directions=d,
      viewdirs=d,
      radii=np.full((batch_size, 1), 1e-3, np.float32),
      imageplane=np.zeros((batch_size, 2), np.float32),
      lossmult=np.ones((batch_size, 1), np.float32),
      near=np.full((batch_size, 1), config.near, np.float32),
      far=np.full((batch_size, 1), config.far, np.float32),
      cam_idx=np.zeros((batch_size, 1), np.int32))
  if exposure:
    ray_kwargs['exposure_idx'] = (
        rs.randint(0, 2, (batch_size, 1)).astype(np.int32))
    ray_kwargs['exposure_values'] = np.full((batch_size, 1), 0.01,
                                            np.float32)

  init_rays = jax.tree_util.tree_map(
      lambda x: jnp.asarray(x[:10]), ref.utils.Rays(**ray_kwargs))
  variables = model.init(rng, rng=None, rays=init_rays, train_frac=1.0,
                         compute_extras=False, zero_glo=True)

  state, _ = ref.train_utils.create_optimizer(config, variables)
  train_pstep = ref.train_utils.create_train_step(model, config)

  batch = ref.utils.Batch(rays=ref.utils.Rays(**ray_kwargs),
                          rgb=rs.rand(batch_size, 3).astype(np.float32))
  sharded_batch = ref.utils.shard(batch)
  state = flax.jax_utils.replicate(state)
  rngs = jax.random.split(jax.random.PRNGKey(seed + 1),
                          jax.local_device_count())
  return train_pstep, state, sharded_batch, rngs


def build_reference_360_step(batch_size: int, seed: int = 0):
  """Assemble the reference's ACTUAL pmap train step on the 360 config.

  Returns (train_pstep, replicated_state, sharded_batch, rngs): call
  ``train_pstep(rngs, state, batch, None, train_frac, loss_threshold)``.
  """
  import flax
  import jax
  import numpy as np

  ref, config, model, variables, ray_kwargs = _build_360_model(
      batch_size, seed)
  rs = np.random.RandomState(seed)
  state, _ = ref.train_utils.create_optimizer(config, variables)
  train_pstep = ref.train_utils.create_train_step(model, config)

  batch = ref.utils.Batch(rays=ref.utils.Rays(**ray_kwargs),
                          rgb=rs.rand(batch_size, 3).astype(np.float32))
  # The reference's host-side device sharding (utils.py:125-128).
  sharded_batch = ref.utils.shard(batch)
  state = flax.jax_utils.replicate(state)
  rngs = jax.random.split(jax.random.PRNGKey(seed + 1),
                          jax.local_device_count())
  return train_pstep, state, sharded_batch, rngs
