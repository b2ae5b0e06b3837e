"""The framework-wide Config dataclass and config loading.

The field set, names, and defaults mirror the reference's public config
surface (``internal/configs.py:47-172`` of google-research/multinerf) so that
every ``configs/*.gin`` file and user ``--gin_bindings`` override parses
unchanged; parsing runs on :mod:`multinerf_tpu.ginlite`.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multinerf_tpu import ginlite
from multinerf_tpu.ops import coord
from multinerf_tpu.ops import mathx

# --- gin externals: names configs refer to with '@'. ------------------------
for _name, _fn in [
    ('jnp.reciprocal', jnp.reciprocal), ('jnp.log', jnp.log),
    ('jnp.log1p', jnp.log1p), ('jnp.exp', jnp.exp), ('jnp.sqrt', jnp.sqrt),
    ('jnp.square', jnp.square),
    ('jax.nn.relu', jax.nn.relu), ('jax.nn.softplus', jax.nn.softplus),
    ('jax.nn.silu', jax.nn.silu),
    ('jax.nn.initializers.he_normal', jax.nn.initializers.he_normal),
    ('jax.nn.initializers.he_uniform', jax.nn.initializers.he_uniform),
    ('jax.nn.initializers.glorot_normal', jax.nn.initializers.glorot_normal),
    ('jax.nn.initializers.glorot_uniform', jax.nn.initializers.glorot_uniform),
    ('coord.contract', coord.contract),
    ('math.safe_exp', mathx.safe_exp),
    ('mathx.safe_exp', mathx.safe_exp),
]:
  ginlite.register_external(_name, _fn)


@ginlite.configurable(name='Config')
@dataclasses.dataclass
class Config:
  """Configuration flags for everything."""
  # --- Data / dataset. -------------------------------------------------------
  dataset_loader: str = 'llff'  # The type of dataset loader to use.
  batching: str = 'all_images'  # Batch composition: single_image/all_images.
  batch_size: int = 16384  # The number of rays/pixels in each batch.
  patch_size: int = 1  # Resolution of patches sampled for training batches.
  factor: int = 0  # Image downsample factor; 0 for none.
  load_alphabetical: bool = True  # Load images alphabetically vs COLMAP order.
  forward_facing: bool = False  # True for forward-facing LLFF captures.
  render_path: bool = False  # Render a path (LLFF only).
  llffhold: int = 8  # Every Nth image is test (LLFF only).
  llff_use_all_images_for_training: bool = False  # Use all images for train.
  use_tiffs: bool = False  # Use 32-bit TIFFs (Blender only).
  # DTU loader settings.  NOTE: the reference reads these from Config but
  # never defines them (datasets.py:851,903 reference a nonexistent field),
  # making its DTU loader dead code; defined here so DTU actually works.
  dtu_light_cond: int = 3  # Light condition index (7 selects 'max').
  dtuhold: int = 8  # Use every Nth DTU image for the test set.
  compute_disp_metrics: bool = False  # Load/compute disparity MSE.
  compute_normal_metrics: bool = False  # Load/compute normal MAE.
  gc_every: int = 10000  # Steps between manual garbage collections.
  # First-class profiling (the reference has none, SURVEY.md section 5.1):
  # capture a jax.profiler trace of steps [profile_step, profile_step +
  # profile_num_steps) into checkpoint_dir/profile. 0 disables.
  profile_step: int = 0
  profile_num_steps: int = 3
  disable_multiscale_loss: bool = False  # Disable multiscale loss weighting.
  randomized: bool = True  # Use randomized stratified sampling.
  near: float = 2.0  # Near plane distance.
  far: float = 6.0  # Far plane distance.
  checkpoint_dir: Optional[str] = None  # Where to store checkpoints.
  render_dir: Optional[str] = None  # Output rendering directory.
  data_dir: Optional[str] = None  # Input data directory.
  vocab_tree_path: Optional[str] = None  # COLMAP vocab tree path.
  render_chunk_size: int = 16384  # Chunk size for whole-image renders.
  # NEW: single-process whole-image renders run as ONE dispatch (lax.scan
  # over stacked chunks) instead of a host loop; False restores the loop.
  render_scan_chunks: bool = True
  num_showcase_images: int = 5  # Test-set images to showcase in TB.
  deterministic_showcase: bool = True  # Showcase the same images every eval.
  vis_num_rays: int = 16  # Rays to visualize as strip charts.
  vis_decimate: int = 0  # Decimate images for TB to save memory.

  # --- Train. ----------------------------------------------------------------
  max_steps: int = 250000  # Number of optimization steps.
  early_exit_steps: Optional[int] = None  # Early stopping (debugging).
  checkpoint_every: int = 25000  # Steps between checkpoints.
  print_every: int = 100  # Steps between TB/console reports.
  train_render_every: int = 5000  # Steps between in-train test renders.
  cast_rays_in_train_step: bool = False  # Cast rays on device in the step.
  # Fully device-resident data plane: images live in HBM, pixel sampling +
  # RGB gather + ray casting all happen inside the jitted train step; the
  # host feeds nothing per step (extension of cast_rays_in_train_step).
  device_data_plane: bool = False
  # With the device data plane: run this many whole optimizer steps per jit
  # call as one lax.scan (removes per-step host dispatch). Must divide
  # print_every, checkpoint_every, train_render_every, and gc_every.
  steps_per_jit_call: int = 1
  # --- Occupancy culling (new capability, models/culling.py; off by
  # default because it changes the work done per sample and needs per-scene
  # quality validation). The final NerfMLP level only evaluates samples
  # whose contraction-space grid cell clears the density threshold,
  # compacted batch-wide to a static capacity.
  occupancy_culling: bool = False
  occupancy_grid_resolution: int = 64  # Grid cells per axis over [-2, 2]^3.
  occupancy_grid_decay: float = 0.97  # EMA-max decay per update.
  occupancy_threshold: float = 5e-3  # Density below this = empty cell.
  # Keep rule: 'density' (occ > occupancy_threshold) or 'alpha' (keep iff
  # the sample's interval could contribute > occupancy_alpha_eps of alpha:
  # occ * world_interval_length > -log1p(-eps) — a per-sample bound that
  # prices wide far-field intervals and narrow near-field intervals
  # consistently; see culling.keep_mask).
  occupancy_keep_rule: str = 'density'
  occupancy_alpha_eps: float = 1e-3
  occupancy_capacity_frac: float = 0.5  # Compact buffer / full batch size.
  # Optional capacity LADDER: compile one culled step per capacity and let
  # the self-gate pick the smallest capacity that fits the measured keep
  # fraction each refresh (falling back to uncull above the top rung), so
  # denser scenes still cull at a coarser rate instead of dropping to the
  # full step.  None = single-capacity gate at occupancy_capacity_frac.
  occupancy_capacity_ladder: Optional[Tuple[float, ...]] = None
  occupancy_warmup_steps: int = 512  # Cull-free steps while the grid warms.
  occupancy_grid_refresh_every: int = 256  # Steps between MLP grid probes.
  data_loss_type: str = 'charb'  # mse | charb | rawnerf | robustnerf.
  charb_padding: float = 0.001  # Charbonnier padding.
  data_loss_mult: float = 1.0  # Mult for the finest data loss.
  data_coarse_loss_mult: float = 0.0  # Mult for coarser data losses.
  interlevel_loss_mult: float = 1.0  # Mult for the proposal loss.
  orientation_loss_mult: float = 0.0  # Mult for the orientation loss.
  orientation_coarse_loss_mult: float = 0.0  # Coarse orientation loss mult.
  # RobustNeRF loss hyperparameters.
  robustnerf_inlier_quantile: float = 0.5
  enable_robustnerf_loss: bool = False
  robustnerf_inner_patch_size: int = 8
  robustnerf_smoothed_filter_size: int = 3
  robustnerf_smoothed_inlier_quantile: float = 0.5
  robustnerf_inner_patch_inlier_quantile: float = 0.5
  orientation_loss_target: str = 'normals_pred'  # normals | normals_pred.
  predicted_normal_loss_mult: float = 0.0  # Predicted-normal loss mult.
  predicted_normal_coarse_loss_mult: float = 0.0  # Coarse variant.
  weight_decay_mults: Dict[str, Any] = dataclasses.field(default_factory=dict)

  lr_init: float = 0.002  # Initial learning rate.
  lr_final: float = 0.00002  # Final learning rate.
  lr_delay_steps: int = 512  # Warmup steps.
  lr_delay_mult: float = 0.01  # Warmup severity.
  adam_beta1: float = 0.9
  adam_beta2: float = 0.999
  adam_eps: float = 1e-6
  grad_max_norm: float = 0.001  # Per-MLP grad-norm clip; 0 disables.
  grad_max_val: float = 0.0  # Per-value grad clip; 0 disables.
  distortion_loss_mult: float = 0.01  # Mult for the distortion loss.

  # --- Eval. -----------------------------------------------------------------
  eval_only_once: bool = True  # Evaluate once vs poll for checkpoints.
  eval_save_output: bool = True  # Save predicted images.
  eval_save_ray_data: bool = False  # Save individual ray traces.
  eval_render_interval: int = 1  # Interval between saved images.
  eval_dataset_limit: int = jnp.iinfo(jnp.int32).max  # Max test images.
  eval_quantize_metrics: bool = True  # Run metrics on 8-bit images.
  eval_crop_borders: int = 0  # Crop border pixels before metrics.
  # Path to exported VGG-LPIPS weights (.npz, see ops/lpips.py); when set,
  # eval also writes metric_lpips_{step}.txt.  New field (the reference's
  # tables consume LPIPS but it never computes it in code).
  lpips_weights_path: Optional[str] = None

  # --- Render. ---------------------------------------------------------------
  render_video_fps: int = 60
  render_video_crf: int = 18
  render_path_frames: int = 120
  z_variation: float = 0.0  # Height variation in render path.
  z_phase: float = 0.0  # Phase offset for height variation.
  render_dist_percentile: float = 0.5
  render_dist_curve_fn: Callable[..., Any] = jnp.log
  render_path_file: Optional[str] = None  # Numpy render pose file.
  render_job_id: int = 0
  render_num_jobs: int = 1
  render_resolution: Optional[Tuple[int, int]] = None  # (width, height).
  render_focal: Optional[float] = None
  render_camtype: Optional[str] = None  # perspective | fisheye | pano.
  render_spherical: bool = False
  render_save_async: bool = True
  render_spline_keyframes: Optional[str] = None
  render_spline_n_interp: int = 30
  render_spline_degree: int = 5
  render_spline_smoothness: float = 0.03
  render_spline_interpolate_exposure: bool = False

  # --- Raw datasets (RawNeRF). ------------------------------------------------
  rawnerf_mode: bool = False  # Load raw images; train in raw color space.
  exposure_percentile: float = 97.0  # Percentile exposed as white.
  num_border_pixels_to_mask: int = 0  # Mask N-pixel borders in training.
  apply_bayer_mask: bool = False  # Apply the Bayer mosaic loss mask.
  autoexpose_renders: bool = False  # Autoexpose each rendered frame.
  eval_raw_affine_cc: bool = False  # Affine raw-space color correction.


def define_common_flags():
  """absl flags shared by train/eval/render (public CLI surface)."""
  from absl import flags  # Deferred: not every entry point uses absl.
  flags.DEFINE_string('mode', None, 'Unused; kept for CLI compatibility.')
  flags.DEFINE_string('base_folder', None,
                      'Unused; kept for CLI compatibility.')
  flags.DEFINE_multi_string('gin_bindings', None, 'Gin parameter bindings.')
  flags.DEFINE_multi_string('gin_configs', None, 'Gin config files.')


def load_config(save_config=True):
  """Parse gin flags into a Config; optionally checkpoint the resolved form."""
  from absl import flags  # Deferred import, as above.
  ginlite.add_search_path(os.path.join(os.path.dirname(__file__), '..'))
  ginlite.parse_config_files_and_bindings(flags.FLAGS.gin_configs,
                                          flags.FLAGS.gin_bindings)
  config = ginlite.make('Config')
  if save_config and jax.process_index() == 0:
    os.makedirs(config.checkpoint_dir, exist_ok=True)
    with open(os.path.join(config.checkpoint_dir, 'config.gin'), 'w') as f:
      f.write(ginlite.config_str())
  return config


def load_config_from_files(config_files, bindings=(), save_config=False):
  """Non-absl entry: parse the given files/bindings into a Config."""
  ginlite.add_search_path(os.path.join(os.path.dirname(__file__), '..'))
  ginlite.parse_config_files_and_bindings(config_files, bindings)
  config = ginlite.make('Config')
  if save_config and config.checkpoint_dir and jax.process_index() == 0:
    os.makedirs(config.checkpoint_dir, exist_ok=True)
    with open(os.path.join(config.checkpoint_dir, 'config.gin'), 'w') as f:
      f.write(ginlite.config_str())
  return config
