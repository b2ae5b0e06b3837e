"""Render entry point: render a camera path from a checkpoint.

CLI-compatible with the reference's ``render.py`` (google-research/
multinerf): multi-job frame striping (render_job_id/render_num_jobs),
resume-by-skipping-existing-frames, async PNG/TIFF saving, and h264 video
assembly with the same file naming.
"""

import concurrent.futures
import functools
import glob
import os
import time

from absl import app
import jax
import numpy as np

from multinerf_tpu import configs
from multinerf_tpu import train_lib
from multinerf_tpu.data import datasets
from multinerf_tpu.models import nerf as models
from multinerf_tpu.parallel import mesh as mesh_lib
from multinerf_tpu.utils import checkpoints as ckpt_lib
from multinerf_tpu.utils import io as io_lib
from multinerf_tpu.utils import video as video_lib
from multinerf_tpu.utils import visualize as vis

configs.define_common_flags()
jax.config.parse_flags_with_absl()

from multinerf_tpu.utils import cache as _cache
_cache.enable_persistent_compilation_cache()


def create_videos(config, base_dir, out_dir, out_name, num_frames):
  """Assemble the saved frames into per-channel videos."""
  names = [n for n in config.checkpoint_dir.split('/') if n]
  # Last two path parts are experiment and scene name.
  exp_name, scene_name = names[-2:] if len(names) >= 2 else ('exp', names[-1])
  video_prefix = f'{scene_name}_{exp_name}_{out_name}'

  zpad = max(3, len(str(num_frames - 1)))
  idx_to_str = lambda idx: str(idx).zfill(zpad)

  os.makedirs(base_dir, exist_ok=True)

  # One example frame gives the shape and the depth normalization range.
  depth_file = os.path.join(out_dir, f'distance_mean_{idx_to_str(0)}.tiff')
  depth_frame = io_lib.load_img(depth_file)
  shape = depth_frame.shape
  p = config.render_dist_percentile
  distance_limits = np.percentile(depth_frame.flatten(), [p, 100 - p])
  lo, hi = [config.render_dist_curve_fn(x) for x in distance_limits]
  print(f'Video shape is {shape[:2]}')

  for k in ['color', 'normals', 'acc', 'distance_mean', 'distance_median']:
    video_file = os.path.join(base_dir, f'{video_prefix}_{k}.mp4')
    file_ext = 'png' if k in ['color', 'normals'] else 'tiff'
    file0 = os.path.join(out_dir, f'{k}_{idx_to_str(0)}.{file_ext}')
    if not os.path.exists(file0):
      print(f'Images missing for tag {k}')
      continue
    print(f'Making video {video_file}...')
    with video_lib.VideoWriter(video_file, fps=config.render_video_fps,
                               shape=shape[:2],
                               crf=config.render_video_crf) as writer:
      for idx in range(num_frames):
        img_file = os.path.join(out_dir,
                                f'{k}_{idx_to_str(idx)}.{file_ext}')
        if not os.path.exists(img_file):
          raise ValueError(f'Image file {img_file} does not exist.')
        img = io_lib.load_img(img_file)
        if k in ['color', 'normals']:
          img = img / 255.0
        elif k.startswith('distance'):
          img = np.array(config.render_dist_curve_fn(img))
          img = np.clip((img - np.minimum(lo, hi)) / np.abs(hi - lo), 0, 1)
          img = np.array(vis._get_cmap('turbo')(img))[..., :3]

        frame = (np.clip(np.nan_to_num(img), 0.0, 1.0) * 255.0).astype(
            np.uint8)
        writer.add_image(frame)


def main(unused_argv):
  config = configs.load_config(save_config=False)

  dataset = datasets.load_dataset('test', config.data_dir, config)

  mesh = mesh_lib.create_mesh()
  key = jax.random.PRNGKey(20200823)
  _, state, render_eval_pfn, _, _ = train_lib.setup_model(config, key,
                                                          mesh=mesh)

  if config.rawnerf_mode:
    postprocess_fn = dataset.metadata['postprocess_fn']
  else:
    postprocess_fn = lambda z: z

  ckpt = ckpt_lib.CheckpointManager(config.checkpoint_dir, keep=100)
  state = ckpt.restore_latest(state)
  # Mesh layout: the scanned render closes over params as constants.
  state = jax.device_put(state, mesh_lib.replicated(mesh))
  step = int(state.step)
  print(f'Rendering checkpoint at step {step}.')

  out_name = 'path_renders' if config.render_path else 'test_preds'
  out_name = f'{out_name}_step_{step}'
  base_dir = config.render_dir
  if base_dir is None:
    base_dir = os.path.join(config.checkpoint_dir, 'render')
  out_dir = os.path.join(base_dir, out_name)
  os.makedirs(out_dir, exist_ok=True)

  path_fn = lambda x: os.path.join(out_dir, x)

  zpad = max(3, len(str(dataset.size - 1)))
  idx_to_str = lambda idx: str(idx).zfill(zpad)

  if config.render_save_async:
    async_executor = concurrent.futures.ThreadPoolExecutor(max_workers=4)
    async_futures = []

    def save_fn(fn, *args, **kwargs):
      async_futures.append(async_executor.submit(fn, *args, **kwargs))
  else:
    def save_fn(fn, *args, **kwargs):
      fn(*args, **kwargs)

  for idx in range(dataset.size):
    # Frame striping across independent render jobs.
    if idx % config.render_num_jobs != config.render_job_id:
      continue
    # Resume: if this frame and the next assigned one exist, skip.
    idx_str = idx_to_str(idx)
    curr_file = path_fn(f'color_{idx_str}.png')
    next_idx_str = idx_to_str(idx + config.render_num_jobs)
    next_file = path_fn(f'color_{next_idx_str}.png')
    if os.path.exists(curr_file) and os.path.exists(next_file):
      print(f'Image {idx}/{dataset.size} already exists, skipping')
      continue
    print(f'Evaluating image {idx + 1}/{dataset.size}')
    eval_start_time = time.time()
    rays = dataset.generate_ray_batch(idx).rays
    train_frac = 1.0
    rendering = models.render_image(
        functools.partial(render_eval_pfn, state.params, train_frac),
        rays, None, config)
    print(f'Rendered in {(time.time() - eval_start_time):0.3f}s')

    if jax.process_index() != 0:  # Only record via process 0.
      continue

    rendering['rgb'] = postprocess_fn(rendering['rgb'])

    save_fn(io_lib.save_img_u8, rendering['rgb'],
            path_fn(f'color_{idx_str}.png'))
    if 'normals' in rendering:
      save_fn(io_lib.save_img_u8, rendering['normals'] / 2.0 + 0.5,
              path_fn(f'normals_{idx_str}.png'))
    save_fn(io_lib.save_img_f32, rendering['distance_mean'],
            path_fn(f'distance_mean_{idx_str}.tiff'))
    save_fn(io_lib.save_img_f32, rendering['distance_median'],
            path_fn(f'distance_median_{idx_str}.tiff'))
    save_fn(io_lib.save_img_f32, rendering['acc'],
            path_fn(f'acc_{idx_str}.tiff'))

  if config.render_save_async:
    async_executor.shutdown(wait=True)
    # Surface exceptions from worker threads.
    for future in async_futures:
      future.result()

  time.sleep(1)
  num_files = len(glob.glob(path_fn('acc_*.tiff')))
  if jax.process_index() == 0 and num_files == dataset.size:
    print(f'All files found, creating videos (job {config.render_job_id}).')
    create_videos(config, base_dir, out_dir, out_name, dataset.size)


if __name__ == '__main__':
  app.run(main)
