"""Render entry point: render a camera path from a checkpoint.

CLI-compatible with the reference's ``render.py`` (google-research/
multinerf): multi-job frame striping (render_job_id/render_num_jobs),
resume-by-skipping-existing-frames, async PNG/TIFF saving, and h264 video
assembly with the same file naming.

Architecture: a ``FrameStore`` owns every on-disk concern (names, zero
padding, async writes, existence checks, decoding frames back for video);
the main loop pipelines frames through the compile-once ``ImageRenderer``
(next frame rendering on the mesh while this one writes); video assembly
walks tag specs instead of an inlined per-tag branch ladder.
"""

import concurrent.futures
import os
import time

from absl import app
import jax
import numpy as np

from multinerf_tpu import configs
from multinerf_tpu import train_lib
from multinerf_tpu.data import datasets
from multinerf_tpu.models import nerf as models
from multinerf_tpu.ops import image_ops
from multinerf_tpu.parallel import mesh as mesh_lib
from multinerf_tpu.utils import checkpoints as ckpt_lib
from multinerf_tpu.utils import io as io_lib
from multinerf_tpu.utils import video as video_lib
from multinerf_tpu.utils import visualize as vis

configs.define_common_flags()
jax.config.parse_flags_with_absl()

from multinerf_tpu.utils import cache as _cache
_cache.enable_persistent_compilation_cache()

# Channels that become videos: tag -> (file extension, u8-encoded?).
VIDEO_TAGS = {
    'color': ('png', True),
    'normals': ('png', True),
    'acc': ('tiff', False),
    'distance_mean': ('tiff', False),
    'distance_median': ('tiff', False),
}


class FrameStore:
  """All on-disk frame handling for one render job.

  Owns the output directory layout, zero-padded frame naming, optional
  async write pool, and reading frames back for video assembly.
  """

  def __init__(self, out_dir, num_frames, use_async=True):
    self.out_dir = out_dir
    self._digits = max(3, len(str(num_frames - 1)))
    self._pool = (concurrent.futures.ThreadPoolExecutor(max_workers=4)
                  if use_async else None)
    self._writes = []
    os.makedirs(out_dir, exist_ok=True)

  def frame_name(self, tag, idx):
    ext = VIDEO_TAGS.get(tag, ('png',))[0]
    return os.path.join(self.out_dir, f'{tag}_{idx:0{self._digits}d}.{ext}')

  def has_frame(self, idx):
    return os.path.exists(self.frame_name('color', idx))

  def count_frames(self, tag='acc'):
    import glob
    ext = VIDEO_TAGS[tag][0]
    return len(glob.glob(os.path.join(self.out_dir, f'{tag}_*.{ext}')))

  def _write(self, fn, *args):
    if self._pool is not None:
      self._writes.append(self._pool.submit(fn, *args))
    else:
      fn(*args)

  def put(self, rendering, idx):
    """Queue one frame's channel images for writing."""
    self._write(io_lib.save_img_u8, rendering['rgb'],
                self.frame_name('color', idx))
    if 'normals' in rendering:
      self._write(io_lib.save_img_u8, rendering['normals'] / 2 + 0.5,
                  self.frame_name('normals', idx))
    for tag in ('distance_mean', 'distance_median', 'acc'):
      self._write(io_lib.save_img_f32, rendering[tag],
                  self.frame_name(tag, idx))

  def flush(self):
    """Finish pending writes; re-raise any worker exception."""
    if self._pool is not None:
      self._pool.shutdown(wait=True)
      for w in self._writes:
        w.result()

  def get(self, tag, idx):
    return io_lib.load_img(self.frame_name(tag, idx))


def video_name_prefix(config, out_name):
  """'{scene}_{experiment}_{out_name}' from the checkpoint path tail."""
  parts = [p for p in config.checkpoint_dir.split('/') if p]
  if len(parts) >= 2:
    experiment, scene = parts[-2], parts[-1]
  else:
    experiment, scene = 'exp', parts[-1]
  return f'{scene}_{experiment}_{out_name}'


def assemble_videos(config, store, base_dir, out_name, num_frames):
  """Encode each rendered channel's frame sequence into an mp4."""
  prefix = video_name_prefix(config, out_name)
  os.makedirs(base_dir, exist_ok=True)

  # Depth channels share one display normalization, fit on frame 0.
  first_depth = store.get('distance_mean', 0)
  shape = first_depth.shape[:2]
  p = config.render_dist_percentile
  span = np.percentile(first_depth.flatten(), [p, 100 - p])
  d_lo, d_hi = [config.render_dist_curve_fn(x) for x in span]
  print(f'Video shape is {shape}')

  def decode(tag, idx):
    """Read one stored frame back as float RGB in [0, 1]."""
    img = store.get(tag, idx)
    if VIDEO_TAGS[tag][1]:  # u8-encoded channels.
      return img / 255.0
    if tag.startswith('distance'):
      curved = np.asarray(config.render_dist_curve_fn(img))
      unit = np.clip((curved - min(d_lo, d_hi)) / abs(d_hi - d_lo), 0, 1)
      return np.asarray(vis._get_cmap('turbo')(unit))[..., :3]
    return img

  for tag in VIDEO_TAGS:
    if not os.path.exists(store.frame_name(tag, 0)):
      print(f'Images missing for tag {tag}')
      continue
    video_file = os.path.join(base_dir, f'{prefix}_{tag}.mp4')
    print(f'Making video {video_file}...')
    with video_lib.VideoWriter(video_file, fps=config.render_video_fps,
                               shape=shape,
                               crf=config.render_video_crf) as writer:
      for idx in range(num_frames):
        if not os.path.exists(store.frame_name(tag, idx)):
          raise ValueError(
              f'Image file {store.frame_name(tag, idx)} does not exist.')
        frame = np.clip(np.nan_to_num(decode(tag, idx)), 0, 1)
        writer.add_image((frame * 255).astype(np.uint8))


def plan_frames(config, store, num_frames):
  """This job's frame indices: stripe across jobs, skip finished work.

  A frame is only skipped when its successor in the stripe also exists —
  the last written frame may be a partial file from a preempted run, so
  it is always re-rendered (reference render.py resume semantics).
  """
  stride = config.render_num_jobs
  for idx in range(config.render_job_id, num_frames, stride):
    if store.has_frame(idx) and store.has_frame(idx + stride):
      print(f'Image {idx}/{num_frames} already exists, skipping')
      continue
    yield idx


def render_job(config, dataset, state, renderer, store, postprocess_fn,
               device_cast=False):
  """Render this job's frames, two stages deep: while the mesh renders
  frame n+1, the host post-processes and writes frame n.

  device_cast=True dispatches by camera index (rays cast in-jit from the
  uploaded cameras — one scalar to the device per frame); otherwise rays
  are cast on host and shipped per frame.
  """
  in_flight = None  # (idx, device rendering, dispatch seconds)
  frames_done = 0

  def complete(idx, device_rendering, dispatch_s):
    t0 = time.time()
    rendering = jax.device_get(device_rendering)
    # Dispatch + fetch only — the overlapped neighbor frames' ray casting
    # and PNG encodes are excluded (same accounting as eval.render_frames).
    print(f'Rendered in {dispatch_s + time.time() - t0:0.3f}s')
    if jax.process_index() == 0:
      rendering['rgb'] = postprocess_fn(rendering['rgb'])
      store.put(rendering, idx)

  for idx in plan_frames(config, store, dataset.size):
    print(f'Evaluating image {idx + 1}/{dataset.size}')
    t0 = time.time()
    if device_cast:
      device_rendering = renderer(state.params, 1.0, idx, fetch=False)
    else:
      rays = dataset.generate_ray_batch(idx).rays
      device_rendering = renderer(state.params, 1.0, rays, fetch=False)
    dispatch_s = time.time() - t0
    if in_flight is not None:
      complete(*in_flight)
      frames_done += 1
    in_flight = (idx, device_rendering, dispatch_s)
  if in_flight is not None:
    complete(*in_flight)
    frames_done += 1
  store.flush()
  return frames_done


def main(unused_argv):
  config = configs.load_config(save_config=False)
  dataset = datasets.load_dataset('test', config.data_dir, config)

  mesh = mesh_lib.create_mesh()
  key = jax.random.PRNGKey(20200823)
  _, state, render_eval_pfn, _, _ = train_lib.setup_model(config, key,
                                                          mesh=mesh)
  # Prefer in-jit ray casting (frames dispatch by camera index; nothing
  # but one scalar crosses to the device); pano paths cast on host.
  device_renderer = models.DeviceImageRenderer(render_eval_pfn, config,
                                               dataset, mesh=mesh)
  device_cast = device_renderer.supports()
  renderer = (device_renderer if device_cast
              else models.ImageRenderer(render_eval_pfn, config, mesh=mesh))

  postprocess_fn, _ = image_ops.make_postprocess_fns(config, dataset)

  ckpt = ckpt_lib.CheckpointManager(config.checkpoint_dir, keep=100)
  state = ckpt.restore_latest(state)
  state = jax.device_put(state, mesh_lib.replicated(mesh))
  step = int(state.step)
  print(f'Rendering checkpoint at step {step}.')

  out_name = 'path_renders' if config.render_path else 'test_preds'
  out_name = f'{out_name}_step_{step}'
  base_dir = config.render_dir
  if base_dir is None:
    base_dir = os.path.join(config.checkpoint_dir, 'render')
  store = FrameStore(os.path.join(base_dir, out_name), dataset.size,
                     use_async=config.render_save_async)

  render_job(config, dataset, state, renderer, store, postprocess_fn,
             device_cast=device_cast)

  # Whichever job finishes the set assembles the videos.
  time.sleep(1)
  if jax.process_index() == 0 and store.count_frames() == dataset.size:
    print(f'All files found, creating videos (job {config.render_job_id}).')
    assemble_videos(config, store, base_dir, out_name, dataset.size)


if __name__ == '__main__':
  app.run(main)
