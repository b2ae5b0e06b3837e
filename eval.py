"""Evaluation entry point.

CLI-compatible with the reference's ``eval.py`` (google-research/multinerf):
renders every test image from the latest checkpoint (optionally polling for
new ones), computes PSNR/SSIM (+ color-corrected variants, disparity MSE,
normal MAE), writes prediction images and per-metric txt files with the same
names (``metric_{name}_{step}.txt``), and logs TB summaries.

Architecture (vs the reference's single render->score loop, eval.py:92-247
there): frames flow through a two-stage pipeline — the compile-once
``ImageRenderer`` keeps the NEXT frame rendering on the device mesh while
the host scores the previous one — and the scoring/saving/logging stages
are standalone functions over a per-frame record, not inlined in the loop.
"""

import os
import sys
import time

from absl import app
import jax
import numpy as np

from multinerf_tpu import configs
from multinerf_tpu import train_lib
from multinerf_tpu.data import datasets
from multinerf_tpu.models import nerf as models
from multinerf_tpu.ops import image_ops
from multinerf_tpu.ops import ref_utils
from multinerf_tpu.parallel import mesh as mesh_lib
from multinerf_tpu.utils import checkpoints as ckpt_lib
from multinerf_tpu.utils import io as io_lib
from multinerf_tpu.utils import visualize as vis

configs.define_common_flags()
jax.config.parse_flags_with_absl()

from multinerf_tpu.utils import cache as _cache
_cache.enable_persistent_compilation_cache()


# Re-exported for callers/tests; implementation is shared with render.py.
make_postprocess_fns = image_ops.make_postprocess_fns


def prepare_frame(rendering, batch, cc_fn):
  """Host prep shared by scoring and saving: f64 rgb + color correction."""
  rendering['rgb'] = np.asarray(rendering['rgb'], np.float64)
  gt = np.asarray(batch.rgb, np.float64) if batch.rgb is not None else None
  if gt is not None:
    t0 = time.time()
    rendering['rgb_cc'] = cc_fn(rendering['rgb'], gt)
    print(f'Color corrected in {time.time() - t0:0.3f}s')
  return gt


def score_frame(rendering, batch, gt, config, metric_harness,
                postprocess_fn):
  """Quality metrics for one frame: (raw dict, color-corrected dict)."""

  def to_metric_space(img, quantize):
    img = postprocess_fn(img)
    if quantize and config.eval_quantize_metrics:
      # Written-to-disk images must reproduce the metrics exactly.
      # Ground truth is never written, so it is never quantized.
      img = np.round(img * 255) / 255
    c = config.eval_crop_borders
    return img[c:-c, c:-c] if c > 0 else img

  gt_m = to_metric_space(gt, quantize=False)
  metric = metric_harness(
      to_metric_space(rendering['rgb'], quantize=True), gt_m)
  metric_cc = metric_harness(
      to_metric_space(rendering['rgb_cc'], quantize=True), gt_m)

  if config.compute_disp_metrics:
    for key in ('distance_mean', 'distance_median'):
      if key in rendering:
        disp = 1 / (1 + rendering[key])
        tag = key.split('_')[1]
        metric[f'disparity_{tag}_mse'] = float(
            np.mean((disp - batch.disps) ** 2))

  if config.compute_normal_metrics:
    mae_weights = rendering['acc'] * batch.alphas
    gt_normals = ref_utils.l2_normalize(batch.normals)
    for key, val in rendering.items():
      if key.startswith('normals') and val is not None:
        metric[key + '_mae'] = float(ref_utils.compute_weighted_mae(
            mae_weights, ref_utils.l2_normalize(val), gt_normals))

  for name, value in metric.items():
    print(f'{name:30s} = {value:.4f}')
  return metric, metric_cc


def save_frame_outputs(rendering, idx, out_dir, postprocess_fn):
  """Prediction images for one frame, reference-named files."""
  tag = f'{idx:03d}'
  io_lib.save_img_u8(postprocess_fn(rendering['rgb']),
                     os.path.join(out_dir, f'color_{tag}.png'))
  if 'rgb_cc' in rendering:
    io_lib.save_img_u8(postprocess_fn(rendering['rgb_cc']),
                       os.path.join(out_dir, f'color_cc_{tag}.png'))
  for key in ('distance_mean', 'distance_median'):
    if key in rendering:
      io_lib.save_img_f32(rendering[key],
                          os.path.join(out_dir, f'{key}_{tag}.tiff'))
  if 'normals' in rendering:
    io_lib.save_img_u8(rendering['normals'] / 2 + 0.5,
                       os.path.join(out_dir, f'normals_{tag}.png'))
  io_lib.save_img_f32(rendering['acc'],
                      os.path.join(out_dir, f'acc_{tag}.tiff'))


def pick_showcases(config, num_eval, step):
  """Deterministic-or-per-step choice of TB showcase frame indices."""
  if config.eval_only_once:
    return np.array([], int)
  key = jax.random.PRNGKey(0 if config.deterministic_showcase else step)
  perm = jax.random.permutation(key, num_eval)
  return np.sort(np.asarray(perm[:config.num_showcase_images]))


def render_frames(renderer, dataset, state, config, num_eval,
                  device_cast=False):
  """Yield (idx, batch, host rendering, render seconds), pipelined.

  Stage 1 (device): dispatch frame idx+1 through the compile-once
  renderer.  Stage 2 (host): fetch + yield frame idx for scoring while
  the mesh works on idx+1.

  device_cast=True dispatches by camera index (rays cast in-jit from the
  uploaded cameras); the host batch is still generated afterwards for
  ground truth + vis, overlapped with the device render.

  The yielded render time counts only time spent blocked on this
  generator's own work (dispatch + batch construction + device fetch) —
  the consumer's scoring/saving between yields is excluded, keeping the
  exported render_times comparable to an unpipelined render.
  """
  train_frac = float(state.step) / config.max_steps
  in_flight = None  # (idx, batch, device rendering, dispatch seconds)

  for idx in range(dataset.size):
    if idx >= num_eval:
      next(dataset)
      print(f'Skipping image {idx + 1}/{dataset.size}')
      continue
    print(f'Evaluating image {idx + 1}/{dataset.size}')
    t0 = time.time()
    if device_cast:
      # Dispatch first (one int32 to the device), THEN pay the host-side
      # ray cast for the ground-truth batch while the mesh renders.
      device_rendering = renderer(state.params, train_frac, idx,
                                  fetch=False)
      batch = next(dataset)
    else:
      batch = next(dataset)
      device_rendering = renderer(state.params, train_frac, batch.rays,
                                  fetch=False)
    dispatch_s = time.time() - t0
    if in_flight is not None:
      t0 = time.time()
      host_rendering = jax.device_get(in_flight[2])
      yield in_flight[0], in_flight[1], host_rendering, (
          in_flight[3] + time.time() - t0)
    in_flight = (idx, batch, device_rendering, dispatch_s)
  if in_flight is not None:
    t0 = time.time()
    host_rendering = jax.device_get(in_flight[2])
    yield in_flight[0], in_flight[1], host_rendering, (
        in_flight[3] + time.time() - t0)


def log_tb_summaries(summary_writer, step, config, frame_metrics,
                     showcases, render_times, postprocess_fn):
  """Aggregate scalars/histograms and showcase image suites."""
  summary_writer.scalar('eval_median_render_time',
                        np.median(render_times), step)
  for group, per_frame in frame_metrics.items():
    for name in (per_frame[0] if per_frame else ()):
      scores = [m[name] for m in per_frame]
      summary_writer.scalar(f'{group}/{name}', np.mean(scores), step)
      summary_writer.histogram(f'{group}/perimage_{name}', scores, step)

  thin = (lambda x: None if x is None else
          x[::config.vis_decimate, ::config.vis_decimate]
          ) if config.vis_decimate > 1 else (lambda x: x)
  for i, rendering, batch in showcases:
    rendering = jax.tree_util.tree_map(thin, rendering)
    batch = jax.tree_util.tree_map(thin, batch)
    suite = vis.visualize_suite(rendering, batch.rays)
    for name, img in suite.items():
      if name == 'color':
        img = postprocess_fn(img)
      summary_writer.image(f'output_{name}_{i}', img, step)
    if not config.render_path:
      target = postprocess_fn(batch.rgb)
      summary_writer.image(f'true_color_{i}', target, step)
      pred = postprocess_fn(suite['color'])
      summary_writer.image(f'true_residual_{i}',
                           np.clip(pred - target + 0.5, 0, 1), step)
      if config.compute_normal_metrics:
        summary_writer.image(f'true_normals_{i}', batch.normals / 2 + 0.5,
                             step)


def write_metric_files(out_dir, step, config, frame_metrics, render_times,
                       showcases):
  """Per-metric txt exports (the generate_tables scrape contract)."""

  def dump(name, values):
    with open(os.path.join(out_dir, name), 'w') as f:
      f.write(' '.join(str(v) for v in values))

  dump(f'render_times_{step}.txt', render_times)
  prefix = {'eval_metrics': 'metric_', 'eval_metrics_cc': 'metric_cc_'}
  for group, per_frame in frame_metrics.items():
    for name in (per_frame[0] if per_frame else ()):
      dump(f'{prefix[group]}{name}_{step}.txt',
           [m[name] for m in per_frame])
  if config.eval_save_ray_data:
    np.set_printoptions(threshold=sys.maxsize)
    for i, rendering, _ in showcases:
      bundles = {k: v for k, v in rendering.items() if 'ray_' in k}
      with open(os.path.join(out_dir, f'ray_data_{step}_{i}.txt'),
                'w') as f:
        f.write(repr(bundles))


def evaluate_checkpoint(state, step, renderer, dataset, config, out_dir,
                        summary_writer, postprocess_fn, cc_fn,
                        metric_harness, device_cast=False):
  """Render + score every test frame of one checkpoint."""
  num_eval = min(dataset.size, config.eval_dataset_limit)
  showcase_indices = pick_showcases(config, num_eval, step)

  metrics, metrics_cc = [], []
  showcases = []
  render_times = []
  for idx, batch, rendering, render_s in render_frames(
      renderer, dataset, state, config, num_eval, device_cast=device_cast):
    if jax.process_index() != 0:  # Only record via process 0.
      continue
    render_times.append(render_s)
    print(f'Rendered in {render_times[-1]:0.3f}s')

    gt = prepare_frame(rendering, batch, cc_fn)
    if idx in showcase_indices:
      order = idx if config.deterministic_showcase else len(showcases)
      showcases.append((order, rendering, batch))
    if not config.render_path:
      metric, metric_cc = score_frame(rendering, batch, gt, config,
                                      metric_harness, postprocess_fn)
      metrics.append(metric)
      metrics_cc.append(metric_cc)
    if (config.eval_save_output and config.eval_render_interval > 0 and
        idx % config.eval_render_interval == 0):
      save_frame_outputs(rendering, idx, out_dir, postprocess_fn)

  if jax.process_index() != 0:
    return
  frame_metrics = {'eval_metrics': metrics, 'eval_metrics_cc': metrics_cc}
  if summary_writer is not None:
    log_tb_summaries(summary_writer, step, config, frame_metrics,
                     showcases, render_times, postprocess_fn)
  if config.eval_save_output and not config.render_path:
    write_metric_files(out_dir, step, config, frame_metrics, render_times,
                       showcases)


def main(unused_argv):
  config = configs.load_config(save_config=False)
  dataset = datasets.load_dataset('test', config.data_dir, config)

  mesh = mesh_lib.create_mesh()
  key = jax.random.PRNGKey(20200823)
  _, state, render_eval_pfn, _, _ = train_lib.setup_model(config, key,
                                                          mesh=mesh)
  # Prefer in-jit ray casting (dispatch by camera index; one scalar to
  # the device per frame); pano paths cast on host.
  device_renderer = models.DeviceImageRenderer(render_eval_pfn, config,
                                               dataset, mesh=mesh)
  device_cast = device_renderer.supports()
  renderer = (device_renderer if device_cast
              else models.ImageRenderer(render_eval_pfn, config, mesh=mesh))

  postprocess_fn, cc_fn = make_postprocess_fns(config, dataset)
  metric_harness = image_ops.MetricHarness(
      lpips_weights_path=config.lpips_weights_path)

  out_dir = os.path.join(
      config.checkpoint_dir,
      'path_renders' if config.render_path else 'test_preds')
  ckpt = ckpt_lib.CheckpointManager(config.checkpoint_dir, keep=100)
  summary_writer = None
  if not config.eval_only_once:
    from flax.metrics import tensorboard
    summary_writer = tensorboard.SummaryWriter(
        os.path.join(config.checkpoint_dir, 'eval'))

  last_step = 0
  while True:
    state = ckpt.restore_latest(state)
    # Restored arrays land on one device; lay the state out on the mesh
    # (the render fn expects params resident on the same device set).
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    step = int(state.step)
    if step <= last_step:
      print(f'Checkpoint step {step} <= last step {last_step}, sleeping.')
      time.sleep(10)
      continue
    print(f'Evaluating checkpoint at step {step}.')
    if config.eval_save_output:
      os.makedirs(out_dir, exist_ok=True)

    evaluate_checkpoint(state, step, renderer, dataset, config, out_dir,
                        summary_writer, postprocess_fn, cc_fn,
                        metric_harness, device_cast=device_cast)

    if config.eval_only_once:
      break
    stop_at = (config.early_exit_steps if config.early_exit_steps is not None
               else config.max_steps)
    if step >= stop_at:
      break
    last_step = step


if __name__ == '__main__':
  app.run(main)
