"""Evaluation entry point.

CLI-compatible with the reference's ``eval.py`` (google-research/multinerf):
renders every test image from the latest checkpoint (optionally polling for
new ones), computes PSNR/SSIM (+ color-corrected variants, disparity MSE,
normal MAE), writes prediction images and per-metric txt files with the same
names (``metric_{name}_{step}.txt``), and logs TB summaries.

Runs on the jit+mesh SPMD stack (no pmap / all_gather / keepalive psum).
"""

import functools
import os
import sys
import time

from absl import app
import jax
import numpy as np
from flax.metrics import tensorboard

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

  if config.eval_raw_affine_cc:
    from multinerf_tpu.data import raw as raw_lib
    cc_fun = raw_lib.match_images_affine
  else:
    cc_fun = image_ops.color_correct

  metric_harness = image_ops.MetricHarness(
      lpips_weights_path=config.lpips_weights_path)

  last_step = 0
  out_dir = os.path.join(
      config.checkpoint_dir,
      'path_renders' if config.render_path else 'test_preds')
  path_fn = lambda x: os.path.join(out_dir, x)

  ckpt = ckpt_lib.CheckpointManager(config.checkpoint_dir, keep=100)

  if not config.eval_only_once:
    summary_writer = tensorboard.SummaryWriter(
        os.path.join(config.checkpoint_dir, 'eval'))
  while True:
    state = ckpt.restore_latest(state)
    # Restored arrays land on one device; lay the state out on the mesh
    # (the scanned render closes over params, so they must already live
    # on the same device set as the jitted chunk renderer).
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    step = int(state.step)
    if step <= last_step:
      print(f'Checkpoint step {step} <= last step {last_step}, sleeping.')
      time.sleep(10)
      continue
    print(f'Evaluating checkpoint at step {step}.')
    if config.eval_save_output and not os.path.isdir(out_dir):
      os.makedirs(out_dir, exist_ok=True)

    num_eval = min(dataset.size, config.eval_dataset_limit)
    key = jax.random.PRNGKey(0 if config.deterministic_showcase else step)
    perm = jax.random.permutation(key, num_eval)
    showcase_indices = np.sort(perm[:config.num_showcase_images])

    metrics = []
    metrics_cc = []
    showcases = []
    render_times = []
    for idx in range(dataset.size):
      eval_start_time = time.time()
      batch = next(dataset)
      if idx >= num_eval:
        print(f'Skipping image {idx + 1}/{dataset.size}')
        continue
      print(f'Evaluating image {idx + 1}/{dataset.size}')
      rays = batch.rays
      train_frac = state.step / config.max_steps
      rendering = models.render_image(
          functools.partial(render_eval_pfn, state.params, train_frac),
          rays, None, config)

      if jax.process_index() != 0:  # Only record via process 0.
        continue

      render_times.append(time.time() - eval_start_time)
      print(f'Rendered in {render_times[-1]:0.3f}s')

      # f64 for a high-precision color-correction solve.
      gt_rgb = np.array(batch.rgb, dtype=np.float64)
      rendering['rgb'] = np.array(rendering['rgb'], dtype=np.float64)

      cc_start_time = time.time()
      rendering['rgb_cc'] = cc_fun(rendering['rgb'], gt_rgb)
      print(f'Color corrected in {(time.time() - cc_start_time):0.3f}s')

      if not config.eval_only_once and idx in showcase_indices:
        showcase_idx = idx if config.deterministic_showcase else len(showcases)
        showcases.append((showcase_idx, rendering, batch))
      if not config.render_path:
        rgb = postprocess_fn(rendering['rgb'])
        rgb_cc = postprocess_fn(rendering['rgb_cc'])
        rgb_gt = postprocess_fn(gt_rgb)

        if config.eval_quantize_metrics:
          # Written-to-disk images must reproduce the metrics exactly.
          rgb = np.round(rgb * 255) / 255
          rgb_cc = np.round(rgb_cc * 255) / 255

        if config.eval_crop_borders > 0:
          crop_fn = lambda x, c=config.eval_crop_borders: x[c:-c, c:-c]
          rgb = crop_fn(rgb)
          rgb_cc = crop_fn(rgb_cc)
          rgb_gt = crop_fn(rgb_gt)

        metric = metric_harness(rgb, rgb_gt)
        metric_cc = metric_harness(rgb_cc, rgb_gt)

        if config.compute_disp_metrics:
          for tag in ['mean', 'median']:
            k = f'distance_{tag}'
            if k in rendering:
              disparity = 1 / (1 + rendering[k])
              metric[f'disparity_{tag}_mse'] = float(
                  ((disparity - batch.disps)**2).mean())

        if config.compute_normal_metrics:
          weights = rendering['acc'] * batch.alphas
          normalized_normals_gt = ref_utils.l2_normalize(batch.normals)
          for k, val in rendering.items():
            if k.startswith('normals') and val is not None:
              normalized_normals = ref_utils.l2_normalize(val)
              metric[k + '_mae'] = float(ref_utils.compute_weighted_mae(
                  weights, normalized_normals, normalized_normals_gt))

        for m, v in metric.items():
          print(f'{m:30s} = {v:.4f}')

        metrics.append(metric)
        metrics_cc.append(metric_cc)

      if config.eval_save_output and (config.eval_render_interval > 0):
        if (idx % config.eval_render_interval) == 0:
          io_lib.save_img_u8(postprocess_fn(rendering['rgb']),
                             path_fn(f'color_{idx:03d}.png'))
          io_lib.save_img_u8(postprocess_fn(rendering['rgb_cc']),
                             path_fn(f'color_cc_{idx:03d}.png'))

          for k in ['distance_mean', 'distance_median']:
            if k in rendering:
              io_lib.save_img_f32(rendering[k],
                                  path_fn(f'{k}_{idx:03d}.tiff'))

          for k in ['normals']:
            if k in rendering:
              io_lib.save_img_u8(rendering[k] / 2.0 + 0.5,
                                 path_fn(f'{k}_{idx:03d}.png'))

          io_lib.save_img_f32(rendering['acc'], path_fn(f'acc_{idx:03d}.tiff'))

    if (not config.eval_only_once) and (jax.process_index() == 0):
      summary_writer.scalar('eval_median_render_time',
                            np.median(render_times), step)
      for name in metrics[0]:
        scores = [m[name] for m in metrics]
        summary_writer.scalar('eval_metrics/' + name, np.mean(scores), step)
        summary_writer.histogram('eval_metrics/' + 'perimage_' + name,
                                 scores, step)
      for name in metrics_cc[0]:
        scores = [m[name] for m in metrics_cc]
        summary_writer.scalar('eval_metrics_cc/' + name, np.mean(scores),
                              step)
        summary_writer.histogram('eval_metrics_cc/' + 'perimage_' + name,
                                 scores, step)

      for i, r, b in showcases:
        if config.vis_decimate > 1:
          d = config.vis_decimate
          decimate_fn = lambda x, d=d: None if x is None else x[::d, ::d]
        else:
          decimate_fn = lambda x: x
        r = jax.tree_util.tree_map(decimate_fn, r)
        b = jax.tree_util.tree_map(decimate_fn, b)
        visualizations = vis.visualize_suite(r, b.rays)
        for k, v in visualizations.items():
          if k == 'color':
            v = postprocess_fn(v)
          summary_writer.image(f'output_{k}_{i}', v, step)
        if not config.render_path:
          target = postprocess_fn(b.rgb)
          summary_writer.image(f'true_color_{i}', target, step)
          pred = postprocess_fn(visualizations['color'])
          residual = np.clip(pred - target + 0.5, 0, 1)
          summary_writer.image(f'true_residual_{i}', residual, step)
          if config.compute_normal_metrics:
            summary_writer.image(f'true_normals_{i}', b.normals / 2.0 + 0.5,
                                 step)

    if (config.eval_save_output and (not config.render_path) and
        (jax.process_index() == 0)):
      with open(path_fn(f'render_times_{step}.txt'), 'w') as f:
        f.write(' '.join([str(r) for r in render_times]))
      for name in metrics[0]:
        with open(path_fn(f'metric_{name}_{step}.txt'), 'w') as f:
          f.write(' '.join([str(m[name]) for m in metrics]))
      for name in metrics_cc[0]:
        with open(path_fn(f'metric_cc_{name}_{step}.txt'), 'w') as f:
          f.write(' '.join([str(m[name]) for m in metrics_cc]))
      if config.eval_save_ray_data:
        for i, r, b in showcases:
          rays = {k: v for k, v in r.items() if 'ray_' in k}
          np.set_printoptions(threshold=sys.maxsize)
          with open(path_fn(f'ray_data_{step}_{i}.txt'), 'w') as f:
            f.write(repr(rays))

    if config.eval_only_once:
      break
    if config.early_exit_steps is not None:
      num_steps = config.early_exit_steps
    else:
      num_steps = config.max_steps
    if int(step) >= num_steps:
      break
    last_step = step


if __name__ == '__main__':
  app.run(main)
