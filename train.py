"""Training entry point.

CLI-compatible with the reference's ``train.py`` (google-research/multinerf):
``python train.py --gin_configs=configs/360.gin --gin_bindings=...``, the
same TensorBoard scalar names (train_steps_per_sec, train_rays_per_sec,
train_avg_psnr, ...), console lines, and checkpoint cadence.

Architecture differences (TPU-first): one jit'd SPMD step over a global
device mesh instead of pmap (no replicate/unreplicate, no per-device rng
stacking); orbax async checkpoints; batches stream to the mesh as global
arrays with one-step host->device prefetch.
"""

import gc
import os
import time

from absl import app
import jax
import jax.numpy as jnp
import numpy as np
from flax.metrics import tensorboard

from multinerf_tpu import configs
from multinerf_tpu import train_lib
from multinerf_tpu.data import datasets
from multinerf_tpu.models import nerf as models
from multinerf_tpu.ops import image_ops
from multinerf_tpu.parallel import mesh as mesh_lib
from multinerf_tpu.utils import checkpoints as ckpt_lib
from multinerf_tpu.utils import visualize as vis

configs.define_common_flags()
jax.config.parse_flags_with_absl()

from multinerf_tpu.utils import cache as _cache
_cache.enable_persistent_compilation_cache()

TIME_PRECISION = 1000  # Integer times are in milliseconds.


def prefetch_to_mesh(iterator, mesh, size=2):
  """Overlap host batch assembly + H2D with device compute."""
  import collections
  buf = collections.deque()
  while True:
    while len(buf) < size:
      buf.append(mesh_lib.shard_batch_to_global(mesh, next(iterator)))
    yield buf.popleft()


def in_train_test_render(step, renderer, state, train_frac, rng,
                         test_dataset, config, summary_writer,
                         metric_harness, postprocess_fn, cam_idx=None):
  """Render one held-out view mid-training; log speed, metrics, vis suite.

  The scalar/image tag names (test_rays_per_sec, train_metrics/*,
  test_true_*, test_output_*) and console lines are the observability
  contract shared with the reference trainer.

  cam_idx is not None means `renderer` is a DeviceImageRenderer: dispatch
  by camera index (rays cast in-jit), then generate the ground-truth
  batch on host while the mesh renders.
  """
  t0 = time.time()
  if cam_idx is not None:
    device_rendering = renderer(state.params, train_frac, cam_idx, rng=rng,
                                fetch=False)
    test_case = next(test_dataset)
    rendering = jax.device_get(device_rendering)
  else:
    test_case = next(test_dataset)
    rendering = renderer(state.params, train_frac, test_case.rays, rng=rng)
  if jax.process_index() != 0:
    return
  dt = time.time() - t0
  n_rays = int(np.prod(test_case.rays.directions.shape[:-1]))
  summary_writer.scalar('test_rays_per_sec', n_rays / dt, step)
  print(f'Eval {step}: {dt:0.3f}s., {n_rays / dt:0.0f} rays/sec')

  t0 = time.time()
  metric = metric_harness(postprocess_fn(rendering['rgb']),
                          postprocess_fn(test_case.rgb))
  print(f'Metrics computed in {time.time() - t0:0.3f}s')
  for name, val in metric.items():
    if not np.isnan(val):
      print(f'{name} = {val:.4f}')
      summary_writer.scalar('train_metrics/' + name, val, step)

  if config.vis_decimate > 1:
    d = config.vis_decimate
    thin = lambda x: None if x is None else x[::d, ::d]
    rendering = jax.tree_util.tree_map(thin, rendering)
    test_case = jax.tree_util.tree_map(thin, test_case)
  t0 = time.time()
  suite = vis.visualize_suite(rendering, test_case.rays)
  print(f'Visualized in {time.time() - t0:0.3f}s')

  # Ground-truth comparisons next to the suite, plus RawNeRF's extra
  # tone-mapping ladder when active.
  truths = {'test_true_color': test_case.rgb}
  if config.compute_normal_metrics:
    truths['test_true_normals'] = test_case.normals / 2 + 0.5
  if config.rawnerf_mode:
    suite['color_raw'] = rendering['rgb']
    suite['color_auto'] = postprocess_fn(rendering['rgb'], None)
    truths['test_true_auto'] = postprocess_fn(test_case.rgb, None)
    for p, level in test_dataset.metadata['exposure_levels'].items():
      suite[f'color/{p}'] = postprocess_fn(rendering['rgb'], level)
      truths[f'test_true_color/{p}'] = postprocess_fn(test_case.rgb, level)
  for tag, img in truths.items():
    summary_writer.image(tag, img, step)
  for name, img in suite.items():
    summary_writer.image('test_output_' + name, img, step)


def main(unused_argv):
  rng = jax.random.PRNGKey(20200823)
  # Shift the numpy seed per process so hosts sample different rays.
  np.random.seed(20201473 + jax.process_index())

  config = configs.load_config()

  if config.batch_size % jax.device_count() != 0:
    raise ValueError('Batch size must be divisible by the number of devices.')

  mesh = mesh_lib.create_mesh()

  dataset = datasets.load_dataset('train', config.data_dir, config)
  test_dataset = datasets.load_dataset('test', config.data_dir, config)

  if config.rawnerf_mode:
    postprocess_fn = test_dataset.metadata['postprocess_fn']
  else:
    postprocess_fn = lambda z, _=None: z

  rng, key = jax.random.split(rng)
  # stats_arg: whole-tree statistics are computed only on the steps whose
  # values get logged (print cadence) — see train_lib.create_train_step.
  setup = train_lib.setup_model(config, key, mesh=mesh, dataset=dataset,
                                stats_arg=True)
  model, state, render_eval_pfn, train_pstep, lr_fn = setup
  # In-train test renders reuse one compile-once whole-image renderer;
  # projective cameras render via in-jit ray casting (one int32 per
  # frame), pano falls back to host-cast rays.
  device_renderer = models.DeviceImageRenderer(render_eval_pfn, config,
                                               test_dataset, mesh=mesh)
  if device_renderer.supports():
    image_renderer = device_renderer
    in_train_device_cast = True
  else:
    image_renderer = models.ImageRenderer(render_eval_pfn, config, mesh=mesh)
    in_train_device_cast = False
  test_render_count = 0  # The fresh test dataset yields cameras 0,1,2,...

  cull_steps = {}  # capacity -> jitted culled step (the gate's ladder).
  cull_ladder = ()
  refresh_grid_fn = None
  cull_cap = None  # Currently engaged ladder capacity; None = uncull.
  cull_idx = 0  # Scan-path equivalent (0 = uncull, i = ladder[i-1]).
  if config.occupancy_culling:
    cull_ladder = tuple(sorted(
        config.occupancy_capacity_ladder or
        (config.occupancy_capacity_frac,)))
    if config.device_data_plane:
      # The scan-stepped device plane runs the whole culling protocol
      # (step choice, grid refresh, self-gating) inside the scan body —
      # see device_sampler.create_scan_train_step.
      if max(1, config.steps_per_jit_call) == 1:
        raise ValueError(
            'occupancy_culling with device_data_plane requires '
            'steps_per_jit_call > 1 (culling runs inside the scan).')
    else:
      from multinerf_tpu.models import culling
      for cap in cull_ladder:
        cull_steps[cap] = train_lib.create_train_step(
            model, config, mesh, dataset=dataset, cull=cap, stats_arg=True)
      refresh_grid_fn = culling.make_refresh_fn(model, config, mesh)

  device_plane = None
  scan_steps = 1
  if config.device_data_plane:
    # Keep the whole image set in HBM; batches are drawn inside the step.
    from multinerf_tpu.data import device_sampler
    device_plane = device_sampler.DeviceDataPlane(dataset, config, mesh)
    scan_steps = max(1, config.steps_per_jit_call)
    if scan_steps > 1:
      for name in ['print_every', 'checkpoint_every', 'train_render_every',
                   'gc_every']:
        val = getattr(config, name)
        if val > 0 and val % scan_steps:
          raise ValueError(
              f'{name}={val} must be a multiple of steps_per_jit_call='
              f'{scan_steps}')
      train_pstep_device = device_sampler.create_scan_train_step(
          model, config, device_plane, mesh, num_steps=scan_steps)
    else:
      train_pstep_device = device_sampler.create_device_train_step(
          model, config, device_plane, mesh)

  num_params = train_lib.tree_len(state.params)
  print(f'Number of parameters being optimized: {num_params}')

  if dataset.size > model.num_glo_embeddings and model.num_glo_features > 0:
    raise ValueError(f'Number of glo embeddings {model.num_glo_embeddings} '
                     f'must be at least equal to number of train images '
                     f'{dataset.size}')

  metric_harness = image_ops.MetricHarness()

  ckpt = ckpt_lib.CheckpointManager(config.checkpoint_dir, keep=100)
  state = ckpt.restore_latest(state)
  init_step = int(state.step) + 1
  # Lay the training state out on the mesh (replicated; or tensor-sharded
  # when a model axis is configured).
  state = jax.device_put(state, mesh_lib.replicated(mesh))

  if jax.process_index() == 0:
    summary_writer = tensorboard.SummaryWriter(config.checkpoint_dir)
    if config.rawnerf_mode:
      for name, data in zip(['train', 'test'], [dataset, test_dataset]):
        for k in ['exposure_idx', 'exposure_values', 'unique_shutters']:
          summary_writer.text(f'{name}_{k}', str(data.metadata[k]), 0)

  if device_plane is None:
    pdataset = prefetch_to_mesh(iter(dataset), mesh, 2)
  else:
    import itertools
    pdataset = itertools.repeat(None)  # The step samples its own batches.
  rng = jax.random.fold_in(rng, jax.process_index())
  gc.disable()  # Avoid GC jitter in the hot loop.
  total_time = 0
  total_steps = 0
  reset_stats = True
  if config.early_exit_steps is not None:
    num_steps = config.early_exit_steps
  else:
    num_steps = config.max_steps
  loss_threshold = 1.0
  for step0, batch in zip(range(init_step, num_steps + 1, scan_steps),
                          pdataset):
    # With scan_steps > 1, [step0, step] is the window of optimizer steps
    # executed by this jit call; all cadence checks use the window end.
    step = step0 + scan_steps - 1

    if reset_stats and (jax.process_index() == 0):
      stats_buffer = []
      train_start_time = time.time()
      reset_stats = False

    # Optional jax.profiler capture window.
    if config.profile_step > 0 and step0 <= config.profile_step <= step:
      jax.profiler.start_trace(
          os.path.join(config.checkpoint_dir, 'profile'))
    if (config.profile_step > 0 and step0 <=
        config.profile_step + config.profile_num_steps <= step):
      jax.profiler.stop_trace()

    learning_rate = lr_fn(step)
    train_frac = jnp.clip((step - 1) / (config.max_steps - 1), 0, 1)

    # True exactly when this iteration will print: tree stats are computed
    # on the logged step only (the lax.cond inside the step skips the
    # whole-tree reductions on the other ~99% of steps).
    will_print = step0 == init_step or step % config.print_every == 0

    if device_plane is None:
      step_fn = train_pstep
      if (cull_cap is not None and cull_cap in cull_steps and
          step0 > config.occupancy_warmup_steps):
        step_fn = cull_steps[cull_cap]
      state, stats, rng = step_fn(rng, state, batch, train_frac,
                                  loss_threshold, will_print)
      if (refresh_grid_fn is not None and
          step % config.occupancy_grid_refresh_every == 0):
        # Probe the NerfMLP at every grid cell so wrongly-culled cells can
        # recover (their samples never reach the MLP during normal steps).
        new_grid = refresh_grid_fn(state.params, jax.random.PRNGKey(step))
        state = state.replace(
            params={**state.params, 'occupancy': {'grid': new_grid}})
        # Self-gating: cull only while the measured occupied fraction fits
        # a ladder capacity — otherwise the compaction would drop LIVE
        # samples and bias the learned density field.  Picks the SMALLEST
        # rung that fits (checked at refresh cadence, one scalar fetch);
        # moves both ways as the scene evolves.
        kf = stats.get('occ_keep_frac')
        if kf is not None:
          kf = float(kf)
          cull_cap = next((c for c in cull_ladder if kf <= c), None)
    elif scan_steps > 1:
      state, stats, rng, loss_threshold, cull_idx = train_pstep_device(
          rng, state, step0, loss_threshold, cull_idx)
    else:
      state, stats, rng = train_pstep_device(rng, state, train_frac,
                                             loss_threshold, will_print)
    if config.enable_robustnerf_loss and scan_steps == 1:
      loss_threshold = stats['loss_threshold']

    if step % config.gc_every == 0:
      gc.collect()

    # Training summaries (host 0 logs; all hosts execute eval renders).
    if jax.process_index() == 0:
      # Scanned windows stay STACKED ([scan_steps, ...] leaves) and on
      # device until print time: per-step unstacking here would issue one
      # slice dispatch per leaf per step (~leaves*scan_steps tiny device
      # ops per window), which dwarfs the step itself on a remote chip.
      stats_buffer.append(stats)
      # Kick off D2H for this window's stats now so the transfer rides
      # along behind the already-dispatched next step; the print-time
      # device_get then finds ~everything already on host instead of
      # paying per-leaf round-trip latency for the whole buffer at once.
      jax.tree_util.tree_map(
          lambda x: x.copy_to_host_async()
          if hasattr(x, 'copy_to_host_async') else None, stats)

      if step0 == init_step or step % config.print_every == 0:
        stats_buffer = jax.device_get(stats_buffer)
        elapsed_time = time.time() - train_start_time
        steps_per_sec = config.print_every / elapsed_time
        rays_per_sec = config.batch_size * steps_per_sec

        # Robust total-time accumulation, resilient to preemption.
        total_time += int(round(TIME_PRECISION * elapsed_time))
        total_steps += config.print_every
        approx_total_time = int(round(step * total_time / total_steps))

        # Transpose the stats buffer: key -> stacked array over steps.
        import flax
        fs = [flax.traverse_util.flatten_dict(s, sep='/')
              for s in stats_buffer]
        if scan_steps > 1:
          # Each window already carries a leading step axis; join windows.
          stats_stacked = {k: np.concatenate([np.asarray(f[k]) for f in fs])
                           for k in fs[0]}
        else:
          stats_stacked = {k: np.stack([f[k] for f in fs]) for k in fs[0]}

        # Tree statistics were only computed on logged steps (stats_arg
        # decimation); keep just those rows so the zero placeholders from
        # skipped steps never reach the summaries.
        tree_stat_prefixes = ('weight_l2s/', 'grad_norms/', 'grad_maxes/',
                              'opt_update_norms/', 'opt_update_maxes/')
        n_rows = next(iter(stats_stacked.values())).shape[0]
        buf_steps = np.arange(step - n_rows + 1, step + 1)
        stats_mask = (buf_steps % config.print_every == 0) | (buf_steps == 1)
        if scan_steps > 1:
          # The scan body also computes stats on each window's first inner
          # step, guaranteeing a real row even when a resume start is
          # misaligned with the print cadence.
          stats_mask[0::scan_steps] = True
        elif not stats_mask.any():
          stats_mask[-1] = True  # step0 == init_step forced computation.
        for k in list(stats_stacked):
          if k.startswith(tree_stat_prefixes):
            stats_stacked[k] = stats_stacked[k][stats_mask]

        # Vector-valued stats become one stat per element.
        stats_split = {}
        for k, v in stats_stacked.items():
          if v.ndim not in [1, 2] and v.shape[0] != len(stats_buffer):
            raise ValueError('statistics must be of size [n], or [n, k].')
          if v.ndim == 1:
            stats_split[k] = v
          elif v.ndim == 2:
            for i, vi in enumerate(tuple(v.T)):
              stats_split[f'{k}/{i}'] = vi

        for k, v in stats_split.items():
          summary_writer.histogram('train_' + k, v, step)

        avg_stats = {k: np.mean(v) for k, v in stats_split.items()}
        max_stats = {k: np.max(v) for k, v in stats_split.items()}

        summ_fn = lambda s, v: summary_writer.scalar(s, v, step)  # pylint: disable=cell-var-from-loop
        for k, v in avg_stats.items():
          summ_fn(f'train_avg_{k}', v)
        for k, v in max_stats.items():
          summ_fn(f'train_max_{k}', v)

        summ_fn('train_num_params', num_params)
        summ_fn('train_learning_rate', learning_rate)
        summ_fn('train_steps_per_sec', steps_per_sec)
        summ_fn('train_rays_per_sec', rays_per_sec)

        summary_writer.scalar('train_avg_psnr_timed', avg_stats['psnr'],
                              total_time // TIME_PRECISION)
        summary_writer.scalar('train_avg_psnr_timed_approx',
                              avg_stats['psnr'],
                              approx_total_time // TIME_PRECISION)

        if dataset.metadata is not None and model.learned_exposure_scaling:
          params = jax.device_get(state.params)['params']
          # NOTE: the reference indexes [0] here to strip pmap's leading
          # device axis (train.py:195 there); our state is a global array
          # with no device axis.
          scalings = params['exposure_scaling_offsets']['embedding']
          num_shutter_speeds = dataset.metadata['unique_shutters'].shape[0]
          for i_s in range(num_shutter_speeds):
            for j_s, value in enumerate(scalings[i_s]):
              summary_writer.scalar(f'exposure/scaling_{i_s}_{j_s}', value,
                                    step)

        precision = int(np.ceil(np.log10(config.max_steps))) + 1
        avg_loss = avg_stats['loss']
        avg_psnr = avg_stats['psnr']
        str_losses = {  # Print each "losses/x" field as "x[:4]".
            k[7:11]: (f'{v:0.5f}' if 1e-4 <= v < 10 else f'{v:0.1e}')
            for k, v in avg_stats.items() if k.startswith('losses/')
        }
        print(f'{step:{precision}d}' + f'/{config.max_steps:d}: ' +
              f'loss={avg_loss:0.5f}, ' + f'psnr={avg_psnr:6.3f}, ' +
              f'lr={learning_rate:0.2e} | ' +
              ', '.join([f'{k}={s}' for k, s in str_losses.items()]) +
              f', {rays_per_sec:0.0f} r/s')

        reset_stats = True

    # Checkpointing: EVERY process calls save (orbax coordinates the
    # single-writer protocol and its cross-host barriers internally;
    # host-0-only saving is a flax-ism that deadlocks or corrupts a
    # multi-host run).  device_get snapshots the replicated state to host
    # memory so the async write never races the step loop's buffer
    # donation.
    if step == 1 or step % config.checkpoint_every == 0:
      ckpt.save(step, jax.device_get(state))

    # In-train test-set render.
    if config.train_render_every > 0 and step % config.train_render_every == 0:
      cam_idx = (test_render_count % test_dataset.size
                 if in_train_device_cast else None)
      in_train_test_render(step, image_renderer, state, train_frac, rng,
                           test_dataset, config, summary_writer,
                           metric_harness, postprocess_fn, cam_idx=cam_idx)
      test_render_count += 1

  if config.max_steps % config.checkpoint_every != 0:
    ckpt.save(config.max_steps, jax.device_get(state))
  ckpt.wait_until_finished()


if __name__ == '__main__':
  app.run(main)
