"""Worker process for the REAL multi-process JAX test (test_multiprocess.py).

Each worker joins a 2-process distributed CPU cluster (4 virtual devices per
process, 8 global), builds the same global mesh and model as the parent's
single-process run, feeds its process-local slice of a deterministic global
batch through ``shard_batch_to_global`` (exercising
``jax.make_array_from_process_local_data``, mesh.py:67-69), trains, and
renders through ``render_image``'s per-process slicing branch
(models/nerf.py:329-338).  It prints one RESULT json line for the parent to
compare against the single-process ground truth — the semantics the
reference achieves with per-host pmap feeding (its datasets.py:256,
models.py:650-671).
"""

import functools
import json
import os
import sys


def make_global_batch(n, seed=5):
  import numpy as np
  from multinerf_tpu.data import types
  rs = np.random.RandomState(seed)
  d = rs.randn(n, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  rays = types.Rays(
      origins=rs.randn(n, 3).astype(np.float32) * 0.2,
      directions=d,
      viewdirs=d,
      radii=np.full((n, 1), 1e-3, np.float32),
      imageplane=np.zeros((n, 2), np.float32),
      lossmult=np.ones((n, 1), np.float32),
      near=np.full((n, 1), 0.5, np.float32),
      far=np.full((n, 1), 10.0, np.float32),
      cam_idx=np.zeros((n, 1), np.int32))
  return types.Batch(rays=rays, rgb=rs.rand(n, 3).astype(np.float32))


def _build(num_processes, batch_size, model_parallel=1, n_devices=None):
  """Identical model/mesh/batch construction for every scenario and the
  parent's single-process ground truth.

  model_parallel > 1 builds a (data, model) TP mesh and lays the state out
  with infer_tree_shardings — the combined multi-process x TP scenario.
  n_devices optionally restricts the mesh to the first n devices so a
  single-process ground truth can match a smaller cluster's topology.
  """
  import jax
  import numpy as np

  from multinerf_tpu import configs as configs_lib
  from multinerf_tpu import ginlite
  from multinerf_tpu import train_lib
  from multinerf_tpu.data import datasets
  from multinerf_tpu.parallel import mesh as mesh_lib

  ginlite.clear_config()
  # NerfMLP width 128: wide enough to shard over a 2-way model axis at
  # min_dim_to_shard=128 (same recipe as test_tensor_parallel.py).
  nerf_width = 128 if model_parallel > 1 else 16
  ginlite.parse_config_files_and_bindings(
      [], ['PropMLP.net_depth = 2', 'PropMLP.net_width = 16',
           f'NerfMLP.net_depth = 2', f'NerfMLP.net_width = {nerf_width}',
           'Model.num_prop_samples = 8', 'Model.num_nerf_samples = 4',
           'Model.num_levels = 2'])
  config = configs_lib.Config(
      dataset_loader='dummy', batch_size=batch_size, render_chunk_size=32,
      data_loss_type='mse', near=0.5, far=10.0, max_steps=10,
      lr_delay_steps=0, randomized=False)

  devices = jax.devices()[:n_devices] if n_devices else None
  mesh = mesh_lib.create_mesh(model_parallel=model_parallel, devices=devices)
  dataset = datasets.load_dataset('test', '', config)
  _, state, render_eval_pfn, train_pstep, _ = train_lib.setup_model(
      config, jax.random.PRNGKey(0), mesh=mesh, dataset=dataset)

  repl = mesh_lib.replicated(mesh)
  if model_parallel > 1:
    shardings = mesh_lib.infer_tree_shardings(state, mesh,
                                              min_dim_to_shard=128)
    assert any(s.spec != jax.sharding.PartitionSpec()
               for s in jax.tree_util.tree_leaves(shardings)), (
                   'TP layout left every leaf replicated')
    # Same-seed init exists fully on every process; materialize each leaf
    # under its TP sharding (works single- and multi-process).
    def lift(x, sh):
      x = np.asarray(x)
      return jax.make_array_from_callback(x.shape, sh,
                                          lambda idx: x[idx])
    state = jax.tree_util.tree_map(lift, state, shardings)
  elif num_processes > 1:
    # Model init ran identically on every process (same seed); lift the
    # host-local replicas into global replicated arrays.
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        state)
  else:
    state = jax.device_put(state, repl)

  batch = make_global_batch(batch_size)
  local_rows = batch_size // num_processes
  start = jax.process_index() * local_rows
  local = jax.tree_util.tree_map(
      lambda x: x[start:start + local_rows], batch)
  gbatch = mesh_lib.shard_batch_to_global(mesh, local)
  return config, mesh, dataset, state, render_eval_pfn, train_pstep, gbatch


def run(num_processes, batch_size=64, train_steps=3):
  """Shared by the workers AND the parent's single-process ground truth."""
  import functools
  import jax
  import numpy as np

  from multinerf_tpu.models import nerf as models

  (config, mesh, dataset, state, render_eval_pfn, train_pstep,
   gbatch) = _build(num_processes, batch_size)

  losses = []
  rng = jax.random.PRNGKey(1)
  for _ in range(train_steps):
    state, stats, rng = train_pstep(rng, state, gbatch, 0.5, 1.0)
    losses.append(float(stats['loss']))

  test_case = next(dataset)
  rendering = models.render_image(
      functools.partial(render_eval_pfn, state.params, 1.0),
      test_case.rays, None, config, verbose=False,
      mesh=mesh if num_processes > 1 else None)
  rgb = np.array(rendering['rgb'])

  # The device-cast production surface (eval.py/render.py default):
  # cameras uploaded once, rays cast in-jit, replicated output gathered
  # across processes.  Must be process-count-invariant like render_image.
  device_renderer = models.DeviceImageRenderer(
      render_eval_pfn, config, dataset,
      mesh=mesh if num_processes > 1 else None)
  dc_rgb = np.array(device_renderer(state.params, 1.0, 0)['rgb'])

  return {'losses': losses, 'rgb_sum': float(rgb.sum()),
          'rgb_shape': list(rgb.shape),
          'dc_rgb_sum': float(dc_rgb.sum()),
          'dc_rgb_shape': list(dc_rgb.shape),
          'n_processes': jax.process_count(),
          'n_devices': jax.device_count()}


def train_window(train_pstep, state, gbatch, steps):
  """Run `steps` optimizer steps with per-step rngs derived from the global
  step counter, so a restored run replays the exact rng sequence."""
  import jax
  losses = []
  for _ in range(steps):
    step_rng = jax.random.fold_in(jax.random.PRNGKey(7), int(state.step))
    state, stats, _ = train_pstep(step_rng, state, gbatch, 0.5, 1.0)
    losses.append(float(stats['loss']))
  return state, losses


def run_ckpt(num_processes, ckpt_dir, steps_per_phase=3, batch_size=64,
             model_parallel=1, n_devices=None):
  """One phase of the save -> kill -> restore continuation scenario.

  Restores the latest checkpoint if one exists (phase 2), trains
  `steps_per_phase` steps, saves — from EVERY process, the orbax multi-host
  contract train.py follows — and reports the losses + start step.  The
  parent asserts phase1+phase2 losses equal an uninterrupted single-process
  run's.  With model_parallel > 1 the state lives TP-sharded on a
  (data, model) mesh through the whole cycle (restore included) — the
  combined multi-process x tensor-parallel scenario.
  """
  import jax

  from multinerf_tpu.utils import checkpoints as ckpt_lib

  _, _, _, state, _, train_pstep, gbatch = _build(
      num_processes, batch_size, model_parallel=model_parallel,
      n_devices=n_devices)

  ckpt = ckpt_lib.CheckpointManager(ckpt_dir, keep=3)
  state = ckpt.restore_latest(state)
  start_step = int(state.step)

  state, losses = train_window(train_pstep, state, gbatch, steps_per_phase)
  ckpt.save(int(state.step), jax.device_get(state))
  ckpt.wait_until_finished()
  ckpt.close()
  return {'start_step': start_step, 'losses': losses,
          'n_processes': jax.process_count(),
          'n_devices': jax.device_count()}


def main():
  proc_id = int(sys.argv[1])
  num_processes = int(sys.argv[2])
  port = int(sys.argv[3])
  scenario = sys.argv[4] if len(sys.argv) > 4 else 'train'

  import jax
  jax.config.update('jax_platforms', 'cpu')
  jax.distributed.initialize(coordinator_address=f'localhost:{port}',
                             num_processes=num_processes,
                             process_id=proc_id)
  if scenario == 'train':
    result = run(num_processes)
  elif scenario == 'ckpt':
    result = run_ckpt(num_processes, ckpt_dir=sys.argv[5])
  elif scenario == 'tp_ckpt':
    result = run_ckpt(num_processes, ckpt_dir=sys.argv[5], model_parallel=2)
  else:
    raise ValueError(f'unknown scenario {scenario}')
  result['pid'] = proc_id
  print('RESULT ' + json.dumps(result), flush=True)


if __name__ == '__main__':
  sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  os.pardir, os.pardir))
  main()
