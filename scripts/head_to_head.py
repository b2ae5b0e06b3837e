"""Same-data PSNR head-to-head: this framework vs the reference stack.

Trains BOTH implementations on IDENTICAL batches of the DummySphere scene
(real parallax, novel-view test cameras on a different ring), starting from
IDENTICAL initial weights (the parameter trees are structurally equal by
construction — tests/test_model_parity.py asserts it), and evaluates
held-out novel-view PSNR through each stack's own full render path at
checkpoints.  This is the strongest quality-parity evidence obtainable
without the paper datasets: if the two frameworks are the same model +
optimizer + losses, their PSNR-vs-step curves must lie within sampling
noise of each other.

The reference implementation is imported read-only from /root/reference
(see multinerf_tpu/reference_import.py) and executed, never copied.

Usage:  python scripts/head_to_head.py [--steps 5000] [--out docs]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multinerf_tpu.utils import cache as _cache
_cache.enable_persistent_compilation_cache()

# Both stacks use the debug.gin model sizes on a 2-level hierarchy.
MLP_SIZES = dict(prop_depth=2, prop_width=64, nerf_depth=4, nerf_width=128)
MODEL_KW = dict(num_levels=2, num_prop_samples=32, num_nerf_samples=16)
NEAR, FAR = 2.0, 6.0
BATCH_SIZE = 2048
LR_KW = dict(lr_init=5e-4, lr_final=5e-6, lr_delay_steps=500,
             lr_delay_mult=0.1)


def build_ours(max_steps):
  from multinerf_tpu import configs as configs_lib
  from multinerf_tpu import ginlite
  from multinerf_tpu import train_lib
  from multinerf_tpu.data import datasets
  from multinerf_tpu.parallel import mesh as mesh_lib

  ginlite.clear_config()
  ginlite.parse_config_files_and_bindings([], [
      f'PropMLP.net_depth = {MLP_SIZES["prop_depth"]}',
      f'PropMLP.net_width = {MLP_SIZES["prop_width"]}',
      'PropMLP.disable_density_normals = True',
      'PropMLP.disable_rgb = True',
      f'NerfMLP.net_depth = {MLP_SIZES["nerf_depth"]}',
      f'NerfMLP.net_width = {MLP_SIZES["nerf_width"]}',
      'NerfMLP.disable_density_normals = True',
      f'Model.num_levels = {MODEL_KW["num_levels"]}',
      f'Model.num_prop_samples = {MODEL_KW["num_prop_samples"]}',
      f'Model.num_nerf_samples = {MODEL_KW["num_nerf_samples"]}',
  ])
  config = configs_lib.Config(
      dataset_loader='dummy_sphere', batch_size=BATCH_SIZE,
      render_chunk_size=4096, data_loss_type='mse', near=NEAR, far=FAR,
      max_steps=max_steps, **LR_KW)
  mesh = mesh_lib.create_mesh()
  train_data = datasets.load_dataset('train', '', config)
  test_data = datasets.load_dataset('test', '', config)
  model, state, render_eval_pfn, train_pstep, _ = train_lib.setup_model(
      config, jax.random.PRNGKey(0), mesh=mesh, dataset=train_data)
  return dict(config=config, mesh=mesh, train_data=train_data,
              test_data=test_data, model=model, state=state,
              render_eval_pfn=render_eval_pfn, train_pstep=train_pstep)


def build_reference(max_steps):
  from multinerf_tpu import reference_import
  ref = reference_import.import_reference()

  # Subclasses NAMED NerfMLP/PropMLP so flax module paths (and therefore
  # the parameter trees) match ours exactly.
  nerf_cls = type('NerfMLP', (ref.models.MLP,), {})
  prop_cls = type('PropMLP', (ref.models.MLP,), {})
  nerf_kw = dict(net_depth=MLP_SIZES['nerf_depth'],
                 net_width=MLP_SIZES['nerf_width'],
                 disable_density_normals=True)
  prop_kw = dict(net_depth=MLP_SIZES['prop_depth'],
                 net_width=MLP_SIZES['prop_width'],
                 disable_density_normals=True, disable_rgb=True)
  ref.models.NerfMLP = lambda: nerf_cls(**nerf_kw)
  ref.models.PropMLP = lambda: prop_cls(**prop_kw)

  config = ref.configs.Config(
      near=NEAR, far=FAR, batch_size=BATCH_SIZE, render_chunk_size=4096,
      data_loss_type='mse', max_steps=max_steps, **LR_KW)
  model = ref.models.Model(config=config, **MODEL_KW)
  return ref, config, model


def to_ref_batch(ref, batch):
  """Convert our numpy Batch to the reference's Batch (same field names)."""
  fields = ['origins', 'directions', 'viewdirs', 'radii', 'imageplane',
            'lossmult', 'near', 'far', 'cam_idx']
  rays = ref.utils.Rays(**{f: np.asarray(getattr(batch.rays, f))
                           for f in fields})
  return ref.utils.Batch(rays=rays, rgb=np.asarray(batch.rgb))


def to_ref_rays(ref, rays):
  fields = ['origins', 'directions', 'viewdirs', 'radii', 'imageplane',
            'lossmult', 'near', 'far', 'cam_idx']
  return ref.utils.Rays(**{f: np.asarray(getattr(rays, f)) for f in fields})


def psnr(pred, gt):
  mse = float(np.mean((np.asarray(pred) - np.asarray(gt))**2))
  return -10.0 / np.log(10.0) * np.log(mse)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--steps', type=int, default=5000)
  parser.add_argument('--eval_every', type=int, default=500)
  parser.add_argument('--out', default='docs')
  args = parser.parse_args()

  from multinerf_tpu.models import nerf as our_models
  from multinerf_tpu.parallel import mesh as mesh_lib
  import flax

  ours = build_ours(args.steps)
  ref, ref_config, ref_model = build_reference(args.steps)

  # IDENTICAL initial weights: init the reference model, drop its parameter
  # tree into both stacks (structures match by construction).
  test_cases = list(
      ours['test_data'].generate_ray_batch(i)
      for i in range(ours['test_data'].images.shape[0]))
  example_batch = next(ours['train_data'])
  ref_vars = ref_model.init(
      jax.random.PRNGKey(20), rng=None,
      rays=to_ref_rays(ref, jax.tree_util.tree_map(
          lambda x: x[:10], example_batch.rays)),
      train_frac=1.0, compute_extras=False, zero_glo=True)

  our_shapes = jax.tree_util.tree_map(lambda x: x.shape,
                                      ours['state'].params)
  ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref_vars)
  assert (jax.tree_util.tree_structure(our_shapes) ==
          jax.tree_util.tree_structure(ref_shapes)), 'param trees differ'
  assert jax.tree_util.tree_all(
      jax.tree_util.tree_map(lambda a, b: a == b, our_shapes, ref_shapes))

  mesh = ours['mesh']
  repl = mesh_lib.replicated(mesh)
  our_state = ours['state'].replace(params=jax.device_put(ref_vars, repl))
  our_state = jax.device_put(our_state, repl)

  ref_state, _ = ref.train_utils.create_optimizer(ref_config, ref_vars)
  ref_train_pstep = ref.train_utils.create_train_step(ref_model, ref_config)
  ref_render_pfn = ref.train_utils.create_render_fn(ref_model)
  ref_state = flax.jax_utils.replicate(ref_state)
  ref_rngs = jax.random.split(jax.random.PRNGKey(30),
                              jax.local_device_count())

  our_rng = jax.random.PRNGKey(31)
  history = []
  wall = {'ours': 0.0, 'reference': 0.0}

  def eval_psnr_ours(state):
    vals = []
    for tc in test_cases:
      rendering = our_models.render_image(
          functools.partial(ours['render_eval_pfn'], state.params, 1.0),
          tc.rays, None, ours['config'], verbose=False)
      vals.append(psnr(rendering['rgb'], tc.rgb))
    return float(np.mean(vals))

  def eval_psnr_ref(state):
    params = flax.jax_utils.unreplicate(state).params
    vals = []
    for tc in test_cases:
      rendering = ref.models.render_image(
          functools.partial(ref_render_pfn, params, 1.0),
          to_ref_rays(ref, tc.rays), None, ref_config, verbose=False)
      vals.append(psnr(rendering['rgb'], tc.rgb))
    return float(np.mean(vals))

  for step, batch in zip(range(1, args.steps + 1), ours['train_data']):
    train_frac = float(np.clip((step - 1) / (args.steps - 1), 0, 1))

    t0 = time.perf_counter()
    gbatch = mesh_lib.shard_batch_to_global(mesh, batch)
    our_state, our_stats, our_rng = ours['train_pstep'](
        our_rng, our_state, gbatch, train_frac, 1.0)
    our_loss = float(our_stats['loss'])  # Sync (axon: fetch is the fence).
    wall['ours'] += time.perf_counter() - t0

    t0 = time.perf_counter()
    ref_batch = ref.utils.shard(to_ref_batch(ref, batch))
    ref_state, ref_stats, ref_rngs = ref_train_pstep(
        ref_rngs, ref_state, ref_batch, None, train_frac, 1.0)
    ref_loss = float(ref_stats['loss'][0])
    wall['reference'] += time.perf_counter() - t0

    if step % args.eval_every == 0 or step == args.steps:
      entry = {
          'step': step,
          'ours_train_loss': our_loss,
          'ref_train_loss': ref_loss,
          'ours_test_psnr': eval_psnr_ours(our_state),
          'ref_test_psnr': eval_psnr_ref(ref_state),
      }
      history.append(entry)
      print(json.dumps(entry), flush=True)

  result = {
      'scene': 'dummy_sphere (12 train views, 12 novel test views, 32x32)',
      'model': {**MLP_SIZES, **MODEL_KW},
      'batch_size': BATCH_SIZE,
      'steps': args.steps,
      'identical_init': True,
      'identical_batches': True,
      'history': history,
      'train_sec': {k: round(v, 1) for k, v in wall.items()},
      'final_psnr_gap_db': round(history[-1]['ours_test_psnr'] -
                                 history[-1]['ref_test_psnr'], 3),
  }
  os.makedirs(args.out, exist_ok=True)
  out_path = os.path.join(args.out, 'HEAD_TO_HEAD.json')
  with open(out_path, 'w') as f:
    json.dump(result, f, indent=2)
  print(f'wrote {out_path}')

  rows = ['| step | ours PSNR (dB) | reference PSNR (dB) | gap |',
          '|---|---|---|---|']
  for e in history:
    rows.append(f"| {e['step']} | {e['ours_test_psnr']:.2f} | "
                f"{e['ref_test_psnr']:.2f} | "
                f"{e['ours_test_psnr'] - e['ref_test_psnr']:+.2f} |")
  print('\n'.join(rows))


if __name__ == '__main__':
  main()
