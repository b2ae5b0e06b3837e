"""Same-data PSNR head-to-head: this framework vs the reference stack.

Trains BOTH implementations on IDENTICAL batches of a synthetic scene
(real parallax, novel-view test cameras on a different ring), starting
from IDENTICAL initial weights (the parameter trees are structurally
equal by construction — tests/test_model_parity.py asserts it), and
evaluates held-out novel-view PSNR through each stack's own full
production render path at checkpoints.  This is the strongest
quality-parity evidence obtainable without the paper datasets: if the
two frameworks are the same model + optimizer + losses, their
PSNR-vs-step curves must lie within sampling noise of each other.

Two architectures:
  --arch debug      2-level 2x64/4x128 hierarchy on dummy_sphere 32x32
                    (fast CI-grade signal).
  --arch flagship   the REAL 360 architecture (3 levels, PropMLP 4x256,
                    NerfMLP 8x1024, contraction warp, reciprocal raydist,
                    opaque background, batch 4096) on dummy_scatter or
                    dummy_unbounded — the VERDICT r3 flagship-scale
                    parity ask.

The reference implementation is imported read-only from /root/reference
(see multinerf_tpu/reference_import.py) and executed, never copied.

Usage:
  python scripts/head_to_head.py [--arch debug] [--steps 5000]
  python scripts/head_to_head.py --arch flagship --loader dummy_unbounded \
      --steps 10000 [--out docs]
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

ARCHS = {
    'debug': dict(
        prop_depth=2, prop_width=64, nerf_depth=4, nerf_width=128,
        num_levels=2, num_prop_samples=32, num_nerf_samples=16,
        contract=False, loader='dummy_sphere', near=2.0, far=6.0,
        batch_size=2048,
        lr=dict(lr_init=5e-4, lr_final=5e-6, lr_delay_steps=500,
                lr_delay_mult=0.1)),
    'flagship': dict(
        prop_depth=4, prop_width=256, nerf_depth=8, nerf_width=1024,
        num_levels=3, num_prop_samples=64, num_nerf_samples=32,
        contract=True, loader='dummy_unbounded', near=0.2, far=1e6,
        batch_size=4096,
        lr=dict(lr_init=2e-3, lr_final=2e-5, lr_delay_steps=512,
                lr_delay_mult=0.01)),
}


def build_ours(arch, loader, max_steps):
  from multinerf_tpu import configs as configs_lib
  from multinerf_tpu import ginlite
  from multinerf_tpu import train_lib
  from multinerf_tpu.data import datasets
  from multinerf_tpu.parallel import mesh as mesh_lib

  bindings = [
      f'PropMLP.net_depth = {arch["prop_depth"]}',
      f'PropMLP.net_width = {arch["prop_width"]}',
      'PropMLP.disable_density_normals = True',
      'PropMLP.disable_rgb = True',
      f'NerfMLP.net_depth = {arch["nerf_depth"]}',
      f'NerfMLP.net_width = {arch["nerf_width"]}',
      'NerfMLP.disable_density_normals = True',
      f'Model.num_levels = {arch["num_levels"]}',
      f'Model.num_prop_samples = {arch["num_prop_samples"]}',
      f'Model.num_nerf_samples = {arch["num_nerf_samples"]}',
  ]
  if arch['contract']:
    bindings += [
        'Model.raydist_fn = @jnp.reciprocal',
        'Model.opaque_background = True',
        'PropMLP.warp_fn = @coord.contract',
        'NerfMLP.warp_fn = @coord.contract',
    ]
  ginlite.clear_config()
  ginlite.parse_config_files_and_bindings([], bindings)
  config = configs_lib.Config(
      dataset_loader=loader, batch_size=arch['batch_size'],
      render_chunk_size=8192, data_loss_type='mse', near=arch['near'],
      far=arch['far'], max_steps=max_steps, **arch['lr'])
  mesh = mesh_lib.create_mesh()
  train_data = datasets.load_dataset('train', '', config)
  test_data = datasets.load_dataset('test', '', config)
  model, state, render_eval_pfn, train_pstep, _ = train_lib.setup_model(
      config, jax.random.PRNGKey(0), mesh=mesh, dataset=train_data)
  return dict(config=config, mesh=mesh, train_data=train_data,
              test_data=test_data, model=model, state=state,
              render_eval_pfn=render_eval_pfn, train_pstep=train_pstep)


def build_reference(arch, max_steps):
  from multinerf_tpu import reference_import
  ref = reference_import.import_reference()

  # Subclasses NAMED NerfMLP/PropMLP so flax module paths (and therefore
  # the parameter trees) match ours exactly.
  nerf_cls = type('NerfMLP', (ref.models.MLP,), {})
  prop_cls = type('PropMLP', (ref.models.MLP,), {})
  nerf_kw = dict(net_depth=arch['nerf_depth'], net_width=arch['nerf_width'],
                 disable_density_normals=True)
  prop_kw = dict(net_depth=arch['prop_depth'], net_width=arch['prop_width'],
                 disable_density_normals=True, disable_rgb=True)
  model_kw = dict(num_levels=arch['num_levels'],
                  num_prop_samples=arch['num_prop_samples'],
                  num_nerf_samples=arch['num_nerf_samples'])
  if arch['contract']:
    nerf_kw['warp_fn'] = ref.coord.contract
    prop_kw['warp_fn'] = ref.coord.contract
    model_kw.update(raydist_fn=jnp.reciprocal, opaque_background=True)
  ref.models.NerfMLP = lambda: nerf_cls(**nerf_kw)
  ref.models.PropMLP = lambda: prop_cls(**prop_kw)

  config = ref.configs.Config(
      near=arch['near'], far=arch['far'], batch_size=arch['batch_size'],
      render_chunk_size=8192, data_loss_type='mse', max_steps=max_steps,
      **arch['lr'])
  model = ref.models.Model(config=config, **model_kw)
  return ref, config, model


def to_ref_rays(ref, rays):
  fields = ['origins', 'directions', 'viewdirs', 'radii', 'imageplane',
            'lossmult', 'near', 'far', 'cam_idx']
  return ref.utils.Rays(**{f: np.asarray(getattr(rays, f)) for f in fields})


def to_ref_batch(ref, batch):
  return ref.utils.Batch(rays=to_ref_rays(ref, batch.rays),
                         rgb=np.asarray(batch.rgb))


def psnr(pred, gt):
  mse = float(np.mean((np.asarray(pred) - np.asarray(gt))**2))
  return -10.0 / np.log(10.0) * np.log(mse)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--arch', choices=list(ARCHS), default='debug')
  parser.add_argument('--loader', default=None,
                      help='Override the arch default dataset loader.')
  parser.add_argument('--steps', type=int, default=5000)
  parser.add_argument('--eval_every', type=int, default=500)
  parser.add_argument('--eval_frames', type=int, default=8,
                      help='Held-out frames per intermediate eval '
                           '(the final eval always uses every test frame).')
  parser.add_argument('--out', default='docs')
  args = parser.parse_args()

  arch = ARCHS[args.arch]
  loader = args.loader or arch['loader']

  from multinerf_tpu.models import nerf as our_models
  from multinerf_tpu.parallel import mesh as mesh_lib
  import flax

  ours = build_ours(arch, loader, args.steps)
  ref, ref_config, ref_model = build_reference(arch, args.steps)

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

  our_renderer = our_models.ImageRenderer(ours['render_eval_pfn'],
                                          ours['config'], mesh=mesh)

  our_rng = jax.random.PRNGKey(31)
  history = []
  wall = {'ours': 0.0, 'reference': 0.0}

  def eval_psnr_ours(state, cases):
    return float(np.mean([
        psnr(our_renderer(state.params, 1.0, tc.rays)['rgb'], tc.rgb)
        for tc in cases]))

  def eval_psnr_ref(state, cases):
    params = flax.jax_utils.unreplicate(state).params
    vals = []
    for tc in cases:
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
      final = step == args.steps
      cases = test_cases if final else test_cases[:args.eval_frames]
      entry = {
          'step': step,
          'ours_train_loss': our_loss,
          'ref_train_loss': ref_loss,
          'ours_test_psnr': eval_psnr_ours(our_state, cases),
          'ref_test_psnr': eval_psnr_ref(ref_state, cases),
          'eval_frames': len(cases),
      }
      history.append(entry)
      print(json.dumps(entry), flush=True)

  result = {
      'arch': args.arch,
      'scene': loader,
      'test_views': len(test_cases),
      'resolution': int(test_cases[0].rays.origins.shape[0]),
      'model': {k: arch[k] for k in
                ('prop_depth', 'prop_width', 'nerf_depth', 'nerf_width',
                 'num_levels', 'num_prop_samples', 'num_nerf_samples',
                 'contract')},
      'batch_size': arch['batch_size'],
      'steps': args.steps,
      'identical_init': True,
      'identical_batches': True,
      'own_render_paths': True,
      'history': history,
      'train_sec': {k: round(v, 1) for k, v in wall.items()},
      'final_psnr_gap_db': round(history[-1]['ours_test_psnr'] -
                                 history[-1]['ref_test_psnr'], 3),
  }
  os.makedirs(args.out, exist_ok=True)
  suffix = '' if args.arch == 'debug' else f'_{args.arch}_{loader}'.upper()
  out_path = os.path.join(args.out, f'HEAD_TO_HEAD{suffix}.json')
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
