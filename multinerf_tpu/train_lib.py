"""Losses, optimizer, and the jit+mesh training/eval step factories.

Capability parity with ``internal/train_utils.py`` of google-research/
multinerf — data/interlevel/distortion/orientation/predicted-normal losses,
per-MLP gradient clipping, rich tree statistics — with the parallelism
re-designed TPU-first:

* The train step is ONE ``jax.jit`` over a global ``Mesh`` with the batch
  sharded on the data axis and parameters replicated (optionally tensor-
  sharded over a model axis).  GSPMD inserts the gradient all-reduce over
  ICI; there is no pmap, no explicit ``lax.pmean`` (reference
  train_utils.py:319-345), and no host-side shard/unshard reshapes.
* Eval rendering likewise jits over the mesh and returns global arrays
  (reference uses pmap + ``lax.all_gather``, train_utils.py:377-396).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training.train_state import TrainState

from multinerf_tpu import robust
from multinerf_tpu.data import cameras as camera_lib
from multinerf_tpu.data import types
from multinerf_tpu.models import nerf as nerf_lib
from multinerf_tpu.ops import image_ops
from multinerf_tpu.ops import mathx
from multinerf_tpu.ops import ref_utils
from multinerf_tpu.ops import stepfun
from multinerf_tpu.parallel import mesh as mesh_lib


# --- Pytree statistics helpers. -------------------------------------------------


def tree_sum(tree):
  return jax.tree_util.tree_reduce(lambda x, y: x + y, tree, initializer=0)


def tree_norm_sq(tree):
  return tree_sum(jax.tree_util.tree_map(lambda x: jnp.sum(x**2), tree))


def tree_norm(tree):
  return jnp.sqrt(tree_norm_sq(tree))


def tree_abs_max(tree):
  return jax.tree_util.tree_reduce(
      lambda x, y: jnp.maximum(x, jnp.max(jnp.abs(y))), tree, initializer=0)


def tree_len(tree):
  return tree_sum(
      jax.tree_util.tree_map(lambda z: jnp.prod(jnp.array(z.shape)), tree))


def summarize_tree(tree, fn, ancestry=(), max_depth=3):
  """Flatten a nested dict while fn-ing values; keys join like/this."""
  stats = {}
  for k, v in tree.items():
    name = ancestry + (k,)
    stats['/'.join(name)] = fn(v)
    if hasattr(v, 'items') and len(ancestry) < (max_depth - 1):
      stats.update(summarize_tree(v, fn, ancestry=name, max_depth=max_depth))
  return stats


# --- Loss terms. -----------------------------------------------------------------


def compute_data_loss(batch, renderings, rays, loss_threshold, config):
  """Photometric data loss over all levels, plus training metrics."""
  data_losses = []
  stats = {'mses': []}

  # lossmult weights rays (Bayer mask, multiscale weighting, masking...).
  lossmult = rays.lossmult
  lossmult = jnp.broadcast_to(lossmult, batch.rgb[..., :3].shape)
  if config.disable_multiscale_loss:
    lossmult = jnp.ones_like(lossmult)

  for rendering in renderings:
    resid_sq = (rendering['rgb'] - batch.rgb[..., :3])**2
    denom = lossmult.sum()
    stats['mses'].append((lossmult * resid_sq).sum() / denom)

    if config.data_loss_type == 'mse':
      data_loss = resid_sq
    elif config.data_loss_type == 'charb':
      data_loss = jnp.sqrt(resid_sq + config.charb_padding**2)
    elif config.data_loss_type == 'rawnerf':
      # Clip renders at 1 to mimic sensor saturation, then reweight by the
      # gradient of the log tonemap curve (arxiv.org/abs/2111.13679 Eq 6).
      rgb_render_clip = jnp.minimum(1.0, rendering['rgb'])
      resid_sq_clip = (rgb_render_clip - batch.rgb[..., :3])**2
      scaling_grad = 1.0 / (1e-3 + jax.lax.stop_gradient(rgb_render_clip))
      data_loss = resid_sq_clip * scaling_grad**2
    elif config.data_loss_type == 'robustnerf':
      mask, robust_stats = robust.robustnerf_mask(resid_sq, loss_threshold,
                                                  config)
      data_loss = resid_sq * mask
      for k, v in robust_stats.items():
        stats[k] = v
    else:
      raise ValueError(f'Unknown data loss type {config.data_loss_type}')
    data_losses.append((lossmult * data_loss).sum() / denom)

    if config.compute_disp_metrics:
      disp = 1 / (1 + rendering['distance_mean'])
      stats.setdefault('disparity_mses', []).append(
          ((disp - batch.disps)**2).mean())

    if config.compute_normal_metrics:
      if 'normals' in rendering:
        weights = rendering['acc'] * batch.alphas
        normalized_normals_gt = ref_utils.l2_normalize(batch.normals)
        normalized_normals = ref_utils.l2_normalize(rendering['normals'])
        normal_mae = ref_utils.compute_weighted_mae(
            weights, normalized_normals, normalized_normals_gt)
      else:
        normal_mae = jnp.nan
      stats.setdefault('normal_maes', []).append(normal_mae)

  data_losses = jnp.array(data_losses)
  loss = (config.data_coarse_loss_mult * jnp.sum(data_losses[:-1]) +
          config.data_loss_mult * data_losses[-1])
  stats = {k: jnp.array(v) if isinstance(v, list) else v
           for k, v in stats.items()}
  return loss, stats


def interlevel_loss(ray_history, config):
  """Proposal supervision: coarse histograms must envelope the nerf's."""
  last = ray_history[-1]
  c = jax.lax.stop_gradient(last['sdist'])
  w = jax.lax.stop_gradient(last['weights'])
  loss = 0.0
  for ray_results in ray_history[:-1]:
    loss += jnp.mean(stepfun.lossfun_outer(
        c, w, ray_results['sdist'], ray_results['weights']))
  return config.interlevel_loss_mult * loss


def distortion_loss(ray_history, config):
  """mip-NeRF 360 distortion regularizer on the final level."""
  last = ray_history[-1]
  loss = jnp.mean(stepfun.lossfun_distortion(last['sdist'], last['weights']))
  return config.distortion_loss_mult * loss


def orientation_loss(rays, model, ray_history, config):
  """Ref-NeRF orientation loss: penalize normals facing away from camera."""
  total_loss = 0.0
  for i, ray_results in enumerate(ray_history):
    w = ray_results['weights']
    n = ray_results[config.orientation_loss_target]
    if n is None:
      raise ValueError('Normals cannot be None if orientation loss is on.')
    v = -1.0 * rays.viewdirs  # Points from surface toward camera.
    n_dot_v = (n * v[..., None, :]).sum(axis=-1)
    loss = jnp.mean((w * jnp.minimum(0.0, n_dot_v)**2).sum(axis=-1))
    mult = (config.orientation_coarse_loss_mult
            if i < model.num_levels - 1 else config.orientation_loss_mult)
    total_loss += mult * loss
  return total_loss


def predicted_normal_loss(model, ray_history, config):
  """Ref-NeRF supervision of predicted normals by density-gradient normals."""
  total_loss = 0.0
  for i, ray_results in enumerate(ray_history):
    w = ray_results['weights']
    n = ray_results['normals']
    n_pred = ray_results['normals_pred']
    if n is None or n_pred is None:
      raise ValueError('Predicted and gradient normals cannot be None if '
                       'predicted normal loss is on.')
    loss = jnp.mean((w * (1.0 - jnp.sum(n * n_pred, axis=-1))).sum(axis=-1))
    mult = (config.predicted_normal_coarse_loss_mult
            if i < model.num_levels - 1
            else config.predicted_normal_loss_mult)
    total_loss += mult * loss
  return total_loss


def clip_gradients(grad, config):
  """Clip gradients of each top-level module (MLP) individually."""
  # Non-'params' collections (e.g. the occupancy grid, which gets a zero
  # cotangent) pass through untouched so the tree structure is preserved.
  grad_clipped = {k: v for k, v in grad.items()}
  grad_clipped['params'] = {}
  for k, g in grad['params'].items():
    if config.grad_max_val > 0:
      g = jax.tree_util.tree_map(
          lambda z: jnp.clip(z, -config.grad_max_val, config.grad_max_val), g)
    if config.grad_max_norm > 0:
      mult = jnp.minimum(
          1, config.grad_max_norm /
          (jnp.finfo(jnp.float32).eps + tree_norm(g)))
      g = jax.tree_util.tree_map(lambda z, m=mult: m * z, g)
    grad_clipped['params'][k] = g
  return type(grad)(grad_clipped)


# --- Optimizer. -------------------------------------------------------------------


def create_optimizer(config, variables) -> Tuple[TrainState, Callable]:
  """Adam with the log-linear decayed learning-rate schedule."""
  adam_kwargs = {
      'b1': config.adam_beta1,
      'b2': config.adam_beta2,
      'eps': config.adam_eps,
  }
  lr_fn = functools.partial(
      mathx.learning_rate_decay,
      lr_init=config.lr_init,
      lr_final=config.lr_final,
      max_steps=config.max_steps,
      lr_delay_steps=config.lr_delay_steps,
      lr_delay_mult=config.lr_delay_mult)
  tx = optax.adam(learning_rate=lr_fn, **adam_kwargs)
  if set(variables) != {'params'}:
    # Non-'params' collections (the occupancy grid) are not optimized:
    # masking them out keeps Adam from allocating mu/nu for resolution^3
    # grid cells and from running apply_gradients over them (their zero
    # cotangents pass through as zero updates; train_lib overwrites the
    # grid with its own EMA-max update each step).
    mask = {k: jax.tree_util.tree_map(lambda _: k == 'params', v)
            for k, v in variables.items()}
    tx = optax.masked(tx, mask)
  return TrainState.create(apply_fn=None, params=variables, tx=tx), lr_fn


# --- Train / eval step factories. ---------------------------------------------------


def create_train_step(model, config, mesh, dataset=None, jit=True,
                      cull=False, stats_arg=False):
  """Build the jitted SPMD training step.

  The returned function takes and returns *global* arrays laid out on
  `mesh`: state/rng replicated, batch sharded along the data axis.  The
  gradient all-reduce is inserted by GSPMD, riding ICI.  With jit=False the
  raw python step is returned for embedding into a larger jit (the
  device-resident data plane wraps it with on-device batch sampling).

  With ``cull=True`` (requires Config.occupancy_culling) the model runs the
  final level through the occupancy-grid compaction; train.py compiles a
  cull=False variant for the grid-warmup phase and switches after.

  With ``stats_arg=True`` the step takes a sixth traced argument
  ``compute_stats``: the five whole-tree statistic families (weight_l2s,
  grad_norms, grad_maxes, opt_update_norms, opt_update_maxes — ~3 ms/step
  of extra HBM passes over every parameter at the 360 scale, profiled in
  docs/DESIGN.md) are computed under a ``lax.cond`` only when it is True.
  The reference computes them every step (train_utils.py:260-309 of
  google-research/multinerf), but its TensorBoard contract only *reads*
  them at print steps, so the production drivers pass
  ``step % print_every == 0`` and skip the work elsewhere.  Loss/psnr/mse
  and the occupancy/robustnerf feedback stats are always computed.
  """
  def _drop_unit_patch_dims(batch):
    """Squeeze [P, 1, 1, ...] batch leaves to [P, ...].

    Both data planes ship patch-shaped batches ([num_patches, ps, ps, c],
    reference datasets.py:245-253 layout).  At patch_size=1 the two unit
    axes carry no information but pin every per-sample tensor derived from
    the ray batch to a T(1,128) tile on TPU — 1/8 sublane utilization for
    the whole step; profiled on the 360 config this cost ~27 ms/step (the
    resampling sort alone ran 8x slower than in flat layout).  Real
    patches (ps > 1, e.g. RobustNeRF) pass through untouched.
    """
    def f(x):
      if hasattr(x, 'ndim') and x.ndim >= 3 and x.shape[1:3] == (1, 1):
        return x.reshape((x.shape[0],) + x.shape[3:])
      return x
    return jax.tree_util.tree_map(f, batch)

  if dataset is None:
    camtype = camera_lib.ProjectionType.PERSPECTIVE
    cameras = None
  else:
    camtype = dataset.camtype
    # jnp constants so traced cam_idx can index them inside the jitted step.
    import numpy as np
    cameras = tuple(
        jnp.asarray(x) if isinstance(x, np.ndarray) else x
        for x in dataset.cameras)

  def train_step(rng, state, batch, train_frac, loss_threshold,
                 compute_stats=True):
    batch = _drop_unit_patch_dims(batch)
    rng, key = jax.random.split(rng)

    def loss_fn(variables):
      rays = batch.rays
      if config.cast_rays_in_train_step:
        rays = camera_lib.cast_ray_batch(cameras, rays, camtype, xnp=jnp)

      compute_extras = (config.compute_disp_metrics or
                        config.compute_normal_metrics)

      renderings, ray_history = model.apply(
          variables,
          key if config.randomized else None,
          rays,
          train_frac=train_frac,
          compute_extras=compute_extras,
          zero_glo=False,
          cull=cull)

      losses = {}
      data_loss, stats = compute_data_loss(batch, renderings, rays,
                                           loss_threshold, config)
      losses['data'] = data_loss

      if config.interlevel_loss_mult > 0:
        losses['interlevel'] = interlevel_loss(ray_history, config)
      if config.distortion_loss_mult > 0:
        losses['distortion'] = distortion_loss(ray_history, config)
      if (config.orientation_coarse_loss_mult > 0 or
          config.orientation_loss_mult > 0):
        losses['orientation'] = orientation_loss(rays, model, ray_history,
                                                 config)
      if (config.predicted_normal_coarse_loss_mult > 0 or
          config.predicted_normal_loss_mult > 0):
        losses['predicted_normals'] = predicted_normal_loss(
            model, ray_history, config)

      if not stats_arg:
        stats['weight_l2s'] = summarize_tree(variables['params'],
                                             tree_norm_sq)

      if config.weight_decay_mults:
        it = config.weight_decay_mults.items
        if stats_arg:
          # weight_l2s is deferred to the compute_stats cond below, but the
          # decay term must be differentiated every step: compute just the
          # decayed subtrees' norms here (identical values).
          def _subtree(params, key):
            for part in key.split('/'):
              params = params[part]
            return params
          losses['weight'] = jnp.sum(jnp.array(
              [m * tree_norm_sq(_subtree(variables['params'], k))
               for k, m in it()]))
        else:
          losses['weight'] = jnp.sum(
              jnp.array([m * stats['weight_l2s'][k] for k, m in it()]))

      stats['loss'] = jnp.sum(jnp.array(list(losses.values())))
      stats['losses'] = losses
      if config.occupancy_culling:
        # Aux for the grid update below; popped before stats leave the step.
        stats['occ_cells'] = ray_history[-1]['occ_cells']
        stats['occ_density'] = ray_history[-1]['occ_density']
        keep_fracs = [rr['occ_keep_frac'] for rr in ray_history
                      if 'occ_keep_frac' in rr]
        if keep_fracs:
          # Fraction of samples whose cell cleared the threshold — the
          # self-gate's input.  With proposal culling enabled every level
          # reports one; the gate must satisfy the WORST (max) level.
          stats['occ_keep_frac'] = (
              keep_fracs[0] if len(keep_fracs) == 1
              else jnp.max(jnp.stack(keep_fracs)))
      return stats['loss'], stats

    loss_grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, stats), grad = loss_grad_fn(state.params)

    # No explicit pmean: with the batch sharded over the data axis and
    # params replicated, GSPMD emits the cross-chip grad reduction itself.
    raw_grad = grad['params']
    if not stats_arg:
      stats['grad_norms'] = summarize_tree(raw_grad, tree_norm)
      stats['grad_maxes'] = summarize_tree(raw_grad, tree_abs_max)

    grad = clip_gradients(grad, config)
    grad = jax.tree_util.tree_map(jnp.nan_to_num, grad)

    new_state = state.apply_gradients(grads=grad)

    if config.occupancy_culling:
      from multinerf_tpu.models import culling
      cells = stats.pop('occ_cells')
      dens = stats.pop('occ_density')
      new_grid = culling.update_grid(
          state.params['occupancy']['grid'], cells, dens,
          config.occupancy_grid_decay)
      new_params = {k: v for k, v in new_state.params.items()}
      new_params['occupancy'] = {'grid': new_grid}
      new_state = new_state.replace(params=new_params)

    opt_delta = jax.tree_util.tree_map(lambda x, y: x - y, new_state,
                                       state).params['params']
    if stats_arg:
      def _tree_stats(args):
        params, g, delta = args
        return {
            'weight_l2s': summarize_tree(params, tree_norm_sq),
            'grad_norms': summarize_tree(g, tree_norm),
            'grad_maxes': summarize_tree(g, tree_abs_max),
            'opt_update_norms': summarize_tree(delta, tree_norm),
            'opt_update_maxes': summarize_tree(delta, tree_abs_max),
        }
      stat_args = (state.params['params'], raw_grad, opt_delta)
      zeros = jax.tree_util.tree_map(
          lambda s: jnp.zeros(s.shape, s.dtype),
          jax.eval_shape(_tree_stats, stat_args))
      stats.update(jax.lax.cond(
          compute_stats, _tree_stats, lambda _: zeros, stat_args))
    else:
      stats['opt_update_norms'] = summarize_tree(opt_delta, tree_norm)
      stats['opt_update_maxes'] = summarize_tree(opt_delta, tree_abs_max)

    stats['psnrs'] = image_ops.mse_to_psnr(stats['mses'])
    stats['psnr'] = stats['psnrs'][-1]
    return new_state, stats, rng

  if not jit:
    return train_step
  repl = mesh_lib.replicated(mesh)
  data = mesh_lib.data_sharding(mesh)
  if stats_arg:
    train_pstep = jax.jit(
        train_step,
        in_shardings=(repl, None, data, None, None, None),
        donate_argnums=(0, 1),
    )
  else:
    train_pstep = jax.jit(
        lambda rng, state, batch, train_frac, loss_threshold: train_step(
            rng, state, batch, train_frac, loss_threshold),
        in_shardings=(repl, None, data, None, None),
        donate_argnums=(0, 1),
    )
  return train_pstep


def create_render_fn(model, mesh, cull=False):
  """Build the jitted SPMD eval-render function (deterministic).

  ``cull=True`` renders through the occupancy grid — the regime a
  cull-trained model was optimized in (empty cells never received
  supervision, so bypassing the grid at eval can resurrect floaters).
  """

  def render_eval_fn(variables, train_frac, _, rays):
    return model.apply(
        variables,
        None,  # Deterministic.
        rays,
        train_frac=train_frac,
        compute_extras=True,
        cull=cull)

  repl = mesh_lib.replicated(mesh)
  data = mesh_lib.data_sharding(mesh)
  # Multi-process: every process must be able to fetch the rendered chunk
  # (render_image device_gets it), so outputs are gathered to replicated —
  # the SPMD equivalent of the reference's lax.all_gather around the render
  # fn (train_utils.py:377-396 there).  Single-process leaves XLA's natural
  # data-sharded layout in place (device_get can address every shard).
  out_shardings = repl if jax.process_count() > 1 else None
  render_eval_pfn = jax.jit(
      render_eval_fn,
      in_shardings=(repl, None, None, data),
      out_shardings=out_shardings,
  )
  return render_eval_pfn


def setup_model(config, rng, mesh=None, dataset=None, stats_arg=False):
  """One-stop: construct model, optimizer, and jitted train/render fns."""
  if mesh is None:
    mesh = mesh_lib.create_mesh()
  dummy = types.dummy_rays(
      include_exposure_idx=config.rawnerf_mode, include_exposure_values=True)
  model, variables = nerf_lib.construct_model(rng, dummy, config)

  state, lr_fn = create_optimizer(config, variables)
  # Rendering always evaluates every sample: culling is a TRAINING
  # throughput feature (self-gated by measured occupancy); at render time a
  # stale/saturated grid would silently drop live samples.  Grid-culled
  # rendering remains available via create_render_fn(..., cull=True).
  render_eval_pfn = create_render_fn(model, mesh)
  train_pstep = create_train_step(model, config, mesh, dataset=dataset,
                                  stats_arg=stats_arg)

  return model, state, render_eval_pfn, train_pstep, lr_fn
