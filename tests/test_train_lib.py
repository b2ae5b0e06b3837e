"""Unit tests for train_lib pieces: losses, clipping, weight decay, stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu import configs as configs_lib
from multinerf_tpu import ginlite
from multinerf_tpu import train_lib
from multinerf_tpu.data import datasets
from multinerf_tpu.parallel import mesh as mesh_lib


@pytest.fixture(autouse=True)
def _clean_gin():
  ginlite.clear_config()
  yield
  ginlite.clear_config()


def test_tree_helpers():
  tree = {'a': jnp.array([3.0, 4.0]), 'b': {'c': jnp.array([-5.0])}}
  assert float(train_lib.tree_norm_sq(tree)) == 50.0
  assert abs(float(train_lib.tree_norm(tree)) - np.sqrt(50)) < 1e-5
  assert float(train_lib.tree_abs_max(tree)) == 5.0
  assert int(train_lib.tree_len(tree)) == 3
  stats = train_lib.summarize_tree(tree, train_lib.tree_norm_sq)
  assert set(stats) == {'a', 'b', 'b/c'}


def test_clip_gradients_by_norm_and_value():
  grad = {'params': {
      'NerfMLP_0': {'kernel': jnp.array([10.0, -10.0])},
      'PropMLP_0': {'kernel': jnp.array([0.0001, -0.0001])},
  }}
  config = configs_lib.Config(grad_max_val=1.0, grad_max_norm=0.5)
  clipped = train_lib.clip_gradients(grad, config)
  nerf = np.array(clipped['params']['NerfMLP_0']['kernel'])
  # Value-clipped to 1 then norm-clipped to 0.5.
  np.testing.assert_allclose(np.linalg.norm(nerf), 0.5, rtol=1e-5)
  prop = np.array(clipped['params']['PropMLP_0']['kernel'])
  # Tiny gradients pass through unchanged.
  np.testing.assert_allclose(prop, [0.0001, -0.0001], rtol=1e-5)


def test_weight_decay_and_module_names():
  """weight_decay_mults keys match flax module naming (NerfMLP_0/...)."""
  ginlite.parse_config_files_and_bindings(
      [], ['PropMLP.net_depth = 1', 'PropMLP.net_width = 8',
           'NerfMLP.net_depth = 1', 'NerfMLP.net_width = 8',
           'Model.num_prop_samples = 4', 'Model.num_nerf_samples = 4',
           'Model.num_levels = 2'])
  config = configs_lib.Config(
      dataset_loader='dummy', batch_size=64, data_loss_type='mse',
      near=0.5, far=10.0, max_steps=10, lr_delay_steps=0,
      weight_decay_mults={'NerfMLP_0': 0.1})
  mesh = mesh_lib.create_mesh()
  dataset = datasets.load_dataset('train', '', config)
  rng = jax.random.PRNGKey(0)
  _, state, _, train_pstep, _ = train_lib.setup_model(
      config, rng, mesh=mesh, dataset=dataset)
  # The module name must exist in the parameter tree.
  assert 'NerfMLP_0' in state.params['params']
  state = jax.device_put(state, mesh_lib.replicated(mesh))
  batch = mesh_lib.shard_batch_to_global(mesh, next(dataset))
  _, stats, _ = train_pstep(rng, state, batch, 0.5, 1.0)
  stats = jax.device_get(stats)
  assert 'weight' in stats['losses']
  # weight loss = mult * ||NerfMLP params||^2.
  want = 0.1 * float(stats['weight_l2s']['NerfMLP_0'])
  assert abs(float(stats['losses']['weight']) - want) < 1e-4


def test_stats_structure():
  ginlite.parse_config_files_and_bindings(
      [], ['PropMLP.net_depth = 1', 'PropMLP.net_width = 8',
           'NerfMLP.net_depth = 1', 'NerfMLP.net_width = 8',
           'Model.num_prop_samples = 4', 'Model.num_nerf_samples = 4',
           'Model.num_levels = 2'])
  config = configs_lib.Config(
      dataset_loader='dummy', batch_size=64, data_loss_type='charb',
      near=0.5, far=10.0, max_steps=10, lr_delay_steps=0)
  mesh = mesh_lib.create_mesh()
  dataset = datasets.load_dataset('train', '', config)
  rng = jax.random.PRNGKey(0)
  _, state, _, train_pstep, _ = train_lib.setup_model(
      config, rng, mesh=mesh, dataset=dataset)
  state = jax.device_put(state, mesh_lib.replicated(mesh))
  batch = mesh_lib.shard_batch_to_global(mesh, next(dataset))
  _, stats, _ = train_pstep(rng, state, batch, 0.5, 1.0)
  stats = jax.device_get(stats)
  # The reference's rich stats surface (train_utils.py:304-338).
  for k in ['loss', 'losses', 'mses', 'psnrs', 'psnr', 'weight_l2s',
            'grad_norms', 'grad_maxes', 'opt_update_norms',
            'opt_update_maxes']:
    assert k in stats, k
  assert np.isfinite(stats['loss'])
  # 2 levels -> 2 mses/psnrs.
  assert np.asarray(stats['mses']).shape == (2,)
  assert {'data', 'interlevel', 'distortion'} <= set(stats['losses'])

def test_stats_arg_decimation_matches_default():
  """stats_arg=True step: flag=True reproduces the default stats exactly;
  flag=False produces an identical optimizer update with zeroed tree stats
  (the production decimation train.py/bench.py/the scan plane rely on)."""
  ginlite.parse_config_files_and_bindings(
      [], ['PropMLP.net_depth = 1', 'PropMLP.net_width = 8',
           'NerfMLP.net_depth = 1', 'NerfMLP.net_width = 8',
           'Model.num_prop_samples = 4', 'Model.num_nerf_samples = 4',
           'Model.num_levels = 2'])
  config = configs_lib.Config(
      dataset_loader='dummy', batch_size=64, data_loss_type='mse',
      near=0.5, far=10.0, max_steps=10, lr_delay_steps=0,
      weight_decay_mults={'NerfMLP_0': 0.1})
  mesh = mesh_lib.create_mesh()
  dataset = datasets.load_dataset('train', '', config)
  rng = jax.random.PRNGKey(0)
  model, state, _, pstep_default, _ = train_lib.setup_model(
      config, rng, mesh=mesh, dataset=dataset)
  pstep_flag = train_lib.create_train_step(model, config, mesh,
                                           dataset=dataset, stats_arg=True)
  host_state = jax.device_get(state)
  batch = mesh_lib.shard_batch_to_global(mesh, next(dataset))

  # The jitted steps donate (rng, state): rematerialize fresh inputs per
  # call so the donated buffers of one call never feed the next.
  fresh = lambda: (jax.random.PRNGKey(7),
                   jax.device_put(host_state, mesh_lib.replicated(mesh)))
  tree_stat_keys = ['weight_l2s', 'grad_norms', 'grad_maxes',
                    'opt_update_norms', 'opt_update_maxes']
  rng_d, state_in = fresh()
  state_d, stats_d, _ = pstep_default(rng_d, state_in, batch, 0.5, 1.0)
  rng_t, state_in = fresh()
  state_t, stats_t, _ = pstep_flag(rng_t, state_in, batch, 0.5, 1.0, True)
  rng_f, state_in = fresh()
  state_f, stats_f, _ = pstep_flag(rng_f, state_in, batch, 0.5, 1.0, False)
  stats_d, stats_t, stats_f = jax.device_get((stats_d, stats_t, stats_f))

  # flag=True == the default path, stats included (weight decay too).
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
      stats_d, stats_t)
  # flag=False: identical loss + identical parameter update...
  np.testing.assert_allclose(stats_f['loss'], stats_d['loss'], rtol=1e-6)
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-6),
      jax.device_get(state_t.params), jax.device_get(state_f.params))
  # ...with the tree stats zeroed (structure preserved for the TB plumbing).
  for k in tree_stat_keys:
    assert set(stats_f[k]) == set(stats_d[k]), k
    assert all(v == 0.0 for v in jax.tree_util.tree_leaves(stats_f[k])), k
    assert any(v != 0.0 for v in jax.tree_util.tree_leaves(stats_t[k])), k
