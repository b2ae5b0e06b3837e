"""CheckpointManager restore semantics (utils/checkpoints.py).

The collection-mismatch graft matters in production: a checkpoint written
by an occupancy-culling training run carries params['occupancy'] that a
plain eval.py/render.py state does not (reference equivalent: flax
restore_checkpoint is structure-lenient, train.py:84-86); without the
graft the stability run's final eval crashes in orbax's strict
structure match.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multinerf_tpu.utils import checkpoints as ckpt_lib


def _mngr(tmp_path):
  return ckpt_lib.CheckpointManager(str(tmp_path), keep=3, async_save=False)


def test_roundtrip_exact_structure(tmp_path):
  ckpt = _mngr(tmp_path)
  state = {'params': {'w': jnp.arange(4.0)}, 'step': jnp.asarray(7)}
  ckpt.save(0, state)
  ckpt.wait_until_finished()
  abstract = {'params': {'w': jnp.zeros(4)}, 'step': jnp.asarray(0)}
  out = ckpt.restore_latest(abstract)
  np.testing.assert_array_equal(np.asarray(out['params']['w']),
                                np.arange(4.0))
  assert int(out['step']) == 7
  ckpt.close()


def test_restore_without_checkpoint_returns_state(tmp_path):
  ckpt = _mngr(tmp_path)
  state = {'a': jnp.ones(2)}
  assert ckpt.restore_latest(state) is state
  ckpt.close()


def test_restore_drops_checkpoint_only_collection(tmp_path):
  """Culled-trained checkpoint (extra occupancy grid) -> plain eval state."""
  ckpt = _mngr(tmp_path)
  trained = {'params': {'w': jnp.arange(4.0),
                        'occupancy': {'grid': jnp.full((8,), 3.0)}},
             'step': jnp.asarray(11)}
  ckpt.save(0, trained)
  ckpt.wait_until_finished()
  abstract = {'params': {'w': jnp.zeros(4)}, 'step': jnp.asarray(0)}
  out = ckpt.restore_latest(abstract)
  np.testing.assert_array_equal(np.asarray(out['params']['w']),
                                np.arange(4.0))
  assert int(out['step']) == 11
  assert 'occupancy' not in out['params']
  ckpt.close()


def test_restore_keeps_state_only_collection_at_init(tmp_path):
  """Uncull-trained checkpoint -> culling eval state: the grid keeps its
  initial value, everything else restores."""
  ckpt = _mngr(tmp_path)
  trained = {'params': {'w': jnp.arange(4.0)}, 'step': jnp.asarray(5)}
  ckpt.save(0, trained)
  ckpt.wait_until_finished()
  abstract = {'params': {'w': jnp.zeros(4),
                         'occupancy': {'grid': jnp.full((8,), 9.0)}},
              'step': jnp.asarray(0)}
  out = ckpt.restore_latest(abstract)
  np.testing.assert_array_equal(np.asarray(out['params']['w']),
                                np.arange(4.0))
  np.testing.assert_array_equal(np.asarray(out['params']['occupancy']['grid']),
                                np.full((8,), 9.0))
  assert int(out['step']) == 5
  ckpt.close()


def test_restore_graft_handles_tuple_opt_state(tmp_path):
  """Tuple nodes (optax opt_state) serialize as string-indexed dicts; the
  graft's path normalization must line SequenceKey up with DictKey."""
  ckpt = _mngr(tmp_path)
  trained = {'opt_state': (jnp.ones(2) * 4, {'mu': jnp.ones(3) * 5}),
             'params': {'w': jnp.arange(4.0),
                        'occupancy': {'grid': jnp.ones(8)}}}
  ckpt.save(0, trained)
  ckpt.wait_until_finished()
  abstract = {'opt_state': (jnp.zeros(2), {'mu': jnp.zeros(3)}),
              'params': {'w': jnp.zeros(4)}}
  out = ckpt.restore_latest(abstract)
  np.testing.assert_array_equal(np.asarray(out['opt_state'][0]),
                                np.full((2,), 4.0))
  np.testing.assert_array_equal(np.asarray(out['opt_state'][1]['mu']),
                                np.full((3,), 5.0))
  assert isinstance(out['opt_state'], tuple)
  ckpt.close()
