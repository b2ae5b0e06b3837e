"""Orbax-backed checkpointing with the reference's save/restore contract.

The reference uses flax.training.checkpoints (save every N steps, keep=100,
restore the latest on startup — train.py:84-86,219-223).  This wrapper keeps
that contract but runs on orbax with async saves, so checkpointing overlaps
training instead of stalling the step loop.
"""

from __future__ import annotations

import os
from typing import Any, Optional

from absl import logging
import jax
import orbax.checkpoint as ocp


class CheckpointManager:
  """Thin orbax CheckpointManager with latest-step restore semantics."""

  def __init__(self, directory: str, keep: int = 100, async_save: bool = True):
    self._dir = os.path.abspath(directory)
    os.makedirs(self._dir, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep,
        enable_async_checkpointing=async_save,
    )
    self._mngr = ocp.CheckpointManager(self._dir, options=options)

  def save(self, step: int, state: Any):
    """Queue an (async) checkpoint save of `state` at `step`."""
    self._mngr.save(int(step), args=ocp.args.StandardSave(state))

  def latest_step(self) -> Optional[int]:
    return self._mngr.latest_step()

  def restore_latest(self, abstract_state: Any) -> Any:
    """Restore the latest checkpoint into abstract_state's structure.

    Returns abstract_state unchanged if no checkpoint exists.

    Tolerates *collection* mismatches between the checkpoint and the
    running job: a checkpoint written by an occupancy-culling run carries
    an extra ``params['occupancy']`` subtree that a plain eval/render job's
    state lacks (and vice versa — evaluating an uncull-trained checkpoint
    under a culling config).  The strict structure-matched restore is
    tried first; on mismatch, the checkpoint is loaded as a raw tree and
    grafted leaf-by-leaf onto ``abstract_state``: shared paths take the
    checkpoint value, paths only in the state keep their initial value,
    checkpoint-only paths are dropped.  Both remainders are logged.
    """
    step = self._mngr.latest_step()
    if step is None:
      return abstract_state
    try:
      return self._mngr.restore(step, args=ocp.args.StandardRestore(
          jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                 abstract_state)))
    except ValueError:
      pass
    raw = self._mngr.restore(step)

    def key_str(k):
      return str(getattr(k, 'key', getattr(k, 'name', getattr(k, 'idx', k))))

    saved = {tuple(key_str(k) for k in path): v
             for path, v in jax.tree_util.tree_flatten_with_path(raw)[0]}
    flat, treedef = jax.tree_util.tree_flatten_with_path(abstract_state)
    leaves, kept = [], []
    used = set()
    for path, leaf in flat:
      key = tuple(key_str(k) for k in path)
      if key in saved:
        used.add(key)
        leaves.append(saved[key])
      else:
        kept.append('/'.join(key))
        leaves.append(leaf)
    dropped = ['/'.join(k) for k in saved if k not in used]
    logging.warning(
        'Checkpoint step %d structure differs from the running state; '
        'grafted the intersection. State-only paths kept at init values: '
        '%s. Checkpoint-only paths dropped: %s.',
        step, kept or 'none', dropped or 'none')
    return jax.tree_util.tree_unflatten(treedef, leaves)

  def wait_until_finished(self):
    self._mngr.wait_until_finished()

  def close(self):
    self._mngr.close()
