"""Orbax-backed checkpointing with the reference's save/restore contract.

The reference uses flax.training.checkpoints (save every N steps, keep=100,
restore the latest on startup — train.py:84-86,219-223).  This wrapper keeps
that contract but runs on orbax with async saves, so checkpointing overlaps
training instead of stalling the step loop.
"""

from __future__ import annotations

import os
from typing import Any, Optional

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
    """
    step = self._mngr.latest_step()
    if step is None:
      return abstract_state
    return self._mngr.restore(step, args=ocp.args.StandardRestore(
        jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                               abstract_state)))

  def wait_until_finished(self):
    self._mngr.wait_until_finished()

  def close(self):
    self._mngr.close()
