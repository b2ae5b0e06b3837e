"""Device mesh construction and sharding policy.

The reference scales with ``jax.pmap`` + host-side array reshapes
(train_utils.py:341-345, utils.py:125-128 of google-research/multinerf).
This framework instead uses the modern SPMD stack: one global
``jax.sharding.Mesh`` with a ``data`` axis (batch parallelism) and an
optional ``model`` axis (tensor parallelism for the wide NerfMLP), jit-ed
functions with ``NamedSharding`` annotations, and XLA GSPMD inserting the
gradient all-reduce and any weight collectives over ICI.

Multi-host feeding goes through ``jax.make_array_from_process_local_data``
instead of per-host device stacking.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def create_mesh(model_parallel: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """Build a (data, model) mesh over all devices.

  Args:
    model_parallel: size of the tensor-parallel axis; the data axis gets
      every remaining device.  1 (default) is pure data parallelism.
    devices: optional explicit device list (defaults to jax.devices()).

  Returns:
    A 2D Mesh with axes (data, model); model axis may have size 1.
  """
  devices = list(devices if devices is not None else jax.devices())
  n = len(devices)
  if n % model_parallel != 0:
    raise ValueError(
        f'{n} devices not divisible by model_parallel={model_parallel}')
  grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
  return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
  """Fully-replicated sharding (params, optimizer state, scalars)."""
  return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
  """Shard the leading (ray-batch) dim over the data axis."""
  return NamedSharding(mesh, P(DATA_AXIS, *(None,) * (ndim - 1)))


def shard_batch_to_global(mesh: Mesh, batch: Any) -> Any:
  """Turn a host-local numpy batch pytree into global device arrays.

  In a multi-process setup each process passes its local slice of the global
  batch; single-process, this is just an H2D put with the right layout.
  """
  def put(x):
    x = np.asarray(x)
    sharding = data_sharding(mesh, x.ndim)
    if jax.process_count() > 1:
      return jax.make_array_from_process_local_data(sharding, x)
    return jax.device_put(x, sharding)
  return jax.tree_util.tree_map(put, batch)


def process_local_slice(global_batch_size: int) -> int:
  """Rays this process must feed per step (global size / process count)."""
  n = jax.process_count()
  if global_batch_size % n:
    raise ValueError(f'batch size {global_batch_size} not divisible by '
                     f'{n} processes')
  return global_batch_size // n


def _layer_sort_key(path_entry) -> tuple:
  """Sort flax auto-names numerically: Dense_2 before Dense_10."""
  name = getattr(path_entry, 'key', None) or str(path_entry)
  head, _, tail = str(name).rpartition('_')
  if head and tail.isdigit():
    return (head, int(tail))
  return (str(name), -1)


def infer_tree_shardings(tree: Any, mesh: Mesh,
                         min_dim_to_shard: int = 512) -> Any:
  """Megatron-style tensor-parallel layout for any params-shaped pytree.

  Dense kernels are [fan_in, fan_out].  Within each module that owns a run
  of Dense layers, consecutive wide kernels are paired column-parallel
  (fan_out split over MODEL_AXIS) then row-parallel (fan_in split): the
  column layer leaves its activation sharded on the feature dim, the row
  layer consumes it in place, and GSPMD emits one psum after the pair
  instead of an all-gather per layer.  A dim is only split when it is both
  >= min_dim_to_shard and divisible by the model-axis size; everything else
  (biases, small heads, scalars) is replicated.  With model axis size 1
  this degenerates to full replication (pure DP).

  Works on a raw params dict or a whole TrainState: Adam's mu/nu subtrees
  repeat the params structure under a different path prefix, so grouping by
  full parent path keeps their layout decisions identical to the params'.
  """
  model_size = mesh.shape[MODEL_AXIS]
  leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
  if model_size <= 1:
    return jax.tree_util.tree_unflatten(
        treedef, [replicated(mesh)] * len(leaves))

  def splittable(dim):
    return dim >= min_dim_to_shard and dim % model_size == 0

  # Pass 1: group 2-D kernels by owning module (path minus the Dense layer
  # and the trailing 'kernel'), ordered by layer index within the module.
  groups: dict = {}
  for i, (path, x) in enumerate(leaves):
    is_kernel = (hasattr(x, 'ndim') and x.ndim == 2 and len(path) >= 2 and
                 str(getattr(path[-1], 'key', path[-1])) == 'kernel')
    if is_kernel:
      groups.setdefault(path[:-2], []).append((path[-2], i, x.shape))

  # Pass 2: walk each module's layers in order, alternating column -> row.
  specs = [P()] * len(leaves)
  for layers in groups.values():
    layers.sort(key=lambda item: _layer_sort_key(item[0]))
    prev_was_column = False
    for _, leaf_idx, shape in layers:
      fan_in, fan_out = shape
      if prev_was_column and splittable(fan_in):
        specs[leaf_idx] = P(MODEL_AXIS, None)
        prev_was_column = False
      elif splittable(fan_out):
        specs[leaf_idx] = P(None, MODEL_AXIS)
        prev_was_column = True
      else:
        prev_was_column = False

  return jax.tree_util.tree_unflatten(
      treedef, [NamedSharding(mesh, s) for s in specs])


def infer_param_shardings(params: Any, mesh: Mesh,
                          min_dim_to_shard: int = 512) -> Any:
  """NamedSharding for every parameter (see infer_tree_shardings)."""
  return infer_tree_shardings(params, mesh, min_dim_to_shard)


def per_chip_bytes(tree: Any) -> int:
  """Bytes one chip holds for a pytree of (possibly sharded) global arrays."""
  def nbytes(x):
    shard_shape = x.sharding.shard_shape(x.shape)
    return int(np.prod(shard_shape)) * x.dtype.itemsize
  return sum(nbytes(x) for x in jax.tree_util.tree_leaves(tree)
             if hasattr(x, 'sharding'))
