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


# Substrings of flattened parameter paths that identify weights worth
# sharding over the model axis, mapped to the kernel dim to shard.  Dense
# kernels are [fan_in, fan_out]; sharding fan_out column-parallel splits the
# wide NerfMLP matmuls across chips (XLA inserts the reduce for the next
# row-parallel layer on its own).
def infer_param_shardings(params: Any, mesh: Mesh,
                          min_dim_to_shard: int = 512) -> Any:
  """Choose a NamedSharding for every parameter.

  Kernels whose output dim is both large (>= min_dim_to_shard) and divisible
  by the model-axis size are sharded column-parallel over MODEL_AXIS; all
  other parameters are replicated.  With model axis size 1 this degenerates
  to full replication (pure DP).
  """
  model_size = mesh.shape[MODEL_AXIS]

  def rule(path, x):
    del path
    if (model_size > 1 and hasattr(x, 'ndim') and x.ndim == 2 and
        x.shape[-1] >= min_dim_to_shard and x.shape[-1] % model_size == 0):
      return NamedSharding(mesh, P(None, MODEL_AXIS))
    return replicated(mesh)

  return jax.tree_util.tree_map_with_path(rule, params)
