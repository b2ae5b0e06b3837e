"""Core pytree types: the universal data currency of the framework.

Mirrors the public data contract of the reference (``internal/utils.py:31-101``
of google-research/multinerf): a train/eval batch is either a compact
``Pixels`` (int pixel coords + camera index; rays get cast on device) or a
fully-materialized ``Rays``.  Keeping ``Pixels`` compact is what makes the
on-device data plane cheap: the host->HBM stream is ~20 bytes/ray instead of
~60.
"""

from __future__ import annotations

import enum
from typing import Any, Dict, Optional, Union

import flax
import jax
import jax.numpy as jnp
import numpy as np

_Array = Union[np.ndarray, jnp.ndarray]


@flax.struct.dataclass
class Pixels:
  """Compact per-ray record; rays are cast from these on device.

  All tensors share leading dims; the trailing dim is the record width.
  """
  pix_x_int: _Array
  pix_y_int: _Array
  lossmult: _Array
  near: _Array
  far: _Array
  cam_idx: _Array
  exposure_idx: Optional[_Array] = None
  exposure_values: Optional[_Array] = None


@flax.struct.dataclass
class Rays:
  """Fully-cast rays with cone footprint metadata."""
  origins: _Array
  directions: _Array
  viewdirs: _Array
  radii: _Array
  imageplane: _Array
  lossmult: _Array
  near: _Array
  far: _Array
  cam_idx: _Array
  exposure_idx: Optional[_Array] = None
  exposure_values: Optional[_Array] = None


@flax.struct.dataclass
class Batch:
  """One training/eval batch: rays (or pixels) plus supervision targets."""
  rays: Union[Pixels, Rays]
  rgb: Optional[_Array] = None
  disps: Optional[_Array] = None
  normals: Optional[_Array] = None
  alphas: Optional[_Array] = None


class DataSplit(enum.Enum):
  TRAIN = 'train'
  TEST = 'test'


class BatchingMethod(enum.Enum):
  """Sample each batch's rays from one image or from all images."""
  ALL_IMAGES = 'all_images'
  SINGLE_IMAGE = 'single_image'


def dummy_rays(include_exposure_idx: bool = False,
               include_exposure_values: bool = False) -> Rays:
  """Minimal Rays pytree used to initialize model parameters."""
  data_fn = lambda n: jnp.zeros((1, n))
  kwargs: Dict[str, Any] = {}
  if include_exposure_idx:
    kwargs['exposure_idx'] = data_fn(1).astype(jnp.int32)
  if include_exposure_values:
    kwargs['exposure_values'] = data_fn(1)
  return Rays(
      origins=data_fn(3),
      directions=data_fn(3),
      viewdirs=data_fn(3),
      radii=data_fn(1),
      imageplane=data_fn(2),
      lossmult=data_fn(1),
      near=data_fn(1),
      far=data_fn(1),
      cam_idx=data_fn(1).astype(jnp.int32),
      **kwargs)
