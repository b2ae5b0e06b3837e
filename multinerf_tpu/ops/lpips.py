"""Learned perceptual similarity (LPIPS, Zhang et al. 2018) in JAX.

VGG16 backbone + linear calibration heads, evaluated as one jit (NHWC
convs lower straight onto the MXU).  The reference never computes LPIPS in
code, but its result tables carry an LPIPS column
(scripts/generate_tables.ipynb of google-research/multinerf consumes
``metric_lpips_*.txt``); this module supplies that capability.

Pretrained weights are NOT bundled (this environment has no network
egress).  Export them once from an environment that has torchvision +
lpips installed with ``scripts/export_lpips_weights.py`` and point
``Config.lpips_weights_path`` at the resulting ``.npz``; eval.py then
writes ``metric_lpips_{step}.txt`` alongside PSNR/SSIM.

npz schema (all float32):
  conv{b}_{i}/kernel : [3, 3, cin, cout]  (HWIO)
  conv{b}_{i}/bias   : [cout]
  lin{k}/weight      : [c_k]   non-negative calibration weights, k = 0..4
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature extractor: (name, out_channels); 'pool' marks 2x2 maxpools.
# Taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3) follow the official
# LPIPS VGG configuration.
VGG16_LAYOUT = (
    ('conv1_1', 64), ('conv1_2', 64), 'pool',
    ('conv2_1', 128), ('conv2_2', 128), 'pool',
    ('conv3_1', 256), ('conv3_2', 256), ('conv3_3', 256), 'pool',
    ('conv4_1', 512), ('conv4_2', 512), ('conv4_3', 512), 'pool',
    ('conv5_1', 512), ('conv5_2', 512), ('conv5_3', 512),
)
TAPS = ('conv1_2', 'conv2_2', 'conv3_3', 'conv4_3', 'conv5_3')

# Input normalization of the official implementation: images in [-1, 1]
# are shifted/scaled per channel before entering the VGG.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def random_params(rng: np.random.RandomState) -> Mapping[str, np.ndarray]:
  """Random-weight parameter dict with the correct schema (for tests)."""
  params = {}
  cin = 3
  k = 0
  for entry in VGG16_LAYOUT:
    if entry == 'pool':
      continue
    name, cout = entry
    params[f'{name}/kernel'] = (
        rng.randn(3, 3, cin, cout).astype(np.float32) / np.sqrt(9 * cin))
    params[f'{name}/bias'] = np.zeros(cout, np.float32)
    cin = cout
  for tap in TAPS:
    cout = dict(e for e in VGG16_LAYOUT if e != 'pool')[tap]
    params[f'lin{k}/weight'] = rng.rand(cout).astype(np.float32)
    k += 1
  return params


def load_params(path: str) -> Mapping[str, jnp.ndarray]:
  with np.load(path) as data:
    return {k: jnp.asarray(data[k]) for k in data.files}


def _conv(x, kernel, bias):
  y = jax.lax.conv_general_dilated(
      x, kernel, window_strides=(1, 1), padding='SAME',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  return y + bias


def _maxpool2(x):
  return jax.lax.reduce_window(
      x, -jnp.inf, jax.lax.max, window_dimensions=(1, 2, 2, 1),
      window_strides=(1, 2, 2, 1), padding='VALID')


def _vgg_taps(params, x):
  feats = []
  for entry in VGG16_LAYOUT:
    if entry == 'pool':
      x = _maxpool2(x)
      continue
    name, _ = entry
    x = jax.nn.relu(_conv(x, params[f'{name}/kernel'], params[f'{name}/bias']))
    if name in TAPS:
      feats.append(x)
  return feats


def _unit_normalize(f, eps=1e-10):
  return f * jax.lax.rsqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)


def lpips(params: Mapping[str, jnp.ndarray], img0, img1) -> jnp.ndarray:
  """LPIPS distance between two [..., H, W, 3] images in [0, 1].

  Lower is better; 0 for identical inputs (with any weights, since the
  tap differences vanish).
  """
  img0 = jnp.asarray(img0, jnp.float32)
  img1 = jnp.asarray(img1, jnp.float32)
  batched = img0.ndim == 4
  if not batched:
    img0, img1 = img0[None], img1[None]

  def normalize_input(img):
    return (2.0 * img - 1.0 - _SHIFT) / _SCALE

  taps0 = _vgg_taps(params, normalize_input(img0))
  taps1 = _vgg_taps(params, normalize_input(img1))

  total = 0.0
  for k, (f0, f1) in enumerate(zip(taps0, taps1)):
    d = (_unit_normalize(f0) - _unit_normalize(f1))**2
    weighted = jnp.sum(d * params[f'lin{k}/weight'], axis=-1)
    total = total + jnp.mean(weighted, axis=(-2, -1))
  return total if batched else total[0]


class LPIPS:
  """Jitted LPIPS scorer bound to a loaded weight set."""

  def __init__(self, weights_path: str):
    self.params = load_params(weights_path)
    self._fn = jax.jit(lpips)

  def __call__(self, img0, img1) -> float:
    return float(self._fn(self.params, img0, img1))


def try_load(weights_path: Optional[str]) -> Optional[LPIPS]:
  """LPIPS scorer if a weight file is configured and readable, else None."""
  if not weights_path:
    return None
  try:
    return LPIPS(weights_path)
  except (OSError, KeyError) as e:
    print(f'LPIPS weights unavailable ({e}); skipping LPIPS metric.')
    return None
