"""RawNeRF raw-sensor data pipeline: demosaic, ISP, exposure metadata.

Functional parity with ``internal/raw_utils.py`` of google-research/multinerf
(arxiv.org/abs/2111.13679): a minimal ISP (raw -> white balance -> color
matrix -> expose -> sRGB gamma), Bayer mosaic loss masks, a trivially-
parallel bilinear demosaicker that runs jitted on device, EXIF processing
into exposure indices/values, and the HDR+ test-scene loading logic.

DNG decoding needs ``rawpy`` (libraw).  If it's unavailable this module
falls back to pre-decoded ``.npy`` sidecar files (same basename as the .dng)
and otherwise raises a clear error, so everything downstream of decoding
remains fully usable and testable.
"""

from __future__ import annotations

import glob
import json
import os
import types
from typing import Any, Mapping, MutableMapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from multinerf_tpu.data import types as dtypes
from multinerf_tpu.ops import image_ops
from multinerf_tpu.ops import mathx

_Array = Union[np.ndarray, jnp.ndarray]
_Axis = Optional[Union[int, Tuple[int, ...]]]


def postprocess_raw(raw: _Array, camtorgb: _Array,
                    exposure: Optional[float] = None,
                    xnp: types.ModuleType = np) -> _Array:
  """Minimal ISP: camera-space raw -> exposed, gamma-mapped sRGB.

  Args:
    raw: [H, W, 3] demosaicked raw image.
    camtorgb: [3, 3] camera-to-linear-RGB color transform.
    exposure: value mapped to pure white (autoexposes at 97% if None).
    xnp: numpy or jax.numpy.
  """
  if raw.shape[-1] != 3:
    raise ValueError(f'raw.shape[-1] is {raw.shape[-1]}, expected 3')
  if camtorgb.shape != (3, 3):
    raise ValueError(f'camtorgb.shape is {camtorgb.shape}, expected (3, 3)')
  matmul = mathx.matmul_hp if xnp == jnp else np.matmul
  linear_rgb = matmul(raw, camtorgb.T)
  if exposure is None:
    exposure = xnp.percentile(linear_rgb, 97)
  exposed = xnp.clip(linear_rgb / exposure, 0, 1)
  return image_ops.linear_to_srgb(exposed, xnp=xnp)


def pixels_to_bayer_mask(pix_x: _Array, pix_y: _Array,
                         xnp: types.ModuleType = np) -> _Array:
  """Binary RGB Bayer (RGGB) mask from integer pixel coordinates.

  xnp-generic: the device data plane evaluates it in-jit with xnp=jnp
  (single source of truth for the RGGB phase convention).
  """
  r = (pix_x % 2 == 0) * (pix_y % 2 == 0)  # Red at top-left.
  g = ((pix_x % 2 == 1) * (pix_y % 2 == 0) +
       (pix_x % 2 == 0) * (pix_y % 2 == 1))  # Greens on the anti-diagonal.
  b = (pix_x % 2 == 1) * (pix_y % 2 == 1)  # Blue at bottom-right.
  return xnp.stack([r, g, b], -1).astype(xnp.float32)


# Demosaic interpolation stencils, as (dy, dx) -> weight taps over a
# full-resolution plane that holds one channel's samples (zeros elsewhere).
#
# * Red/blue live on a 2x2 subgrid, so bilinear interpolation is the tent
#   filter: exact at sample sites, the 2-neighbor mean on half-step rows or
#   columns, the 4-corner mean at the fully offset phase.
# * Green lives on the complementary checkerboard; every missing pixel has
#   all four axis-neighbors observed, so one 4-cross mean fills it (the
#   center tap passes observed greens through untouched, since their
#   axis-neighbors are zeros in the plane).
_TENT_TAPS = tuple(
    ((dy, dx), 1.0 / (1 << (abs(dy) + abs(dx))))
    for dy in (-1, 0, 1) for dx in (-1, 0, 1))
_CROSS_TAPS = (((0, 0), 1.0),
               ((-1, 0), 0.25), ((1, 0), 0.25), ((0, -1), 0.25), ((0, 1), 0.25))


def bilinear_demosaic(bayer: _Array, xnp: types.ModuleType) -> _Array:
  """Bilinearly demosaic an RGGB Bayer mosaic into a full RGB image.

  Formulated as three scatter+filter passes at full resolution: each
  channel's samples stay in place in a zero-filled full-res plane and one
  fixed shift-stencil (tent for R/B, 4-cross for G) fills the missing
  phases — a uniform, trivially-parallel stencil per channel.  Shifts are
  circular, so edge wrap-around only touches the garbage border rows of
  real sensor data.  Behavior contract (values incl. wrap): the reference's
  demosaicker, internal/raw_utils.py:80-146 — pinned by the oracle test in
  tests/test_raw.py.

  Args:
    bayer: [H, W] mosaic (R at (0,0), G at (0,1)/(1,0), B at (1,1)).
    xnp: numpy or jax.numpy (jit the jnp version; it is all shifts+adds).
  """
  on = xnp.ones((), dtype=bayer.dtype)
  even_row = (xnp.arange(bayer.shape[0]) % 2 == 0)[:, None] * on
  even_col = (xnp.arange(bayer.shape[1]) % 2 == 0)[None, :] * on

  def filled(phase_mask, taps):
    plane = bayer * phase_mask
    return sum(w * xnp.roll(plane, (dy, dx), axis=(0, 1))
               for (dy, dx), w in taps)

  return xnp.stack([
      filled(even_row * even_col, _TENT_TAPS),
      filled(even_row + even_col - 2 * even_row * even_col, _CROSS_TAPS),
      filled((1 - even_row) * (1 - even_col), _TENT_TAPS),
  ], -1)


bilinear_demosaic_jax = jax.jit(
    lambda bayer: bilinear_demosaic(bayer, xnp=jnp))


def _read_dng(f) -> np.ndarray:
  """Decode a DNG via rawpy, or fall back to a .npy sidecar."""
  try:
    import rawpy
    return rawpy.imread(f).raw_image
  except ImportError:
    name = getattr(f, 'name', None)
    if name is not None:
      sidecar = os.path.splitext(name)[0] + '.npy'
      if os.path.exists(sidecar):
        return np.load(sidecar)
    raise ImportError(
        'rawpy is unavailable and no pre-decoded .npy sidecar was found. '
        'Either install rawpy/libraw or pre-decode DNGs with '
        "`np.save(base + '.npy', rawpy.imread(dng).raw_image)`.")


def load_raw_images(image_dir: str,
                    image_names: Optional[Sequence[str]] = None
                    ) -> Tuple[np.ndarray, Sequence[Mapping[str, Any]]]:
  """Load raw mosaics + exiftool-JSON EXIF data from disk."""
  if not os.path.exists(image_dir):
    raise ValueError(f'Raw image folder {image_dir} does not exist.')

  def read_pair(image_name):
    stem = os.path.join(image_dir, os.path.splitext(image_name)[0])
    with open(stem + '.dng', 'rb') as f:
      mosaic = _read_dng(f)
    with open(stem + '.json', 'rb') as f:
      exif = json.load(f)[0]
    return mosaic, exif

  if image_names is None:
    image_names = sorted(
        os.path.basename(f)
        for f in glob.glob(os.path.join(image_dir, '*.dng')))

  pairs = [read_pair(name) for name in image_names]
  raws = np.stack([m for m, _ in pairs], axis=0).astype(np.float32)
  return raws, [e for _, e in pairs]


# Brightness percentiles visualized as an exposure sweep in training logs.
_PERCENTILE_LIST = (80, 90, 97, 99, 100)

# EXIF fields needed for rescaling, white balance/color, and noise levels
# (DNG spec 1.4).
_EXIF_KEYS = (
    'BlackLevel',
    'WhiteLevel',
    'AsShotNeutral',
    'ColorMatrix2',
    'NoiseProfile',
)

# Reference-illuminant RGB -> XYZ (brucelindbloom.com).
_RGB2XYZ = np.array([[0.4124564, 0.3575761, 0.1804375],
                     [0.2126729, 0.7151522, 0.0721750],
                     [0.0193339, 0.1191920, 0.9503041]])


def process_exif(exifs: Sequence[Mapping[str, Any]]
                 ) -> MutableMapping[str, Any]:
  """Distill exiftool-JSON EXIF dicts into RawNeRF metadata.

  Builds the full raw->sRGB color transform: camera space -> white-balanced
  camera space (via AsShotNeutral) -> XYZ (via ColorMatrix2) -> linear RGB.
  """
  meta = {}
  for key in _EXIF_KEYS:
    sample = exifs[0].get(key)
    if sample is None:
      continue
    if isinstance(sample, str):  # Space-separated numeric vectors.
      parsed = [[float(z) for z in e[key].split(' ')] for e in exifs]
    else:
      parsed = [e[key] for e in exifs]
    meta[key] = np.squeeze(np.array(parsed))
  # Shutter speed is written like "1/N".
  meta['ShutterSpeed'] = np.fromiter(
      (1.0 / float(e['ShutterSpeed'].split('/')[1]) for e in exifs), float)

  wb_gains = 1.0 / meta['AsShotNeutral'].reshape(-1, 3)
  cam_to_wbcam = np.array([np.diag(g) for g in wb_gains])
  xyz_to_wbcam = meta['ColorMatrix2'].reshape(-1, 3, 3)
  rgb_to_wbcam = xyz_to_wbcam @ _RGB2XYZ
  # Row-normalize the color matrix (simple-camera-pipeline convention).
  rgb_to_wbcam /= rgb_to_wbcam.sum(axis=-1, keepdims=True)
  meta['cam2rgb'] = np.linalg.inv(rgb_to_wbcam) @ cam_to_wbcam
  return meta


def load_raw_dataset(split: dtypes.DataSplit, data_dir: str,
                     image_names: Sequence[str], exposure_percentile: float,
                     n_downsample: int
                     ) -> Tuple[np.ndarray, MutableMapping[str, Any], bool]:
  """Load + process a RawNeRF scene (incl. HDR+ ground-truth test scenes).

  Returns (demosaicked images, metadata dict incl. exposure indexing and a
  postprocess_fn closure, and whether this is an HDR+ test scene).
  """
  image_dir = os.path.join(data_dir, 'raw')

  testimg_file = os.path.join(data_dir, 'hdrplus_test/merged.dng')
  testscene = os.path.exists(testimg_file)
  if testscene:
    # Test scenes keep train/test split subdirectories inside raw/.
    image_dir = os.path.join(image_dir, split.value)
    if split == dtypes.DataSplit.TEST:
      image_names = None  # COLMAP names don't apply to the test split.
    else:
      image_names = image_names[1:]  # First name duplicates the test image.

  raws, exifs = load_raw_images(image_dir, image_names)
  meta = process_exif(exifs)

  if testscene and split == dtypes.DataSplit.TEST:
    with open(testimg_file, 'rb') as imgin:
      testraw = _read_dng(imgin)
    # HDR+ output carries 2 extra fixed-precision bits.
    testraw = testraw.astype(np.float32) / 4.0
    # Rescale the long-exposure test image by the shortest:longest ratio.
    shutter_ratio = meta['ShutterSpeed'][0] / meta['ShutterSpeed'][-1]
    raws = testraw[None]
    meta = {k: v[:1] for k, v in meta.items()}
  else:
    shutter_ratio = 1.0

  # Bucket the capture's shutter speeds, brightest (slowest) first; each
  # image gets its bucket index and an exposure value relative to the
  # brightest bucket.  (The exposure_* key names are the contract the
  # drivers' TB introspection and the learned-scaling embed read.)
  shutters = meta['ShutterSpeed']
  by_brightness = np.sort(np.unique(shutters))[::-1]
  meta['unique_shutters'] = by_brightness
  # Rank within the descending bucket list == first index with that value.
  meta['exposure_idx'] = np.searchsorted(
      -by_brightness, -shutters).astype(np.int32)
  meta['exposure_values'] = shutters / by_brightness[0]

  # Sensor counts -> [0, 1]: subtract the per-image black level, scale by
  # the sensor's dynamic range, then the HDR+ shutter-ratio correction.
  black = meta['BlackLevel'][:, None, None]
  white = meta['WhiteLevel'][:, None, None]
  images = (raws - black) / (white - black) * shutter_ratio

  # Gamma-mapping exposure anchors come from the FULL-RES first image
  # (stable across downsampling factors): demosaic it, rotate to linear
  # RGB, take brightness percentiles.
  rgb0 = np.array(bilinear_demosaic_jax(images[0])) @ meta['cam2rgb'][0].T
  meta['exposure'] = np.percentile(rgb0, exposure_percentile)
  meta['exposure_levels'] = {p: np.percentile(rgb0, p)
                             for p in _PERCENTILE_LIST}

  cam2rgb0 = meta['cam2rgb'][0]
  meta['postprocess_fn'] = (
      lambda z, x=meta['exposure']: postprocess_raw(z, cam2rgb0, x))

  # Demosaic (device-side: it is pure shifts/averages, faster through one
  # jit than on the CPU) and optionally downsample.
  def processing_fn(x):
    x_demosaic = bilinear_demosaic_jax(jnp.array(x))
    if n_downsample > 1:
      x_demosaic = image_ops.downsample(x_demosaic, n_downsample)
    return np.array(x_demosaic)

  images = np.stack([processing_fn(im) for im in images], axis=0)
  return images, meta, testscene


def best_fit_affine(x: _Array, y: _Array, axis: _Axis) -> _Array:
  """Least-squares a, b with a * x + b ~= y (covariance/variance form)."""
  mean_x = x.mean(axis=axis)
  mean_y = y.mean(axis=axis)
  cov_xy = (x * y).mean(axis=axis) - mean_x * mean_y
  var_x = (x * x).mean(axis=axis) - mean_x * mean_x
  a = cov_xy / var_x
  b = mean_y - a * mean_x
  return a, b


def match_images_affine(est: _Array, gt: _Array,
                        axis: _Axis = (0, 1)) -> _Array:
  """Affine-match a (noisy) estimate to ground truth for raw-space eval."""
  # Fit gt->est (robust when est is noisy), then invert back to gt's space.
  a, b = best_fit_affine(gt, est, axis=axis)
  return (est - b) / a
