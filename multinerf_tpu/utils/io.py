"""Host-side image/EXIF file IO (parity with internal/utils.py:104-171)."""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
from PIL import ExifTags
from PIL import Image


def open_image(f):
  """Open a PIL image from a file object or path."""
  return Image.open(f)


def _write(pth: str, pil_image, fmt: str) -> None:
  """Write one PIL image in the given format."""
  with open(pth, 'wb') as f:
    pil_image.save(f, fmt)


def load_img(pth: str) -> np.ndarray:
  """Load an image as float32 (no scaling applied)."""
  with open(pth, 'rb') as f:
    return np.asarray(Image.open(f)).astype(np.float32)


def load_exif(pth: str) -> Dict[str, Any]:
  """Load EXIF tags (named) for an image; empty dict if none."""
  with open(pth, 'rb') as f:
    raw = Image.open(f)._getexif() or {}  # pylint: disable=protected-access
  return {ExifTags.TAGS[tag]: value for tag, value in raw.items()
          if tag in ExifTags.TAGS}


def save_img_u8(img, pth):
  """Save an RGB image in [0, 1] as an 8-bit PNG."""
  quantized = np.clip(np.nan_to_num(img), 0.0, 1.0) * 255.0
  _write(pth, Image.fromarray(quantized.astype(np.uint8)), 'PNG')


def save_img_f32(depthmap, pth):
  """Save a float map (e.g. depth) as a 32-bit TIFF."""
  _write(pth, Image.fromarray(np.nan_to_num(depthmap).astype(np.float32)),
         'TIFF')


def makedirs(pth):
  os.makedirs(pth, exist_ok=True)
