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


def load_img(pth: str) -> np.ndarray:
  """Load an image as float32 (no scaling applied)."""
  with open(pth, 'rb') as f:
    return np.array(Image.open(f), dtype=np.float32)


def load_exif(pth: str) -> Dict[str, Any]:
  """Load EXIF tags (named) for an image; empty dict if none."""
  with open(pth, 'rb') as f:
    image_pil = Image.open(f)
    exif_pil = image_pil._getexif()  # pylint: disable=protected-access
    if exif_pil is not None:
      return {ExifTags.TAGS[k]: v for k, v in exif_pil.items()
              if k in ExifTags.TAGS}
    return {}


def save_img_u8(img, pth):
  """Save an RGB image in [0, 1] as an 8-bit PNG."""
  with open(pth, 'wb') as f:
    Image.fromarray(
        (np.clip(np.nan_to_num(img), 0.0, 1.0) * 255.0).astype(
            np.uint8)).save(f, 'PNG')


def save_img_f32(depthmap, pth):
  """Save a float map (e.g. depth) as a 32-bit TIFF."""
  with open(pth, 'wb') as f:
    Image.fromarray(np.nan_to_num(depthmap).astype(np.float32)).save(f, 'TIFF')


def makedirs(pth):
  os.makedirs(pth, exist_ok=True)
