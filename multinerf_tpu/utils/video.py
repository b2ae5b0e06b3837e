"""Video encoding with graceful degradation.

The reference shells out to ffmpeg via mediapy (render.py:79-95 of
google-research/multinerf).  This environment may lack both; we try
mediapy, then imageio(+ffmpeg), and otherwise skip video assembly with a
clear message (the per-frame PNGs/TIFFs are always written regardless).
"""

from __future__ import annotations

import numpy as np


class VideoWriter:
  """Best-available mp4 writer; no-op (with a warning) if none exists."""

  def __init__(self, path: str, fps: int, shape=None, crf: int = 18):
    self._path = path
    self._impl = None
    self._frames = []
    try:
      import mediapy
      self._impl = mediapy.VideoWriter(
          path, shape=shape, codec='h264', fps=fps, crf=crf)
      self._impl.__enter__()
      self._kind = 'mediapy'
      return
    except (ImportError, Exception):  # noqa: BLE001 - fall through.
      self._impl = None
    try:
      import imageio
      self._impl = imageio.get_writer(path, fps=fps, codec='libx264')
      self._kind = 'imageio'
      return
    except Exception:  # noqa: BLE001
      self._impl = None
      self._kind = 'none'
      print(f'No video encoder available (mediapy/imageio+ffmpeg missing); '
            f'skipping {path}. Frames remain on disk.')

  def add_image(self, frame: np.ndarray):
    if self._impl is None:
      return
    if self._kind == 'mediapy':
      self._impl.add_image(frame)
    else:
      self._impl.append_data(frame)

  def close(self):
    if self._impl is None:
      return
    if self._kind == 'mediapy':
      self._impl.__exit__(None, None, None)
    else:
      self._impl.close()

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()
