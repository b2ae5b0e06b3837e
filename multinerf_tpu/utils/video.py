"""Video encoding with graceful degradation.

The reference shells out to ffmpeg via mediapy (render.py:79-95 of
google-research/multinerf).  This environment may lack both; we try
mediapy, then imageio(+ffmpeg), and otherwise fall back to a built-in
dependency-free MJPEG-in-AVI encoder (`MjpegAviWriter`): every frame is
a PIL-encoded JPEG inside a hand-written RIFF/AVI container, playable by
stock players.  The per-frame PNGs/TIFFs are always written regardless.
"""

from __future__ import annotations

import io
import struct

import numpy as np


class MjpegAviWriter:
  """Minimal pure-Python MJPEG AVI encoder (no ffmpeg required).

  AVI is a RIFF file: a `hdrl` LIST with the main and per-stream headers,
  a `movi` LIST holding one `00dc` chunk per JPEG frame, and an `idx1`
  index.  MJPEG means each `00dc` payload is simply a baseline JPEG, so
  PIL does all the actual compression.  Frames are buffered as encoded
  JPEG bytes and the container is assembled at close() when all sizes
  are known.
  """

  def __init__(self, path: str, fps: int, quality: int = 90):
    self._path = path
    self._fps = int(fps)
    self._quality = quality
    self._jpegs = []
    self._shape = None

  def add_image(self, frame: np.ndarray):
    """Append one u8 RGB (or grayscale) frame."""
    from PIL import Image
    frame = np.asarray(frame)
    if frame.dtype != np.uint8:
      raise ValueError(f'MJPEG frames must be uint8, got {frame.dtype}')
    if self._shape is None:
      self._shape = frame.shape[:2]
    elif frame.shape[:2] != self._shape:
      raise ValueError(f'Frame shape {frame.shape[:2]} != {self._shape}')
    buf = io.BytesIO()
    Image.fromarray(frame).convert('RGB').save(
        buf, 'JPEG', quality=self._quality)
    self._jpegs.append(buf.getvalue())

  @staticmethod
  def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    padded = payload + (b'\0' if len(payload) % 2 else b'')
    return fourcc + struct.pack('<I', len(payload)) + padded

  @classmethod
  def _list(cls, kind: bytes, payload: bytes) -> bytes:
    return cls._chunk(b'LIST', kind + payload)

  def close(self):
    if not self._jpegs:
      return
    h, w = self._shape
    n = len(self._jpegs)
    max_bytes = max(map(len, self._jpegs))

    # Main AVI header: frame cadence, count, dimensions, HASINDEX flag.
    avih = self._chunk(b'avih', struct.pack(
        '<14I', 1_000_000 // self._fps, max_bytes * self._fps, 0, 0x10,
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0))
    # One video stream: MJPG handler at fps = rate/scale.  Fields after
    # the two FOURCCs: flags, priority+language, initial frames, scale,
    # rate, start, length, suggested buffer, quality, sample size, rect.
    strh = self._chunk(b'strh', struct.pack(
        '<4s4s10I4H', b'vids', b'MJPG', 0, 0, 0, 1, self._fps, 0, n,
        max_bytes, 0xFFFFFFFF, 0, 0, 0, int(w), int(h)))
    # BITMAPINFOHEADER with biCompression='MJPG'.
    strf = self._chunk(b'strf', struct.pack(
        '<I2i2H4s5I', 40, w, h, 1, 24, b'MJPG', w * h * 3, 0, 0, 0, 0))
    hdrl = self._list(b'hdrl', avih + self._list(b'strl', strh + strf))

    # Frame chunks + the idx1 index (offsets count from the 'movi' tag).
    frames, index, offset = [], [], 4
    for jpeg in self._jpegs:
      chunk = self._chunk(b'00dc', jpeg)
      frames.append(chunk)
      index.append(struct.pack('<4s3I', b'00dc', 0x10, offset, len(jpeg)))
      offset += len(chunk)
    movi = self._list(b'movi', b''.join(frames))
    idx1 = self._chunk(b'idx1', b''.join(index))

    with open(self._path, 'wb') as f:
      f.write(self._chunk(b'RIFF', b'AVI ' + hdrl + movi + idx1))


class VideoWriter:
  """Best-available video writer; falls back to built-in MJPEG AVI."""

  def __init__(self, path: str, fps: int, shape=None, crf: int = 18):
    self._path = path
    self._impl = None
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
      avi_path = path.rsplit('.', 1)[0] + '.avi'
      print(f'No mp4 encoder available (mediapy/imageio+ffmpeg missing); '
            f'writing MJPEG {avi_path} instead.')
      self._impl = MjpegAviWriter(avi_path, fps=fps)
      self._kind = 'mjpeg'

  def add_image(self, frame: np.ndarray):
    if self._impl is None:
      return
    if self._kind == 'imageio':
      self._impl.append_data(frame)
    else:
      self._impl.add_image(frame)

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
