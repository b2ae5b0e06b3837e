"""MJPEG-AVI fallback encoder: container structure + decodable frames.

The environment has no ffmpeg/mediapy, so render.py's video assembly runs
through utils/video.MjpegAviWriter (pure-Python RIFF container around
PIL-encoded JPEG frames).  These tests parse the written RIFF back by
hand and decode an embedded frame, so a regression in the container
layout (players refusing the file) fails CI rather than only in a player.
"""

import io
import os
import struct

import numpy as np
import pytest

from multinerf_tpu.utils import video as video_lib


def _write_sample(tmp_path, n_frames=5, h=24, w=32, fps=4):
  # Smooth gradients (JPEG-friendly) shifted per frame.
  base = np.linspace(0, 200, h)[:, None, None] + np.linspace(0, 55, w)[None, :,
                                                                       None]
  frames = [
      np.clip(base + 10 * i, 0, 255).astype(np.uint8) * np.ones(3, np.uint8)
      for i in range(n_frames)
  ]
  path = os.path.join(tmp_path, 'clip.avi')
  writer = video_lib.MjpegAviWriter(path, fps=fps)
  for f in frames:
    writer.add_image(f)
  writer.close()
  return path, frames


def _read_chunks(data, start, end):
  """Yield (fourcc, payload_start, payload_size) for a chunk run."""
  pos = start
  while pos < end:
    fourcc = data[pos:pos + 4]
    (size,) = struct.unpack('<I', data[pos + 4:pos + 8])
    yield fourcc, pos + 8, size
    pos += 8 + size + (size % 2)


def test_container_structure_and_index(tmp_path):
  path, frames = _write_sample(str(tmp_path))
  data = open(path, 'rb').read()

  # RIFF/AVI framing, with the declared size covering the whole file.
  assert data[:4] == b'RIFF' and data[8:12] == b'AVI '
  (riff_size,) = struct.unpack('<I', data[4:8])
  assert 8 + riff_size == len(data)

  lists = {}
  for fourcc, start, size in _read_chunks(data, 12, len(data)):
    key = data[start:start + 4] if fourcc == b'LIST' else fourcc
    lists[key] = (start, size)
  assert set(lists) >= {b'hdrl', b'movi', b'idx1'}

  # Main header: frame count and dimensions.
  hdrl_start, _ = lists[b'hdrl']
  avih_fields = struct.unpack('<14I', data[hdrl_start + 12:hdrl_start + 68])
  assert avih_fields[4] == len(frames)          # dwTotalFrames
  assert (avih_fields[8], avih_fields[9]) == (32, 24)  # width, height
  assert avih_fields[3] & 0x10                  # AVIF_HASINDEX

  # One '00dc' chunk per frame inside movi, each a decodable JPEG.
  movi_start, movi_size = lists[b'movi']
  movi_chunks = list(
      _read_chunks(data, movi_start + 4, movi_start + movi_size))
  assert [c[0] for c in movi_chunks] == [b'00dc'] * len(frames)

  # The idx1 offsets (relative to the 'movi' tag) must land on each chunk.
  idx_start, idx_size = lists[b'idx1']
  assert idx_size == 16 * len(frames)
  for i, (_, payload_start, payload_size) in enumerate(movi_chunks):
    tag, flags, offset, size = struct.unpack(
        '<4s3I', data[idx_start + 16 * i:idx_start + 16 * (i + 1)])
    assert tag == b'00dc' and flags & 0x10
    # Offsets count from the 'movi' tag to the chunk HEADER.
    assert movi_start + offset + 8 == payload_start
    assert size == payload_size


def test_frames_decode_back(tmp_path):
  from PIL import Image
  path, frames = _write_sample(str(tmp_path), n_frames=3)
  data = open(path, 'rb').read()
  movi_at = data.index(b'LIST') and data.find(b'movi')
  decoded = []
  for fourcc, start, size in _read_chunks(data, movi_at + 4, len(data)):
    if fourcc != b'00dc':
      break
    decoded.append(np.asarray(Image.open(io.BytesIO(data[start:start + size]))))
  assert len(decoded) == len(frames)
  for got, want in zip(decoded, frames):
    assert got.shape == want.shape
    # Smooth gradients survive JPEG nearly intact.
    assert np.abs(got.astype(float) - want.astype(float)).mean() < 3


def test_videowriter_falls_back_to_mjpeg(tmp_path):
  path = os.path.join(str(tmp_path), 'out.mp4')
  with video_lib.VideoWriter(path, fps=2, shape=(8, 8)) as w:
    for _ in range(2):
      w.add_image(np.zeros((8, 8, 3), np.uint8))
  if w._kind == 'mjpeg':  # This environment: no mediapy/imageio+ffmpeg.
    avi = os.path.join(str(tmp_path), 'out.avi')
    assert os.path.exists(avi) and open(avi, 'rb').read(4) == b'RIFF'
  else:  # pragma: no cover - encoder-equipped environments.
    assert os.path.exists(path)


def test_rejects_bad_frames(tmp_path):
  writer = video_lib.MjpegAviWriter(
      os.path.join(str(tmp_path), 'x.avi'), fps=2)
  with pytest.raises(ValueError):
    writer.add_image(np.zeros((4, 4, 3), np.float32))
  writer.add_image(np.zeros((4, 4, 3), np.uint8))
  with pytest.raises(ValueError):
    writer.add_image(np.zeros((8, 4, 3), np.uint8))
