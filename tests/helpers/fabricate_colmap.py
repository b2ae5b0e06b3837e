"""Fabricate a tiny COLMAP scene on disk for real-scene-path e2e tests.

Writes the inverse of multinerf_tpu/data/colmap.py: a ``sparse/0`` model
(``cameras.bin`` / ``images.bin`` / ``points3D.bin`` in the binary format
of COLMAP's reconstruction_io.cc) plus an ``images/`` + ``images_2/``
pyramid of PNG renders of an analytic sphere scene — everything the LLFF
loader stages need (COLMAP parse -> pyramid decode -> pose PCA ->
ellipse path), with no COLMAP binary or real capture involved.

The scene: textured unit sphere at the origin over a white background,
cameras on a ring of radius 4 — multi-view consistent, so a few hundred
training steps measurably beat the init and eval metrics are meaningful.
"""

import os
import struct

import numpy as np

from multinerf_tpu.data import cameras as camera_lib
from multinerf_tpu.utils import io as io_lib

RES = 64  # Original capture resolution; images_2 holds RES // 2.
PINHOLE_MODEL_ID = 1
SIMPLE_RADIAL_MODEL_ID = 2


def rotmat_to_qvec(rot):
  """Rotation matrix -> COLMAP (w, x, y, z) quaternion."""
  tr = np.trace(rot)
  if tr > 0:
    s = 2 * np.sqrt(tr + 1.0)
    return np.array([s / 4, (rot[2, 1] - rot[1, 2]) / s,
                     (rot[0, 2] - rot[2, 0]) / s,
                     (rot[1, 0] - rot[0, 1]) / s])
  i = int(np.argmax(np.diag(rot)))
  j, k = (i + 1) % 3, (i + 2) % 3
  s = 2 * np.sqrt(max(0.0, 1.0 + rot[i, i] - rot[j, j] - rot[k, k]))
  q = np.empty(4)
  q[0] = (rot[k, j] - rot[j, k]) / s
  q[1 + i] = s / 4
  q[1 + j] = (rot[j, i] + rot[i, j]) / s
  q[1 + k] = (rot[k, i] + rot[i, k]) / s
  return q


def ring_poses(n):
  """[n, 3, 4] NeRF-convention (right, up, back) camera-to-world poses."""
  poses = []
  for i in range(n):
    theta = 2 * np.pi * i / n
    pos = np.array([4 * np.cos(theta), 4 * np.sin(theta),
                    1.0 + 0.4 * np.sin(3 * theta)])
    poses.append(camera_lib.viewmatrix(lookdir=pos,
                                       up=np.array([0.0, 0.0, 1.0]),
                                       position=pos))
  return np.stack(poses)


def render_sphere_view(c2w, pixtocam, res, distortion_params=None):
  """Analytic render: textured unit sphere at origin, white background."""
  pix_x, pix_y = camera_lib.pixel_coordinates(res, res)
  origins, _, viewdirs, _, _ = camera_lib.pixels_to_rays(
      pix_x, pix_y, pixtocam, c2w, distortion_params=distortion_params,
      xnp=np)
  b = 2 * np.sum(origins * viewdirs, -1)
  c = np.sum(origins ** 2, -1) - 1.0
  disc = b ** 2 - 4 * c
  hit = disc > 0
  t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 0.0)
  p = origins + t[..., None] * viewdirs
  texture = 0.5 + 0.5 * np.sin(5.0 * p)
  return np.where(hit[..., None], texture, 1.0).astype(np.float32)


def write_cameras_bin(path, focal, res, k1=None):
  with open(path, 'wb') as f:
    f.write(struct.pack('<Q', 1))  # One shared camera.
    if k1 is None:
      f.write(struct.pack('<iiQQ', 1, PINHOLE_MODEL_ID, res, res))
      f.write(struct.pack('<4d', focal, focal, res / 2, res / 2))
    else:
      f.write(struct.pack('<iiQQ', 1, SIMPLE_RADIAL_MODEL_ID, res, res))
      f.write(struct.pack('<4d', focal, res / 2, res / 2, k1))


def write_images_bin(path, c2w_nerf, names):
  """NeRF-convention c2w poses -> COLMAP world-to-camera image records."""
  with open(path, 'wb') as f:
    f.write(struct.pack('<Q', len(names)))
    for i, name in enumerate(names):
      # Undo the loader's axis flip (NeRF right/up/back -> COLMAP
      # right/down/forward), then invert to world-to-camera.
      c2w = np.concatenate([c2w_nerf[i] @ np.diag([1.0, -1.0, -1.0, 1.0]),
                            [[0, 0, 0, 1.0]]], axis=0)
      w2c = np.linalg.inv(c2w)
      f.write(struct.pack('<i', i + 1))
      f.write(struct.pack('<4d', *rotmat_to_qvec(w2c[:3, :3])))
      f.write(struct.pack('<3d', *w2c[:3, 3]))
      f.write(struct.pack('<i', 1))
      f.write(name.encode('utf-8') + b'\x00')
      f.write(struct.pack('<Q', 0))  # No 2D point observations.


def write_points3d_bin(path):
  with open(path, 'wb') as f:
    f.write(struct.pack('<Q', 0))  # Empty sparse point cloud.


def fabricate_scene(data_dir, num_images=8, k1=None):
  """Write the full scene; returns the list of image names.

  k1=None writes a PINHOLE camera; a float writes SIMPLE_RADIAL with that
  radial coefficient AND renders the ground-truth images through the same
  distortion, so the loader's undistortion path sees consistent data.
  """
  sparse = os.path.join(data_dir, 'sparse', '0')
  os.makedirs(sparse, exist_ok=True)
  for level in ('images', 'images_2'):
    os.makedirs(os.path.join(data_dir, level), exist_ok=True)

  focal = RES * 1.2
  pixtocam_full = camera_lib.get_pixtocam(focal, RES, RES)
  poses = ring_poses(num_images)
  names = [f'frame_{i:03d}.png' for i in range(num_images)]
  distortion = None if k1 is None else {
      'k1': k1, 'k2': 0.0, 'k3': 0.0, 'p1': 0.0, 'p2': 0.0}

  write_cameras_bin(os.path.join(sparse, 'cameras.bin'), focal, RES, k1=k1)
  write_images_bin(os.path.join(sparse, 'images.bin'), poses, names)
  write_points3d_bin(os.path.join(sparse, 'points3D.bin'))

  for i, name in enumerate(names):
    img = render_sphere_view(poses[i], pixtocam_full, RES,
                             distortion_params=distortion)
    io_lib.save_img_u8(img, os.path.join(data_dir, 'images', name))
    # 2x2 area downsample for the pyramid level.
    half = img.reshape(RES // 2, 2, RES // 2, 2, 3).mean(axis=(1, 3))
    io_lib.save_img_u8(half, os.path.join(data_dir, 'images_2', name))
  return names
