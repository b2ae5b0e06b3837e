"""Tests for data.cameras: poses, rays, NDC, distortion, paths."""

import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu.data import cameras


def _random_poses(n, seed=0):
  rng = np.random.RandomState(seed)
  poses = []
  for _ in range(n):
    position = rng.randn(3) * 2
    lookdir = rng.randn(3)
    poses.append(cameras.viewmatrix(lookdir, np.array([0.0, 0.0, 1.0]),
                                    position))
  return np.stack(poses)


def test_viewmatrix_orthonormal():
  m = cameras.viewmatrix(np.array([1.0, 2.0, 3.0]), np.array([0.0, 0.0, 1.0]),
                         np.zeros(3))
  r = m[:, :3]
  np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-6)


def test_pad_unpad_roundtrip():
  poses = _random_poses(5)
  np.testing.assert_allclose(cameras.unpad_poses(cameras.pad_poses(poses)),
                             poses)


def test_recenter_poses():
  poses = _random_poses(7)
  recentered, transform = cameras.recenter_poses(poses)
  # The transform must map original to recentered.
  again = cameras.unpad_poses(transform @ cameras.pad_poses(poses))
  np.testing.assert_allclose(again, recentered, atol=1e-6)
  # Average position is now near the origin.
  assert np.linalg.norm(recentered[:, :3, 3].mean(0)) < 1.5


def test_transform_poses_pca_properties():
  poses = _random_poses(20, seed=1)
  out, transform = cameras.transform_poses_pca(poses)
  # Positions fit in the unit cube, with the max exactly on the boundary.
  assert np.max(np.abs(out[:, :3, 3])) <= 1 + 1e-6
  # Rotation parts stay orthonormal.
  for p in out:
    np.testing.assert_allclose(p[:, :3].T @ p[:, :3], np.eye(3), atol=1e-5)
  # The returned transform reproduces the output translations exactly; the
  # rotation block comes back uniformly scaled by the cube-fitting factor.
  again = cameras.unpad_poses(transform @ cameras.pad_poses(poses))
  np.testing.assert_allclose(again[:, :3, 3], out[:, :3, 3], atol=1e-5)
  scale = np.linalg.norm(again[0, :, 0])
  np.testing.assert_allclose(again[:, :3, :3] / scale, out[:, :3, :3],
                             atol=1e-5)


def test_focus_point_least_squares():
  # Cameras looking exactly at a known point.
  target = np.array([0.3, -0.2, 0.5])
  poses = []
  for theta in np.linspace(0, 2 * np.pi, 8, endpoint=False):
    position = target + 3 * np.array([np.cos(theta), np.sin(theta), 0.5])
    poses.append(cameras.viewmatrix(position - target,
                                    np.array([0.0, 0.0, 1.0]), position))
  focus = cameras.focus_point_fn(np.stack(poses))
  np.testing.assert_allclose(focus, target, atol=1e-5)


def test_pixels_to_rays_geometry():
  h = w = 8
  focal = 10.0
  pixtocam = cameras.get_pixtocam(focal, w, h)
  camtoworld = np.eye(4)[:3]
  px, py = cameras.pixel_coordinates(w, h)
  origins, directions, viewdirs, radii, imageplane = cameras.pixels_to_rays(
      px, py, pixtocam, camtoworld)
  assert origins.shape == (h, w, 3)
  np.testing.assert_allclose(origins, 0, atol=1e-7)
  np.testing.assert_allclose(np.linalg.norm(viewdirs, axis=-1), 1, rtol=1e-5)
  # OpenGL convention: camera looks along -z.
  assert np.all(directions[..., 2] < 0)
  # Center pixel's ray points straight ahead.
  c = directions[h // 2, w // 2]
  np.testing.assert_allclose(c[:2] * focal, [0.5, -0.5], atol=1e-5)
  assert np.all(radii > 0)


def test_pixels_to_rays_jnp_matches_numpy():
  h = w = 6
  pixtocam = cameras.get_pixtocam(5.0, w, h)
  camtoworld = _random_poses(1, seed=3)[0]
  px, py = cameras.pixel_coordinates(w, h)
  out_np = cameras.pixels_to_rays(px, py, pixtocam, camtoworld, xnp=np)
  out_jnp = cameras.pixels_to_rays(
      jnp.array(px), jnp.array(py), jnp.array(pixtocam),
      jnp.array(camtoworld), xnp=jnp)
  for a, b in zip(out_np, out_jnp):
    np.testing.assert_allclose(np.array(b), a, rtol=1e-4, atol=1e-5)


def test_undistortion_inverts_distortion():
  rng = np.random.RandomState(4)
  x = rng.uniform(-0.3, 0.3, 100)
  y = rng.uniform(-0.3, 0.3, 100)
  params = dict(k1=0.05, k2=-0.01, p1=0.001, p2=-0.002)
  xd, yd = cameras.distort(x, y, **params)
  xu, yu = cameras._radial_and_tangential_undistort(xd, yd, **params)
  np.testing.assert_allclose(xu, x, atol=1e-6)
  np.testing.assert_allclose(yu, y, atol=1e-6)


def test_convert_to_ndc_bounds():
  """Rays along -z map into the NDC cube with near plane at z=-1."""
  rng = np.random.RandomState(5)
  origins = rng.randn(64, 3) * 0.1
  origins[:, 2] = 0.0
  directions = rng.randn(64, 3) * 0.05
  directions[:, 2] = -1.0
  pixtocam = cameras.get_pixtocam(10.0, 16, 16)
  o_ndc, d_ndc = cameras.convert_to_ndc(origins, directions, pixtocam)
  np.testing.assert_allclose(o_ndc[:, 2], -1.0, atol=1e-6)
  # Far plane (t=1 in NDC) lands at z=+1.
  np.testing.assert_allclose((o_ndc + d_ndc)[:, 2], 1.0, atol=1e-6)


def test_fisheye_projection():
  h = w = 8
  pixtocam = cameras.get_pixtocam(4.0, w, h)
  camtoworld = np.eye(4)[:3]
  px, py = cameras.pixel_coordinates(w, h)
  _, directions, viewdirs, _, _ = cameras.pixels_to_rays(
      px, py, pixtocam, camtoworld, camtype=cameras.ProjectionType.FISHEYE)
  assert np.all(np.isfinite(directions))
  np.testing.assert_allclose(np.linalg.norm(viewdirs, axis=-1), 1, rtol=1e-5)


def test_ellipse_path():
  poses = _random_poses(12, seed=6)
  poses, _ = cameras.transform_poses_pca(poses)
  path = cameras.generate_ellipse_path(poses, n_frames=30)
  assert path.shape == (30, 3, 4)
  for p in path:
    np.testing.assert_allclose(p[:, :3].T @ p[:, :3], np.eye(3), atol=1e-5)


def test_spiral_path():
  poses = _random_poses(10, seed=7)
  bounds = np.array([[1.0, 10.0]] * 10)
  path = cameras.generate_spiral_path(poses, bounds, n_frames=20)
  assert path.shape == (20, 3, 4)


def test_interpolated_path():
  poses = _random_poses(6, seed=8)
  path = cameras.generate_interpolated_path(poses, n_interp=4)
  assert path.shape == (4 * 5, 3, 4)
  for p in path:
    np.testing.assert_allclose(p[:, :3].T @ p[:, :3], np.eye(3), atol=1e-4)


def test_cast_spherical_rays():
  rays = cameras.cast_spherical_rays(np.eye(4)[:3], 8, 16, 0.1, 10.0, xnp=np)
  assert rays.origins.shape == (8, 16, 3)
  np.testing.assert_allclose(np.linalg.norm(rays.directions, axis=-1), 1,
                             rtol=1e-4)
