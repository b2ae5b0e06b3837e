"""Tests for ops.geopoly."""

import itertools

import numpy as np

from multinerf_tpu.ops import geopoly


def test_octahedron_subdiv1_is_axis_basis():
  """Octahedron with no tesselation reduces to the identity basis."""
  basis = geopoly.generate_basis('octahedron', 1)
  # 6 vertices, 3 after removing antipodes; each is +-e_i (reversed order).
  assert basis.shape == (3, 3)
  assert np.allclose(np.abs(basis) @ np.ones(3), 1)
  # Rows are signed permutation of identity.
  assert np.allclose(np.abs(basis).sum(0), 1)


def test_unit_norm_vertices():
  for shape, tess in [('icosahedron', 2), ('octahedron', 2)]:
    basis = geopoly.generate_basis(shape, tess, remove_symmetries=False)
    np.testing.assert_allclose(np.linalg.norm(basis, axis=-1), 1, rtol=1e-6)


def test_icosahedron_counts():
  # Geodesic icosahedron with frequency v has 10v^2+2 vertices; removing
  # antipodal pairs halves it.
  full = geopoly.generate_basis('icosahedron', 2, remove_symmetries=False)
  assert full.shape[0] == 10 * 4 + 2
  half = geopoly.generate_basis('icosahedron', 2, remove_symmetries=True)
  assert half.shape[0] == (10 * 4 + 2) // 2


def test_remove_symmetries_no_antipodal_pairs():
  basis = geopoly.generate_basis('icosahedron', 2)
  d = geopoly.compute_sq_dist(basis.T, -basis.T)
  # No vertex has its negation in the set.
  assert np.min(d) > 1e-4


def test_tesselation_weights():
  w = geopoly.compute_tesselation_weights(2)
  # Barycentric weights sum to one, count = (v+1)(v+2)/2.
  assert w.shape == (6, 3)
  np.testing.assert_allclose(w.sum(-1), 1)


def test_compute_sq_dist_matches_direct():
  rng = np.random.RandomState(0)
  a = rng.randn(3, 10)
  b = rng.randn(3, 7)
  got = geopoly.compute_sq_dist(a, b)
  want = np.array([[np.sum((a[:, i] - b[:, j])**2) for j in range(7)]
                   for i in range(10)])
  np.testing.assert_allclose(got, want, atol=1e-8)
