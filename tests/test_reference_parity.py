"""Numerical parity against the reference implementation as an oracle.

The reference (google-research/multinerf) numerics layer is pure JAX with no
external deps, so where a read-only checkout is available (CI containers
mount it at /root/reference) we import its modules directly and assert our
re-implementations agree to float tolerance.  Skipped silently elsewhere.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE_PATH = os.environ.get('MULTINERF_REFERENCE', '/root/reference')

if not os.path.isdir(REFERENCE_PATH):
  pytest.skip('reference checkout not available', allow_module_level=True)

sys.path.insert(0, REFERENCE_PATH)
try:
  from internal import math as ref_math
  from internal import stepfun as ref_stepfun
  from internal import coord as ref_coord
  from internal import render as ref_render
  from internal import geopoly as ref_geopoly
  from internal import ref_utils as ref_refutils
except ImportError:
  pytest.skip('reference modules not importable', allow_module_level=True)

from multinerf_tpu.ops import coord
from multinerf_tpu.ops import geopoly
from multinerf_tpu.ops import mathx
from multinerf_tpu.ops import ref_utils
from multinerf_tpu.ops import rendering
from multinerf_tpu.ops import stepfun

RNG = np.random.RandomState(0)


def test_sorted_interp_parity():
  x = np.sort(RNG.rand(16, 32), -1).astype(np.float32)
  xp = np.sort(RNG.rand(16, 17), -1).astype(np.float32)
  fp = np.sort(RNG.rand(16, 17), -1).astype(np.float32)
  ours = mathx.interp_sorted(jnp.array(x), jnp.array(xp), jnp.array(fp))
  ref = ref_math.sorted_interp(jnp.array(x), jnp.array(xp), jnp.array(fp))
  np.testing.assert_allclose(np.array(ours), np.array(ref), atol=1e-6)


def test_learning_rate_parity():
  for step in [0, 10, 500, 5000, 250000]:
    ours = float(mathx.learning_rate_decay(step, 2e-3, 2e-5, 250000, 512,
                                           0.01))
    ref = float(ref_math.learning_rate_decay(step, 2e-3, 2e-5, 250000, 512,
                                             0.01))
    assert abs(ours - ref) < 1e-9


def test_sample_intervals_parity():
  t = np.sort(RNG.rand(32, 65), -1).astype(np.float32)
  t = (t - t[:, :1]) / (t[:, -1:] - t[:, :1])
  logits = np.log(RNG.rand(32, 64) + 0.01).astype(np.float32)
  key = jax.random.PRNGKey(7)
  for single_jitter in [True, False]:
    ours = stepfun.sample_intervals(key, jnp.array(t), jnp.array(logits), 32,
                                    single_jitter=single_jitter,
                                    domain=(0.0, 1.0))
    ref = ref_stepfun.sample_intervals(key, jnp.array(t), jnp.array(logits),
                                       32, single_jitter=single_jitter,
                                       domain=(0.0, 1.0))
    np.testing.assert_allclose(np.array(ours), np.array(ref), atol=1e-6)


def test_lossfun_outer_parity():
  t = np.sort(RNG.rand(16, 33), -1).astype(np.float32)
  w = RNG.rand(16, 32).astype(np.float32)
  t_env = np.sort(RNG.rand(16, 65), -1).astype(np.float32)
  w_env = RNG.rand(16, 64).astype(np.float32)
  args = [jnp.array(x) for x in (t, w, t_env, w_env)]
  np.testing.assert_allclose(np.array(stepfun.lossfun_outer(*args)),
                             np.array(ref_stepfun.lossfun_outer(*args)),
                             rtol=1e-5, atol=1e-5)


def test_distortion_parity():
  t = np.sort(RNG.rand(16, 33), -1).astype(np.float32)
  w = RNG.rand(16, 32).astype(np.float32)
  np.testing.assert_allclose(
      np.array(stepfun.lossfun_distortion(jnp.array(t), jnp.array(w))),
      np.array(ref_stepfun.lossfun_distortion(jnp.array(t), jnp.array(w))),
      rtol=1e-5, atol=1e-7)


def test_max_dilate_weights_parity():
  t = np.sort(RNG.rand(16, 33), -1).astype(np.float32)
  w = RNG.rand(16, 32).astype(np.float32)
  ours = stepfun.max_dilate_weights(jnp.array(t), jnp.array(w), 0.02,
                                    domain=(0.0, 1.0), renormalize=True)
  ref = ref_stepfun.max_dilate_weights(jnp.array(t), jnp.array(w), 0.02,
                                       domain=(0.0, 1.0), renormalize=True)
  for a, b in zip(ours, ref):
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-6)


def test_contract_and_gaussian_warp_parity():
  x = (RNG.randn(128, 3) * 3).astype(np.float32)
  np.testing.assert_allclose(np.array(coord.contract(jnp.array(x))),
                             np.array(ref_coord.contract(jnp.array(x))),
                             atol=1e-6)
  a = RNG.randn(128, 3, 3).astype(np.float32) * 0.1
  cov = a @ np.swapaxes(a, -1, -2)
  ours = coord.track_linearize(coord.contract, jnp.array(x), jnp.array(cov))
  ref = ref_coord.track_linearize(ref_coord.contract, jnp.array(x),
                                  jnp.array(cov))
  np.testing.assert_allclose(np.array(ours[0]), np.array(ref[0]), atol=1e-5)
  np.testing.assert_allclose(np.array(ours[1]), np.array(ref[1]), rtol=1e-3,
                             atol=1e-5)


def test_integrated_pos_enc_parity():
  mean = RNG.randn(64, 21).astype(np.float32)
  var = (RNG.rand(64, 21) * 0.1).astype(np.float32)
  np.testing.assert_allclose(
      np.array(coord.integrated_pos_enc(jnp.array(mean), jnp.array(var), 0,
                                        12)),
      np.array(ref_coord.integrated_pos_enc(jnp.array(mean), jnp.array(var),
                                            0, 12)),
      atol=1e-6)


def test_pos_enc_parity():
  x = RNG.randn(64, 3).astype(np.float32)
  np.testing.assert_allclose(
      np.array(coord.pos_enc(jnp.array(x), 0, 4)),
      np.array(ref_coord.pos_enc(jnp.array(x), 0, 4)), atol=1e-6)


def test_ray_warp_parity():
  near, far = jnp.array([0.2]), jnp.array([1e6])
  t2s_o, s2t_o = coord.construct_ray_warps(jnp.reciprocal, near, far)
  t2s_r, s2t_r = ref_coord.construct_ray_warps(jnp.reciprocal, near, far)
  t = jnp.linspace(0.3, 1e5, 128)
  np.testing.assert_allclose(np.array(t2s_o(t)), np.array(t2s_r(t)),
                             atol=1e-7)
  s = jnp.linspace(0, 1, 128)
  np.testing.assert_allclose(np.array(s2t_o(s)), np.array(s2t_r(s)),
                             rtol=1e-5)


def test_cast_rays_parity():
  tdist = np.sort(RNG.rand(32, 9) * 5 + 0.1, -1).astype(np.float32)
  origins = RNG.randn(32, 3).astype(np.float32)
  dirs = RNG.randn(32, 3).astype(np.float32)
  radii = (RNG.rand(32, 1) * 0.01).astype(np.float32)
  for shape in ['cone', 'cylinder']:
    for diag in [True, False]:
      ours = rendering.cast_rays(jnp.array(tdist), jnp.array(origins),
                                 jnp.array(dirs), jnp.array(radii), shape,
                                 diag=diag)
      ref = ref_render.cast_rays(jnp.array(tdist), jnp.array(origins),
                                 jnp.array(dirs), jnp.array(radii), shape,
                                 diag=diag)
      np.testing.assert_allclose(np.array(ours[0]), np.array(ref[0]),
                                 atol=1e-6)
      np.testing.assert_allclose(np.array(ours[1]), np.array(ref[1]),
                                 rtol=1e-4, atol=1e-7)


def test_volumetric_rendering_parity():
  tdist = np.sort(RNG.rand(32, 9) * 5 + 0.1, -1).astype(np.float32)
  dirs = RNG.randn(32, 3).astype(np.float32)
  density = (RNG.rand(32, 8) * 2).astype(np.float32)
  rgbs = RNG.rand(32, 8, 3).astype(np.float32)
  far = np.full((32, 1), 6.0, np.float32)
  for opaque in [False, True]:
    w_o = rendering.compute_alpha_weights(jnp.array(density),
                                          jnp.array(tdist), jnp.array(dirs),
                                          opaque_background=opaque)
    w_r = ref_render.compute_alpha_weights(jnp.array(density),
                                           jnp.array(tdist), jnp.array(dirs),
                                           opaque_background=opaque)
    np.testing.assert_allclose(np.array(w_o[0]), np.array(w_r[0]), atol=1e-6)
  out_o = rendering.volumetric_rendering(jnp.array(rgbs), w_o[0],
                                         jnp.array(tdist), 1.0,
                                         jnp.array(far), True)
  out_r = ref_render.volumetric_rendering(jnp.array(rgbs), w_r[0],
                                          jnp.array(tdist), 1.0,
                                          jnp.array(far), True)
  for k in out_r:
    np.testing.assert_allclose(np.array(out_o[k]), np.array(out_r[k]),
                               rtol=1e-4, atol=1e-5, err_msg=k)


def test_geopoly_parity():
  for shape, tess in [('icosahedron', 2), ('octahedron', 1),
                      ('octahedron', 2)]:
    np.testing.assert_allclose(geopoly.generate_basis(shape, tess),
                               ref_geopoly.generate_basis(shape, tess),
                               atol=1e-12)


def test_ide_parity():
  # The reference spells stdlib math as `np.math` (a numpy<2 alias removed
  # in numpy 2); restore the alias for the duration so its IDE — the only
  # reference numeric that otherwise can't execute here — runs as the
  # oracle.
  import math as _math
  had = hasattr(np, 'math')
  if not had:
    np.math = _math
  try:
    xyz = RNG.randn(64, 3).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    kappa_inv = (RNG.rand(64, 1) * 0.5).astype(np.float32)
    for deg in [2, 4, 5]:
      ref_fn = ref_refutils.generate_ide_fn(deg)
      ref = ref_fn(jnp.array(xyz), jnp.array(kappa_inv))
      ours = ref_utils.generate_ide_fn(deg)(jnp.array(xyz),
                                            jnp.array(kappa_inv))
      np.testing.assert_allclose(np.array(ours), np.array(ref), atol=2e-5)
  finally:
    if not had:
      del np.math


def test_reflect_and_mae_parity():
  n = RNG.randn(32, 3).astype(np.float32)
  n /= np.linalg.norm(n, -1, keepdims=True)
  v = RNG.randn(32, 3).astype(np.float32)
  np.testing.assert_allclose(
      np.array(ref_utils.reflect(jnp.array(v), jnp.array(n))),
      np.array(ref_refutils.reflect(jnp.array(v), jnp.array(n))), atol=1e-6)


def test_substitute_real_ide_patches_value_identically():
  """The no-complex64-backend workaround (reference_import.substitute_real_ide)
  must swap in a function producing the reference's own IDE values.

  On CPU the reference's complex-power IDE executes, so compare its output
  (captured BEFORE patching) against the patched module attribute at the
  refnerf production deg_view=5, then restore the original.
  """
  import math as _math
  from multinerf_tpu import reference_import
  had = hasattr(np, 'math')
  if not had:
    np.math = _math
  reference_import.import_reference()
  import internal.ref_utils as ref_refutils_mod
  original = ref_refutils_mod.generate_ide_fn
  try:
    xyz = RNG.randn(32, 3).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    kappa_inv = (RNG.rand(32, 1) * 0.3).astype(np.float32)
    want = original(5)(jnp.array(xyz), jnp.array(kappa_inv))
    reference_import.substitute_real_ide()
    assert ref_refutils_mod.generate_ide_fn is not original
    got = ref_refutils_mod.generate_ide_fn(5)(jnp.array(xyz),
                                              jnp.array(kappa_inv))
    np.testing.assert_allclose(np.array(got), np.array(want), atol=2e-5)
  finally:
    ref_refutils_mod.generate_ide_fn = original
    if not had:
      del np.math
