"""Diagnose the refnerf head-to-head's TPU UNIMPLEMENTED failure.

h2h --arch refnerf died at the first loss fetch with
`UNIMPLEMENTED: TPU backend error`.  Candidates: (a) complex-valued ops —
the reference's IDE computes (x+iy)^m via complex powers
(reference internal/ref_utils.py:98-159) inside ref Model.init, whose
async error would surface at the next fetch on this backend; (b) our own
refnerf-architecture step (unlikely: bench's refnerf arm timed it on this
chip).  This probe isolates each in order, one fetch per stage.

Usage: python scripts/refnerf_tpu_diag.py
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def stage(name, fn):
  try:
    out = fn()
    print(f'{name}: OK {out}', flush=True)
    return True
  except Exception as e:
    print(f'{name}: FAIL {type(e).__name__}: {str(e)[:300]}', flush=True)
    traceback.print_exc()
    return False


def main():
  print('devices:', jax.devices(), flush=True)

  stage('complex_pow', lambda: float(
      jnp.abs(jax.jit(lambda z: (z ** 3).sum())(
          jnp.arange(8, dtype=jnp.complex64) + 1j))))

  stage('complex_matmul', lambda: float(jnp.abs(jax.jit(jnp.dot)(
      jnp.ones((8, 8), jnp.complex64),
      jnp.ones((8, 8), jnp.complex64)).sum())))

  def ref_ide():
    import math as _m
    if not hasattr(np, 'math'):
      np.math = _m
    from multinerf_tpu import reference_import
    ref = reference_import.import_reference()
    ide = ref.ref_utils.generate_ide_fn(5)
    d = jnp.array(np.random.RandomState(0).randn(16, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = jax.jit(ide)(d, jnp.zeros((16, 1)))
    return float(out.sum())
  stage('reference_ide_jit', ref_ide)

  def ours_step():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), 'scripts'))
    import head_to_head as h2h
    from multinerf_tpu.parallel import mesh as mesh_lib
    arch = h2h.ARCHS['refnerf']
    ours = h2h.build_ours(arch, 'dummy_specular', 100)
    batch = next(ours['train_data'])
    gbatch = mesh_lib.shard_batch_to_global(ours['mesh'], batch)
    rng = jax.random.PRNGKey(0)
    state, stats, rng = ours['train_pstep'](rng, ours['state'], gbatch,
                                            0.5, 1.0)
    return float(stats['loss'])
  stage('ours_refnerf_step', ours_step)

  def ref_init():
    import math as _m
    if not hasattr(np, 'math'):
      np.math = _m
    import head_to_head as h2h
    arch = h2h.ARCHS['refnerf']
    ref, ref_config, ref_model = h2h.build_reference(arch, 100)
    rs = np.random.RandomState(1)
    d = rs.randn(10, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = ref.utils.Rays(
        origins=rs.randn(10, 3).astype(np.float32),
        directions=d, viewdirs=d,
        radii=np.full((10, 1), 1e-3, np.float32),
        imageplane=np.zeros((10, 2), np.float32),
        lossmult=np.ones((10, 1), np.float32),
        near=np.full((10, 1), 2.0, np.float32),
        far=np.full((10, 1), 6.0, np.float32),
        cam_idx=np.zeros((10, 1), np.int32))
    variables = ref_model.init(jax.random.PRNGKey(2), rng=None, rays=rays,
                               train_frac=1.0, compute_extras=False,
                               zero_glo=True)
    leaf = jax.tree_util.tree_leaves(variables)[0]
    return float(jnp.asarray(leaf).sum())
  stage('reference_refnerf_init', ref_init)


if __name__ == '__main__':
  main()
