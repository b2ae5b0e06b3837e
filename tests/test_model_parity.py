"""Forward-pass parity against the REFERENCE Model as an oracle.

The reference model stack is pure JAX except for two unavailable imports
(gin, dm_pix); we stub those, import ``internal.models`` from the read-only
reference checkout, initialize ITS parameters, feed the same parameter
pytree into OUR model (the module/layer naming matches by construction), and
assert the deterministic forward passes agree: rendered rgb, densities,
weights, and sample positions per level.

This pins the whole pipeline — resampling, annealing, dilation, ray
casting, contraction, IPE, MLP wiring, compositing — to the reference, not
just the leaf numerics.  Skipped when the reference checkout is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE_PATH = os.environ.get('MULTINERF_REFERENCE', '/root/reference')
if not os.path.isdir(REFERENCE_PATH):
  pytest.skip('reference checkout not available', allow_module_level=True)


def _install_stubs():
  """Minimal gin + dm_pix stand-ins so reference modules import."""
  if 'gin' not in sys.modules:
    gin = types.ModuleType('gin')
    gin.configurable = lambda *a, **k: (a[0] if a and callable(a[0])
                                        else (lambda cls: cls))
    config = types.ModuleType('gin.config')
    config.external_configurable = lambda fn, module=None: fn
    gin.config = config
    gin.add_config_file_search_path = lambda *a, **k: None
    gin.parse_config_files_and_bindings = lambda *a, **k: None
    gin.config_str = lambda: ''
    sys.modules['gin'] = gin
    sys.modules['gin.config'] = config
  if 'dm_pix' not in sys.modules:
    dm_pix = types.ModuleType('dm_pix')
    dm_pix.ssim = lambda a, b: 0.0
    sys.modules['dm_pix'] = dm_pix


_install_stubs()
sys.path.insert(0, REFERENCE_PATH)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
  from internal import models as ref_models  # noqa: E402
  from internal import configs as ref_configs  # noqa: E402
  from internal import utils as ref_utils_mod  # noqa: E402
except Exception as e:  # noqa: BLE001
  pytest.skip(f'reference model not importable: {e}',
              allow_module_level=True)

from multinerf_tpu import configs as configs_lib  # noqa: E402
from multinerf_tpu import ginlite  # noqa: E402
from multinerf_tpu.data import types as our_types  # noqa: E402
from multinerf_tpu.models import nerf as our_models  # noqa: E402


@pytest.fixture(autouse=True)
def _clean_gin():
  ginlite.clear_config()
  yield
  ginlite.clear_config()


def _rays(n=16, seed=0, near=2.0, far=6.0):
  rng = np.random.RandomState(seed)
  d = rng.randn(n, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  kwargs = dict(
      origins=jnp.array(rng.randn(n, 3).astype(np.float32) * 0.2),
      directions=jnp.array(d),
      viewdirs=jnp.array(d),
      radii=jnp.full((n, 1), 1e-3, jnp.float32),
      imageplane=jnp.zeros((n, 2), jnp.float32),
      lossmult=jnp.ones((n, 1), jnp.float32),
      near=jnp.full((n, 1), near, jnp.float32),
      far=jnp.full((n, 1), far, jnp.float32),
      cam_idx=jnp.zeros((n, 1), jnp.int32))
  return (ref_utils_mod.Rays(**kwargs), our_types.Rays(**kwargs))


MLP_KW = dict(net_depth=2, net_width=16, bottleneck_width=8,
              net_depth_viewdirs=1, net_width_viewdirs=8,
              deg_view=2, max_deg_point=8, disable_density_normals=True)
MODEL_KW = dict(num_prop_samples=8, num_nerf_samples=4, num_levels=2,
                single_jitter=True)


def _build_pair(model_kw, nerf_kw, prop_kw, near=2.0, far=6.0):
  ref_config = ref_configs.Config(near=near, far=far)
  our_config = configs_lib.Config(near=near, far=far)

  # Reference model: attribute defaults come from gin normally; instead
  # subclass its MLPs with our kwargs baked in.
  ref_nerf = type('NerfMLP', (ref_models.MLP,), {})
  ref_prop = type('PropMLP', (ref_models.MLP,), {})
  ref_models.NerfMLP = ref_nerf
  ref_models.PropMLP = ref_prop
  # The reference instantiates NerfMLP()/PropMLP() with no args; bake kwargs
  # via dataclass field defaults on the subclass.
  ref_nerf_inst = lambda: ref_nerf(**nerf_kw)
  ref_prop_inst = lambda: ref_prop(**prop_kw)
  # Monkeypatch the constructors used inside Model.__call__.
  ref_models.NerfMLP = ref_nerf_inst
  ref_models.PropMLP = ref_prop_inst
  ref_model = ref_models.Model(config=ref_config, **model_kw)

  for target, kw in [('NerfMLP', nerf_kw), ('PropMLP', prop_kw),
                     ('Model', model_kw)]:
    for k, v in kw.items():
      ginlite.bind(target, k, v)
  our_model = ginlite.make('Model', config=our_config)
  return ref_model, our_model


@pytest.mark.parametrize('use_contract', [False, True])
def test_forward_pass_matches_reference(use_contract):
  nerf_kw = dict(MLP_KW)
  prop_kw = dict(MLP_KW, disable_rgb=True)
  model_kw = dict(MODEL_KW)
  near, far = 2.0, 6.0
  if use_contract:
    from internal import coord as ref_coord
    from multinerf_tpu.ops import coord as our_coord
    model_kw['raydist_fn'] = jnp.reciprocal
    model_kw['opaque_background'] = True
    near, far = 0.2, 1e6
    ref_nerf_kw = dict(nerf_kw, warp_fn=ref_coord.contract)
    ref_prop_kw = dict(prop_kw, warp_fn=ref_coord.contract)
    our_nerf_kw = dict(nerf_kw, warp_fn=our_coord.contract)
    our_prop_kw = dict(prop_kw, warp_fn=our_coord.contract)
  else:
    ref_nerf_kw, ref_prop_kw = nerf_kw, prop_kw
    our_nerf_kw, our_prop_kw = nerf_kw, prop_kw

  # Build reference with ref kwargs.
  ref_model, _ = _build_pair(model_kw, ref_nerf_kw, ref_prop_kw, near, far)
  # Build ours with our kwargs (fresh gin bindings).
  ginlite.clear_config()
  _, our_model = _build_pair(model_kw, our_nerf_kw, our_prop_kw, near, far)

  ref_rays, our_rays = _rays(near=near, far=far)
  init_rng = jax.random.PRNGKey(42)

  ref_vars = ref_model.init(init_rng, rng=None, rays=ref_rays,
                            train_frac=1.0, compute_extras=False,
                            zero_glo=True)
  our_vars = our_model.init(init_rng, rng=None, rays=our_rays,
                            train_frac=1.0, compute_extras=False,
                            zero_glo=True)

  # The parameter trees must be structurally identical (same module/layer
  # naming and shapes) so the reference's weights drop straight in.
  ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref_vars)
  our_shapes = jax.tree_util.tree_map(lambda x: x.shape, our_vars)
  assert jax.tree_util.tree_structure(ref_shapes) == (
      jax.tree_util.tree_structure(our_shapes))
  assert jax.tree_util.tree_all(
      jax.tree_util.tree_map(lambda a, b: a == b, ref_shapes, our_shapes))

  # Same params -> same deterministic forward pass.
  ref_out, ref_hist = ref_model.apply(ref_vars, None, ref_rays,
                                      train_frac=1.0, compute_extras=False,
                                      zero_glo=True)
  our_out, our_hist = our_model.apply(ref_vars, None, our_rays,
                                      train_frac=1.0, compute_extras=False,
                                      zero_glo=True)

  for lvl, (r, o) in enumerate(zip(ref_hist, our_hist)):
    np.testing.assert_allclose(np.array(o['sdist']), np.array(r['sdist']),
                               atol=1e-5, err_msg=f'sdist level {lvl}')
    np.testing.assert_allclose(np.array(o['density']),
                               np.array(r['density']), rtol=1e-3, atol=1e-4,
                               err_msg=f'density level {lvl}')
    np.testing.assert_allclose(np.array(o['weights']),
                               np.array(r['weights']), atol=1e-4,
                               err_msg=f'weights level {lvl}')
  np.testing.assert_allclose(np.array(our_out[-1]['rgb']),
                             np.array(ref_out[-1]['rgb']), atol=1e-4)


def test_gradient_parity_with_reference():
  """Same params + batch -> same photometric-loss gradients (both models)."""
  nerf_kw = dict(MLP_KW)
  prop_kw = dict(MLP_KW, disable_rgb=True)
  model_kw = dict(MODEL_KW)

  ref_model, _ = _build_pair(model_kw, nerf_kw, prop_kw)
  ginlite.clear_config()
  _, our_model = _build_pair(model_kw, nerf_kw, prop_kw)

  ref_rays, our_rays = _rays(seed=3)
  rng = np.random.RandomState(4)
  target = jnp.array(rng.rand(16, 3).astype(np.float32))

  variables = ref_model.init(jax.random.PRNGKey(7), rng=None, rays=ref_rays,
                             train_frac=1.0, compute_extras=False,
                             zero_glo=True)

  def loss_ref(v):
    out, _ = ref_model.apply(v, None, ref_rays, train_frac=1.0,
                             compute_extras=False, zero_glo=True)
    return jnp.mean((out[-1]['rgb'] - target)**2)

  def loss_ours(v):
    out, _ = our_model.apply(v, None, our_rays, train_frac=1.0,
                             compute_extras=False, zero_glo=True)
    return jnp.mean((out[-1]['rgb'] - target)**2)

  l_ref, g_ref = jax.value_and_grad(loss_ref)(variables)
  l_our, g_our = jax.value_and_grad(loss_ours)(variables)
  np.testing.assert_allclose(float(l_our), float(l_ref), rtol=1e-5)
  flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
  flat_our = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(g_our)}
  for path, v_ref in flat_ref:
    key = jax.tree_util.keystr(path)
    np.testing.assert_allclose(
        np.array(flat_our[key]), np.array(v_ref), rtol=1e-3, atol=1e-5,
        err_msg=key)


@pytest.mark.parametrize('use_ide', [False, True])
def test_refnerf_forward_parity(use_ide):
  """Ref-NeRF wiring parity: density-gradient normals (sum-trick vs the
  reference's per-sample vmapped value_and_grad), predicted normals,
  reflections, n.v, diffuse/specular split, and (use_ide=True) the full
  integrated directional encoding.  The reference spells stdlib math as
  np.math (a numpy<2 alias); the alias is restored for the duration so its
  IDE executes as the oracle."""
  import math as _math
  import numpy as _np
  if use_ide and not hasattr(_np, 'math'):
    _np.math = _math
  try:
    _refnerf_forward_parity_impl(use_ide)
  finally:
    if use_ide and getattr(_np, 'math', None) is _math:
      del _np.math


def _refnerf_forward_parity_impl(use_ide):
  nerf_kw = dict(MLP_KW, disable_density_normals=False,
                 enable_pred_normals=True, use_reflections=True,
                 use_n_dot_v=True, use_diffuse_color=True,
                 use_specular_tint=True, enable_pred_roughness=True,
                 use_directional_enc=use_ide)
  prop_kw = dict(MLP_KW, disable_rgb=True)
  model_kw = dict(MODEL_KW, single_mlp=False, anneal_slope=0.0,
                  dilation_multiplier=0.0, dilation_bias=0.0)

  ref_model, _ = _build_pair(model_kw, nerf_kw, prop_kw)
  ginlite.clear_config()
  _, our_model = _build_pair(model_kw, nerf_kw, prop_kw)

  ref_rays, our_rays = _rays(seed=9)
  variables = ref_model.init(jax.random.PRNGKey(11), rng=None, rays=ref_rays,
                             train_frac=1.0, compute_extras=False,
                             zero_glo=True)
  ref_out, ref_hist = ref_model.apply(variables, None, ref_rays,
                                      train_frac=1.0, compute_extras=False,
                                      zero_glo=True)
  our_out, our_hist = our_model.apply(variables, None, our_rays,
                                      train_frac=1.0, compute_extras=False,
                                      zero_glo=True)
  final_ref, final_our = ref_hist[-1], our_hist[-1]
  # The sum-trick density gradient equals the per-sample value_and_grad.
  np.testing.assert_allclose(np.array(final_our['raw_grad_density']),
                             np.array(final_ref['raw_grad_density']),
                             rtol=1e-3, atol=1e-5)
  np.testing.assert_allclose(np.array(final_our['normals']),
                             np.array(final_ref['normals']),
                             rtol=1e-3, atol=1e-4)
  np.testing.assert_allclose(np.array(final_our['normals_pred']),
                             np.array(final_ref['normals_pred']),
                             rtol=1e-3, atol=1e-4)
  np.testing.assert_allclose(np.array(final_our['roughness']),
                             np.array(final_ref['roughness']),
                             rtol=1e-3, atol=1e-5)
  np.testing.assert_allclose(np.array(our_out[-1]['rgb']),
                             np.array(ref_out[-1]['rgb']), atol=1e-4)
