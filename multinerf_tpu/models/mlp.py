"""The NeRF MLP: density trunk + view-dependent color branch + Ref-NeRF heads.

Capability parity with the reference MLP (``internal/models.py:341-612`` of
google-research/multinerf): IPE featurization with geodesic basis lifting,
skip connections, density-gradient and predicted normals, integrated
directional encoding of reflection directions, diffuse/specular split,
roughness, n.v features, GLO conditioning, RawNeRF exposure-aware rgb
activations.

TPU-first divergences:

* Density-gradient normals use **one batched VJP via the sum trick** instead
  of a per-sample ``vmap(value_and_grad)`` (reference models.py:473-492).
  Each sample's density depends only on its own mean, so
  ``grad(sum(raw_density), means)`` yields exactly the per-sample gradients
  while letting XLA batch the backward matmuls at full MXU width.
* The scene-contraction warp inside ``predict_density`` hits the analytic
  Jacobian path in ``ops.coord.track_linearize``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multinerf_tpu import ginlite
from multinerf_tpu.ops import coord
from multinerf_tpu.ops import geopoly
from multinerf_tpu.ops import image_ops
from multinerf_tpu.ops import ref_utils


def random_split(rng):
  """Split an rng that may be None (deterministic mode)."""
  if rng is None:
    return None, None
  key, rng = jax.random.split(rng)
  return key, rng


class _FusedIPEDense(nn.Module):
  """First trunk layer: featurize+matmul in one Pallas kernel.

  Param tree ({kernel [2*D*L, features], bias}) is identical to the
  ``nn.Dense`` it replaces — instantiated under the same name, it draws the
  same init values, so fused and unfused checkpoints are interchangeable.
  """
  features: int
  basis: Any  # [3, L] numpy
  min_deg: int
  max_deg: int
  use_contract: bool
  kernel_init: Any
  interpret: bool = False

  @nn.compact
  def __call__(self, means, covs):
    from multinerf_tpu.ops.pallas import featurize_dense as fd
    num_feats = 2 * (self.max_deg - self.min_deg) * self.basis.shape[-1]
    kernel = self.param('kernel', self.kernel_init,
                        (num_feats, self.features))
    bias = self.param('bias', jax.nn.initializers.zeros, (self.features,))
    return fd.featurize_dense(means, covs, kernel, bias, self.basis,
                              self.min_deg, self.max_deg,
                              use_contract=self.use_contract,
                              interpret=self.interpret)


class _DenseParams(nn.Module):
  """Param-holder with nn.Dense's exact param tree, no compute.

  The fully-fused density MLP (ops/pallas/density_mlp.py) consumes raw
  weights; instantiating these under the same ``Dense_i`` names keeps
  checkpoints interchangeable with the unfused path.
  """
  features: int
  in_features: int
  kernel_init: Any

  @nn.compact
  def __call__(self):
    kernel = self.param('kernel', self.kernel_init,
                        (self.in_features, self.features))
    bias = self.param('bias', jax.nn.initializers.zeros, (self.features,))
    return kernel, bias


class _SplitSkipDense(nn.Module):
  """Skip-connection layer without materializing the feature concat.

  ``concat([x, feats]) @ W == x @ W[:width_x] + feats @ W[width_x:]`` — the
  feats half runs through the fused featurize+matmul kernel (features are
  recomputed in VMEM, never stored), the x half is a plain matmul.  Param
  shapes/name match the unfused ``nn.Dense`` exactly.
  """
  features: int
  basis: Any
  min_deg: int
  max_deg: int
  use_contract: bool
  kernel_init: Any
  interpret: bool = False

  @nn.compact
  def __call__(self, x, means, covs):
    from multinerf_tpu.ops.pallas import featurize_dense as fd
    num_feats = 2 * (self.max_deg - self.min_deg) * self.basis.shape[-1]
    width_x = x.shape[-1]
    kernel = self.param('kernel', self.kernel_init,
                        (width_x + num_feats, self.features))
    bias = self.param('bias', jax.nn.initializers.zeros, (self.features,))
    return x @ kernel[:width_x] + fd.featurize_dense(
        means, covs, kernel[width_x:], bias, self.basis, self.min_deg,
        self.max_deg, use_contract=self.use_contract,
        interpret=self.interpret)


class MLP(nn.Module):
  """A positional-encoding MLP with optional Ref-NeRF heads."""
  net_depth: int = 8  # Depth of the density trunk.
  net_width: int = 256  # Width of the density trunk.
  bottleneck_width: int = 256  # Width of the bottleneck vector.
  net_depth_viewdirs: int = 1  # Depth of the view-dependent branch.
  net_width_viewdirs: int = 128  # Width of the view-dependent branch.
  net_activation: Callable[..., Any] = nn.relu  # Activation function.
  min_deg_point: int = 0  # Min degree of positional encoding for points.
  max_deg_point: int = 12  # Max degree of positional encoding for points.
  weight_init: str = 'he_uniform'  # MLP weight initializer name.
  skip_layer: int = 4  # Skip connection period in the trunk.
  skip_layer_dir: int = 4  # Skip connection period in the view branch.
  num_rgb_channels: int = 3  # Number of RGB channels.
  deg_view: int = 4  # Encoding degree for view/reflection directions.
  use_reflections: bool = False  # Encode refdirs instead of viewdirs.
  use_directional_enc: bool = False  # Use IDE for directions.
  enable_pred_roughness: bool = False  # Predict roughness for the IDE.
  roughness_activation: Callable[..., Any] = nn.softplus
  roughness_bias: float = -1.0  # Pre-activation shift for raw roughness.
  use_diffuse_color: bool = False  # Predict diffuse & specular colors.
  use_specular_tint: bool = False  # Predict a specular tint.
  use_n_dot_v: bool = False  # Feed normal-dot-view to the view branch.
  bottleneck_noise: float = 0.0  # Std of noise added to the bottleneck.
  density_activation: Callable[..., Any] = nn.softplus
  density_bias: float = -1.0  # Pre-activation shift for raw density.
  density_noise: float = 0.0  # Std of noise added to raw density.
  rgb_premultiplier: float = 1.0  # Premultiplier on raw RGB.
  rgb_activation: Callable[..., Any] = nn.sigmoid
  rgb_bias: float = 0.0  # Pre-activation shift for raw RGB.
  rgb_padding: float = 0.001  # Maps colors to [-pad, 1 + pad].
  enable_pred_normals: bool = False  # Predict normals with a linear head.
  disable_density_normals: bool = False  # Skip density-gradient normals.
  disable_rgb: bool = False  # Density-only MLP (proposal levels).
  warp_fn: Callable[..., Any] = None  # Coordinate warp (e.g. contract).
  basis_shape: str = 'icosahedron'  # Basis polyhedron: octahedron/icosahedron.
  basis_subdivisions: int = 2  # Basis tesselation count.
  # Computation dtype for the trunk and view-branch hidden layers
  # ('float32', 'bfloat16', or 'int8').  On TPU the matmuls already run
  # bf16-in/f32-accumulate at XLA's default precision either way;
  # 'bfloat16' additionally stores the hidden activations (and their
  # cotangents) in bf16, halving the HBM traffic of the wide trunk.
  # 'int8' runs the hidden layers' matmuls (forward AND both gradient
  # matmuls) through dynamically-quantized int8 on the 2x-rate int8 MXU
  # path (ops/quant.py); 'int8_hybrid' keeps the int8 forward but runs the
  # backward unquantized in bf16 (exact linearization of the quantized
  # forward — VERDICT r4 #1b probe).  params/checkpoints stay f32 and are
  # interchangeable across all modes.  Heads (density, rgb, normals,
  # bottleneck) always compute/store f32.
  trunk_dtype: str = 'float32'
  # Fused featurize->first-matmul Pallas kernel (ops/pallas/featurize_dense):
  # None = auto (on for TPU in every eligible config: density normals
  # disabled, contract-or-no warp); False = force XLA path; True = force on
  # (interpreted when running on CPU — used by tests).
  use_fused_featurize: Any = None
  # Whether the sample Gaussians fed to this MLP sit behind a stop_gradient
  # (Model sets this False when Model.stop_level_grad=False).  The fused
  # Pallas kernels return zero cotangents for means/covs, which is only
  # correct when no gradient is supposed to flow through them — e.g. the
  # cross-level path density -> sample positions -> previous level's MLP
  # that exists when stop_level_grad=False.
  inputs_have_stop_gradient: bool = True

  def setup(self):
    if self.use_reflections and not (self.enable_pred_normals or
                                     not self.disable_density_normals):
      raise ValueError('Normals must be computed for reflection directions.')

    # The (transposed) geodesic basis used to lift IPE features.  Kept as a
    # host-side numpy constant: integrated_pos_enc_lifted folds the
    # frequency scaling into it at trace time.
    self.pos_basis_t = np.array(
        geopoly.generate_basis(self.basis_shape, self.basis_subdivisions)).T

    if self.use_directional_enc:
      self.dir_enc_fn = ref_utils.generate_ide_fn(self.deg_view)
    else:
      def dir_enc_fn(direction, _):
        return coord.pos_enc(
            direction, min_deg=0, max_deg=self.deg_view, append_identity=True)
      self.dir_enc_fn = dir_enc_fn

  @nn.compact
  def __call__(self, rng, gaussians, viewdirs=None, imageplane=None,
               glo_vec=None, exposure=None):
    """Evaluate density (+ color, normals, roughness) for sample Gaussians.

    Args:
      rng: rng for density/bottleneck noise, or None for determinism.
      gaussians: (means [..., s, 3], covs [..., s, 3{,3}]) sample Gaussians.
      viewdirs: [..., 3] unit view directions (None disables the view branch).
      imageplane: [..., 2] image-plane coords (reserved for vignetting).
      glo_vec: [..., num_glo] appearance embedding per ray.
      exposure: [..., 1] exposure values (shutter * ISO) per ray.

    Returns:
      dict with density, rgb, normals, normals_pred, roughness, and raw
      gradients (for losses).
    """
    del imageplane  # Reserved.
    import itertools
    import os

    # Flatten [..., S] sample dims into ONE leading dim for the whole body:
    # XLA lowers Dense stacks on 3-D [rays, samples, C] activations as
    # per-ray batched GEMMs, measured 1.7x (1024-wide trunk) to 4.5x
    # (256-wide PropMLP) off the MXU roofline on v5e; the same stacks on
    # flat [rays*samples, C] run at roofline.  Per-ray conditioning
    # (viewdirs, glo) is broadcast per sample up front; every output is
    # reshaped back at the end.
    means_in, covs_in = gaussians
    sample_shape = means_in.shape[:-1]  # [..., S]
    gaussians = (means_in.reshape(-1, 3),
                 covs_in.reshape((-1,) + covs_in.shape[len(sample_shape):]))
    n_flat = gaussians[0].shape[0]

    def per_sample(a):
      """[..., C] per-ray -> [N, C] per-sample (broadcast over S)."""
      if a is None:
        return None
      return jnp.broadcast_to(
          a[..., None, :], sample_shape + a.shape[-1:]).reshape(
              n_flat, a.shape[-1])

    viewdirs_rays = viewdirs
    viewdirs = per_sample(viewdirs)
    glo_vec = per_sample(glo_vec)
    kernel_init = getattr(jax.nn.initializers, self.weight_init)()
    # Explicit creation-order names (== flax's auto names): the fused path
    # below replaces two nn.Dense layers with param-compatible custom
    # modules, and explicit numbering keeps every checkpoint key identical
    # in both modes.
    _dense_ids = itertools.count()
    dense = lambda features: nn.Dense(
        features, kernel_init=kernel_init, name=f'Dense_{next(_dense_ids)}')
    # Hidden trunk/view-branch layers honor trunk_dtype; param storage (and
    # therefore checkpoints and the optimizer) stays f32 in every mode.
    if self.trunk_dtype in ('int8', 'int8_hybrid'):
      from multinerf_tpu.ops import quant
      dense_hidden = lambda features: quant.QuantDense(
          features, kernel_init=kernel_init,
          hybrid=self.trunk_dtype == 'int8_hybrid',
          name=f'Dense_{next(_dense_ids)}')
    else:
      hidden_dtype = jnp.dtype(self.trunk_dtype)
      dense_hidden = lambda features: nn.Dense(
          features, kernel_init=kernel_init, dtype=hidden_dtype,
          name=f'Dense_{next(_dense_ids)}')

    density_key, rng = random_split(rng)

    reference_algos = os.environ.get('MULTINERF_REFERENCE_ALGOS') == '1'
    # Fused featurize+first-matmul kernel: gradients w.r.t. sample
    # positions are cut (fine exactly when density normals are off — same
    # stop-gradient contract as the reference's sampling), and the trunk's
    # last layer must not be a skip point (its output would re-concat
    # features into the heads).
    use_fused_feat = self.use_fused_featurize
    fused_eligible = (
        self.disable_density_normals and
        self.inputs_have_stop_gradient and
        self.warp_fn in (None, coord.contract) and
        not reference_algos and
        (self.net_depth <= 1 or (self.net_depth - 1) % self.skip_layer != 0))
    if use_fused_feat is None:
      use_fused_feat = fused_eligible and jax.default_backend() != 'cpu'
    elif use_fused_feat:
      use_fused_feat = fused_eligible
    fused_kw = dict(
        basis=self.pos_basis_t, min_deg=self.min_deg_point,
        max_deg=self.max_deg_point,
        use_contract=self.warp_fn is coord.contract,
        kernel_init=kernel_init,
        interpret=jax.default_backend() == 'cpu')
    # Density-only MLPs (proposal levels: rgb branch off, no normal heads,
    # no in-trunk skip) fuse ENTIRELY — featurize + trunk + density head in
    # one Pallas kernel; HBM traffic drops to means/covs in, density out
    # (the flat-GEMM trunk is bandwidth-bound, ~4.5x off roofline).
    full_density_fusion = (
        use_fused_feat and self.disable_rgb and
        not self.enable_pred_normals and self.net_depth <= self.skip_layer)

    def predict_density(means, covs):
      """Featurize Gaussians and run the density trunk."""
      if full_density_fusion:
        from multinerf_tpu.ops.pallas import density_mlp as dm
        num_feats = 2 * (self.max_deg_point - self.min_deg_point) * (
            self.pos_basis_t.shape[-1])
        ws, bs = [], []
        c_in = num_feats
        for _ in range(self.net_depth):
          w, b = _DenseParams(features=self.net_width, in_features=c_in,
                              kernel_init=kernel_init,
                              name=f'Dense_{next(_dense_ids)}')()
          ws.append(w)
          bs.append(b)
          c_in = self.net_width
        wd, bd = _DenseParams(features=1, in_features=self.net_width,
                              kernel_init=kernel_init,
                              name=f'Dense_{next(_dense_ids)}')()
        raw_density = dm.density_mlp(
            means, covs, ws, bs, wd, bd[0], self.pos_basis_t,
            min_deg=self.min_deg_point, max_deg=self.max_deg_point,
            use_contract=self.warp_fn is coord.contract,
            interpret=fused_kw['interpret'])
        if (density_key is not None) and (self.density_noise > 0):
          raw_density += self.density_noise * jax.random.normal(
              density_key, raw_density.shape)
        return raw_density, None
      if use_fused_feat and self.trunk_dtype in ('int8', 'int8_hybrid') and (
          self.net_activation is nn.relu):
        # Fully-fused int8 trunk: featurize + every trunk layer in ONE
        # Pallas kernel, hidden dots on the 2x-rate int8 MXU path,
        # quant/dequant in registers (ops/pallas/int8_trunk.py).  Params
        # are declared with nn.Dense's exact tree under the same names, so
        # checkpoints stay interchangeable across f32/bf16/int8 trunks.
        from multinerf_tpu.ops.pallas import int8_trunk as i8t
        num_feats = 2 * (self.max_deg_point - self.min_deg_point) * (
            self.pos_basis_t.shape[-1])
        skip_ids = [i for i in range(1, self.net_depth)
                    if (i - 1) % self.skip_layer == 0 and (i - 1) > 0]
        ws, bs_ = [], []
        for i in range(self.net_depth):
          rows = num_feats if i == 0 else (
              self.net_width + num_feats if i in skip_ids
              else self.net_width)
          w, b = _DenseParams(features=self.net_width, in_features=rows,
                              kernel_init=kernel_init,
                              name=f'Dense_{next(_dense_ids)}')()
          ws.append(w)
          bs_.append(b)
        x = i8t.int8_trunk(
            means, covs, ws, bs_, self.pos_basis_t,
            min_deg=self.min_deg_point, max_deg=self.max_deg_point,
            use_contract=self.warp_fn is coord.contract,
            skip_layers=skip_ids, interpret=fused_kw['interpret'],
            bwd_bf16=self.trunk_dtype == 'int8_hybrid')
      elif use_fused_feat:
        # Features live only in VMEM: the first layer and every skip-point
        # layer recompute+contract them in one Pallas kernel each.
        x = _FusedIPEDense(features=self.net_width,
                           name=f'Dense_{next(_dense_ids)}',
                           **fused_kw)(means, covs)
        x = self.net_activation(x)
        for i in range(1, self.net_depth):
          if (i - 1) % self.skip_layer == 0 and (i - 1) > 0:
            x = _SplitSkipDense(features=self.net_width,
                                name=f'Dense_{next(_dense_ids)}',
                                **fused_kw)(x, means, covs)
          else:
            x = dense_hidden(self.net_width)(x)
          x = self.net_activation(x)
      else:
        if self.warp_fn is not None:
          means, covs = coord.track_linearize(self.warp_fn, means, covs)
        if reference_algos:
          # The reference's composed featurization (bench baseline).
          lifted_means, lifted_vars = coord.lift_and_diagonalize(
              means, covs, jnp.asarray(self.pos_basis_t))
          feats = coord.integrated_pos_enc(
              lifted_means, lifted_vars, self.min_deg_point,
              self.max_deg_point)
        else:
          # Fused lift+IPE: the frequency scaling is folded into the
          # projection matrices so the featurization is two flat matmuls +
          # fused elementwise (~20% faster than the composed chain on TPU).
          # bf16 feature storage on TPU: free under the trunk's default-
          # precision matmuls (they round to bf16 anyway), halves traffic.
          feats = coord.integrated_pos_enc_lifted(
              means, covs, self.pos_basis_t, self.min_deg_point,
              self.max_deg_point,
              out_dtype=(jnp.bfloat16 if jax.default_backend() != 'cpu'
                         else None))

        x = feats
        inputs = feats
        for i in range(self.net_depth):
          x = dense_hidden(self.net_width)(x)
          x = self.net_activation(x)
          if i % self.skip_layer == 0 and i > 0:
            x = jnp.concatenate([x, inputs], axis=-1)
      raw_density = dense(1)(x)[..., 0]
      if (density_key is not None) and (self.density_noise > 0):
        raw_density += self.density_noise * jax.random.normal(
            density_key, raw_density.shape)
      return raw_density, x

    means, covs = gaussians
    if self.disable_density_normals:
      raw_density, x = predict_density(means, covs)
      raw_grad_density = None
      normals = None
    else:
      # Per-sample density gradients in ONE batched backward pass: densities
      # are elementwise-independent across samples, so the gradient of their
      # sum w.r.t. means is exactly the per-sample gradient field.
      def density_sum(m):
        raw, feat = predict_density(m, covs)
        return raw.sum(), (raw, feat)
      (_, (raw_density, x)), raw_grad_density = jax.value_and_grad(
          density_sum, has_aux=True)(means)
      # Normals point against the density gradient; normalizing the raw
      # (pre-activation) gradient is numerically safer than post-activation.
      normals = -ref_utils.l2_normalize(raw_grad_density)

    if self.enable_pred_normals:
      grad_pred = dense(3)(x)
      normals_pred = -ref_utils.l2_normalize(grad_pred)
      normals_to_use = normals_pred
    else:
      grad_pred = None
      normals_pred = None
      normals_to_use = normals

    density = self.density_activation(raw_density + self.density_bias)

    roughness = None
    if self.disable_rgb:
      rgb = jnp.zeros_like(means)
    else:
      if viewdirs is not None:
        if self.use_diffuse_color:
          raw_rgb_diffuse = dense(self.num_rgb_channels)(x)
        if self.use_specular_tint:
          tint = nn.sigmoid(dense(3)(x))
        if self.enable_pred_roughness:
          raw_roughness = dense(1)(x)
          roughness = self.roughness_activation(
              raw_roughness + self.roughness_bias)

        if self.bottleneck_width > 0:
          bottleneck = dense(self.bottleneck_width)(x)
          if (rng is not None) and (self.bottleneck_noise > 0):
            key, rng = random_split(rng)
            bottleneck += self.bottleneck_noise * jax.random.normal(
                key, bottleneck.shape)
          x = [bottleneck]
        else:
          x = []

        if self.use_reflections:
          # viewdirs point camera->point; reflect() wants point->camera.
          refdirs = ref_utils.reflect(-viewdirs, normals_to_use)
          dir_enc = self.dir_enc_fn(refdirs, roughness)
        else:
          # Encode per RAY (cheaper), then broadcast per sample.
          dir_enc = self.dir_enc_fn(viewdirs_rays, roughness)
          dir_enc = jnp.broadcast_to(
              dir_enc[..., None, :],
              sample_shape + (dir_enc.shape[-1],)).reshape(
                  n_flat, dir_enc.shape[-1])
        x.append(dir_enc)

        if self.use_n_dot_v:
          dotprod = jnp.sum(
              normals_to_use * viewdirs, axis=-1, keepdims=True)
          x.append(dotprod)

        if glo_vec is not None:
          x.append(glo_vec)

        x = jnp.concatenate(x, axis=-1)

        inputs = x
        for i in range(self.net_depth_viewdirs):
          x = dense_hidden(self.net_width_viewdirs)(x)
          x = self.net_activation(x)
          if i % self.skip_layer_dir == 0 and i > 0:
            x = jnp.concatenate([x, inputs], axis=-1)

      rgb = self.rgb_activation(
          self.rgb_premultiplier * dense(self.num_rgb_channels)(x) +
          self.rgb_bias)

      if self.use_diffuse_color:
        # Initialize diffuse near 0.25 so combined linear color starts ~0.5.
        diffuse_linear = nn.sigmoid(raw_rgb_diffuse - jnp.log(3.0))
        specular_linear = (tint * rgb if self.use_specular_tint else 0.5 * rgb)
        rgb = jnp.clip(
            image_ops.linear_to_srgb(specular_linear + diffuse_linear), 0, 1)

      rgb = rgb * (1 + 2 * self.rgb_padding) - self.rgb_padding

    def unflatten(a):
      return None if a is None else a.reshape(sample_shape + a.shape[1:])

    return dict(
        density=unflatten(density),
        rgb=unflatten(rgb),
        raw_grad_density=unflatten(raw_grad_density),
        grad_pred=unflatten(grad_pred),
        normals=unflatten(normals),
        normals_pred=unflatten(normals_pred),
        roughness=unflatten(roughness),
    )


@ginlite.configurable(name='NerfMLP')
class NerfMLP(MLP):
  pass


@ginlite.configurable(name='PropMLP')
class PropMLP(MLP):
  pass
