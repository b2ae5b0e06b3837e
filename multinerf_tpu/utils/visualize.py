"""Host-side visualization: colormapped buffers and ray strip charts.

Covers the capability surface of ``internal/vis.py`` in
google-research/multinerf (depth/normal/acc colormapping, checkerboard
matting, per-ray step-function strip charts, the per-image suite), built
as host post-processing in numpy: eval's rendering dict is already on the
host, and on a remotely-attached TPU every stray jnp op in the vis path
would cost a device round trip per image.  Structure:

* ``_scale_unit`` — one normalization core (weighted-percentile bounds,
  optional tone curve, clip-or-wrap) shared by every colormapped output.
* ``colorize`` / ``visualize_cmap`` — scalar image -> RGB via any
  matplotlib colormap, matted over a checkerboard where unaccumulated.
* ``rasterize_stepfun`` + ``ray_strip_chart`` — vectorized
  piecewise-constant rasterization of ray histograms onto a fixed pixel
  grid, laid out rays-by-levels with separator rows.
* ``visualize_suite`` — the per-image bundle the drivers log to
  TensorBoard (same output keys as the reference's suite: that naming is
  the TB contract).
"""

from __future__ import annotations

import numpy as np

from multinerf_tpu.ops import stepfun

_EPS = float(np.finfo(np.float32).eps)


def _get_cmap(name):
  """matplotlib colormap lookup across old/new APIs."""
  import matplotlib
  try:
    return matplotlib.colormaps[name]
  except (AttributeError, KeyError):
    from matplotlib import cm
    return cm.get_cmap(name)


# One implementation of weighted percentiles for the whole package: the
# ops version with numpy, so vis stays host-only (VERDICT r3 dedup).
def weighted_percentile(x, w, ps):
  return stepfun.weighted_percentile_of_values(x, w, ps, xnp=np)


def sinebow(h):
  """Cyclic uniform colormap (basecase.org/env/on-rainbows)."""
  f = lambda x: np.sin(np.pi * x)**2
  return np.stack([f(3 / 6 - h), f(5 / 6 - h), f(7 / 6 - h)], -1)


def checkerboard(shape, square=8, dark=0.8, light=1.0):
  """[H, W] checkerboard of alternating gray squares."""
  ii, jj = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]),
                       indexing='ij')
  return np.where((ii // square + jj // square) % 2 == 0, dark, light)


def matte(vis, acc, dark=0.8, light=1.0, width=8):
  """Alpha-composite an image over a checkerboard where acc < 1."""
  vis = np.asarray(vis)
  acc = np.asarray(acc)[..., None]
  board = checkerboard(vis.shape[:2], width, dark, light)[..., None]
  return vis * acc + board * (1 - acc)


def _scale_unit(value, weight, lo=None, hi=None, percentile=99.0,
                curve_fn=None, modulus=None):
  """Map a scalar image into [0, 1] for display.

  Bounds default to the weighted percentiles straddling the central
  ``percentile``-wide mass of ``value`` (so fliers don't flatten the
  range); ``curve_fn`` reshapes the tone response (e.g. log for depth);
  ``modulus`` wraps instead of clipping (cyclic quantities).
  """
  value = np.asarray(value, np.float64)
  if lo is None or hi is None:
    half = percentile / 2
    # Multi-channel values: every channel sample carries its pixel weight.
    w_full = np.broadcast_to(
        np.reshape(weight, np.shape(weight) + (1,) * (value.ndim -
                                                      np.ndim(weight))),
        value.shape)
    p_lo, p_hi = weighted_percentile(value, w_full, [50 - half, 50 + half])
    lo = lo if lo is not None else p_lo - _EPS
    hi = hi if hi is not None else p_hi + _EPS
  if curve_fn is not None:
    value, lo, hi = curve_fn(value), curve_fn(lo), curve_fn(hi)
  if modulus is not None:
    return np.mod(value, modulus) / modulus
  span = np.abs(hi - lo)
  unit = (value - min(lo, hi)) / max(span, _EPS)
  return np.nan_to_num(np.clip(unit, 0.0, 1.0))


def colorize(value, weight, cmap, matte_background=True, **scale_kwargs):
  """Scalar image -> RGB: normalize, apply colormap, optionally matte."""
  unit = _scale_unit(value, weight, **scale_kwargs)
  if cmap is None:
    if unit.ndim != 3 or unit.shape[-1] != 3:
      raise ValueError(f'value must be HxWx3 when cmap is None, '
                       f'got shape {unit.shape}')
    rgb = unit
  else:
    rgb = np.asarray(cmap(unit))[..., :3]
  return matte(rgb, weight) if matte_background else rgb


def visualize_cmap(value, weight, colormap, lo=None, hi=None,
                   percentile=99.0, curve_fn=None, modulus=None,
                   matte_background=True):
  """Compatibility alias for ``colorize`` (reference vis.py:48 surface)."""
  # The reference treats lo/hi as falsy-optional; preserve that so a
  # caller passing lo=0 gets the automatic bound, like it would there.
  return colorize(value, weight, colormap,
                  lo=lo if lo else None, hi=hi if hi else None,
                  percentile=percentile, curve_fn=curve_fn,
                  modulus=modulus, matte_background=matte_background)


def rasterize_stepfun(edges, values, grid):
  """Average piecewise-constant functions over the bins of a pixel grid.

  Args:
    edges: [R, n+1] per-row fenceposts (sorted).
    values: [R, n] or [R, n, C] per-interval heights.
    grid: [res+1] target fenceposts.

  Returns:
    [R, res(, C)]: for each target bin, the mean height of the source
    function over the covered part of the bin (0 where the bin lies
    entirely outside the source domain).

  Exact, not sampled: the running integral of each row's height function
  is linear between fenceposts, so evaluating it at the grid points by
  linear interpolation and differencing gives the true bin integrals;
  dividing by the covered measure (the same construction applied to the
  constant-1 function) turns integrals into means.
  """
  edges = np.asarray(edges, np.float64)
  values = np.asarray(values, np.float64)
  squeeze = values.ndim == 2
  if squeeze:
    values = values[..., None]
  widths = np.diff(edges, axis=-1)

  out = np.empty((values.shape[0], len(grid) - 1, values.shape[-1]))
  zero = np.zeros((1,))
  for r in range(values.shape[0]):
    covered = np.diff(np.clip(grid, edges[r, 0], edges[r, -1]))
    for c in range(values.shape[-1]):
      integral = np.concatenate(
          [zero, np.cumsum(values[r, :, c] * widths[r])])
      per_bin = np.diff(np.interp(grid, edges[r], integral))
      out[r, :, c] = per_bin / np.maximum(covered, _EPS)
  return out[..., 0] if squeeze else out


def _accumulate_along_ray(w, rgb):
  """Replace per-interval values with their running accumulation."""
  w_acc = np.cumsum(w, axis=-1)
  rgb_acc = np.cumsum(rgb * w[..., None], axis=-2)
  rgb_mean = (rgb_acc + _EPS) / (w_acc[..., None] + 2 * _EPS)
  return w_acc, rgb_mean


def ray_strip_chart(dist, dist_range, weights, rgbs, accumulate=False,
                    renormalize=False, resolution=2048, bg_color=0.8):
  """Render a bundle of rays' per-level histograms as one strip image.

  Each ray owns a horizontal band: its levels stacked top to bottom,
  every (ray, level) strip repeated to a few pixels tall, a blank
  separator row between rays.  Color is the per-interval rgb, opacity the
  per-interval weight, both rasterized exactly onto ``resolution``
  columns spanning ``dist_range``.

  Args:
    dist: per level, [R, n+1] histogram fenceposts.
    dist_range: (lo, hi) of the horizontal axis.
    weights: per level, [R, n] interval weights.
    rgbs: per level, [R, n, 3] interval colors.
    accumulate: chart running accumulation instead of raw intervals.
    renormalize: scale opacities so the global max is 1.
    resolution: chart width in pixels (height derives from it).
    bg_color: color where no mass lands.

  Returns:
    (chart [rows, resolution, C], alpha [rows, resolution]); alpha is 0
    exactly on separator rows and uncovered columns.
  """
  grid = np.linspace(dist_range[0], dist_range[1], resolution + 1)

  strips_rgb, strips_a = [], []
  for edges, w, rgb in zip(dist, weights, rgbs):
    edges, w, rgb = np.asarray(edges), np.asarray(w), np.asarray(rgb)
    if accumulate:
      w, rgb = _accumulate_along_ray(w, rgb)
    strips_rgb.append(rasterize_stepfun(edges, rgb, grid))
    strips_a.append(rasterize_stepfun(edges, w, grid))
  # [R, L, res, C] / [R, L, res]: ray-major, levels inside each band.
  chart_rgb = np.stack(strips_rgb, axis=1)
  chart_a = np.stack(strips_a, axis=1)
  num_rays, num_levels = chart_a.shape[:2]

  if renormalize:
    chart_a = chart_a / max(_EPS, chart_a.max())

  # Row layout: each (ray, level) strip `rep` pixels tall, one separator
  # row per ray band, no trailing separator.
  rep = max(1, resolution // (num_rays * num_levels + 1))
  rows_per_band = num_levels * rep + 1
  total_rows = num_rays * rows_per_band - 1
  row = np.arange(total_rows)
  ray_of_row = row // rows_per_band
  within = row % rows_per_band
  is_sep = within == num_levels * rep
  level_of_row = np.minimum(within // rep, num_levels - 1)

  flat_rgb = chart_rgb[ray_of_row, level_of_row]  # [rows, res, C]
  flat_a = np.where(is_sep[:, None], 0.0, chart_a[ray_of_row, level_of_row])
  chart = flat_rgb * flat_a[..., None] + bg_color * (1 - flat_a[..., None])
  return chart, flat_a


def _depth_layers(rendering, acc):
  """The three depth visualizations: mean, median, percentile-triplet."""
  log_depth = lambda x: -np.log(np.asarray(x) + _EPS)
  turbo = _get_cmap('turbo')
  mean_d = np.asarray(rendering['distance_mean'])
  median_d = np.asarray(rendering['distance_median'])
  p5 = np.asarray(rendering['distance_percentile_5'])
  p95 = np.asarray(rendering['distance_percentile_95'])

  out = {
      'depth_mean': colorize(mean_d, acc, turbo, curve_fn=log_depth),
      'depth_median': colorize(median_d, acc, turbo, curve_fn=log_depth),
      # The spread triplet straight into RGB channels: hue encodes the
      # local shape of the depth distribution (tight surfaces read gray,
      # skewed/multimodal ones tint).
      'depth_triplet': colorize(
          np.stack([2 * median_d - p5, median_d, p95], axis=-1), acc, None,
          curve_fn=lambda x: np.log(x + _EPS)),
  }
  return out


def _strip_chart_layers(rendering):
  """Ray-bundle charts: per-level colors and sqrt-weight intensity."""
  edges = [np.asarray(d) for d in rendering['ray_sdist']]
  weights = [np.asarray(w) for w in rendering['ray_weights']]
  rgbs = [np.clip(np.asarray(r), 0, 1) for r in rendering['ray_rgbs']]
  domain = (0.0, 1.0)  # Normalized ray distance.

  colors_chart, _ = ray_strip_chart(edges, domain, weights, rgbs)

  # Weight chart: intensity = sqrt(weight) through a gray map, fully
  # opaque, with rows/columns carrying no histogram at all flagged red.
  sqrt_w = [np.sqrt(w) for w in weights]
  intensity, coverage = ray_strip_chart(
      edges, domain, [np.ones_like(w) for w in sqrt_w],
      [w[..., None] for w in sqrt_w], bg_color=0)
  gray = colorize(intensity[..., 0], np.ones_like(coverage),
                  _get_cmap('gray'), lo=0.0, hi=1.0, matte_background=False)
  weights_chart = np.where(coverage[..., None] == 0,
                           np.array([1.0, 0.0, 0.0]), gray)
  return {'ray_colors': colors_chart, 'ray_weights': weights_chart}


def visualize_suite(rendering, rays):
  """Standard bundle of visualizations for one rendered image.

  The returned keys are the TB image-tag contract shared with the
  reference suite (vis.py:170-260 there); everything is computed in host
  numpy from the fetched rendering dict.
  """
  rgb = np.asarray(rendering['rgb'])
  # Rays whose expected depth diverged carry no usable geometry; treat
  # them as unaccumulated everywhere below.
  mean_d = np.asarray(rendering['distance_mean'])
  acc = np.where(np.isnan(mean_d), 0.0, np.asarray(rendering['acc']))

  suite = {'color': rgb, 'acc': acc, 'color_matte': matte(rgb, acc)}
  suite.update(_depth_layers(rendering, acc))

  # Scene point of each pixel, folded into its unit cell.
  points = (np.asarray(rays.origins) +
            np.asarray(rays.directions) * mean_d[..., None])
  suite['coords_mod'] = matte(((points + 1) % 2) / 2, acc)

  suite.update(_strip_chart_layers(rendering))

  if 'rgb_cc' in rendering:
    suite['color_corrected'] = np.asarray(rendering['rgb_cc'])
  for key, val in rendering.items():
    if key.startswith('normals'):
      suite[key] = matte((np.asarray(val) + 1) / 2, acc)
  if 'roughness' in rendering:
    suite['roughness'] = matte(np.tanh(np.asarray(rendering['roughness'])),
                               acc)
  return suite
