"""Tests for ops.stepfun: brute-force references, invariants, statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu.ops import stepfun


def _random_stepfun(rng, batch, n):
  t = np.sort(rng.rand(batch, n + 1) * 4 - 2, axis=-1).astype(np.float32)
  w = rng.rand(batch, n).astype(np.float32)
  return t, w


def test_searchsorted_brackets():
  rng = np.random.RandomState(0)
  a = np.sort(rng.randn(8, 17), axis=-1).astype(np.float32)
  v = (rng.randn(8, 33) * 2).astype(np.float32)
  lo, hi = stepfun.searchsorted(jnp.array(a), jnp.array(v))
  lo, hi = np.array(lo), np.array(hi)
  for i in range(a.shape[0]):
    for j in range(v.shape[1]):
      x = v[i, j]
      if x < a[i, 0]:
        assert lo[i, j] == 0 and hi[i, j] == 0
      elif x >= a[i, -1]:
        assert lo[i, j] == a.shape[1] - 1 and hi[i, j] == a.shape[1] - 1
      else:
        assert a[i, lo[i, j]] <= x < a[i, hi[i, j]]
        assert hi[i, j] == lo[i, j] + 1


def test_searchsorted_matches_numpy_inside_range():
  rng = np.random.RandomState(1)
  a = np.sort(rng.rand(4, 9), axis=-1).astype(np.float32)
  # Strictly interior queries.
  v = (a[:, :1] + (a[:, -1:] - a[:, :1]) *
       rng.rand(4, 21).astype(np.float32) * 0.999 + 1e-4)
  _, hi = stepfun.searchsorted(jnp.array(a), jnp.array(v))
  for i in range(4):
    want = np.searchsorted(a[i], v[i], side='right')
    np.testing.assert_array_equal(np.array(hi[i]), want)


def test_query_step_function():
  t = jnp.array([[0.0, 1.0, 2.0, 3.0]])
  y = jnp.array([[10.0, 20.0, 30.0]])
  tq = jnp.array([[-0.5, 0.5, 1.5, 2.5, 3.5]])
  yq = stepfun.query(tq, t, y, outside_value=-1)
  np.testing.assert_allclose(np.array(yq[0]), [-1, 10, 20, 30, -1])


def _inner_brute(t0, t1, y1):
  """Naive loop reference for the inner (fully-contained) measure."""
  n0 = t0.shape[-1] - 1
  inner = np.zeros(n0)
  for i in range(n0):
    lo, hi = t0[i], t0[i + 1]
    for j in range(len(y1)):
      if t1[j] >= lo and t1[j + 1] <= hi:
        inner[i] += y1[j]
  return inner


def test_inner_outer_bounds():
  rng = np.random.RandomState(2)
  t1, y1 = _random_stepfun(rng, 1, 12)
  t0 = np.sort(rng.rand(1, 9) * 4 - 2, axis=-1).astype(np.float32)
  inner, outer = stepfun.inner_outer(
      jnp.array(t0), jnp.array(t1), jnp.array(y1))
  inner, outer = np.array(inner[0]), np.array(outer[0])
  # inner <= outer always; both nonnegative.
  assert np.all(inner <= outer + 1e-6)
  assert np.all(inner >= -1e-6)
  # inner measure matches the brute-force contained-mass computation.
  want_inner = _inner_brute(t0[0], t1[0], y1[0])
  np.testing.assert_allclose(inner, want_inner, atol=1e-5)


def test_outer_measure_matches_inner_outer():
  """The one-pass outer measure == the cumsum/gather formulation."""
  rng = np.random.RandomState(12)
  t1, y1 = _random_stepfun(rng, 16, 12)
  t0 = np.sort(rng.rand(16, 9) * 4 - 2, axis=-1).astype(np.float32)
  _, want = stepfun.inner_outer(jnp.array(t0), jnp.array(t1), jnp.array(y1))
  got = stepfun.outer_measure(jnp.array(t0), jnp.array(t1), jnp.array(y1))
  np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-5,
                             atol=1e-6)
  # Including exactly-shared endpoints (the training case: both step
  # functions span [0, 1]).
  t0s = np.sort(rng.rand(8, 9), -1).astype(np.float32)
  t1s = np.sort(rng.rand(8, 13), -1).astype(np.float32)
  for t in (t0s, t1s):
    t[:, 0] = 0.0
    t[:, -1] = 1.0
  y1s = rng.rand(8, 12).astype(np.float32)
  _, want = stepfun.inner_outer(jnp.array(t0s), jnp.array(t1s),
                                jnp.array(y1s))
  got = stepfun.outer_measure(jnp.array(t0s), jnp.array(t1s), jnp.array(y1s))
  np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-5,
                             atol=1e-6)
  # Degenerate (zero-width) bins in either function.
  t_deg = np.repeat(np.sort(rng.rand(4, 5), -1), 2, axis=-1).astype(
      np.float32)[:, :9]
  y_deg = rng.rand(4, 8).astype(np.float32)
  _, want = stepfun.inner_outer(jnp.array(t0s[:4]), jnp.array(t_deg),
                                jnp.array(y_deg))
  got = stepfun.outer_measure(jnp.array(t0s[:4]), jnp.array(t_deg),
                              jnp.array(y_deg))
  np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-5,
                             atol=1e-6)


def test_lossfun_outer_zero_when_enveloped():
  """If the envelope strictly dominates, the loss must vanish."""
  rng = np.random.RandomState(3)
  t, w = _random_stepfun(rng, 4, 8)
  w = w / w.sum(-1, keepdims=True)
  # Build an envelope on the same grid with double the mass.
  loss = stepfun.lossfun_outer(
      jnp.array(t), jnp.array(w), jnp.array(t), jnp.array(2 * w))
  np.testing.assert_allclose(np.array(loss), 0, atol=1e-7)


def test_pdf_weight_roundtrip():
  rng = np.random.RandomState(4)
  t, w = _random_stepfun(rng, 4, 8)
  p = stepfun.weight_to_pdf(jnp.array(t), jnp.array(w))
  w2 = stepfun.pdf_to_weight(jnp.array(t), p)
  np.testing.assert_allclose(np.array(w2), w, rtol=1e-4, atol=1e-6)


def test_max_dilate_contains_original():
  """Dilated step function upper-bounds the original everywhere."""
  rng = np.random.RandomState(5)
  t, w = _random_stepfun(rng, 1, 8)
  td, wd = stepfun.max_dilate(jnp.array(t), jnp.array(w), 0.1)
  td, wd = np.array(td[0]), np.array(wd[0])
  queries = np.linspace(t[0, 0], t[0, -1] - 1e-5, 100)
  for q in queries:
    orig = 0.0
    for j in range(w.shape[1]):
      if t[0, j] <= q < t[0, j + 1]:
        orig = w[0, j]
    dil = 0.0
    for j in range(len(wd)):
      if td[j] <= q < td[j + 1]:
        dil = wd[j]
    assert dil >= orig - 1e-5


def test_integrate_weights_endpoints():
  rng = np.random.RandomState(6)
  w = rng.rand(8, 16).astype(np.float32)
  w /= w.sum(-1, keepdims=True)
  cw = np.array(stepfun.integrate_weights(jnp.array(w)))
  assert np.all(cw[..., 0] == 0)
  assert np.all(cw[..., -1] == 1)
  assert np.all(np.diff(cw, axis=-1) >= -1e-6)
  np.testing.assert_allclose(cw[:, 1:-1], np.cumsum(w, -1)[:, :-1], atol=1e-5)


@pytest.mark.parametrize('use_gpu_resampling', [False, True])
def test_sample_distribution_matches_pdf(use_gpu_resampling):
  """Empirical histogram of samples ~ matches the target step PDF."""
  t = jnp.array([0.0, 1.0, 2.0, 3.0])
  w = jnp.array([0.2, 0.5, 0.3])
  logits = jnp.log(w)
  n = 4096
  t_b = jnp.broadcast_to(t, (512, 4))
  logits_b = jnp.broadcast_to(logits, (512, 3))
  samples = stepfun.sample(
      jax.random.PRNGKey(0), t_b, logits_b, n // 512 * 8,
      use_gpu_resampling=use_gpu_resampling)
  samples = np.array(samples).ravel()
  hist, _ = np.histogram(samples, bins=[0, 1, 2, 3])
  frac = hist / hist.sum()
  np.testing.assert_allclose(frac, np.array(w), atol=0.02)


def test_sample_backend_equivalence():
  """Gather-based and brute-force resampling must agree (TPU-vs-GPU path)."""
  rng = np.random.RandomState(7)
  t, w = _random_stepfun(rng, 16, 32)
  logits = np.log(w + 0.01).astype(np.float32)
  key = jax.random.PRNGKey(1)
  a = stepfun.sample(key, jnp.array(t), jnp.array(logits), 24,
                     use_gpu_resampling=False)
  b = stepfun.sample(key, jnp.array(t), jnp.array(logits), 24,
                     use_gpu_resampling=True)
  np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-4)


def test_sample_intervals_sorted_and_in_domain():
  rng = np.random.RandomState(8)
  t, w = _random_stepfun(rng, 16, 32)
  t = np.sort(np.abs(t), axis=-1)
  logits = np.log(w + 0.01).astype(np.float32)
  out = stepfun.sample_intervals(
      jax.random.PRNGKey(2), jnp.array(t), jnp.array(logits), 12,
      single_jitter=True, domain=(0.0, 1e6))
  out = np.array(out)
  assert out.shape == (16, 13)
  assert np.all(np.diff(out, axis=-1) >= 0)
  assert np.all(out >= 0)


def test_distortion_loss_monte_carlo():
  """lossfun_distortion == E|x-y| under the step-function distribution."""
  rng = np.random.RandomState(9)
  t = np.sort(rng.rand(5)).astype(np.float32)
  w = rng.rand(4).astype(np.float32)
  w /= w.sum()
  got = float(stepfun.lossfun_distortion(jnp.array(t), jnp.array(w)))

  # Monte Carlo: sample pairs from the step-function density.
  n = 200000
  bins = rng.choice(4, size=(n, 2), p=w)
  u = rng.rand(n, 2)
  x = t[bins] + u * (t[bins + 1] - t[bins])
  want = np.mean(np.abs(x[:, 0] - x[:, 1]))
  assert abs(got - want) < 0.01


def test_interval_distortion_matches_lossfun():
  rng = np.random.RandomState(10)
  t = np.sort(rng.rand(3)).astype(np.float32)
  w = np.array([0.5, 0.5], np.float32)
  total = float(stepfun.lossfun_distortion(jnp.array(t), jnp.array(w)))
  pieces = 0.0
  for i in range(2):
    for j in range(2):
      d = float(stepfun.interval_distortion(
          jnp.array(t[i]), jnp.array(t[i + 1]),
          jnp.array(t[j]), jnp.array(t[j + 1])))
      pieces += w[i] * w[j] * d
  assert abs(total - pieces) < 1e-5


def test_weighted_percentile():
  t = jnp.array([0.0, 1.0, 2.0, 3.0, 4.0])
  w = jnp.array([0.25, 0.25, 0.25, 0.25])
  pct = stepfun.weighted_percentile(t, w, [50])
  # CDF is linear in t here, so the median is 2.0.
  assert abs(float(pct[0]) - 2.0) < 1e-5


def test_resample_conserves_mass():
  rng = np.random.RandomState(11)
  tp, vp = _random_stepfun(rng, 4, 16)
  # Resampling onto a grid covering everything conserves total mass.
  t = np.stack([np.linspace(tp[i, 0], tp[i, -1], 9) for i in range(4)])
  v = stepfun.resample(jnp.array(t), jnp.array(tp), jnp.array(vp))
  np.testing.assert_allclose(
      np.array(v).sum(-1), vp.sum(-1), rtol=1e-4, atol=1e-4)
