"""Equivalence tests: Pallas fused resampling == stepfun.sample_intervals.

Runs in Pallas interpret mode on the CPU test mesh; the compiled TPU path
is exercised by bench.py and the flagship configs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu.ops import stepfun
from multinerf_tpu.ops.pallas import resample


def _case(rng, batch, nbins, pad=0.01):
  t = np.sort(rng.rand(batch, nbins + 1), -1).astype(np.float32)
  t = (t - t[:, :1]) / (t[:, -1:] - t[:, :1])  # Span [0, 1] like sdist.
  w = rng.rand(batch, nbins).astype(np.float32)
  logits = np.log(w + pad).astype(np.float32)
  return jnp.array(t), jnp.array(logits)


@pytest.mark.parametrize('nbins,nsamples', [(64, 32), (64, 64), (128, 32),
                                            (16, 8), (1, 64)])
@pytest.mark.parametrize('single_jitter', [True, False])
def test_fused_matches_reference(nbins, nsamples, single_jitter):
  rng = np.random.RandomState(0)
  t, logits = _case(rng, 64, nbins)
  key = jax.random.PRNGKey(3)
  want = stepfun.sample_intervals(key, t, logits, nsamples,
                                  single_jitter=single_jitter,
                                  domain=(0.0, 1.0))
  got = resample.sample_intervals_fused(key, t, logits, nsamples,
                                        single_jitter=single_jitter,
                                        domain=(0.0, 1.0), interpret=True)
  np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-5)


def test_fused_deterministic_mode():
  rng = np.random.RandomState(1)
  t, logits = _case(rng, 32, 32)
  want = stepfun.sample_intervals(None, t, logits, 16, domain=(0.0, 1.0))
  got = resample.sample_intervals_fused(None, t, logits, 16,
                                        domain=(0.0, 1.0), interpret=True)
  np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-5)


def test_fused_handles_degenerate_bins():
  """Zero-width bins get -inf logits (as the model constructs them)."""
  batch = 8
  t = np.tile(np.concatenate([np.zeros(4), np.linspace(0, 1, 13)]),
              (batch, 1)).astype(np.float32)
  t.sort(-1)
  w = np.ones((batch, 16), np.float32)
  logits = np.where(t[:, 1:] > t[:, :-1], np.log(w + 0.01),
                    -np.inf).astype(np.float32)
  key = jax.random.PRNGKey(5)
  want = stepfun.sample_intervals(key, jnp.array(t), jnp.array(logits), 8,
                                  single_jitter=True, domain=(0.0, 1.0))
  got = resample.sample_intervals_fused(key, jnp.array(t), jnp.array(logits),
                                        8, single_jitter=True,
                                        domain=(0.0, 1.0), interpret=True)
  assert np.all(np.isfinite(np.array(got)))
  np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-5)


def test_fused_multidim_batch():
  """Leading batch dims (e.g. patch-shaped batches) are flattened."""
  rng = np.random.RandomState(2)
  t, logits = _case(rng, 64, 16)
  t = t.reshape(4, 16, 17)
  logits = logits.reshape(4, 16, 16)
  key = jax.random.PRNGKey(7)
  want = stepfun.sample_intervals(key, t, logits, 8, single_jitter=True,
                                  domain=(0.0, 1.0))
  got = resample.sample_intervals_fused(key, t, logits, 8,
                                        single_jitter=True,
                                        domain=(0.0, 1.0), interpret=True)
  assert got.shape == (4, 16, 9)
  np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-5)


def test_fused_output_sorted_and_in_domain():
  rng = np.random.RandomState(3)
  t, logits = _case(rng, 128, 64)
  got = resample.sample_intervals_fused(
      jax.random.PRNGKey(11), t, logits, 32, single_jitter=True,
      domain=(0.0, 1.0), interpret=True)
  got = np.array(got)
  assert np.all(np.diff(got, axis=-1) >= 0)
  assert got.min() >= 0 and got.max() <= 1
