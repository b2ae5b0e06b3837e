"""Tests for ops.mathx."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multinerf_tpu.ops import mathx


def test_safe_trig_finite_for_huge_args():
  x = jnp.array([0.0, 1e3, 1e8, -1e8, 1e20, -1e20])
  assert jnp.all(jnp.isfinite(mathx.safe_sin(x)))
  assert jnp.all(jnp.isfinite(mathx.safe_cos(x)))


def test_safe_trig_matches_sin_in_range():
  x = jnp.linspace(-50, 50, 1001)
  np.testing.assert_allclose(mathx.safe_sin(x), jnp.sin(x), atol=1e-6)
  np.testing.assert_allclose(mathx.safe_cos(x), jnp.cos(x), atol=1e-6)


def test_safe_exp_finite_value_and_grad():
  x = jnp.array([-10.0, 0.0, 50.0, 88.0, 200.0, 1e6])
  y = mathx.safe_exp(x)
  assert jnp.all(jnp.isfinite(y))
  g = jax.vmap(jax.grad(mathx.safe_exp))(x)
  assert jnp.all(jnp.isfinite(g))
  # Gradient matches exp below the clamp.
  np.testing.assert_allclose(g[:3], jnp.exp(x[:3]), rtol=1e-6)
  # Gradient stays large (not zero) above the clamp.
  assert g[-1] > 1e30


def test_log_lerp_endpoints():
  assert np.isclose(mathx.log_lerp(0.0, 2.0, 200.0), 2.0, rtol=1e-4)
  assert np.isclose(mathx.log_lerp(1.0, 2.0, 200.0), 200.0, rtol=1e-4)
  assert np.isclose(mathx.log_lerp(0.5, 1.0, 100.0), 10.0, rtol=1e-4)
  with pytest.raises(ValueError):
    mathx.log_lerp(0.5, -1.0, 1.0)


def test_learning_rate_decay_schedule():
  lr0 = mathx.learning_rate_decay(0, 1e-2, 1e-4, 1000)
  lr1 = mathx.learning_rate_decay(1000, 1e-2, 1e-4, 1000)
  assert np.isclose(lr0, 1e-2, rtol=1e-4)
  assert np.isclose(lr1, 1e-4, rtol=1e-4)
  # Warmup scales the initial rate by lr_delay_mult.
  lr0_d = mathx.learning_rate_decay(0, 1e-2, 1e-4, 1000, lr_delay_steps=100,
                                    lr_delay_mult=0.1)
  assert np.isclose(lr0_d, 1e-3, rtol=1e-4)
  lr_after = mathx.learning_rate_decay(100, 1e-2, 1e-4, 1000,
                                       lr_delay_steps=100, lr_delay_mult=0.1)
  assert np.isclose(
      lr_after, mathx.learning_rate_decay(100, 1e-2, 1e-4, 1000), rtol=1e-4)


@pytest.mark.parametrize('n_query', [1, 7, 64])
@pytest.mark.parametrize('n_fence', [2, 13, 65])
def test_interp_sorted_matches_numpy(n_query, n_fence):
  rng = np.random.RandomState(0)
  batch = 16
  xp = np.sort(rng.randn(batch, n_fence), axis=-1).astype(np.float32)
  fp = np.sort(rng.randn(batch, n_fence), axis=-1).astype(np.float32)
  # Queries both inside and outside the fencepost range.
  x = np.sort(rng.randn(batch, n_query) * 2, axis=-1).astype(np.float32)
  got = mathx.interp_sorted(jnp.array(x), jnp.array(xp), jnp.array(fp))
  want = np.stack([np.interp(x[i], xp[i], fp[i]) for i in range(batch)])
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_interp_gather_matches_sorted():
  rng = np.random.RandomState(1)
  xp = np.sort(rng.rand(8, 33), axis=-1).astype(np.float32)
  fp = np.sort(rng.rand(8, 33), axis=-1).astype(np.float32)
  x = rng.rand(8, 17).astype(np.float32)
  a = mathx.interp_sorted(jnp.array(x), jnp.array(xp), jnp.array(fp))
  b = mathx.interp_gather(jnp.array(x), jnp.array(xp), jnp.array(fp))
  np.testing.assert_allclose(a, b, atol=1e-5)


def test_matmul_hp_precision():
  a = jnp.array(np.random.RandomState(2).randn(64, 64), jnp.float32)
  b = jnp.array(np.random.RandomState(3).randn(64, 64), jnp.float32)
  got = mathx.matmul_hp(a, b)
  want = np.array(a, np.float64) @ np.array(b, np.float64)
  np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
