"""LPIPS machinery tests (architecture/schema; real weights are external).

Pretrained VGG weights cannot be downloaded in this environment, so these
tests validate the full network evaluation path with schema-correct random
weights: identity distance is exactly zero for ANY weights (the tap
differences vanish), distances are positive/finite for distinct images,
batching matches per-image evaluation, and the eval-side gating degrades
gracefully.
"""

import os

import numpy as np
import pytest

from multinerf_tpu.ops import image_ops
from multinerf_tpu.ops import lpips


@pytest.fixture(scope='module')
def weights_file(tmp_path_factory):
  rng = np.random.RandomState(0)
  params = lpips.random_params(rng)
  path = tmp_path_factory.mktemp('lpips') / 'w.npz'
  np.savez(path, **params)
  return str(path)


def test_identity_is_zero_any_weights(weights_file):
  model = lpips.LPIPS(weights_file)
  img = np.random.RandomState(1).rand(33, 35, 3).astype(np.float32)
  # XLA may compile the two (identical) tap towers with different fusion
  # choices, leaving reassociation dust at the 1e-15 level.
  assert abs(model(img, img)) < 1e-12


def test_positive_and_finite_for_distinct_images(weights_file):
  model = lpips.LPIPS(weights_file)
  rng = np.random.RandomState(2)
  img0 = rng.rand(32, 32, 3).astype(np.float32)
  img1 = rng.rand(32, 32, 3).astype(np.float32)
  d = model(img0, img1)
  assert np.isfinite(d) and d > 0
  # Symmetric in its arguments.
  np.testing.assert_allclose(d, model(img1, img0), rtol=1e-5)


def test_batched_matches_loop(weights_file):
  model = lpips.LPIPS(weights_file)
  rng = np.random.RandomState(3)
  a = rng.rand(2, 32, 32, 3).astype(np.float32)
  b = rng.rand(2, 32, 32, 3).astype(np.float32)
  import jax
  batched = jax.jit(lpips.lpips)(model.params, a, b)
  for i in range(2):
    np.testing.assert_allclose(float(batched[i]), model(a[i], b[i]),
                               rtol=1e-5)


def test_metric_harness_integration(weights_file):
  harness = image_ops.MetricHarness(lpips_weights_path=weights_file)
  rng = np.random.RandomState(4)
  img0 = rng.rand(24, 24, 3)
  img1 = rng.rand(24, 24, 3)
  m = harness(img0, img1)
  assert set(m) == {'psnr', 'ssim', 'lpips'}
  assert np.isfinite(m['lpips'])


def test_metric_harness_gates_on_missing_weights(tmp_path):
  harness = image_ops.MetricHarness(
      lpips_weights_path=os.path.join(str(tmp_path), 'nope.npz'))
  m = harness(np.zeros((16, 16, 3)), np.ones((16, 16, 3)))
  assert set(m) == {'psnr', 'ssim'}
  assert image_ops.MetricHarness().lpips_fn is None
