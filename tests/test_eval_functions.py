"""Unit pins for eval.py's frame pipeline (review findings, round 4).

Three regressions guarded here:
  1. eval_quantize_metrics must round PREDICTIONS only — the reference
     (eval.py:134-137 there) never quantizes the ground truth, and float
     GT (LLFF pyramid averages, raw HDR) would otherwise shift every
     exported metric.
  2. render_times must measure time blocked on the renderer (dispatch +
     fetch), not the consumer's scoring/saving between generator
     resumptions (reference contract: eval.py:115-116 there times the
     render alone).
  3. DeviceImageRenderer's exposure selection must layer dataset
     .exposures OVER metadata exposure_values, matching
     Dataset._make_ray_batch's override order.
"""

import time
import types as pytypes

import jax.numpy as jnp
import numpy as np

import eval as eval_lib
from multinerf_tpu import configs as configs_lib
from multinerf_tpu.data import datasets as datasets_lib
from multinerf_tpu.data import types
from multinerf_tpu.models import nerf as models


class _RecordingHarness:
  """Stands in for MetricHarness; records the (pred, gt) pairs it sees."""

  def __init__(self):
    self.calls = []

  def __call__(self, pred, gt):
    self.calls.append((np.asarray(pred), np.asarray(gt)))
    return {'psnr': 0.0}


def test_score_frame_quantizes_predictions_only():
  config = configs_lib.Config(
      eval_quantize_metrics=True, eval_crop_borders=0,
      compute_disp_metrics=False, compute_normal_metrics=False)
  # GT values deliberately OFF the 8-bit lattice.
  gt = np.full((4, 4, 3), 0.5 + 0.3 / 255, np.float64)
  rendering = {'rgb': gt.copy(), 'rgb_cc': gt.copy()}
  harness = _RecordingHarness()
  batch = types.Batch(rays=None, rgb=gt)

  eval_lib.score_frame(rendering, batch, gt, config, harness,
                       postprocess_fn=lambda x: x)

  assert len(harness.calls) == 2
  for pred, seen_gt in harness.calls:
    np.testing.assert_array_equal(seen_gt, gt)  # GT untouched.
    np.testing.assert_array_equal(pred, np.round(gt * 255) / 255)
    assert not np.array_equal(pred, seen_gt)  # The rounding is real.


def test_score_frame_crops_before_metrics():
  config = configs_lib.Config(
      eval_quantize_metrics=False, eval_crop_borders=1,
      compute_disp_metrics=False, compute_normal_metrics=False)
  gt = np.random.RandomState(0).rand(6, 6, 3)
  rendering = {'rgb': gt.copy(), 'rgb_cc': gt.copy()}
  harness = _RecordingHarness()
  batch = types.Batch(rays=None, rgb=gt)

  eval_lib.score_frame(rendering, batch, gt, config, harness,
                       postprocess_fn=lambda x: x)

  for pred, seen_gt in harness.calls:
    assert pred.shape == (4, 4, 3)
    np.testing.assert_array_equal(seen_gt, gt[1:-1, 1:-1])


class _SleepyRenderer:
  """Fake renderer whose dispatch costs a fixed, measurable time."""

  def __init__(self, dispatch_s):
    self.dispatch_s = dispatch_s

  def __call__(self, params, train_frac, rays, fetch=True):
    time.sleep(self.dispatch_s)
    return {'rgb': np.zeros((2, 2, 3), np.float32)}


class _TinyDataset:
  def __init__(self, n):
    self.size = n

  def __next__(self):
    return types.Batch(rays=np.zeros((2, 2, 3), np.float32))


def test_render_frames_timing_excludes_consumer_work():
  dispatch_s = 0.05
  consumer_s = 0.25
  renderer = _SleepyRenderer(dispatch_s)
  dataset = _TinyDataset(3)
  state = pytypes.SimpleNamespace(step=0, params=None)
  config = configs_lib.Config(max_steps=1)

  times = []
  for _, _, _, render_s in eval_lib.render_frames(
      renderer, dataset, state, config, num_eval=3):
    times.append(render_s)
    time.sleep(consumer_s)  # Scoring/saving stand-in; must NOT be counted.

  assert len(times) == 3
  for t in times:
    assert t >= dispatch_s * 0.5
    assert t < consumer_s  # The old inter-yield clock would exceed this.


class _ExposureDataset:
  """Minimal attribute bag accepted by DeviceImageRenderer.__init__."""

  # The REAL shared selection rules — so these tests pin the exact code
  # path both _make_ray_batch and the device renderer read from.
  exposure_records = datasets_lib.Dataset.exposure_records

  def __init__(self, n_cams, metadata, exposures, render_path=False):
    pix2cam = np.tile(np.eye(3, dtype=np.float32), (n_cams, 1, 1))
    cam2world = np.tile(np.eye(3, 4, dtype=np.float32), (n_cams, 1, 1))
    self.cameras = (pix2cam, cam2world, None, None)
    self.camtype = 'perspective'
    self.height, self.width = 4, 4
    self.near, self.far = 0.1, 10.0
    self.metadata = metadata
    self.exposures = exposures
    self.render_path = render_path
    self.render_exposures = None
    self._render_spherical = False


def test_device_renderer_exposures_override_metadata():
  n = 3
  metadata = {
      'exposure_idx': np.arange(n, dtype=np.int32),
      'exposure_values': np.array([0.1, 0.2, 0.3], np.float32),
  }
  exif_exposures = np.array([1.5, 2.5, 3.5], np.float32)
  dataset = _ExposureDataset(n, metadata, exif_exposures)
  config = configs_lib.Config(render_chunk_size=16)

  renderer = models.DeviceImageRenderer(lambda *a: None, config, dataset)

  # _make_ray_batch layers .exposures AFTER metadata — the EXIF values win.
  np.testing.assert_allclose(np.asarray(renderer._exposure_values),
                             exif_exposures)
  # The metadata exposure INDEX channel is still carried.
  np.testing.assert_array_equal(np.asarray(renderer._exposure_idx),
                                metadata['exposure_idx'])


def test_device_renderer_metadata_only_unchanged():
  n = 2
  metadata = {
      'exposure_idx': np.zeros(n, np.int32),
      'exposure_values': np.array([0.25, 0.75], np.float32),
  }
  dataset = _ExposureDataset(n, metadata, exposures=None)
  config = configs_lib.Config(render_chunk_size=16)
  renderer = models.DeviceImageRenderer(lambda *a: None, config, dataset)
  np.testing.assert_allclose(np.asarray(renderer._exposure_values),
                             metadata['exposure_values'])
