"""Golden pin for the LPIPS stack: export schema + JAX forward vs torch.

The pretrained VGG weights cannot exist in this container (no egress), so
the risk is a silently wrong schema in scripts/export_lpips_weights.py or
wrong tap/normalization semantics in ops/lpips.py that no random-weight
test would notice.  This test closes that hole without torchvision/lpips:

1. Build a torchvision-layout VGG16 `.features` Sequential (13 convs, 5
   maxpools — the exact module list torchvision emits) plus lpips-layout
   `lins` heads, with seeded random weights.
2. Run the REAL `export_lpips_weights.extract_params` over it.
3. Compute LPIPS for a fixed image pair with an INDEPENDENT torch forward
   (NCHW convs, official scaling layer, channel-unit-normalize, 1x1 lin
   heads, spatial average) written from the official implementation's
   semantics.
4. Assert `ops.lpips.lpips` on the extracted npz params matches.

A transposed kernel, a reordered tap, a missing scaling constant, or a
wrong lin reshape all change the value and fail this test.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'scripts'))
import export_lpips_weights  # noqa: E402

from multinerf_tpu.ops import lpips as lpips_jax  # noqa: E402

# VGG16 .features layout as torchvision builds it: M = maxpool.
_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
        512, 512, 512, 'M', 512, 512, 512, 'M']
# ReLU indices whose outputs LPIPS taps (relu1_2, 2_2, 3_3, 4_3, 5_3).
_TAP_INDICES = (3, 8, 15, 22, 29)


def _build_fake_vgg(seed=0):
  gen = torch.Generator().manual_seed(seed)
  layers = []
  cin = 3
  for v in _CFG:
    if v == 'M':
      layers.append(torch.nn.MaxPool2d(kernel_size=2, stride=2))
      continue
    conv = torch.nn.Conv2d(cin, v, kernel_size=3, padding=1)
    with torch.no_grad():
      conv.weight.copy_(torch.randn(conv.weight.shape, generator=gen) *
                        (1.0 / np.sqrt(9 * cin)))
      conv.bias.copy_(torch.randn(conv.bias.shape, generator=gen) * 0.05)
    layers.append(conv)
    layers.append(torch.nn.ReLU(inplace=False))
    cin = v
  return torch.nn.Sequential(*layers), gen


class _FakeLin:
  """Mimics lpips.NetLinLayer: `.model[-1]` is a 1x1 Conv2d."""

  def __init__(self, channels, gen):
    conv = torch.nn.Conv2d(channels, 1, kernel_size=1, bias=False)
    with torch.no_grad():
      conv.weight.copy_(torch.rand(conv.weight.shape, generator=gen))
    self.model = torch.nn.Sequential(torch.nn.Identity(), conv)


def _torch_lpips(vgg, lin_weights, img0, img1):
  """Independent LPIPS forward in torch NCHW, official semantics."""
  shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
  scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

  def prep(img):
    x = torch.from_numpy(np.asarray(img, np.float32)).permute(2, 0, 1)[None]
    return (2.0 * x - 1.0 - shift) / scale

  def taps(x):
    feats = []
    for i, layer in enumerate(vgg):
      x = layer(x)
      if i in _TAP_INDICES:
        feats.append(x)
    return feats

  def unit_normalize(f, eps=1e-10):
    return f / torch.sqrt(torch.sum(f * f, dim=1, keepdim=True) + eps)

  total = 0.0
  with torch.no_grad():
    for w, f0, f1 in zip(lin_weights, taps(prep(img0)), taps(prep(img1))):
      d = (unit_normalize(f0) - unit_normalize(f1)) ** 2
      weighted = torch.sum(d * w.view(1, -1, 1, 1), dim=1)
      total = total + torch.mean(weighted, dim=(-2, -1))
  return float(total[0])


def test_export_schema_and_jax_forward_match_torch(tmp_path):
  vgg, gen = _build_fake_vgg()
  tap_channels = [64, 128, 256, 512, 512]
  lins = [_FakeLin(c, gen) for c in tap_channels]

  params = export_lpips_weights.extract_params(vgg, lins)
  npz = tmp_path / 'lpips_fake.npz'
  np.savez(npz, **params)

  rs = np.random.RandomState(42)
  img0 = rs.rand(32, 32, 3).astype(np.float32)
  img1 = np.clip(img0 + 0.1 * rs.randn(32, 32, 3).astype(np.float32), 0, 1)

  golden = _torch_lpips(vgg, [l.model[-1].weight[0, :, 0, 0] for l in lins],
                        img0, img1)
  scorer = lpips_jax.LPIPS(str(npz))
  got = scorer(img0, img1)

  assert golden > 1e-4  # Non-degenerate fixture.
  np.testing.assert_allclose(got, golden, rtol=1e-4)
  # Identical inputs score ~0 regardless of weights.
  assert scorer(img0, img0) < 1e-8


def test_extract_rejects_wrong_conv_count():
  vgg = torch.nn.Sequential(torch.nn.Conv2d(3, 8, 3), torch.nn.ReLU())
  with pytest.raises(ValueError, match='expected 13 convs'):
    export_lpips_weights.extract_params(vgg, [])
