"""Export pretrained VGG-LPIPS weights to the .npz schema of ops/lpips.py.

Run this in ANY environment that has `torch`, `torchvision`, and `lpips`
installed (this build container has no network egress, so the pretrained
checkpoints cannot be downloaded here), then copy the .npz over and set
``Config.lpips_weights_path`` to its location.

Usage:  python scripts/export_lpips_weights.py --out lpips_vgg.npz
"""

import argparse

# torchvision indices of the 13 convs, in ops/lpips.py VGG16_LAYOUT order.
CONV_NAMES = ['conv1_1', 'conv1_2', 'conv2_1', 'conv2_2', 'conv3_1',
              'conv3_2', 'conv3_3', 'conv4_1', 'conv4_2', 'conv4_3',
              'conv5_1', 'conv5_2', 'conv5_3']


def extract_params(vgg_features, lins):
  """Walk a torchvision-layout VGG16 `.features` module + lpips `.lins`
  into the ops/lpips.py npz schema.

  Separated from main() so the schema assumptions (conv walking order,
  OIHW->HWIO transpose, `lin.model[-1]` 1x1-conv weight layout) are pinned
  by tests/test_lpips_golden.py against a hand-built VGG — without needing
  torchvision/lpips in this container.
  """
  import numpy as np
  out = {}
  conv_idx = 0
  for layer in vgg_features:
    if layer.__class__.__name__ == 'Conv2d':
      name = CONV_NAMES[conv_idx]
      # torch kernels are OIHW; ours are HWIO.
      out[f'{name}/kernel'] = (
          layer.weight.detach().numpy().transpose(2, 3, 1, 0).astype(
              np.float32))
      out[f'{name}/bias'] = layer.bias.detach().numpy().astype(np.float32)
      conv_idx += 1
  if conv_idx != len(CONV_NAMES):
    raise ValueError(f'expected {len(CONV_NAMES)} convs, found {conv_idx}')

  for k, lin in enumerate(lins):
    w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
    out[f'lin{k}/weight'] = w.reshape(-1).astype(np.float32)
  return out


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--out', default='lpips_vgg.npz')
  args = parser.parse_args()

  import lpips as lpips_torch
  import numpy as np
  import torchvision

  vgg = torchvision.models.vgg16(
      weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1).features
  net = lpips_torch.LPIPS(net='vgg')

  out = extract_params(vgg, net.lins)
  np.savez(args.out, **out)
  print(f'wrote {args.out} with {len(out)} arrays')


if __name__ == '__main__':
  main()
