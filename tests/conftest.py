"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding/collective
tests run against XLA's host-platform device emulation instead.  These env
vars must be set before jax (or anything importing it) loads.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
xla_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in xla_flags:
  os.environ['XLA_FLAGS'] = (
      xla_flags + ' --xla_force_host_platform_device_count=8').strip()
