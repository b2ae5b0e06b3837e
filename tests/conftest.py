"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding/collective
tests run against XLA's host-platform device emulation instead.  These env
vars must be set before jax (or anything importing it) loads.
"""

import os

# Force-override: the environment pre-sets JAX_PLATFORMS to the TPU plugin.
os.environ['JAX_PLATFORMS'] = 'cpu'
xla_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in xla_flags:
  os.environ['XLA_FLAGS'] = (
      xla_flags + ' --xla_force_host_platform_device_count=8').strip()

# pytest's plugin autoload imports jax before this conftest runs, and jax
# snapshots JAX_PLATFORMS at import time — so update the live config too.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
