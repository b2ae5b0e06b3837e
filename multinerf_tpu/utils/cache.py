"""Persistent XLA compilation cache setup.

TPU compiles of the full train step take minutes (and go through a remote
compile service on some deployments); caching them on disk makes restarts
and eval/render launches near-instant.  Opt out with
MULTINERF_NO_COMPILE_CACHE=1 or override the location with
JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os

import jax


def enable_persistent_compilation_cache():
  if os.environ.get('MULTINERF_NO_COMPILE_CACHE') == '1':
    return
  cache_dir = os.environ.get(
      'JAX_COMPILATION_CACHE_DIR',
      os.path.join(os.path.expanduser('~'), '.cache', 'multinerf_tpu_xla'))
  os.makedirs(cache_dir, exist_ok=True)
  jax.config.update('jax_compilation_cache_dir', cache_dir)
  jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
