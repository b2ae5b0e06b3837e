"""Run a CLI driver (train/eval/render.py) forced onto the CPU platform.

The container pre-registers a TPU plugin and pins JAX_PLATFORMS at import
time, so a plain env override does not reach subprocesses; like
mp_worker.py, update the live jax config first, then hand off to the real
driver under runpy so its ``__main__`` block executes unmodified.

Usage: python cli_runner.py <driver.py> [driver args...]
"""

import sys

import jax

jax.config.update('jax_platforms', 'cpu')

script = sys.argv.pop(1)
sys.argv[0] = script
import runpy
runpy.run_path(script, run_name='__main__')
