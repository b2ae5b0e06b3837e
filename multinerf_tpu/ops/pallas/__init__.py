"""Pallas TPU kernels for the hot paths, each with a jnp reference twin."""
