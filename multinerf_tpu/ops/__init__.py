"""Numerics core: pure functions on jnp arrays plus Pallas TPU kernels."""
