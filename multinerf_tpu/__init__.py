"""multinerf_tpu: a TPU-native NeRF framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
google-research/multinerf (mip-NeRF 360, Ref-NeRF, RawNeRF, RobustNeRF):

* ``ops``      -- numerics core: step functions, coordinate warps, volume
                  rendering, directional encodings, image metrics, and the
                  Pallas TPU kernels that fuse the hot paths.
* ``models``   -- flax model zoo (proposal-MLP hierarchy, Ref-NeRF heads).
* ``data``     -- datasets, cameras, COLMAP/Blender/raw loaders, ray types.
* ``parallel`` -- device mesh / sharding utilities (jit + NamedSharding SPMD
                  instead of the reference's pmap).
* ``utils``    -- host-side IO and visualization.
"""

__version__ = "0.1.0"
