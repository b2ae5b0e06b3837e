"""Device mesh and sharding utilities (jit + GSPMD SPMD, not pmap)."""

from multinerf_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    replicated,
    shard_batch_to_global,
    infer_param_shardings,
    process_local_slice,
)
