"""Device mesh + sharding rules (SPMD over data/model axes)."""

from vlpet_tpu.parallel.mesh import (
    MeshConfig,
    build_mesh,
    batch_sharding,
    param_shardings,
    replicated,
)
