from .mesh import (
    MeshPlan,
    make_mesh,
    batch_sharding,
    params_sharding,
    replicated,
    state_sharding,
)

__all__ = [
    "MeshPlan",
    "make_mesh",
    "batch_sharding",
    "params_sharding",
    "replicated",
    "state_sharding",
]
