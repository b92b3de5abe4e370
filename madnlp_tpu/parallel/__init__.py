from .mesh import (  # noqa: F401
    batch_sharding,
    hybrid_mesh,
    init_distributed,
    scenario_sharding,
)
