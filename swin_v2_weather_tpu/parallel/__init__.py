from swin_v2_weather_tpu.parallel.mesh import (
    batch_sharding,
    init_distributed,
    make_mesh,
    replicated_sharding,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "init_distributed"]
