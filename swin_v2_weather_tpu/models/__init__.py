from swin_v2_weather_tpu.models.swin import (
    SwinTransformerV2,
    build_swin_from_params,
    window_partition,
    window_reverse,
)
from swin_v2_weather_tpu.models.wrappers import (
    MultiStepWrapper,
    SingleStepWrapper,
    get_model,
)

__all__ = [
    "SwinTransformerV2",
    "build_swin_from_params",
    "window_partition",
    "window_reverse",
    "SingleStepWrapper",
    "MultiStepWrapper",
    "get_model",
]
