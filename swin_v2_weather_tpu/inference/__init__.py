from swin_v2_weather_tpu.inference.registry import (
    export_model,
    load_model,
    swin_from_yaml,
)
from swin_v2_weather_tpu.inference.export import export_stepper, load_stepper
from swin_v2_weather_tpu.inference.rollout import RolloutEngine
from swin_v2_weather_tpu.inference.scoring import (
    acc_against_climatology,
    score_rollout,
)

__all__ = [
    "RolloutEngine",
    "export_stepper",
    "load_stepper",
    "export_model",
    "load_model",
    "swin_from_yaml",
    "acc_against_climatology",
    "score_rollout",
]
