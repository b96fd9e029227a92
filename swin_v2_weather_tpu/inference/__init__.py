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
from swin_v2_weather_tpu.inference.ensemble import (
    breed_perturbations,
    gaussian_perturbations,
    make_members,
    score_ensemble,
)

__all__ = [
    "breed_perturbations",
    "gaussian_perturbations",
    "make_members",
    "score_ensemble",
    "RolloutEngine",
    "export_stepper",
    "load_stepper",
    "export_model",
    "load_model",
    "swin_from_yaml",
    "acc_against_climatology",
    "score_rollout",
]
