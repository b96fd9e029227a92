"""swin_v2_weather_tpu — TPU-native global weather forecasting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
NERSC/swin_v2_weather (arXiv:2404.19630): a SwinV2 transformer with
shifted-window cosine attention over the 0.25-degree ERA5 grid, trained
autoregressively for 6-hourly global forecasting.

Subpackages
-----------
config     YAML configuration system (reference: utils/YParams.py, config/swin.yaml)
ops        numerics substrate: sphere quadrature, metrics, losses, SHT, zenith angle,
           fused Pallas window attention
models     the SwinV2 model family in Flax (reference: networks/swinv2_global.py)
data       sharded ERA5 HDF5 input pipeline (reference: utils/data_loader_era5*.py)
parallel   device mesh + sharded train step (replaces torch DDP/NCCL)
training   trainer, optimizers, checkpointing (reference: train.py)
inference  jit-compiled autoregressive rollout + ACC/RMSE scoring (replaces
           the external Earth2MIP fork, reference README.md:77-78)
"""

__version__ = "0.1.0"

# Lazy top-level re-exports: `from swin_v2_weather_tpu import YParams` works
# without importing jax (and its device bootstrap) at package-import time.
_LAZY = {
    "YParams": ("swin_v2_weather_tpu.config.yparams", "YParams"),
    "default_config_path": ("swin_v2_weather_tpu.config.yparams", "default_config_path"),
    "get_model": ("swin_v2_weather_tpu.models.wrappers", "get_model"),
    "SwinTransformerV2": ("swin_v2_weather_tpu.models.swin", "SwinTransformerV2"),
    "Trainer": ("swin_v2_weather_tpu.training.trainer", "Trainer"),
    "RolloutEngine": ("swin_v2_weather_tpu.inference.rollout", "RolloutEngine"),
    "export_model": ("swin_v2_weather_tpu.inference.registry", "export_model"),
    "load_model": ("swin_v2_weather_tpu.inference.registry", "load_model"),
}

__all__ = sorted(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
