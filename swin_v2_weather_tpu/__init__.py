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
