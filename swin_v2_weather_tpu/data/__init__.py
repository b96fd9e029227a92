from swin_v2_weather_tpu.data.conditioning import (
    get_land_mask,
    get_orography,
    static_features,
)
from swin_v2_weather_tpu.data.era5 import Era5Dataset
from swin_v2_weather_tpu.data.pipeline import ThreadedLoader, device_prefetch, get_data_loader
from swin_v2_weather_tpu.data.preprocess import Preprocessor, derived_channel_counts
from swin_v2_weather_tpu.data.synthetic import SyntheticDataset

__all__ = [
    "Era5Dataset",
    "SyntheticDataset",
    "ThreadedLoader",
    "device_prefetch",
    "get_data_loader",
    "Preprocessor",
    "derived_channel_counts",
    "get_orography",
    "get_land_mask",
    "static_features",
]
