from swin_v2_weather_tpu.data.era5 import Era5Dataset
from swin_v2_weather_tpu.data.pipeline import ThreadedLoader, device_prefetch, get_data_loader
from swin_v2_weather_tpu.data.synthetic import SyntheticDataset

__all__ = [
    "Era5Dataset",
    "SyntheticDataset",
    "ThreadedLoader",
    "device_prefetch",
    "get_data_loader",
]
