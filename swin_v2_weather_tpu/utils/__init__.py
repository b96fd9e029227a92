from swin_v2_weather_tpu.utils.logging_utils import (
    config_logger,
    log_to_file,
    log_versions,
)
from swin_v2_weather_tpu.utils.metrics_sink import MetricsSink

__all__ = ["config_logger", "log_to_file", "log_versions", "MetricsSink"]
