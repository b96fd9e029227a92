from swin_v2_weather_tpu.config.yparams import YParams, default_config_path

__all__ = ["YParams", "default_config_path"]
