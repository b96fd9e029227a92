from swin_v2_weather_tpu.data.native.reader import (
    NativeEra5Reader,
    native_available,
)

__all__ = ["NativeEra5Reader", "native_available"]
