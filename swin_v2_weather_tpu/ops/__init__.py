from swin_v2_weather_tpu.ops.quadrature import (
    GridQuadrature,
    clenshaw_curtiss_weights,
    legendre_gauss_weights,
    quadrature_weights,
)
from swin_v2_weather_tpu.ops.metrics import (
    latitude_weights,
    weighted_acc,
    weighted_rmse,
    weighted_rmse_channels,
    weighted_acc_channels,
    unweighted_acc_channels,
    top_quantiles_error,
    weighted_crps,
    weighted_crps_channels,
    ensemble_spread,
    ensemble_spread_channels,
)
from swin_v2_weather_tpu.ops.zenith import cos_zenith_angle
from swin_v2_weather_tpu.ops.losses import LossHandler, auto_channel_weights
from swin_v2_weather_tpu.ops.window_attention import (
    fused_window_attention,
    fused_window_attention_grid,
)

__all__ = [
    "GridQuadrature",
    "clenshaw_curtiss_weights",
    "legendre_gauss_weights",
    "quadrature_weights",
    "latitude_weights",
    "weighted_acc",
    "weighted_rmse",
    "weighted_rmse_channels",
    "weighted_acc_channels",
    "unweighted_acc_channels",
    "top_quantiles_error",
    "weighted_crps",
    "weighted_crps_channels",
    "ensemble_spread",
    "ensemble_spread_channels",
    "cos_zenith_angle",
    "LossHandler",
    "auto_channel_weights",
]
