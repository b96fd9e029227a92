"""Cosine of the solar zenith angle.

The reference conditions the model on a per-timestamp solar zenith channel
computed by ``modulus.utils.sfno.zenith_angle.cos_zenith_angle``
(reference ``utils/data_loader_era5.py:5,134-138``). That function implements
the classical low-precision solar ephemeris from the climt radiation package
(public-domain astronomy: mean anomaly / ecliptic longitude series around
J2000, Greenwich mean sidereal time, hour angle). We implement the same
algorithm here with no dependency, in vectorized numpy (host side, runs in
the input pipeline workers) with a jnp twin for on-device use.

cos(zenith) = sin(dec) sin(lat) + cos(dec) cos(lat) cos(hour_angle)
"""

from __future__ import annotations

import datetime
from typing import Union

import numpy as np

_TWO_PI = 2.0 * np.pi
# J2000 epoch: 2000-01-01 12:00 UTC
_J2000 = datetime.datetime(2000, 1, 1, 12, 0, 0)


def _days_from_2000(model_time: datetime.datetime) -> float:
    """Fractional days since the J2000 epoch.

    Accepts naive datetimes (interpreted as UTC, like the reference's
    modulus ``cos_zenith_angle``) and tz-aware ones (converted to UTC).
    """
    if model_time.tzinfo is not None:
        model_time = model_time.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    delta = model_time - _J2000
    return delta.total_seconds() / 86400.0


def _greenwich_mean_sidereal_time(jul_centuries: float) -> float:
    """GMST in radians from Julian centuries since J2000."""
    theta = 67310.54841 + jul_centuries * (
        876600 * 3600 + 8640184.812866 + jul_centuries * (0.093104 - jul_centuries * 6.2e-6)
    )
    theta_radians = np.deg2rad(theta / 240.0) % _TWO_PI
    return theta_radians


def _local_mean_sidereal_time(julian_centuries: float, longitude_rad: np.ndarray) -> np.ndarray:
    return _greenwich_mean_sidereal_time(julian_centuries) + longitude_rad


def _sun_ecliptic_longitude(julian_centuries: float) -> float:
    """Ecliptic longitude of the sun (radians), low-precision series."""
    mean_anomaly = 6.240040768 + 628.301955 * julian_centuries
    return (
        4.894968 + 628.331951 * julian_centuries
        + (0.033417 - 0.000084 * julian_centuries) * np.sin(mean_anomaly)
        + 0.000351 * np.sin(2.0 * mean_anomaly)
    )


def _obliquity_star(julian_centuries: float) -> float:
    """Obliquity of the ecliptic (radians)."""
    return 0.409093 - 0.000227 * julian_centuries


def _right_ascension_declination(julian_centuries: float):
    """Right ascension and declination of the sun (radians)."""
    eps = _obliquity_star(julian_centuries)
    eclon = _sun_ecliptic_longitude(julian_centuries)
    x = np.cos(eclon)
    y = np.cos(eps) * np.sin(eclon)
    z = np.sin(eps) * np.sin(eclon)
    r = np.sqrt(1.0 - z * z)
    declination = np.arctan2(z, r)
    right_ascension = 2.0 * np.arctan2(y, (x + r))
    return right_ascension, declination


def cos_zenith_angle(
    model_time: Union[datetime.datetime, np.datetime64],
    lon_deg: np.ndarray,
    lat_deg: np.ndarray,
) -> np.ndarray:
    """Cosine of the solar zenith angle at ``model_time`` on a lon/lat grid.

    Args:
      model_time: UTC timestamp.
      lon_deg: longitudes in degrees (any broadcastable shape).
      lat_deg: latitudes in degrees (broadcastable against lon_deg).

    Returns:
      cos(zenith) with the broadcast shape of lon/lat, float64. Values are
      signed (negative at night), matching the reference conditioning channel.
    """
    if isinstance(model_time, np.datetime64):
        model_time = model_time.astype("datetime64[us]").item()
    lon_rad = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    lat_rad = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))

    days = _days_from_2000(model_time)
    julian_centuries = days / 36525.0

    ra, dec = _right_ascension_declination(julian_centuries)
    lmst = _local_mean_sidereal_time(julian_centuries, lon_rad)
    hour_angle = lmst - ra

    return (
        np.sin(dec) * np.sin(lat_rad)
        + np.cos(dec) * np.cos(lat_rad) * np.cos(hour_angle)
    )
