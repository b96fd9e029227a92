"""Solar zenith angle sanity tests against basic astronomy."""

import datetime

import numpy as np

from swin_v2_weather_tpu.ops.zenith import cos_zenith_angle


def test_equinox_noon_at_equator_overhead():
    # March equinox 2020-03-20 ~03:50 UTC; at local solar noon on the
    # equator the sun is near zenith (cosz ~ 1)
    t = datetime.datetime(2020, 3, 20, 12, 0, 0)
    # local solar noon at lon ~ 0 at 12:00 UTC (equation of time ~ -7 min)
    cz = cos_zenith_angle(t, np.array([0.0]), np.array([0.0]))
    assert cz[0] > 0.99


def test_poles_night_and_day_december():
    t = datetime.datetime(2021, 12, 21, 12, 0, 0)
    cz_north = cos_zenith_angle(t, np.array([0.0]), np.array([89.0]))
    cz_south = cos_zenith_angle(t, np.array([0.0]), np.array([-89.0]))
    assert cz_north[0] < 0  # polar night
    assert cz_south[0] > 0  # midnight sun


def test_antipodal_longitudes_day_night():
    t = datetime.datetime(2020, 6, 1, 12, 0, 0)
    cz = cos_zenith_angle(t, np.array([0.0, 180.0]), np.array([45.0, 45.0]))
    assert cz[0] > 0 and cz[1] < 0


def test_declination_bounds_over_year():
    # max |declination| is ~23.44 deg; subsolar latitude tracks it
    lats = np.linspace(-90, 90, 721)
    lons = np.zeros_like(lats)
    for month, day in [(1, 1), (3, 21), (6, 21), (9, 21), (12, 21)]:
        t = datetime.datetime(2019, month, day, 12, 0, 0)
        cz = cos_zenith_angle(t, lons, lats)
        best_lat = lats[np.argmax(cz)]
        assert abs(best_lat) <= 24.5, (month, day, best_lat)


def test_grid_broadcast_shape():
    lon = np.arange(0, 360, 0.25)
    lat = np.arange(-90, 90.25, 0.25)[::-1]
    lon_g, lat_g = np.meshgrid(lon, lat)
    t = datetime.datetime(2018, 7, 4, 6, 0, 0)
    cz = cos_zenith_angle(t, lon_g, lat_g)
    assert cz.shape == (721, 1440)
    assert cz.min() >= -1.0 - 1e-9 and cz.max() <= 1.0 + 1e-9


def test_diurnal_cycle_period():
    # cosz at a fixed point should be ~24h periodic (within the sun's ~1
    # deg/day drift along the ecliptic)
    lat = np.array([10.0])
    lon = np.array([100.0])
    t0 = datetime.datetime(2020, 2, 10, 0, 0, 0)
    a = cos_zenith_angle(t0, lon, lat)
    b = cos_zenith_angle(t0 + datetime.timedelta(hours=24), lon, lat)
    assert abs(a[0] - b[0]) < 0.03
