"""SHT tests: orthonormality, delta property on spherical harmonics,
Parseval identity, and roundtrip."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import sph_harm_y

from swin_v2_weather_tpu.ops.sht import InverseRealSHT, RealSHT, legendre_matrix


def _grid(nlat, nlon, grid="equiangular"):
    if grid == "equiangular":
        theta = np.pi * np.arange(nlat) / (nlat - 1)
    else:
        from swin_v2_weather_tpu.ops.quadrature import legendre_gauss_weights

        nodes, _ = legendre_gauss_weights(nlat, -1, 1)
        theta = np.arccos(nodes[::-1])
    phi = 2 * np.pi * np.arange(nlon) / nlon
    return theta, phi


@pytest.mark.parametrize("grid", ["equiangular", "legendre-gauss"])
def test_legendre_matrix_matches_scipy(grid):
    nlat, lmax, mmax = 18, 10, 8
    pct, _ = legendre_matrix(nlat, lmax, mmax, grid)
    theta, _ = _grid(nlat, 4, grid)
    for l in (0, 1, 3, 7):
        for m in range(0, min(l + 1, mmax)):
            # scipy sph_harm_y(l, m, theta, 0) = Pbar_l^m(cos theta)/... the
            # orthonormal Y_lm at phi=0 equals our Pbar scaled by 1
            want = sph_harm_y(l, m, theta, 0.0).real
            np.testing.assert_allclose(pct[:, l, m], want, atol=1e-10, err_msg=f"l={l} m={m}")


@pytest.mark.parametrize("grid", ["equiangular", "legendre-gauss"])
def test_delta_property(grid):
    # SHT of an orthonormal spherical harmonic is a one-hot coefficient
    nlat, nlon = 33, 64
    theta, phi = _grid(nlat, nlon, grid)
    tg, pg = np.meshgrid(theta, phi, indexing="ij")
    sht = RealSHT(nlat, nlon, grid=grid, dtype=jnp.float32)
    # Legendre-Gauss quadrature is exact for these products; equiangular
    # (Clenshaw-Curtis) has inherent aliasing near the band limit
    atol = 2e-5 if grid == "legendre-gauss" else 1e-3
    for l, m in [(0, 0), (2, 1), (5, 3), (10, 0)]:
        y = sph_harm_y(l, m, tg, pg)
        field = np.sqrt(2.0) * y.real if m > 0 else y.real
        coeffs = np.asarray(sht(jnp.asarray(field[None], jnp.float32)))[0]
        # expected coefficient: 1/sqrt(2) in both (its conj) for m>0 real
        # combination; exactly 1 at (l, 0) for m=0
        expected = np.zeros_like(coeffs)
        expected[l, m] = 1.0 / np.sqrt(2.0) if m > 0 else 1.0
        # CC quadrature is exact only up to degree nlat-1, so for the
        # equiangular grid high-degree rows alias (same as torch_harmonics);
        # compare in the alias-free band
        lcut = nlat if grid == "legendre-gauss" else (nlat - 1 - 10)
        np.testing.assert_allclose(coeffs.real[:lcut], expected.real[:lcut], atol=atol)
        # energy at the right mode
        power = np.abs(coeffs) ** 2
        total = power[:, 0].sum() + 2 * power[:, 1:].sum()
        np.testing.assert_allclose(total, 1.0, atol=200 * atol)


def test_parseval_band_limited(rng):
    # random band-limited field: sum of norms == quadrature integral of f^2
    nlat, nlon = 34, 64
    theta, phi = _grid(nlat, nlon, "legendre-gauss")
    tg, pg = np.meshgrid(theta, phi, indexing="ij")
    field = np.zeros((nlat, nlon))
    amps = {}
    for l, m in [(0, 0), (1, 0), (3, 2), (6, 5), (8, 1)]:
        a = rng.normal()
        amps[(l, m)] = a
        y = sph_harm_y(l, m, tg, pg)
        field += a * (np.sqrt(2) * y.real if m > 0 else y.real)
    sht = RealSHT(nlat, nlon, grid="legendre-gauss", dtype=jnp.float32)
    coeffs = np.asarray(sht(jnp.asarray(field[None], jnp.float32)))[0]
    power = np.abs(coeffs) ** 2
    total = power[:, 0].sum() + 2 * power[:, 1:].sum()
    want = sum(a**2 for a in amps.values())
    np.testing.assert_allclose(total, want, rtol=1e-5)


def test_roundtrip_inverse(rng):
    # forward then inverse reproduces a band-limited field
    nlat, nlon = 32, 64
    grid = "legendre-gauss"
    theta, phi = _grid(nlat, nlon, grid)
    tg, pg = np.meshgrid(theta, phi, indexing="ij")
    field = np.zeros((nlat, nlon))
    for l, m in [(1, 1), (4, 0), (7, 3)]:
        y = sph_harm_y(l, m, tg, pg)
        field += rng.normal() * (np.sqrt(2) * y.real if m > 0 else y.real)
    sht = RealSHT(nlat, nlon, grid=grid, dtype=jnp.float32)
    isht = InverseRealSHT(nlat, nlon, grid=grid, dtype=jnp.float32)
    rec = np.asarray(isht(sht(jnp.asarray(field[None], jnp.float32))))[0]
    np.testing.assert_allclose(rec, field, atol=1e-5)
