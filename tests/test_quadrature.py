"""Unit tests for sphere quadrature against fp64 analytic oracles."""

import numpy as np
import pytest

from swin_v2_weather_tpu.ops.quadrature import (
    GridConverter,
    GridQuadrature,
    clenshaw_curtiss_weights,
    legendre_gauss_weights,
    quadrature_weights,
)


class TestClenshawCurtiss:
    def test_sums_to_interval_length(self):
        for n in (2, 9, 16, 721):
            _, w = clenshaw_curtiss_weights(n, -1, 1)
            assert abs(w.sum() - 2.0) < 1e-12

    def test_integrates_polynomials_exactly(self):
        # CC with n nodes is exact for polynomials of degree <= n-1
        n = 9
        nodes, w = clenshaw_curtiss_weights(n, -1, 1)
        for deg in range(n):
            exact = (1 - (-1) ** (deg + 1)) / (deg + 1)  # int_{-1}^{1} x^deg
            approx = np.sum(w * nodes**deg)
            assert abs(approx - exact) < 1e-12, f"degree {deg}"

    def test_nodes_are_equiangular(self):
        n = 13
        nodes, _ = clenshaw_curtiss_weights(n, -1, 1)
        expected = np.sort(np.cos(np.pi * np.arange(n) / (n - 1)))
        np.testing.assert_allclose(nodes, expected, atol=1e-14)

    def test_interval_mapping(self):
        nodes, w = clenshaw_curtiss_weights(17, 0, 3)
        assert abs(w.sum() - 3.0) < 1e-12
        assert nodes.min() >= -1e-14 and nodes.max() <= 3 + 1e-14


class TestLegendreGauss:
    def test_integrates_high_degree(self):
        # LG with n nodes exact to degree 2n-1
        n = 8
        nodes, w = legendre_gauss_weights(n, -1, 1)
        for deg in range(2 * n):
            exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
            assert abs(np.sum(w * nodes**deg) - exact) < 1e-12, f"degree {deg}"


class TestGridQuadrature:
    def test_naive_weights_sum_to_4pi(self):
        w = quadrature_weights("naive", (73, 144))
        assert abs(w.sum() - 4 * np.pi) < 1e-10

    def test_normalized_integral_of_one(self):
        for rule in ("naive", "clenshaw-curtiss", "legendre-gauss"):
            q = GridQuadrature(rule, (36, 72), normalize=True)
            ones = np.ones((1, 1, 36, 72), dtype=np.float32)
            val = np.asarray(q(ones))
            # naive is renormalized exactly; CC/LG weights sum to 2 -> 4pi
            assert abs(val.item() - 1.0) < 1e-5, rule

    def test_naive_matches_reference_formula(self):
        # replicate utils/grids.py:68-76 independently in fp64
        h, w = 19, 37
        jac = np.clip(np.sin(np.linspace(0, np.pi, h)), 0, None)
        qw = (2 * np.pi / w) * (np.pi / h) * np.tile(jac[:, None], (1, w))
        qw = qw * 4 * np.pi / qw.sum()
        np.testing.assert_allclose(quadrature_weights("naive", (h, w)), qw, rtol=1e-12)

    def test_pole_mask(self):
        w = quadrature_weights("clenshaw-curtiss", (10, 20), pole_mask=2)
        assert (w[:2] == 0).all() and (w[-2:] == 0).all()
        assert (w[2:-2] != 0).all()

    def test_crop(self):
        full = quadrature_weights("naive", (10, 20))
        crop = quadrature_weights("naive", (10, 20), crop_shape=(8, 20), crop_offset=(0, 0))
        np.testing.assert_allclose(crop, full[:8], rtol=0)

    def test_smooth_function_integral(self):
        # integrate f = cos(colat)^2 over the sphere: exact 4*pi/3; each rule
        # integrates fields sampled at its own latitude nodes
        h, w = 181, 360
        # tolerances bounded by float32 accumulation, not the rules themselves
        for rule, tol in (("naive", 1e-3), ("clenshaw-curtiss", 1e-5), ("legendre-gauss", 1e-5)):
            if rule == "legendre-gauss":
                nodes, _ = legendre_gauss_weights(h, -1, 1)
                cost = nodes[::-1]  # descending cos(theta) = ascending theta
            else:
                cost = np.cos(np.linspace(0, np.pi, h))
            f = np.tile((cost**2)[:, None], (1, w))[None, None]
            q = GridQuadrature(rule, (h, w))
            val = np.asarray(q(f.astype(np.float32))).item()
            assert abs(val - 4 * np.pi / 3) / (4 * np.pi / 3) < tol, rule


class TestGridConverter:
    def test_identity_when_same_grid(self):
        lat = np.deg2rad(np.linspace(90, -90, 19))
        lon = np.deg2rad(np.arange(0, 360, 10.0))
        conv = GridConverter("equiangular", "equiangular", lat, lon)
        x = np.random.default_rng(0).normal(size=(2, 19, 36)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(conv(x)), x)

    def test_linear_field_interpolates_exactly(self):
        # a field linear in latitude should interpolate with no error
        n = 91
        lat = np.deg2rad(np.linspace(90, -90, n))
        lon = np.deg2rad(np.arange(0, 360, 10.0))
        conv = GridConverter("equiangular", "legendre-gauss", lat, lon)
        field = np.tile(lat[:, None], (1, 36)).astype(np.float64)[None]
        out = np.asarray(conv(field))
        dst_lat, _ = conv.get_dst_coords()
        np.testing.assert_allclose(out[0, :, 0], dst_lat, atol=1e-6)
