"""Quadrature rules on the sphere.

Behavioral equivalent of the reference ``utils/grids.py`` (GridQuadrature /
GridConverter), with the quadrature node/weight generators that the reference
imports from ``torch_harmonics.quadrature`` implemented here from first
principles (Gauss-Legendre via ``numpy.polynomial``, Clenshaw-Curtis via the
classical cosine-sum formula).

All weights are computed once on the host in float64 and baked into jitted
computations as constants; the integration itself (a weighted reduction over
the last two axes) is left to XLA, which fuses it into neighbouring
element-wise work.

Reference parity notes:
  - the 'naive' rule reproduces ``utils/grids.py:68-76`` exactly: a
    sin(colatitude) Jacobian on nodes linspace(0, pi, H) *including both
    endpoints*, renormalized so the weights sum to 4*pi;
  - normalization divides by 4*pi (``utils/grids.py:92-94``);
  - the reference's pole-mask branch references an undefined ``sizes``
    variable (``utils/grids.py:99``, a latent NameError) — implemented
    correctly here using the image shape.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def legendre_gauss_weights(n: int, a: float = -1.0, b: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre nodes and weights on [a, b].

    Returns (cost, w): nodes in ascending order and their weights, matching
    the contract of the generator the reference imports at
    ``utils/grids.py:19``.
    """
    nodes, weights = np.polynomial.legendre.leggauss(n)
    nodes = 0.5 * (b - a) * nodes + 0.5 * (b + a)
    weights = 0.5 * (b - a) * weights
    return nodes.astype(np.float64), weights.astype(np.float64)


def clenshaw_curtiss_weights(n: int, a: float = -1.0, b: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Clenshaw-Curtis nodes and weights on [a, b] (endpoints included).

    Nodes are x_j = cos(pi*j/(n-1)), j = 0..n-1 — the equiangular latitude
    grid — returned in ascending order. Weights use the classical closed
    form; the rule integrates polynomials of degree <= n-1 exactly.
    """
    if n < 2:
        raise ValueError("Clenshaw-Curtis requires n >= 2")
    l = n - 1
    j = np.arange(n)
    theta = np.pi * j / l
    w = np.zeros(n, dtype=np.float64)
    kmax = l // 2
    k = np.arange(1, kmax + 1)
    b_k = np.where(k == l / 2.0, 1.0, 2.0)
    # w_j = (c_j / l) * (1 - sum_k b_k cos(2 k theta_j) / (4k^2 - 1))
    cos_terms = np.cos(2.0 * np.outer(theta, k))  # [n, kmax]
    s = cos_terms @ (b_k / (4.0 * k**2 - 1.0))
    c_j = np.where((j == 0) | (j == l), 1.0, 2.0)
    w = (c_j / l) * (1.0 - s)
    # map to [a, b] and ascending-node order (theta descending in x)
    nodes = np.cos(theta)
    order = np.argsort(nodes)
    nodes = 0.5 * (b - a) * nodes[order] + 0.5 * (b + a)
    w = 0.5 * (b - a) * w[order]
    return nodes, w


def quadrature_weights(
    quadrature_rule: str,
    img_shape: Tuple[int, int],
    crop_shape: Optional[Tuple[int, int]] = None,
    crop_offset: Tuple[int, int] = (0, 0),
    normalize: bool = False,
    pole_mask: Optional[int] = None,
) -> np.ndarray:
    """Per-pixel quadrature weights [H, W] for integrating over the sphere.

    Reference semantics: ``utils/grids.py:62-113``.
    """
    h, w = img_shape
    if quadrature_rule == "naive":
        # sin(colat) on linspace(0, pi, H) incl. endpoints, renormed to 4*pi
        jacobian = np.clip(np.sin(np.linspace(0.0, np.pi, h)), 0.0, None)
        dtheta = np.pi / h
        dlambda = 2.0 * np.pi / w
        quad_weight = (dlambda * dtheta) * jacobian[:, None]
        quad_weight = np.tile(quad_weight, (1, w))
        quad_weight = quad_weight * (4.0 * np.pi) / np.sum(quad_weight)
    elif quadrature_rule == "clenshaw-curtiss":
        _, wlat = clenshaw_curtiss_weights(h, -1, 1)
        dlambda = 2.0 * np.pi / w
        quad_weight = np.tile(dlambda * wlat[:, None], (1, w))
    elif quadrature_rule == "legendre-gauss":
        _, wlat = legendre_gauss_weights(h, -1, 1)
        dlambda = 2.0 * np.pi / w
        quad_weight = np.tile(dlambda * wlat[:, None], (1, w))
    else:
        raise ValueError(f"Unknown quadrature rule {quadrature_rule}")

    if normalize:
        quad_weight = quad_weight / (4.0 * np.pi)

    if pole_mask is not None and pole_mask > 0:
        quad_weight = quad_weight.copy()
        quad_weight[:pole_mask, :] = 0.0
        quad_weight[h - pole_mask :, :] = 0.0

    if crop_shape is not None:
        quad_weight = quad_weight[
            crop_offset[0] : crop_offset[0] + crop_shape[0],
            crop_offset[1] : crop_offset[1] + crop_shape[1],
        ]

    return np.ascontiguousarray(quad_weight)


class GridQuadrature:
    """Integrates fields over the last two (lat, lon) axes.

    A callable holding the precomputed [1, 1, H, W] weight tensor; usable
    inside jit (the weights become a compile-time constant). Reference:
    ``utils/grids.py:62-117``.
    """

    def __init__(
        self,
        quadrature_rule: str,
        img_shape: Tuple[int, int],
        crop_shape: Optional[Tuple[int, int]] = None,
        crop_offset: Tuple[int, int] = (0, 0),
        normalize: bool = False,
        pole_mask: Optional[int] = None,
        dtype=jnp.float32,
    ):
        w = quadrature_weights(
            quadrature_rule, img_shape, crop_shape, crop_offset, normalize, pole_mask
        )
        self.quad_weight = jnp.asarray(w[None, None, :, :], dtype=dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(x * self.quad_weight, axis=(-2, -1))


class GridConverter:
    """Equiangular -> Legendre-Gauss latitude interpolation.

    Used by scoring/grid conversion, not the train path. Reference:
    ``utils/grids.py:21-59``. Latitudes are in radians; ``lat_rad`` is the
    source (descending, north to south, like ERA5) latitude array.
    """

    def __init__(self, src_grid: str, dst_grid: str, lat_rad: np.ndarray, lon_rad: np.ndarray):
        self.src = src_grid
        self.dst = dst_grid
        self.src_lat = np.asarray(lat_rad, dtype=np.float64)
        self.src_lon = np.asarray(lon_rad, dtype=np.float64)

        if self.src != self.dst:
            if self.dst != "legendre-gauss":
                raise NotImplementedError(f"destination grid type {self.dst} not implemented")
            cost_lg, _ = legendre_gauss_weights(self.src_lat.shape[0], -1, 1)
            # colatitude of LG nodes, shifted to latitude in radians
            self.dst_lat = np.arccos(cost_lg) - np.pi / 2.0
            self.dst_lon = self.src_lon
            # source latitudes are descending; find bracketing indices
            asc = self.src_lat[::-1]
            jj = np.searchsorted(asc, self.dst_lat) - 1
            n = self.src_lat.shape[0]
            # translate ascending index back to the descending array
            self.indices = (n - 2 - jj).clip(0, n - 2)
            denom = np.diff(self.src_lat)[self.indices]
            self.interp_weights = ((self.dst_lat - self.src_lat[self.indices]) / denom).reshape(-1, 1)
        else:
            self.dst_lat = self.src_lat
            self.dst_lon = self.src_lon
            self.indices = None
            self.interp_weights = None

    def get_src_coords(self):
        return self.src_lat, self.src_lon

    def get_dst_coords(self):
        return self.dst_lat, self.dst_lon

    def __call__(self, data: jnp.ndarray) -> jnp.ndarray:
        if self.src == self.dst:
            return data
        idx = jnp.asarray(self.indices)
        w = jnp.asarray(self.interp_weights, dtype=data.dtype)
        lo = data[..., idx, :]
        hi = data[..., idx + 1, :]
        return lo + (hi - lo) * w
