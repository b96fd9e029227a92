"""Real spherical harmonic transform (SHT) in matmul form.

Replaces the reference's dependency on ``torch_harmonics.RealSHT``
(used by the GeometricH1Loss, reference ``utils/losses.py:27-28,266``) with a
TPU-native formulation: an rFFT over longitude followed by a per-order
Legendre transform expressed as an einsum against a precomputed associated
Legendre matrix — batched matmuls that map directly onto the MXU, instead of
the reference's custom CUDA contraction kernels.

Conventions (matching torch_harmonics defaults used by the reference):
  - grid='equiangular': latitude nodes cos(theta_j), theta_j = pi*j/(nlat-1)
    (poles included), quadrature via Clenshaw-Curtis weights;
  - grid='legendre-gauss': Gauss-Legendre nodes/weights;
  - lmax = nlat, mmax = nlon // 2 + 1;
  - orthonormal spherical harmonics with Condon-Shortley phase, so Parseval
    holds as |f|^2_{S2} = sum_l |f_hat[l,0]|^2 + 2 sum_{m>0} |f_hat[l,m]|^2
    (the exact identity the H1 loss exploits, ``utils/losses.py:276-279``).

The Legendre matrix is computed once on the host in float64 via the standard
stable three-term recursion and cached per (nlat, lmax, mmax, grid).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from swin_v2_weather_tpu.ops.quadrature import (
    clenshaw_curtiss_weights,
    legendre_gauss_weights,
)


def legendre_matrix(nlat: int, lmax: int, mmax: int, grid: str = "equiangular") -> Tuple[np.ndarray, np.ndarray]:
    """Orthonormal associated Legendre values Pbar_l^m(cos theta_j).

    Returns (pct [nlat, lmax, mmax] float64, weights [nlat] float64).
    Entries with l < m are zero.
    """
    if grid == "equiangular":
        theta = np.pi * np.arange(nlat) / (nlat - 1)
        x = np.cos(theta)
        _, w_asc = clenshaw_curtiss_weights(nlat, -1, 1)
        # weights for ascending nodes; x here is descending -> reverse
        w = w_asc[::-1].copy()
    elif grid == "legendre-gauss":
        nodes, w_asc = legendre_gauss_weights(nlat, -1, 1)
        # torch ordering: colatitude ascending => cos(theta) descending
        x = nodes[::-1].copy()
        w = w_asc[::-1].copy()
    else:
        raise ValueError(f"unknown grid {grid}")

    sint = np.sqrt(np.clip(1.0 - x * x, 0.0, None))
    pct = np.zeros((nlat, lmax, mmax), dtype=np.float64)

    mmax_eff = min(mmax, lmax)
    # diagonal terms Pbar_m^m via recursion (Condon-Shortley phase)
    pmm = np.full(nlat, np.sqrt(1.0 / (4.0 * np.pi)))
    for m in range(mmax_eff):
        if m > 0:
            pmm = -np.sqrt((2.0 * m + 1.0) / (2.0 * m)) * sint * pmm
        pct[:, m, m] = pmm
        if m + 1 < lmax:
            pct[:, m + 1, m] = np.sqrt(2.0 * m + 3.0) * x * pmm
        for l in range(m + 2, lmax):
            a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = np.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0))
            pct[:, l, m] = a * (x * pct[:, l - 1, m] - b * pct[:, l - 2, m])
    return pct, w


@functools.lru_cache(maxsize=8)
def _cached_legendre(nlat: int, lmax: int, mmax: int, grid: str):
    pct, w = legendre_matrix(nlat, lmax, mmax, grid)
    return pct, w


class RealSHT:
    """Forward real SHT: [..., nlat, nlon] -> complex [..., lmax, mmax].

    Drop-in for the reference's ``harmonics.RealSHT(nlat, nlon,
    grid='equiangular')`` forward call (``utils/losses.py:266,275``).
    """

    def __init__(
        self,
        nlat: int,
        nlon: int,
        lmax: Optional[int] = None,
        mmax: Optional[int] = None,
        grid: str = "equiangular",
        dtype=jnp.float32,
    ):
        self.nlat = nlat
        self.nlon = nlon
        self.lmax = lmax or nlat
        self.mmax = mmax or (nlon // 2 + 1)
        self.grid = grid
        pct, w = _cached_legendre(nlat, self.lmax, self.mmax, grid)
        # fold quadrature weights and the 2*pi/nlon longitude measure into
        # the Legendre matrix so the transform is a single contraction
        self.weighted_pct = jnp.asarray(
            pct * (w[:, None, None] * (2.0 * np.pi / nlon)), dtype=dtype
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # rfft over longitude (unnormalized sums, the 2*pi/nlon measure is in
        # weighted_pct); complex64 coefficients
        f = jnp.fft.rfft(x, axis=-1)[..., : self.mmax]
        # per-order Legendre transform: contract over latitude j
        re = jnp.einsum("...jm,jlm->...lm", f.real.astype(self.weighted_pct.dtype), self.weighted_pct)
        im = jnp.einsum("...jm,jlm->...lm", f.imag.astype(self.weighted_pct.dtype), self.weighted_pct)
        return jax.lax.complex(re, im)


class InverseRealSHT:
    """Inverse real SHT: complex [..., lmax, mmax] -> [..., nlat, nlon]."""

    def __init__(
        self,
        nlat: int,
        nlon: int,
        lmax: Optional[int] = None,
        mmax: Optional[int] = None,
        grid: str = "equiangular",
        dtype=jnp.float32,
    ):
        self.nlat = nlat
        self.nlon = nlon
        self.lmax = lmax or nlat
        self.mmax = mmax or (nlon // 2 + 1)
        pct, _ = _cached_legendre(nlat, self.lmax, self.mmax, grid)
        self.pct = jnp.asarray(pct, dtype=dtype)

    def __call__(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        # synthesize per-order latitude profiles, then inverse rfft with
        # "backward"-compatible scaling: irfft expects unnormalized sums
        re = jnp.einsum("...lm,jlm->...jm", coeffs.real.astype(self.pct.dtype), self.pct)
        im = jnp.einsum("...lm,jlm->...jm", coeffs.imag.astype(self.pct.dtype), self.pct)
        f = jax.lax.complex(re, im)
        # pad orders up to nlon//2+1 if truncated
        full_m = self.nlon // 2 + 1
        if self.mmax < full_m:
            pad = [(0, 0)] * (f.ndim - 1) + [(0, full_m - self.mmax)]
            f = jnp.pad(f, pad)
        return jnp.fft.irfft(f, n=self.nlon, axis=-1) * self.nlon
