"""Latitude-weighted forecast verification metrics.

Behavioral equivalent of the reference ``utils/weighted_acc_rmse.py``: the
latitude weight at row j of an H-row grid is

    w_j = H * cos(lat_j) / sum_i cos(lat_i),   lat_j = 90 - j * 180 / (H - 1)

(reference ``utils/weighted_acc_rmse.py:4-5,33-34,52-57``). The reference's
torch twins use the literal constant ``3.1416`` for pi
(``utils/weighted_acc_rmse.py:57,66``); the JAX functions here reproduce that
constant bit-for-bit so validation curves are comparable, while the
numpy-oracle helpers use ``np.pi`` like the reference's numpy functions.

All JAX functions are pure and jittable; reductions are done in the input
dtype (callers keep metrics in fp32, as the reference computes all metrics
post-autocast in fp32, ``train.py:308-313``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# the reference's torch twins hard-code 3.1416 for pi; keep it for parity
_TORCH_PI = 3.1416


def lat_np(j: np.ndarray, num_lat: int) -> np.ndarray:
    """Latitude in degrees of row j (0 = north pole row)."""
    return 90.0 - j * 180.0 / (num_lat - 1)


def latitude_weights(num_lat: int, dtype=jnp.float32) -> jnp.ndarray:
    """[H] latitude weights, matching the reference torch twins (3.1416-pi)."""
    j = np.arange(num_lat, dtype=np.float64)
    coslat = np.cos(_TORCH_PI / 180.0 * lat_np(j, num_lat))
    s = np.sum(coslat)
    return jnp.asarray(num_lat * coslat / s, dtype=dtype)


def latitude_weights_np(num_lat: int) -> np.ndarray:
    """[H] latitude weights with true pi (reference numpy functions)."""
    j = np.arange(num_lat, dtype=np.float64)
    coslat = np.cos(np.pi / 180.0 * lat_np(j, num_lat))
    return num_lat * coslat / np.sum(coslat)


def weighted_rmse_channels(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """[N, C, H, W] -> [N, C] latitude-weighted RMSE per channel.

    Reference: ``utils/weighted_acc_rmse.py:59-69``.
    """
    num_lat = pred.shape[-2]
    weight = latitude_weights(num_lat, dtype=pred.dtype).reshape(1, 1, -1, 1)
    return jnp.sqrt(jnp.mean(weight * (pred - target) ** 2, axis=(-1, -2)))


def weighted_rmse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """[N, C, H, W] -> [C]: per-channel RMSE averaged over the batch.

    Reference: ``utils/weighted_acc_rmse.py:83-86``.
    """
    return jnp.mean(weighted_rmse_channels(pred, target), axis=0)


def weighted_acc_channels(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """[N, C, H, W] -> [N, C] latitude-weighted (uncentered) anomaly correlation.

    Reference: ``utils/weighted_acc_rmse.py:89-99``. Anomalies (climatology
    subtraction) are the caller's responsibility, as in the reference.
    """
    num_lat = pred.shape[-2]
    weight = latitude_weights(num_lat, dtype=pred.dtype).reshape(1, 1, -1, 1)
    num = jnp.sum(weight * pred * target, axis=(-1, -2))
    den = jnp.sqrt(
        jnp.sum(weight * pred * pred, axis=(-1, -2))
        * jnp.sum(weight * target * target, axis=(-1, -2))
    )
    return num / den


def weighted_acc(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """[N, C, H, W] -> [C]: per-channel ACC averaged over the batch."""
    return jnp.mean(weighted_acc_channels(pred, target), axis=0)


def unweighted_acc_channels(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Reference: ``utils/weighted_acc_rmse.py:106-110``."""
    num = jnp.sum(pred * target, axis=(-1, -2))
    den = jnp.sqrt(
        jnp.sum(pred * pred, axis=(-1, -2)) * jnp.sum(target * target, axis=(-1, -2))
    )
    return num / den


def top_quantiles_error(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """[N, C, H, W] -> [C] mean error of the top quantiles (extremes skill).

    Reference: ``utils/weighted_acc_rmse.py:117-126`` (torch variant: 100
    log-spaced quantiles in [1 - 1e-3, 1 - 10^-0.1]).
    """
    n, c, h, w = pred.shape
    qtile = 1.0 - jnp.logspace(-3, -0.1, num=100, dtype=pred.dtype)
    p_tar = jnp.quantile(target.reshape(n, c, h * w), qtile, axis=-1)  # [Q, N, C]
    p_pred = jnp.quantile(pred.reshape(n, c, h * w), qtile, axis=-1)
    return jnp.mean(jnp.mean(p_pred - p_tar, axis=0), axis=0)


# ---------------------------------------------------------------------------
# probabilistic (ensemble) verification — beyond the reference, which scores
# deterministic forecasts only (its ensemble role lives in the external
# Earth2MIP fork, reference README.md:77-78). Used by inference/ensemble.py.
# ---------------------------------------------------------------------------


def weighted_crps_channels(
    ensemble: jnp.ndarray, target: jnp.ndarray, fair: bool = True
) -> jnp.ndarray:
    """[M, N, C, H, W] ensemble + [N, C, H, W] target -> [N, C] CRPS.

    Pointwise continuous ranked probability score of the empirical ensemble
    distribution, then latitude-weighted spatial mean (same 3.1416-pi weights
    as the deterministic metrics):

        CRPS = E|X - y| - 1/2 E|X - X'|

    The dispersion term uses the sorted-member identity
    ``sum_{m<m'} (x_(m') - x_(m)) = sum_i (2i - M + 1) x_(i)`` — O(M log M)
    instead of the O(M^2) pairwise form, so it stays cheap on device for
    full-resolution fields. ``fair=True`` divides by M*(M-1) (the
    finite-ensemble-unbiased estimator, Ferro 2014); ``fair=False`` divides
    by M^2 (the classic PWM estimator). A single-member ensemble degrades to
    the latitude-weighted MAE under both.
    """
    m = ensemble.shape[0]
    num_lat = ensemble.shape[-2]
    weight = latitude_weights(num_lat, dtype=ensemble.dtype).reshape(1, 1, -1, 1)
    mae = jnp.mean(jnp.abs(ensemble - target[None]), axis=0)  # [N, C, H, W]
    if m > 1:
        srt = jnp.sort(ensemble, axis=0)
        coef = (2.0 * jnp.arange(m, dtype=ensemble.dtype) - m + 1).reshape(
            (m,) + (1,) * (ensemble.ndim - 1)
        )
        denom = m * (m - 1) if fair else m * m
        disp = jnp.sum(coef * srt, axis=0) / denom  # = E|X - X'| / 2
        pointwise = mae - disp
    else:
        pointwise = mae
    return jnp.mean(weight * pointwise, axis=(-1, -2))


def weighted_crps(ensemble: jnp.ndarray, target: jnp.ndarray, fair: bool = True) -> jnp.ndarray:
    """[M, N, C, H, W] + [N, C, H, W] -> [C]: CRPS averaged over the batch."""
    return jnp.mean(weighted_crps_channels(ensemble, target, fair=fair), axis=0)


def ensemble_spread_channels(ensemble: jnp.ndarray) -> jnp.ndarray:
    """[M, N, C, H, W] -> [N, C] spread = sqrt(lat-weighted mean member variance).

    Member variance uses ddof=1 (the unbiased estimator customary in
    spread-error diagnostics, where spread should match the RMSE of the
    ensemble mean for a reliable ensemble).
    """
    m = ensemble.shape[0]
    num_lat = ensemble.shape[-2]
    weight = latitude_weights(num_lat, dtype=ensemble.dtype).reshape(1, 1, -1, 1)
    var = jnp.var(ensemble, axis=0, ddof=1) if m > 1 else jnp.zeros(ensemble.shape[1:], ensemble.dtype)
    return jnp.sqrt(jnp.mean(weight * var, axis=(-1, -2)))


def ensemble_spread(ensemble: jnp.ndarray) -> jnp.ndarray:
    """[M, N, C, H, W] -> [C]: spread averaged over the batch."""
    return jnp.mean(ensemble_spread_channels(ensemble), axis=0)


def weighted_crps_np(ensemble: np.ndarray, target: np.ndarray, fair: bool = True) -> np.ndarray:
    """fp64 brute-force pairwise oracle of ``weighted_crps`` ([M,N,C,H,W] -> [C])."""
    ensemble = np.asarray(ensemble, np.float64)
    target = np.asarray(target, np.float64)
    m = ensemble.shape[0]
    num_lat = ensemble.shape[-2]
    j = np.arange(num_lat, dtype=np.float64)
    coslat = np.cos(_TORCH_PI / 180.0 * lat_np(j, num_lat))
    weight = (num_lat * coslat / coslat.sum()).reshape(1, 1, -1, 1)
    mae = np.mean(np.abs(ensemble - target[None]), axis=0)
    disp = np.zeros_like(mae)
    if m > 1:
        for a in range(m):
            for b in range(m):
                disp += np.abs(ensemble[a] - ensemble[b])
        disp /= 2.0 * (m * (m - 1) if fair else m * m)
    return np.mean(np.mean(weight * (mae - disp), axis=(-1, -2)), axis=0)


# ---------------------------------------------------------------------------
# numpy oracles (reference utils/weighted_acc_rmse.py:7-47) — used by tests
# and offline scoring scripts; true-pi variants.
# ---------------------------------------------------------------------------


def weighted_rmse_np(pred: np.ndarray, target: np.ndarray) -> float:
    """Single-field [H, W] or [1, H, W] lat-weighted RMSE (numpy oracle)."""
    if pred.ndim == 2:
        pred = pred[None]
    if target.ndim == 2:
        target = target[None]
    num_lat, num_lon = pred.shape[1], pred.shape[2]
    weight = latitude_weights_np(num_lat)[:, None]
    return float(np.sqrt(np.mean(weight * (pred[0] - target[0]) ** 2)))


def weighted_acc_np(pred: np.ndarray, target: np.ndarray, weighted: bool = True) -> float:
    """Single-field lat-weighted pattern correlation (numpy oracle)."""
    if pred.ndim == 2:
        pred = pred[None]
    if target.ndim == 2:
        target = target[None]
    num_lat = pred.shape[1]
    weight = latitude_weights_np(num_lat)[:, None] if weighted else 1.0
    return float(
        (weight * pred * target).sum()
        / np.sqrt((weight * pred * pred).sum() * (weight * target * target).sum())
    )


def top_quantiles_error_np(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
    """[N, C, H, W] -> [C] numpy oracle of the torch top-quantile error
    (reference ``utils/weighted_acc_rmse.py:117-126``: 100 log-spaced
    quantiles in [1 - 1e-3, 1 - 10^-0.1], linear interpolation).

    The reference's own *numpy* variant (``:36-47``) uses a deeper tail
    (qlim=5) over single-channel fields; this oracle mirrors the torch
    variant our jitted ``top_quantiles_error`` implements, batch-averaged.
    """
    n, c, h, w = pred.shape
    qtile = 1.0 - np.logspace(-3, -0.1, num=100)
    p_tar = np.quantile(target.reshape(n, c, h * w), qtile, axis=-1)  # [Q, N, C]
    p_pred = np.quantile(pred.reshape(n, c, h * w), qtile, axis=-1)
    return np.mean(np.mean(p_pred - p_tar, axis=0), axis=0)
