"""Forecast scoring: latitude-weighted RMSE and anomaly correlation (ACC).

Replaces the external Earth2MIP scoring pipeline (reference
``README.md:77-78``). ACC follows the standard deterministic-verification
definition the reference's metrics implement
(``utils/weighted_acc_rmse.py:89-104``): latitude-weighted uncentered
pattern correlation of *anomalies* — fields minus a time-mean climatology.
The reference repo ships the climatology as ``time_means.npy``
(``config/swin.yaml`` time_means_path) and subtracts it before calling
``weighted_acc``; we do the same here.

All metric math runs jitted on device in fp32; only per-(step, channel)
scalars return to the host.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from swin_v2_weather_tpu.ops.metrics import weighted_acc, weighted_rmse


@jax.jit
def _score_step(pred, target, clim):
    """pred/target [B, C, H, W] physical units; clim [1, C, H, W]."""
    rmse = weighted_rmse(pred, target)
    acc = weighted_acc(pred - clim, target - clim)
    return rmse, acc


def acc_against_climatology(pred, target, climatology):
    """Latitude-weighted ACC of anomalies wrt a time-mean climatology."""
    clim = jnp.asarray(climatology, jnp.float32)
    return weighted_acc(
        jnp.asarray(pred, jnp.float32) - clim, jnp.asarray(target, jnp.float32) - clim
    )


def score_rollout(
    engine,
    initial_state: np.ndarray,  # [B, C_out, H, W] normalized
    targets: Sequence[np.ndarray],  # iterable of [B, C_out, H, W] normalized
    start_time,
    means: np.ndarray,  # [C_out, 1, 1] denormalization
    stds: np.ndarray,
    climatology: Optional[np.ndarray] = None,  # [C_out, H, W] physical units
    channel_names: Optional[Sequence[str]] = None,
    scanned: bool = False,
    chunk: int = 8,
) -> Dict[str, np.ndarray]:
    """Run a rollout and score each lead time against targets.

    Returns {'rmse': [T, C], 'acc': [T, C], 'lead_hours': [T]} (acc only if
    climatology given). Targets are streamed — one step on device at a time.

    ``scanned=True`` is the throughput path: ``chunk``-step ``lax.scan``
    programs with the state carried across chunks — one dispatch (and one
    host round-trip) per ``chunk`` lead times instead of per step, with the
    per-step zenith stack precomputed host-side. Same math, same results;
    measured 1.5-2.4x faster per IC than the host-stepped loop
    (ROLLOUT_r03.json). Device memory holds one chunk of predictions, so
    any trajectory length fits.
    """
    means = np.asarray(means, np.float32).reshape(1, -1, 1, 1)
    stds = np.asarray(stds, np.float32).reshape(1, -1, 1, 1)
    clim = None
    if climatology is not None:
        clim = jnp.asarray(
            np.asarray(climatology, np.float32).reshape((1,) + np.asarray(climatology).shape[-3:])
        )

    rmses, accs = [], []
    denorm = jax.jit(lambda x: x * jnp.asarray(stds) + jnp.asarray(means))

    def score_one(pred, tar):
        pred_phys = denorm(pred)
        tar_phys = denorm(jnp.asarray(np.asarray(tar, np.float32)))
        if clim is not None:
            rmse, acc = _score_step(pred_phys, tar_phys, clim)
            accs.append(np.asarray(acc))
        else:
            rmse = weighted_rmse(pred_phys, tar_phys)
        rmses.append(np.asarray(rmse))

    if scanned:
        import datetime

        state = jnp.asarray(initial_state, jnp.float32)
        when, n_steps, done = start_time, len(targets), 0
        while done < n_steps:
            k = min(int(chunk), n_steps - done)
            if engine.add_zenith:
                zstack = engine.zenith_stack(when, k)
                when = when + datetime.timedelta(hours=k * engine.hours_per_step)
            else:
                zstack = np.zeros((k, 1, 1, engine.h, engine.w), np.float32)
            state, preds = engine.rollout_chunk(state, zstack)
            for s in range(k):
                score_one(preds[s], targets[done + s])
            done += k
    else:
        targets_it = iter(targets)
        for pred in engine.steps(initial_state, start_time, n_steps=len(targets)):
            score_one(pred, next(targets_it))

    out: Dict[str, np.ndarray] = {
        "rmse": np.stack(rmses),
        "lead_hours": np.arange(1, len(rmses) + 1) * engine.hours_per_step,
    }
    if accs:
        out["acc"] = np.stack(accs)
    if channel_names is not None:
        out["channels"] = np.asarray(list(channel_names))
    return out
