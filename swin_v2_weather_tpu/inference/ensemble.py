"""Ensemble forecasting: IC perturbations + probabilistically scored rollouts.

The reference scores deterministic forecasts only and outsources everything
past training to an external Earth2MIP fork (reference ``README.md:77-78``),
whose ensemble machinery (Gaussian / bred-vector IC perturbations, CRPS,
spread-error) this module brings in-repo, TPU-native:

  * **members ride the batch dimension** of the same jitted stepper the
    deterministic engine uses — one compiled program advances all M members
    at once (MXU-friendly batching, no per-member dispatch);
  * **scoring runs inside the scan**: each chunk of lead times is one
    compiled ``lax.scan`` whose body steps the whole ensemble AND reduces
    CRPS / spread / ensemble-mean RMSE / ACC on device — only [C]-sized
    scalars per lead time ever reach the host, so device memory is
    M states + one chunk of targets regardless of trajectory length;
  * perturbations are centered pairs (member 0 = control, then ±δ pairs) so
    the ensemble mean is unbiased at init time.
"""

from __future__ import annotations

import datetime
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from swin_v2_weather_tpu.ops.metrics import (
    ensemble_spread_channels,
    latitude_weights,
    weighted_acc_channels,
    weighted_crps_channels,
    weighted_rmse_channels,
)


def _lat_rms(fields: jnp.ndarray) -> jnp.ndarray:
    """[..., C, H, W] -> [..., C] latitude-weighted RMS amplitude."""
    weight = latitude_weights(fields.shape[-2], dtype=fields.dtype).reshape(1, -1, 1)
    return jnp.sqrt(jnp.mean(weight * fields**2, axis=(-1, -2)))


def _rescale(pert: jnp.ndarray, amplitude: float) -> jnp.ndarray:
    """Scale each [C, H, W] field of [P, C, H, W] to lat-weighted RMS = amplitude."""
    rms = _lat_rms(pert)[..., None, None]
    return pert * (amplitude / jnp.maximum(rms, 1e-12))


def gaussian_perturbations(
    key,
    n_pairs: int,
    shape,  # (C, H, W)
    amplitude: float,
    zonal_truncation: Optional[int] = None,
) -> jnp.ndarray:
    """[P, C, H, W] Gaussian perturbation fields, per-channel lat-weighted
    RMS normalized to ``amplitude`` (normalized-state units).

    ``zonal_truncation=k`` low-passes the noise to zonal wavenumbers <= k
    (rFFT along longitude), giving spatially coherent large-scale
    perturbations instead of grid-point white noise — the usual choice for
    IC ensembles at 0.25 degrees.
    """
    noise = jax.random.normal(key, (n_pairs,) + tuple(shape), jnp.float32)
    if zonal_truncation is not None:
        spec = jnp.fft.rfft(noise, axis=-1)
        mask = (jnp.arange(spec.shape[-1]) <= int(zonal_truncation)).astype(spec.dtype)
        noise = jnp.fft.irfft(spec * mask, n=noise.shape[-1], axis=-1)
    return _rescale(noise, amplitude)


def breed_perturbations(
    engine,
    initial_state: jnp.ndarray,  # [1, C_out, H, W] normalized
    start_time: Optional[datetime.datetime],
    n_pairs: int,
    amplitude: float,
    cycles: int = 3,
    seed: int = 0,
    zonal_truncation: Optional[int] = 20,
) -> jnp.ndarray:
    """[P, C, H, W] bred vectors: perturbations grown by the model itself.

    Classic breeding cycle seeded with Gaussian noise: step the control and
    each perturbed state forward one dt together (one batched compiled
    program for all P+1 states), rescale the grown difference back to
    ``amplitude``, repeat. After a few cycles the perturbations align with
    the fastest-growing local error modes — flow-dependent spread that white
    noise lacks. With only the IC available, cycles run forward from the IC
    and the bred vector is applied back at the IC time (the same pragmatic
    choice Earth2MIP-style noise-bred ensembles make).
    """
    state = jnp.asarray(initial_state, jnp.float32)
    c, h, w = state.shape[-3:]
    pert = gaussian_perturbations(
        jax.random.PRNGKey(seed), n_pairs, (c, h, w), amplitude, zonal_truncation
    )
    when = start_time
    for _ in range(int(cycles)):
        if engine.add_zenith:
            zstack = engine.zenith_stack(when, 1)
            when = when + datetime.timedelta(hours=engine.hours_per_step)
        else:
            zstack = np.zeros((1, 1, 1, h, w), np.float32)
        batch = jnp.concatenate([state, state + pert], axis=0)  # [1+P, C, H, W]
        nxt, _ = engine.rollout_chunk(batch, zstack)
        state, grown = nxt[:1], nxt[1:] - nxt[:1]
        pert = _rescale(grown, amplitude)
    return pert


def make_members(initial_state: jnp.ndarray, perturbations: jnp.ndarray, n_members: int) -> jnp.ndarray:
    """[M, C, H, W] members: control, then centered +/- pairs (mean-unbiased)."""
    ic = jnp.asarray(initial_state, jnp.float32)
    if ic.ndim == 4:
        ic = ic[0]
    members = [ic]
    for p in perturbations:
        if len(members) < n_members:
            members.append(ic + p)
        if len(members) < n_members:
            members.append(ic - p)
    if len(members) != n_members:
        raise ValueError(
            f"need {(n_members - 1 + 1) // 2} perturbation pairs for {n_members} members, "
            f"got {perturbations.shape[0]}"
        )
    return jnp.stack(members)


def score_ensemble(
    engine,
    members: jnp.ndarray,  # [M, C_out, H, W] normalized
    targets: Sequence[np.ndarray],  # iterable of [1, C_out, H, W] normalized
    start_time,
    means: np.ndarray,
    stds: np.ndarray,
    climatology: Optional[np.ndarray] = None,  # [C_out, H, W] physical units
    channel_names: Optional[Sequence[str]] = None,
    chunk: int = 8,
) -> Dict[str, np.ndarray]:
    """Probabilistically scored ensemble rollout.

    Returns per-lead-time [T, C] arrays: ``crps`` (fair, physical units),
    ``spread`` (sqrt lat-weighted mean member variance), ``rmse_mean``
    (RMSE of the ensemble-mean forecast), ``rmse_control`` (member 0),
    ``acc_mean`` (if a climatology is given) and ``lead_hours`` — computed
    on device inside the chunked scan; the [M, C, H, W] ensemble state is
    the only persistent device tensor.
    """
    members = jnp.asarray(members, jnp.float32)
    m = int(members.shape[0])
    c, h, w = members.shape[-3:]
    means_d = jnp.asarray(np.asarray(means, np.float32).reshape(1, -1, 1, 1))
    stds_d = jnp.asarray(np.asarray(stds, np.float32).reshape(1, -1, 1, 1))
    clim_d = None
    if climatology is not None:
        clim_d = jnp.asarray(
            np.asarray(climatology, np.float32).reshape((1,) + np.asarray(climatology).shape[-3:])
        )

    # cache compiled scans on the engine: scoring many ICs with the same
    # ensemble geometry reuses one compiled program (cf. engine._scan_cache)
    cache = engine.__dict__.setdefault("_ens_scan_cache", {})
    key = (m, clim_d is not None)
    if key not in cache:
        cache[key] = _build_scored_scan(engine, m, with_acc=clim_d is not None)
    scan = cache[key]

    out_rows: Dict[str, list] = {k: [] for k in ("crps", "spread", "rmse_mean", "rmse_control", "acc_mean")}
    when, n_steps, done = start_time, len(targets), 0
    while done < n_steps:
        k = min(int(chunk), n_steps - done)
        if engine.add_zenith:
            zstack = engine.zenith_stack(when, k)
            when = when + datetime.timedelta(hours=k * engine.hours_per_step)
        else:
            zstack = np.zeros((k, 1, 1, h, w), np.float32)
        tchunk = np.stack([np.asarray(targets[done + s], np.float32).reshape(c, h, w) for s in range(k)])
        members, rows = scan(
            engine.variables, members, jnp.asarray(zstack), jnp.asarray(tchunk),
            means_d, stds_d, clim_d if clim_d is not None else jnp.zeros((1, c, 1, 1), jnp.float32),
        )
        for key in out_rows:
            if key in rows:
                out_rows[key].append(np.asarray(rows[key]))
        done += k

    out: Dict[str, np.ndarray] = {
        k: np.concatenate(v) for k, v in out_rows.items() if v
    }
    out["lead_hours"] = np.arange(1, n_steps + 1) * engine.hours_per_step
    out["n_members"] = m
    if channel_names is not None:
        out["channels"] = np.asarray(list(channel_names))
    return out


def _build_scored_scan(engine, m: int, with_acc: bool):
    assemble = engine._assemble
    add_zenith = engine.add_zenith

    @jax.jit
    def run(variables, members, zstack, tchunk, means, stds, clim):
        def body(carry, step_in):
            zen, tar = step_in
            z = jnp.broadcast_to(zen, (m,) + zen.shape[1:]) if add_zenith else None
            nxt = assemble(variables, carry, z)  # [M, C, H, W]
            ens_phys = nxt * stds + means  # member physical fields
            tar_phys = tar[None] * stds + means  # [1, C, H, W]
            mean_phys = jnp.mean(ens_phys, axis=0, keepdims=True)
            row = {
                "crps": weighted_crps_channels(ens_phys[:, None], tar_phys)[0],
                "spread": ensemble_spread_channels(ens_phys[:, None])[0],
                "rmse_mean": weighted_rmse_channels(mean_phys, tar_phys)[0],
                "rmse_control": weighted_rmse_channels(ens_phys[:1], tar_phys)[0],
            }
            if with_acc:
                row["acc_mean"] = weighted_acc_channels(mean_phys - clim, tar_phys - clim)[0]
            return nxt, row

        return jax.lax.scan(body, members, (zstack, tchunk))

    return run
