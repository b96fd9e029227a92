"""Autoregressive medium-range rollout engine.

The reference delegates inference/scoring to an external Earth2MIP fork
(reference ``README.md:77-78``); this module brings it in-repo as a
jit-compiled 6-hourly stepper:

  * one compiled ``step`` advances the normalized atmospheric state by
    ``dt`` (re-assembling the model input from [state, zenith(t), static]
    exactly like training's preprocessor + MultiStepWrapper feedback,
    reference ``networks/helpers.py:26-41``);
  * the host loop streams per-step zenith channels in and per-step fields /
    metrics out — a 14-day, 56-step rollout of the 73x720x1440 state never
    materializes more than one step on device;
  * zenith channels are computed host-side from real timestamps with the
    same astronomy as the training pipeline (ops/zenith.py).
"""

from __future__ import annotations

import datetime
from typing import Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from swin_v2_weather_tpu.data.conditioning import static_features
from swin_v2_weather_tpu.ops.zenith import cos_zenith_angle


class RolloutEngine:
    """Jit-compiled autoregressive forecaster.

    Args:
      params: config (needs img_size/img_shape, add_zenith/orography/
        landmask, dt, in/out channel lists, time-step hours).
      model: the *core* single-step model (SwinTransformerV2 or a
        SingleStepWrapper; multi-step wrappers are for training).
      variables: flax variables dict {'params': ...}.
    """

    def __init__(self, params, model, variables):
        self.params = params
        self.model = model
        self.variables = variables
        self.h = int(getattr(params, "img_shape_x", params.img_size[0]))
        self.w = int(getattr(params, "img_shape_y", params.img_size[1]))
        self.dt = int(params.dt)
        self.hours_per_step = 6 * self.dt
        self.add_zenith = bool(params.add_zenith)
        self.n_out = len(params.out_channels)

        static = static_features(params)
        self._static = None
        if static is not None:
            self._static = jnp.asarray(static[None], jnp.float32)

        if self.add_zenith:
            longitude = np.arange(0, 360, 360.0 / self.w)
            latitude = np.linspace(90, -90, self.h) if self.h % 2 else np.linspace(
                90, -90, self.h + 1
            )[: self.h]
            self.lon_grid, self.lat_grid = np.meshgrid(longitude, latitude)

        def _assemble(variables, state, zen):
            parts = [state]
            if zen is not None:
                parts.append(zen)
            if self._static is not None:
                b = state.shape[0]
                parts.append(jnp.broadcast_to(self._static, (b,) + self._static.shape[1:]))
            inp = jnp.concatenate(parts, axis=1) if len(parts) > 1 else state
            pred = self.model.apply(variables, inp, train=False)
            return pred.astype(jnp.float32)

        self._assemble = _assemble
        self._step = jax.jit(_assemble)
        self._scan_cache = {}

    def zenith_at(self, when: datetime.datetime) -> np.ndarray:
        """[1, 1, H, W] cos-zenith channel for a timestamp."""
        z = cos_zenith_angle(when, self.lon_grid, self.lat_grid).astype(np.float32)
        return z[None, None, : self.h, : self.w]

    def steps(
        self,
        initial_state: jnp.ndarray,  # [B, C_out, H, W], normalized
        start_time: Optional[datetime.datetime],
        n_steps: int,
    ) -> Iterator[jnp.ndarray]:
        """Yield normalized predictions step by step ([B, C_out, H, W]).

        The prediction at yield i is valid at start_time + (i+1)*dt*6h.
        """
        state = jnp.asarray(initial_state, jnp.float32)
        b = state.shape[0]
        when = start_time
        for _ in range(n_steps):
            zen = None
            if self.add_zenith:
                if when is None:
                    raise ValueError("start_time is required when add_zenith is set")
                zen = jnp.asarray(np.broadcast_to(self.zenith_at(when), (b, 1, self.h, self.w)))
            state = self._step(self.variables, state, zen)
            yield state
            if when is not None:
                when = when + datetime.timedelta(hours=self.hours_per_step)

    def rollout(
        self,
        initial_state: jnp.ndarray,
        start_time: Optional[datetime.datetime],
        n_steps: int,
        keep_channels: Optional[Sequence[int]] = None,
    ) -> np.ndarray:
        """Full rollout to host: [T, B, C', H, W] (C' = kept channels).

        Host-stepped loop (one jitted step per lead time): streamed and
        memory-light — any T at one step of device memory. For throughput
        (the whole trajectory in ONE compiled program) use
        ``rollout_scanned``.
        """
        out: List[np.ndarray] = []
        for pred in self.steps(initial_state, start_time, n_steps):
            if keep_channels is not None:
                pred = pred[:, np.asarray(keep_channels)]
            out.append(np.asarray(pred))
        return np.stack(out)

    def zenith_stack(
        self, start_time: datetime.datetime, n_steps: int
    ) -> np.ndarray:
        """[T, 1, 1, H, W] cos-zenith channels for steps 1..T of a rollout."""
        when = start_time
        zs = []
        for _ in range(n_steps):
            zs.append(self.zenith_at(when))
            when = when + datetime.timedelta(hours=self.hours_per_step)
        return np.stack(zs).astype(np.float32)

    def rollout_scanned(
        self,
        initial_state: jnp.ndarray,
        start_time: Optional[datetime.datetime],
        n_steps: int,
        keep_channels: Optional[Sequence[int]] = None,
    ) -> jnp.ndarray:
        """Whole-trajectory rollout inside ONE compiled program.

        ``lax.scan`` over lead times with the zenith channels precomputed
        host-side as a [T, 1, 1, H, W] stack — no per-step host round-trip,
        dispatch, or host-side ephemeris on the critical path (the
        host-stepped ``rollout`` pays all three per step). Returns the
        DEVICE array [T, B, C', H, W]; pass ``keep_channels`` for long
        rollouts (73 channels x 56 steps at 720x1440 would not fit HBM).

        This is the throughput path for skill evaluation over many initial
        conditions (the role Earth2MIP plays for the reference,
        ``README.md:77-78``).
        """
        state = jnp.asarray(initial_state, jnp.float32)
        b = state.shape[0]
        if self.add_zenith:
            if start_time is None:
                raise ValueError("start_time is required when add_zenith is set")
            zstack = jnp.asarray(self.zenith_stack(start_time, n_steps))
        else:
            zstack = jnp.zeros((n_steps, 1, 1, self.h, self.w), jnp.float32)
        keep_t = tuple(int(c) for c in keep_channels) if keep_channels is not None else None
        key = (b, keep_t)
        if key not in self._scan_cache:
            self._scan_cache[key] = self._build_scan(b, keep_t)
        _, outs = self._scan_cache[key](self.variables, state, zstack)
        return outs

    def rollout_chunk(self, state: jnp.ndarray, zstack) -> tuple:
        """One compiled scan over ``len(zstack)`` steps, returning
        ``(final_state, preds[T, B, C_out, H, W])`` — the building block for
        chunked whole-trajectory scoring (a 56-step 73-channel full-res
        trajectory does not fit HBM in one piece; K-step chunks carry the
        state across compiled programs at one dispatch per K steps)."""
        state = jnp.asarray(state, jnp.float32)
        b = state.shape[0]
        key = (b, None)
        if key not in self._scan_cache:
            self._scan_cache[key] = self._build_scan(b, None)
        return self._scan_cache[key](self.variables, state, jnp.asarray(zstack))

    def write_forecast(
        self,
        out_dir: str,
        initial_state: jnp.ndarray,  # [1, C_out, H, W] normalized
        start_time: Optional[datetime.datetime],
        n_steps: int,
        means: np.ndarray,  # [C_out, 1, 1] denormalization
        stds: np.ndarray,
        channel_names: Sequence[str],
        keep_names: Optional[Sequence[str]] = None,
        ic_index: Optional[int] = None,
        chunk: int = 8,
    ) -> str:
        """Run a rollout and write the forecast FIELDS to disk.

        The scoring paths reduce everything to skill scalars; this is the
        product path — the actual forecast, streamed chunk-by-chunk through
        the scanned stepper and written denormalized (physical units) as

            <out_dir>/ic<idx>.npy    [T, C', H, W] float32
            <out_dir>/ic<idx>.json   start time, lead hours, channel names

        ``keep_names`` selects output channels by name (default: all).
        Returns the .npy path.
        """
        import json
        import os

        names = [str(c) for c in channel_names]
        if keep_names is None:
            keep = list(range(len(names)))
        else:
            missing = [c for c in keep_names if str(c) not in names]
            if missing:
                raise ValueError(f"unknown channels {missing}; have {names}")
            keep = [names.index(str(c)) for c in keep_names]
        means = np.asarray(means, np.float32).reshape(1, -1, 1, 1)[:, keep]
        stds = np.asarray(stds, np.float32).reshape(1, -1, 1, 1)[:, keep]

        state = jnp.asarray(initial_state, jnp.float32)
        fields: List[np.ndarray] = []
        when, done = start_time, 0
        while done < n_steps:
            k = min(int(chunk), n_steps - done)
            if self.add_zenith:
                zstack = self.zenith_stack(when, k)
                when = when + datetime.timedelta(hours=k * self.hours_per_step)
            else:
                zstack = np.zeros((k, 1, 1, self.h, self.w), np.float32)
            state, preds = self.rollout_chunk(state, zstack)
            fields.append(np.asarray(preds[:, 0, keep]) * stds + means)
            done += k

        os.makedirs(out_dir, exist_ok=True)
        tag = f"ic{int(ic_index):06d}" if ic_index is not None else "ic"
        npy_path = os.path.join(out_dir, f"{tag}.npy")
        np.save(npy_path, np.concatenate(fields, axis=0))
        meta = {
            "ic_index": ic_index,
            "start_time": start_time.isoformat() if start_time else None,
            "lead_hours": [int((s + 1) * self.hours_per_step) for s in range(n_steps)],
            "channels": [names[i] for i in keep],
            "grid": [self.h, self.w],
            "units": "physical (denormalized)",
        }
        with open(os.path.join(out_dir, f"{tag}.json"), "w") as f:
            json.dump(meta, f, indent=2)
        return npy_path

    def _build_scan(self, b: int, keep_t):
        assemble = self._assemble
        add_zenith = self.add_zenith
        keep = np.asarray(keep_t, np.int32) if keep_t is not None else None

        @jax.jit
        def run(variables, state, zstack):
            def body(carry, zen):
                z = jnp.broadcast_to(zen, (b,) + zen.shape[1:]) if add_zenith else None
                nxt = assemble(variables, carry, z)
                out = nxt if keep is None else nxt[:, keep]
                return nxt, out

            return jax.lax.scan(body, state, zstack)

        return run
