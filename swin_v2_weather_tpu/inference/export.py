"""AOT-compiled serving artifact: the forecast stepper as serialized StableHLO.

The reference delegates deployment to an external Earth2MIP fork that
re-imports the training code to rebuild the torch module at serving time
(reference ``README.md:77-78``, ``networks/swinv2_global.py:47-54``
``swin_from_yaml``). On TPU the natural deployment unit is stronger: a
``jax.export`` artifact — the jitted single-step forecaster lowered to
StableHLO with the trained weights baked in as constants. A serving system
runs it with no model code, no flax, no checkpoint restore, and no Python
trace step; versioned StableHLO guarantees forward compatibility across
JAX/XLA releases.

Artifact layout (next to the registry directory contract of
``inference/registry.py``):

    <dir>/stepper.bin       — serialized jax.export.Exported
    <dir>/manifest.json     — input/output shapes+dtypes, platforms,
                              channel names, grid + time-step info

The exported callable has signature ``(state[, zenith]) -> prediction``
over NORMALIZED fields ([B, C_out, H, W] fp32), with the static
conditioning channels (orography/landmask) folded in as constants —
exactly the ``RolloutEngine`` step. Autoregression stays host-side where
the serving loop lives.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def export_stepper(
    engine,
    out_dir: str,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Serialize ``engine``'s single forecast step as a StableHLO artifact.

    Args:
      engine: an ``inference.rollout.RolloutEngine`` (trained weights
        resident in ``engine.variables`` are baked into the artifact).
      out_dir: directory to write ``stepper.bin`` + ``manifest.json``.
      batch: static batch size of the exported program (export once per
        serving batch shape; StableHLO programs are shape-specialized the
        same way the training step is).
      platforms: lowering platforms, e.g. ``("tpu", "cpu")``; default is
        the current backend.

    Returns the manifest dict.
    """
    os.makedirs(out_dir, exist_ok=True)
    h, w, n_out = engine.h, engine.w, engine.n_out
    state_spec = jax.ShapeDtypeStruct((batch, n_out, h, w), jnp.float32)

    variables = engine.variables
    if engine.add_zenith:
        zen_spec = jax.ShapeDtypeStruct((batch, 1, h, w), jnp.float32)

        def fn(state, zen):
            return engine._assemble(variables, state, zen)

        specs = (state_spec, zen_spec)
    else:

        def fn(state):
            return engine._assemble(variables, state, None)

        specs = (state_spec,)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax.export.export(jax.jit(fn), **kwargs)(*specs)
    blob = exported.serialize()
    with open(os.path.join(out_dir, "stepper.bin"), "wb") as f:
        f.write(blob)

    params = engine.params
    manifest = {
        "format": "jax.export/stablehlo",
        "calling_convention_version": exported.calling_convention_version,
        "platforms": list(exported.platforms),
        "inputs": [
            {"name": n, "shape": list(s.shape), "dtype": str(s.dtype)}
            for n, s in zip(("state", "zenith"), specs)
        ],
        "output": {"shape": [batch, n_out, h, w], "dtype": "float32"},
        "grid": {"height": h, "width": w},
        "hours_per_step": engine.hours_per_step,
        "add_zenith": engine.add_zenith,
        "out_channels": [str(c) for c in getattr(params, "channel_names", [])]
        or None,
        "artifact_bytes": len(blob),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ServedStepper:
    """Runtime wrapper over a deserialized stepper artifact."""

    def __init__(self, exported, manifest: dict):
        self._exported = exported
        self.manifest = manifest
        self._call = jax.jit(exported.call)

    def __call__(self, state, zenith=None):
        args = (jnp.asarray(state, jnp.float32),)
        if self.manifest.get("add_zenith"):
            if zenith is None:
                raise ValueError("this artifact requires a zenith input")
            args += (jnp.asarray(zenith, jnp.float32),)
        return self._call(*args)


def load_stepper(artifact_dir: str) -> ServedStepper:
    """Deserialize ``export_stepper``'s artifact; no model code needed."""
    with open(os.path.join(artifact_dir, "stepper.bin"), "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    with open(os.path.join(artifact_dir, "manifest.json")) as f:
        manifest = json.load(f)
    return ServedStepper(exported, manifest)
