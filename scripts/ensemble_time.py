"""Measure flagship-shape ensemble forecasting throughput on the chip.

Times the scored ensemble scan of ``inference/ensemble.py`` (M members
advanced + CRPS/spread/skill reduced inside one compiled program) with
device-resident members/zenith/targets — the pure compute rate, excluding
the dev-tunnel H2D leg (cf. scripts/rollout_time.py). Reference role:
Earth2MIP ensembles (reference ``README.md:77-78``).

Usage: python scripts/ensemble_time.py [--members 4] [--steps 4] [--iters 3]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=4)
    ap.add_argument("--steps", type=int, default=4, help="lead times per scan chunk")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_xla_cache"),
    )
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_params
    from swin_v2_weather_tpu.inference.ensemble import _build_scored_scan
    from swin_v2_weather_tpu.inference.rollout import RolloutEngine
    from swin_v2_weather_tpu.models.wrappers import get_model

    params = _flagship_params()
    params["n_future"] = 0
    model = get_model(params)
    h, w = params["img_shape_x"], params["img_shape_y"]
    n_out = int(params["n_out_channels"])
    m, k = args.members, args.steps

    rng = np.random.default_rng(0)
    x = jnp.zeros((1, int(params["n_in_channels"]), h, w), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    engine = RolloutEngine(params, model, variables)

    members = jax.device_put(
        jnp.asarray(rng.standard_normal((m, n_out, h, w)), jnp.float32) * 0.1
    )
    t0 = datetime.datetime(2018, 1, 1)
    zstack = jax.device_put(jnp.asarray(engine.zenith_stack(t0, k)))
    tchunk = jax.device_put(
        jnp.asarray(rng.standard_normal((k, n_out, h, w)), jnp.float32) * 0.1
    )
    means = jax.device_put(jnp.zeros((1, n_out, 1, 1), jnp.float32))
    stds = jax.device_put(jnp.ones((1, n_out, 1, 1), jnp.float32))
    clim = jax.device_put(jnp.zeros((1, n_out, 1, 1), jnp.float32))

    scan = _build_scored_scan(engine, m, with_acc=True)
    nxt, rows = scan(variables, members, zstack, tchunk, means, stds, clim)
    _ = float(jnp.sum(nxt)) + float(jnp.sum(rows["crps"]))  # warm + tunnel fetch
    t = time.perf_counter()
    for _ in range(args.iters):
        nxt, rows = scan(variables, members, zstack, tchunk, means, stds, clim)
        _ = float(jnp.sum(nxt)) + float(jnp.sum(rows["crps"]))
    dt = (time.perf_counter() - t) / args.iters

    print(json.dumps({
        "members": m,
        "steps_per_chunk": k,
        "scored_scan_s": round(dt, 3),
        "ms_per_step": round(dt / k * 1e3, 2),
        "ms_per_member_step": round(dt / (k * m) * 1e3, 2),
        "fields_advanced_per_s": round(k * m / dt, 2),
        "crps_sample": [round(float(v), 4) for v in np.asarray(rows["crps"])[0][:3]],
    }))


if __name__ == "__main__":
    main()
