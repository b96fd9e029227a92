"""Measure 14-day (56-step) flagship rollout wall time per initial condition.

Compares the host-stepped rollout (one jitted step per lead time, host
round-trip + host-side zenith each step) against the scanned rollout (whole
trajectory in one compiled program, zenith stack precomputed) — the
inference-throughput role Earth2MIP plays for the reference
(``README.md:77-78``).

Usage: python scripts/rollout_time.py [--steps 56] [--iters 3]
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
    ap.add_argument("--steps", type=int, default=56)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--keep", type=int, default=3, help="channels kept per step")
    ap.add_argument("--batch", type=int, default=1, help="initial conditions per rollout (batched inference)")
    ap.add_argument("--compute-only", action="store_true", help="skip the tunnel-bound API-path measurements")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_xla_cache"),
    )
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_params
    from swin_v2_weather_tpu.inference.rollout import RolloutEngine
    from swin_v2_weather_tpu.models.wrappers import get_model

    params = _flagship_params()
    params["n_future"] = 0
    model = get_model(params)
    h, w = params["img_shape_x"], params["img_shape_y"]
    n_out = int(params["n_out_channels"])

    rng = np.random.default_rng(0)
    x = jnp.zeros((1, int(params["n_in_channels"]), h, w), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)

    engine = RolloutEngine(params, model, variables)
    ic = rng.standard_normal((args.batch, n_out, h, w)).astype(np.float32) * 0.1
    t0 = datetime.datetime(2018, 1, 1)
    keep = list(range(args.keep))

    # --- scanned path (as the API runs it: ic + zenith stack pushed per
    # call — through the dev tunnel that H2D leg dominates; see 'compute') ---
    scanned_s = host_s = float("nan")
    if args.compute_only:
        pass
    else:
        out = engine.rollout_scanned(ic, t0, args.steps, keep_channels=keep)
        _ = float(jnp.sum(out))  # warm + force fetch through the tunnel
        t = time.perf_counter()
        for _ in range(args.iters):
            out = engine.rollout_scanned(ic, t0, args.steps, keep_channels=keep)
            _ = float(jnp.sum(out))
        scanned_s = (time.perf_counter() - t) / args.iters

    # --- scanned path, device-resident inputs: the pure compute rate (on a
    # production host the ~0.5 GB of ic+zenith H2D rides PCIe at >10 GB/s,
    # overlapped; through the axon dev tunnel it costs ~13 s/call and must
    # be excluded to see the chip) ---
    fn = engine._build_scan(args.batch, tuple(keep))
    ic_d = jax.device_put(jnp.asarray(ic, jnp.float32))
    zstack_d = jax.device_put(jnp.asarray(engine.zenith_stack(t0, args.steps)))
    _ = float(jnp.sum(fn(engine.variables, ic_d, zstack_d)))  # warm
    t = time.perf_counter()
    for _ in range(args.iters):
        _ = float(jnp.sum(fn(engine.variables, ic_d, zstack_d)))
    compute_s = (time.perf_counter() - t) / args.iters

    # --- host-stepped path ---
    if not args.compute_only:
        o = engine.rollout(ic, t0, n_steps=args.steps, keep_channels=keep)
        t = time.perf_counter()
        for _ in range(args.iters):
            o = engine.rollout(ic, t0, n_steps=args.steps, keep_channels=keep)
        host_s = (time.perf_counter() - t) / args.iters

    print(json.dumps({
        "steps": args.steps,
        "batch_ics": args.batch,
        "scanned_compute_s_per_ic_each": round(compute_s / args.batch, 3),
        "scanned_compute_s_per_ic": round(compute_s, 3),
        "scanned_compute_ms_per_step": round(compute_s / args.steps * 1e3, 2),
        "scanned_s_per_ic": round(scanned_s, 3),
        "host_stepped_s_per_ic": round(host_s, 3),
        "scanned_ms_per_step": round(scanned_s / args.steps * 1e3, 2),
        "host_ms_per_step": round(host_s / args.steps * 1e3, 2),
        "speedup": round(host_s / scanned_s, 2),
    }))


if __name__ == "__main__":
    main()
