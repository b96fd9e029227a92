"""Prefetch-overlap demonstration: e2e step time ~= max(compute, H2D).

The claim under test (VERDICT r3 #7 / r4 #2): ``data.pipeline.device_prefetch``
keeps ``depth`` batches in flight so the H2D transfer of batch k+1 rides
under the training step on batch k — end-to-end step time approaches
``max(compute, input)`` rather than their sum.

``loader_bench --e2e`` measures this THROUGH the live threaded loader,
which on this 1-CPU dev box entangles two environment artifacts with the
number: loader worker threads starve ``device_put``'s host-side
serialization of CPU (measured 90 ms/batch bare vs 436 ms beside live
loader threads), and concurrent big-RSS processes evict the page cache
under the synthetic archive. This script isolates the overlap property
itself: batches are pre-materialized host numpy dicts (unique data per
batch — the axon tunnel caches identical payloads), no loader threads run,
and the three legs are measured in one session on the same step:

  put-only     sequential ``device_put`` + block per batch
  compute-only the jitted train step on a device-resident batch
  pipelined    ``device_prefetch`` generator feeding the step (the
               production consumption pattern)

Overlap is demonstrated when pipelined ~= max(put, compute) << sum.
The input pipeline's own rate is measured separately (loader-only leg of
``loader_bench``); production sizing arithmetic lives in ROADMAP.md.

Usage: python scripts/overlap_demo.py [--channels 8] [--batches 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=8)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--depth", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from loader_bench import ensure_archive, flagship_loader_params
    from swin_v2_weather_tpu.data.preprocess import Preprocessor
    from swin_v2_weather_tpu.data.pipeline import device_prefetch
    from swin_v2_weather_tpu.models.wrappers import get_model
    from swin_v2_weather_tpu.ops.losses import LossHandler
    from swin_v2_weather_tpu.parallel.mesh import make_mesh
    from swin_v2_weather_tpu.training.optim import build_optimizer
    from swin_v2_weather_tpu.training.step import TrainState, build_train_step

    C = args.channels
    root = f"/tmp/loader_bench_c{C}" if C != 73 else "/tmp/loader_bench"
    data_dir = ensure_archive(root, args.frames, C)
    params = flagship_loader_params(root, data_dir, C)
    params["attn_impl"] = "pallas_qkv"
    params["activation_ckpt"] = True
    params["remat_policy"] = "mlp3"
    params["scan_blocks"] = False

    mesh = make_mesh(None, devices=jax.devices()[:1])
    model = get_model(params)
    optimizer = build_optimizer(params)
    x = jnp.zeros((1, int(params["n_in_channels"]), 720, 1440), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    state = TrainState.create(variables["params"], optimizer)
    del variables
    step = build_train_step(
        model, LossHandler(params), Preprocessor(params), optimizer, mesh
    )
    key = jax.random.key(1)

    # pre-materialized host batches, unique data per batch (tunnel caches
    # identical payloads); contiguous fp32, the loader's output layout
    rng = np.random.default_rng(0)
    n_out = int(params["n_out_channels"])

    def make_batch(i):
        return {
            "inp": rng.standard_normal((1, C, 720, 1440)).astype(np.float32),
            "tar": rng.standard_normal((1, n_out, 720, 1440)).astype(np.float32),
            "zen_inp": rng.standard_normal((1, 1, 720, 1440)).astype(np.float32),
            "zen_tar": rng.standard_normal((1, 1, 720, 1440)).astype(np.float32),
        }

    batches = [make_batch(i) for i in range(args.batches + args.depth + 1)]
    bytes_per_batch = sum(v.nbytes for v in batches[0].values())

    # warm compile
    stream = device_prefetch(iter(batches[:1]), mesh, depth=args.depth)
    state, metrics = step(state, next(stream), key)
    _ = float(metrics["loss"])

    # leg 1: put-only, sequential (no overlap possible). TIMING GOTCHA:
    # block_until_ready() does NOT block through the axon tunnel — force a
    # host fetch of one element PER ARRAY so the timer sees transfer
    # completion, not dispatch (each fetch requires the device buffer to
    # be fully resident; the fetch round-trip itself is ~ms).
    t0 = time.perf_counter()
    for b in batches[1 : args.batches + 1]:
        placed = {k: jax.device_put(v) for k, v in b.items()}
        for v in placed.values():
            _ = float(v.ravel()[0])
    t_put = (time.perf_counter() - t0) / args.batches

    # leg 2: compute-only on a device-resident batch
    resident = {k: jax.device_put(v) for k, v in batches[0].items()}
    for _ in range(2):
        state, metrics = step(state, resident, key)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.batches):
        state, metrics = step(state, resident, key)
    _ = float(metrics["loss"])
    t_compute = (time.perf_counter() - t0) / args.batches

    # leg 3: pipelined — the production consumption pattern
    stream = device_prefetch(iter(batches), mesh, depth=args.depth)
    state, metrics = step(state, next(stream), key)  # fill the pipeline
    _ = float(metrics["loss"])
    n = 0
    t0 = time.perf_counter()
    for b in stream:
        state, metrics = step(state, b, key)
        n += 1
        if n >= args.batches:
            break
    _ = float(metrics["loss"])
    t_e2e = (time.perf_counter() - t0) / n

    mx = max(t_put, t_compute)
    out = {
        "what": (
            "prefetch-overlap demo: device_prefetch feeding the real jitted "
            "train step from pre-materialized host batches (no loader "
            "threads, unique payloads)"
        ),
        "channels": C,
        "mb_per_batch": round(bytes_per_batch / 1e6, 1),
        "put_only_ms": round(t_put * 1e3, 1),
        "compute_only_ms": round(t_compute * 1e3, 1),
        "pipelined_e2e_ms": round(t_e2e * 1e3, 1),
        "max_legs_ms": round(mx * 1e3, 1),
        "sum_legs_ms": round((t_put + t_compute) * 1e3, 1),
        "e2e_over_max_legs": round(t_e2e / mx, 3),
        "overlapped": bool(t_e2e < 0.75 * (t_put + t_compute)),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
