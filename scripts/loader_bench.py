"""Input-pipeline throughput proof at flagship shape (VERDICT r2 next #2).

Measures, at the full 73-channel 721x1440 geometry:
  (a) loader-only:    Era5Dataset (native C++ pread reader + fused
                      normalize) through ThreadedLoader — samples/s and
                      GB/s of field reads;
  (b) +device:        the same batches through device_prefetch onto the
                      attached chip (H2D path);
  (c) --e2e:          the full flagship train step consuming real loader
                      batches — end-to-end ms/step vs the compute-only
                      number from scripts/step_time.py.

This is the role DALI plays in the reference
(``utils/data_loader_era5_dali.py:34-98``): prove the input side can feed
the chip at the benched compute rate (~2.3 samples/s/chip = ~1.4 GB/s of
normalized fp32 fields). The archive is synthetic random data at real
shape; reads come from the page cache after generation, so (a) bounds the
decode+normalize+assembly machinery, not the disk.

Usage: python scripts/loader_bench.py [--frames 24] [--device] [--e2e]
                                      [--channels 73]

--channels 8 runs the same pipeline on an 8-channel archive: ~66 MB/sample
instead of ~600 MB, which fits through the dev-box tunnel's ~40 MB/s H2D
link, so the loader -> prefetch-queue -> chip-step overlap can be validated
END TO END here (e2e ~= max(compute, H2D) — VERDICT r3 next #7). The 73-ch
run is recorded alongside as tunnel-bound for honesty; on a production TPU
host (PCIe H2D, dozens of cores) the 73-ch input side is the measured
1.31 GB/s/core x N workers vs the ~1.45 GB/s the 2.4 samples/s step needs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 721, 1440


def ensure_archive(root: str, frames: int, channels: int) -> str:
    import h5py

    data_dir = f"{root}/data/train"
    marker = f"{root}/.complete_{frames}"
    if os.path.exists(marker):
        return data_dir
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(f"{root}/stats", exist_ok=True)
    rng = np.random.default_rng(0)
    path = f"{data_dir}/2015.h5"
    with h5py.File(path, "w") as f:
        d = f.create_dataset("fields", shape=(frames, channels, H, W), dtype=np.float32)
        for t in range(frames):  # frame-at-a-time: bounded host memory
            d[t] = rng.standard_normal((channels, H, W)).astype(np.float32)
    np.save(f"{root}/stats/global_means.npy", np.zeros((1, channels, 1, 1), np.float32))
    np.save(f"{root}/stats/global_stds.npy", np.ones((1, channels, 1, 1), np.float32))
    open(marker, "w").close()
    return data_dir


def flagship_loader_params(root: str, data_dir: str, channels: int):
    from __graft_entry__ import _flagship_params

    params = _flagship_params()
    if channels != 73:
        # channel-reduced variant of the flagship: same network geometry
        # (embed 768, depth 12, 720x1440 — compute is within a few percent
        # of the 73-ch step since attention/MLP dominate), but the field
        # payload shrinks to what the dev tunnel's H2D link can move
        params["in_channels"] = np.arange(channels)
        params["out_channels"] = np.arange(channels)
        params["channel_names"] = list(params["channel_names"])[:channels]
        from swin_v2_weather_tpu.data.preprocess import derived_channel_counts

        n_in, n_out = derived_channel_counts(params)
        params["n_in_channels"], params["n_out_channels"] = n_in, n_out
    params["train_data_path"] = data_dir
    params["global_means_path"] = f"{root}/stats/global_means.npy"
    params["global_stds_path"] = f"{root}/stats/global_stds.npy"
    tds = f"{root}/stats/time_diff_stds.npy"
    if not os.path.exists(tds):
        np.save(tds, np.ones((1, channels, 1, 1), np.float32))
    params["time_diff_stds_path"] = tds
    params["data_loader_config"] = "threaded"
    params["local_batch_size"] = 1
    params["batch_size"] = 1
    params["n_future"] = 0
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--device", action="store_true", help="also time H2D prefetch")
    ap.add_argument("--e2e", action="store_true", help="full train step on real batches")
    ap.add_argument("--workers", type=int, default=0, help="0 = config default")
    ap.add_argument(
        "--channels", type=int, default=73,
        help="archive channel count (73 = real ERA5 payload; 8 fits the dev "
        "tunnel's H2D link for end-to-end overlap validation)",
    )
    args = ap.parse_args()

    C = args.channels
    frame_bytes = C * H * W * 4
    root = "/tmp/loader_bench" if C == 73 else f"/tmp/loader_bench_c{C}"
    data_dir = ensure_archive(root, args.frames, C)
    params = flagship_loader_params(root, data_dir, C)
    if args.workers:
        params["num_data_workers"] = args.workers

    from swin_v2_weather_tpu.data.pipeline import device_prefetch, get_data_loader

    loader, dataset = get_data_loader(params, data_dir, train=True)
    result = {
        "frames": args.frames,
        "channels": C,
        "native": dataset._native is not None,
    }

    # (a) loader-only: steady-state over n batches (sample pair = inp+tar)
    it = iter(loader)
    next(it)  # warm: thread pool spun up, lookahead filled
    n = 0
    t0 = time.perf_counter()
    for batch in it:
        n += batch["inp"].shape[0]
        if n >= args.batches:
            break
    dt = time.perf_counter() - t0
    sps = n / dt
    result["loader_samples_per_s"] = round(sps, 3)
    # each sample reads inp + tar frames (73 ch each) and normalizes them
    result["loader_GBps"] = round(sps * 2 * frame_bytes / 1e9, 3)

    if args.device or args.e2e:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_xla_cache"),
        )
        from swin_v2_weather_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(None, devices=jax.devices()[:1])

    if args.device:
        import jax
        import jax.numpy as jnp

        loader.set_epoch(1)
        stream = device_prefetch(iter(loader), mesh)
        first = next(stream)  # warm
        _ = [float(v.ravel()[0]) for v in first.values()]
        n = 0
        t0 = time.perf_counter()
        for batch in stream:
            # force a host fetch of one element PER ARRAY: through the
            # axon tunnel block_until_ready() does not block, and syncing
            # only one array lets the others' transfers stay in flight
            # past the timer (the r5 first-cut artifact undercounted the
            # input leg exactly this way). The prefetch generator still
            # keeps `depth` batches in flight ahead of this sync point.
            _ = [float(v.ravel()[0]) for v in batch.values()]
            n += batch["inp"].shape[0]
            if n >= args.batches:
                break
        dt = time.perf_counter() - t0
        result["device_samples_per_s"] = round(n / dt, 3)
        result["device_GBps"] = round(n / dt * 2 * frame_bytes / 1e9, 3)

    if args.e2e:
        import jax
        import jax.numpy as jnp

        from swin_v2_weather_tpu.data.preprocess import Preprocessor
        from swin_v2_weather_tpu.models.wrappers import get_model
        from swin_v2_weather_tpu.ops.losses import LossHandler
        from swin_v2_weather_tpu.training.optim import build_optimizer
        from swin_v2_weather_tpu.training.step import TrainState, build_train_step

        params["attn_impl"] = "pallas_qkv"
        params["activation_ckpt"] = True
        params["remat_policy"] = "mlp3"
        params["scan_blocks"] = False
        model = get_model(params)
        optimizer = build_optimizer(params)
        x = jnp.zeros(
            (1, int(params["n_in_channels"]), 720, 1440), jnp.float32
        )
        variables = model.init(jax.random.key(0), x, train=False)
        state = TrainState.create(variables["params"], optimizer)
        del variables
        step = build_train_step(
            model, LossHandler(params), Preprocessor(params), optimizer, mesh
        )

        loader.set_epoch(2)
        stream = device_prefetch(iter(loader), mesh)
        key = jax.random.key(1)
        # warm compile on the first real batch
        state, metrics = step(state, next(stream), key)
        _ = float(metrics["loss"])
        n = 0
        last = None
        t0 = time.perf_counter()
        for batch in stream:
            state, metrics = step(state, batch, key)
            last = batch
            n += 1
            if n >= args.batches:
                break
        _ = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / n
        result["e2e_ms_per_step"] = round(dt * 1e3, 1)
        result["e2e_samples_per_s"] = round(1.0 / dt, 3)

        # compute-only floor on the SAME (already device-resident) batch:
        # the overlap claim is e2e ~= max(compute, input-side)
        for _ in range(2):
            state, metrics = step(state, last, key)
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(max(4, args.batches // 2)):
            state, metrics = step(state, last, key)
        _ = float(metrics["loss"])
        cdt = (time.perf_counter() - t0) / max(4, args.batches // 2)
        result["compute_ms_per_step"] = round(cdt * 1e3, 1)
        result["e2e_over_max_legs"] = round(
            dt / max(cdt, 1.0 / result.get("device_samples_per_s", 1e9)), 3
        ) if "device_samples_per_s" in result else None

    print(json.dumps(result))


if __name__ == "__main__":
    main()
