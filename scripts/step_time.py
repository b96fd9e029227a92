"""Measure flagship train-step time under a given config on the real chip.

Usage:
    python scripts/step_time.py --attn pallas_qkv --remat mlp --bs 1 [--profile DIR]

Prints one line: config + ms/step + samples/s/chip. Used for the perf
sweeps recorded in ROADMAP.md; bench.py pins the winning config.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="config family (default: flagship)")
    ap.add_argument("--attn", default="pallas_qkv")
    ap.add_argument("--remat", default="mlp", help="'off' disables activation ckpt")
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--nfuture", type=int, default=0, help="in-graph rollout steps - 1")
    ap.add_argument("--no-scan", action="store_true", help="unroll block pairs")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--profile", default=None, help="capture a jax.profiler trace here")
    ap.add_argument(
        "--mem", action="store_true",
        help="print the compiled program's HBM analysis (peak temp size etc.)",
    )
    ap.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="override a config value (yaml-parsed; repeatable), e.g. "
        "--set rel_pos=true --set full_pos_embed=false",
    )
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_xla_cache"),
    )
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_params
    from swin_v2_weather_tpu.data.preprocess import Preprocessor
    from swin_v2_weather_tpu.models.wrappers import get_model
    from swin_v2_weather_tpu.ops.losses import LossHandler
    from swin_v2_weather_tpu.parallel.mesh import make_mesh
    from swin_v2_weather_tpu.training.optim import build_optimizer
    from swin_v2_weather_tpu.training.step import TrainState, build_train_step

    if args.config:
        from swin_v2_weather_tpu.config.yparams import YParams, default_config_path
        from swin_v2_weather_tpu.data.preprocess import derived_channel_counts

        params = YParams(default_config_path(), args.config)
        params["in_channels"] = np.asarray(params["in_channels"])
        params["out_channels"] = np.asarray(params["out_channels"])
        n_in, n_out_ = derived_channel_counts(params)
        params["n_in_channels"], params["n_out_channels"] = n_in, n_out_
        params["img_shape_x"] = int(params.img_size[0])
        params["img_shape_y"] = int(params.img_size[1])
    else:
        params = _flagship_params()
    params["data_loader_config"] = "synthetic"
    params["attn_impl"] = args.attn
    if args.nfuture:
        params["n_future"] = args.nfuture
    if args.no_scan:
        params["scan_blocks"] = False
    if args.remat == "off":
        params["activation_ckpt"] = False
    else:
        params["activation_ckpt"] = True
        params["remat_policy"] = args.remat
    overrides = []
    for item in args.set:
        key, _, value = item.partition("=")
        import yaml as _yaml

        params[key] = _yaml.safe_load(value)
        overrides.append(item)

    mesh = make_mesh(None, devices=jax.devices()[:1])
    model = get_model(params)
    loss_obj = LossHandler(params)
    preprocessor = Preprocessor(params)
    optimizer = build_optimizer(params)

    h, w = params["img_shape_x"], params["img_shape_y"]
    n_data = len(params["in_channels"])
    n_out = int(params["n_out_channels"])
    rng = np.random.default_rng(0)
    bs = args.bs
    n_steps_roll = int(params.get("n_future", 0)) + 1
    batch = {
        "inp": jnp.asarray(rng.standard_normal((bs, n_data, h, w)), jnp.float32),
        "tar": jnp.asarray(
            rng.standard_normal((bs, n_steps_roll * n_out, h, w)), jnp.float32
        ),
        "zen_inp": jnp.asarray(rng.standard_normal((bs, 1, h, w)), jnp.float32),
        "zen_tar": jnp.asarray(
            rng.standard_normal((bs, n_steps_roll, h, w)), jnp.float32
        ),
    }
    batch = jax.device_put(batch, jax.devices()[0])

    x = jnp.zeros((1, int(params["n_in_channels"]), h, w), jnp.float32)
    tzen = jnp.zeros((1, n_steps_roll, h, w), jnp.float32)
    variables = model.init(jax.random.key(0), x, coszen=tzen, train=False)
    state = TrainState.create(variables["params"], optimizer)
    del variables

    train_step = build_train_step(model, loss_obj, preprocessor, optimizer, mesh)
    key = jax.random.key(1)

    if args.mem:
        # train_step is already a jitted callable (build_train_step)
        ma = train_step.lower(state, batch, key).compile().memory_analysis()
        if ma is not None:
            print(
                f"hbm: temp={ma.temp_size_in_bytes / 2**30:.2f}G "
                f"args={ma.argument_size_in_bytes / 2**30:.2f}G "
                f"out={ma.output_size_in_bytes / 2**30:.2f}G "
                f"total={(ma.temp_size_in_bytes + ma.argument_size_in_bytes) / 2**30:.2f}G"
            )

    t0 = time.perf_counter()
    for _ in range(8):
        state, metrics = train_step(state, batch, key)
    _ = float(metrics["loss"])
    warm = time.perf_counter() - t0

    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = train_step(state, batch, key)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    if args.profile:
        jax.profiler.stop_trace()

    print(
        f"{args.config or 'flagship'} attn={args.attn} remat={args.remat} bs={bs}"
        f"{' noscan' if args.no_scan else ''}"
        f"{f' nfuture={args.nfuture}' if args.nfuture else ''}"
        f"{' ' + ' '.join(overrides) if overrides else ''}: "
        f"{dt * 1e3:.1f} ms/step, {bs / dt:.3f} samples/s/chip "
        f"(warmup {warm:.0f}s)"
    )


if __name__ == "__main__":
    main()
