"""Headline benchmark: flagship single-step training throughput per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

Baseline (BASELINE.md): the reference trains the 73-var depth-12 flagship at
~0.5 samples/s/GPU on A100-80GB in the 2-step fine-tune config; single-step
pretraining is ~2x faster per sample, so the A100 single-step baseline is
~1.0 samples/s/GPU. ``vs_baseline`` is measured samples/s/chip divided by
that 1.0.

Runs the real jitted train step (forward + backward + adam update, bf16
compute, Pallas window attention) on synthetic device-resident data — pure
compute throughput of one chip, no input pipeline in the way. Batch size
and remat are picked to fit a single chip's HBM.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

A100_SINGLE_STEP_BASELINE = 1.0  # samples/s/GPU, derived in BASELINE.md


def main():
    import jax

    # persistent XLA compile cache: repeat bench runs skip the ~3-min compile
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

    params = _flagship_params()
    params["data_loader_config"] = "synthetic"  # device-resident random batch
    batch_size = int(params.get("bench_batch_size", 1))
    params["activation_ckpt"] = True  # fit 720x1440 depth-12 on one chip
    # measured-best single-chip config (see ROADMAP.md): qkv-fused attention
    # kernel (batched-head fwd/bwd) + min-recompute 'mlp3' remat policy +
    # unrolled blocks (no scan-stacked save buffers: the per-iteration
    # dynamic-update-slice saves ran at ~1/6 HBM peak; 465 -> 431 ms) +
    # fused fc1+GELU Pallas kernel pair (SWIN_MLP_IMPL default; 431 -> 417)
    params["attn_impl"] = "pallas_qkv"
    params["remat_policy"] = "mlp3"
    params["scan_blocks"] = False

    mesh = make_mesh(None, devices=jax.devices()[:1])
    model = get_model(params)
    loss_obj = LossHandler(params)
    preprocessor = Preprocessor(params)
    optimizer = build_optimizer(params)

    h, w = params["img_shape_x"], params["img_shape_y"]
    n_data = len(params["in_channels"])
    n_out = int(params["n_out_channels"])
    rng = np.random.default_rng(0)
    batch = {
        "inp": jnp.asarray(rng.standard_normal((batch_size, n_data, h, w)), jnp.float32),
        "tar": jnp.asarray(rng.standard_normal((batch_size, n_out, h, w)), jnp.float32),
        "zen_inp": jnp.asarray(rng.standard_normal((batch_size, 1, h, w)), jnp.float32),
        "zen_tar": jnp.asarray(rng.standard_normal((batch_size, 1, h, w)), jnp.float32),
    }
    batch = jax.device_put(batch, jax.devices()[0])

    x = jnp.zeros((1, int(params["n_in_channels"]), h, w), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    state = TrainState.create(variables["params"], optimizer)
    del variables

    train_step = build_train_step(model, loss_obj, preprocessor, optimizer, mesh)
    key = jax.random.key(1)

    # warmup: compile + the first few state-feedback steps pay a one-time
    # buffer-layout adoption; measure steady state only
    for _ in range(8):
        state, metrics = train_step(state, batch, key)
    _ = float(metrics["loss"])

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = train_step(state, batch, key)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_iters

    samples_per_sec = batch_size / dt
    print(
        json.dumps(
            {
                "metric": "flagship_train_throughput_single_step",
                "value": round(samples_per_sec, 4),
                "unit": "samples/sec/chip",
                "vs_baseline": round(samples_per_sec / A100_SINGLE_STEP_BASELINE, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
