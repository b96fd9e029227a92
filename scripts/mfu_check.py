"""Cross-check bench.py's analytic model-FLOPs against XLA's own count.

VERDICT r4 next #8: the MFU column in BENCH_rNN.json divides an analytic
matmul-only FLOP model (bench.model_flops_fwd, 3x forward for the train
step, remat recompute NOT counted) by measured step time and the v5e bf16
peak. This script validates that analytic model against the FLOP count XLA
derives from the lowered train-step HLO (jax ``lowered.cost_analysis()``),
which DOES include the remat recompute and every non-matmul op. The
analysis ignores custom_call cost estimates, so the step is lowered in its
pure-XLA form (attn_impl='xla', plain MLP) — identical math, every dot
visible.

The expected relationship: xla_flops >= 3 * analytic_fwd, with the excess
attributable to (a) remat recompute of the rematerialized block interior
(policy 'mlp3' recomputes fc1+gelu and proj per block in the backward) and
(b) non-matmul ops (norms, softmax, elementwise). The analytic figure is
therefore a *conservative* "model FLOPs" MFU, the convention used by
PaLM/scaling-book-style reports.

Pure shape analysis — no TPU or execution needed (runs on the CPU backend;
FLOP counts depend only on the lowered program, not the device).

Usage: python scripts/mfu_check.py [--config NAME]
Prints one JSON line with both counts and the breakdown ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="config family (default flagship)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from bench import build_params, model_flops_fwd
    from swin_v2_weather_tpu.data.preprocess import Preprocessor
    from swin_v2_weather_tpu.models.wrappers import get_model
    from swin_v2_weather_tpu.ops.losses import LossHandler
    from swin_v2_weather_tpu.parallel.mesh import make_mesh
    from swin_v2_weather_tpu.training.optim import build_optimizer
    from swin_v2_weather_tpu.training.step import TrainState, build_train_step

    # Lower the PURE-XLA variant of the same math: cost_analysis() on the
    # lowered HLO ignores the Pallas custom_calls' declared CostEstimate
    # flops (measured: the fused attention+MLP kernels' ~7.2 TFLOP of the
    # flagship forward vanish from the count), so the kernel-ized program
    # undercounts. The xla/plain program computes identical math with every
    # dot visible to the analysis.
    params = build_params(args.config, {})
    params["attn_impl"] = "xla"
    params["mlp_impl"] = "plain"
    params["lnadd_impl"] = "xla"
    mesh = make_mesh(None, devices=jax.devices()[:1])
    model = get_model(params)
    loss_obj = LossHandler(params)
    preprocessor = Preprocessor(params)
    optimizer = build_optimizer(params)

    h, w = params["img_shape_x"], params["img_shape_y"]
    n_data = len(params["in_channels"])
    n_out = int(params["n_out_channels"])
    n_roll = int(params.get("n_future", 0) or 0) + 1
    batch = {
        "inp": jnp.zeros((1, n_data, h, w), jnp.float32),
        "tar": jnp.zeros((1, n_roll * n_out, h, w), jnp.float32),
        "zen_inp": jnp.zeros((1, 1, h, w), jnp.float32),
        "zen_tar": jnp.zeros((1, n_roll, h, w), jnp.float32),
    }
    x = jnp.zeros((1, int(params["n_in_channels"]), h, w), jnp.float32)
    tzen = jnp.zeros((1, n_roll, h, w), jnp.float32)
    variables = jax.eval_shape(
        lambda k: model.init(k, x, coszen=tzen, train=False), jax.random.key(0)
    )
    pshape = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables["params"]
    )
    state = TrainState.create(pshape, optimizer)

    train_step = build_train_step(model, loss_obj, preprocessor, optimizer, mesh)
    lowered = train_step.lower(state, batch, jax.random.key(1))
    cost = lowered.cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    xla_flops = float(cost.get("flops", float("nan")))

    analytic_fwd = model_flops_fwd(params) * n_roll
    analytic_step = 3.0 * analytic_fwd
    out = {
        "config": args.config or "flagship",
        "analytic_fwd_model_tflops": round(analytic_fwd / 1e12, 4),
        "analytic_step_tflops_3x_fwd": round(analytic_step / 1e12, 4),
        "xla_lowered_step_tflops": round(xla_flops / 1e12, 4),
        "xla_over_analytic": round(xla_flops / analytic_step, 4),
        "note": (
            "xla count (pure-XLA variant of the same math) includes remat "
            "recompute (policy mlp3 re-runs fc1+gelu+proj per block in the "
            "backward) and non-matmul ops; the analytic 3x-forward "
            "model-FLOPs figure is the conservative MFU numerator by "
            "convention (xla/analytic ~1.23 at flagship, i.e. hardware MFU "
            "is ~23% higher than the reported model-FLOPs MFU)"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
