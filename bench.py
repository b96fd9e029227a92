"""Headline benchmark: config-family training throughput per chip.

Prints ONE JSON line. Top-level fields keep the original contract —
    {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}
— where `value` is the FLAGSHIP single-step throughput, and a "families"
key carries the full measured table (ms/step, samples/s/chip, x-baseline,
and MFU) for every config family the reference budgets real jobs for
(`/root/reference/config/swin.yaml`): flagship, relative-loss, CPB
(rel_pos), 2/4/8-step fine-tune, depth-24.

Baselines (BASELINE.md): the reference documents ~0.5 samples/s/GPU on
A100-80GB for the 2-step fine-tune (`config/swin.yaml:202`, the ONE config
with a stated throughput). Rollout cost scales linearly with in-graph
steps and single-step pretraining is ~2x faster per sample, so the derived
per-family A100 baselines are 1.0/n_steps samples/s/GPU; depth-24 halves
the single-step rate (0.5); CPB has no reference config (no A100 number) —
it is compared against the single-step 1.0 as the nearest anchor.

MFU: model FLOPs are computed analytically from the config (matmul terms
only: patch embed, qkv, scores, attn@v, proj, MLP, head — 2*M*N*K each),
train step = 3x forward (backward is 2x; remat recompute is NOT counted,
so the figure is a conservative "model FLOPs" MFU), divided by measured
step time and the v5e bf16 peak of 197 TFLOP/s.

Runs the real jitted train step (forward + backward + adam update, bf16
compute, Pallas window attention) on synthetic device-resident data — pure
compute throughput of one chip, no input pipeline in the way. Batch size
and remat are picked to fit a single chip's HBM.

Emission contract (VERDICT r4 next #1 — the r4 run printed nothing before
the driver timeout): the flagship row is measured FIRST, and a complete,
valid JSON line is printed+flushed after EVERY family, each line a
cumulative snapshot superseding the previous one — whichever line is the
last on stdout is the full result so far. A wall-clock budget
(BENCH_BUDGET_S, default 900 s) is enforced between families: when the
projected cost of the next family would overrun it, the remaining rows are
emitted as {"skipped": "budget"} and the run exits 0 with everything it
measured. The default covers the flagship row plus slack only — each
family's remote compile is ~10 min on the dev tunnel and uncacheable — so
the full family table measured on the same chip in-round is committed as
BENCH_FAMILIES_r05.json; budget-skipped families whose committed row exists
are emitted with that row's numbers plus an explicit "source" field naming
the artifact (never silently — provenance is always in the line itself).
Re-measure any row live with BENCH_FAMILIES=<name> BENCH_BUDGET_S=3600.

Set BENCH_FLAGSHIP_ONLY=1 to skip the family rows (fast smoke run).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

A100_SINGLE_STEP_BASELINE = 1.0  # samples/s/GPU, derived in BASELINE.md
V5E_BF16_PEAK = 197e12  # FLOP/s

# (row name, config-family name or None for flagship, overrides, bs, iters,
#  A100 baseline samples/s/GPU). Ordered by evidence value: flagship first
# (the headline number the driver must always capture), then the rows the
# verdict requires, then rel_loss (measures == flagship; lowest news value).
FAMILIES = [
    ("flagship_1step", None, {}, 1, 20, 1.0),
    ("cpb_rel_pos", None, {"rel_pos": True, "full_pos_embed": False}, 1, 20, 1.0),
    ("finetune_2step", None, {"n_future": 1}, 1, 12, 0.5),
    ("finetune_4step", None, {"n_future": 3}, 1, 8, 0.25),
    ("finetune_8step", None, {"n_future": 7}, 1, 6, 0.125),
    ("depth24", "swin_73var_geo_depth24_chweight_invar", {}, 1, 12, 0.5),
    ("rel_loss", "swin_73var_geo_depth12_chweight_invar_rel", {}, 1, 20, 1.0),
    # fallback rows: this session the tunnel's compile helper reproducibly
    # crashes (HTTP 500, subprocess exit 1) on the two LARGEST unrolled
    # programs (8-step, depth-24) while every flagship-sized program
    # compiles fine; scan_blocks=True trades ~57 ms/step of
    # dynamic-update-slice (r2 measurement at depth-12) for a program one
    # scanned block-pair long, which both shrinks the compile and stacks
    # remat saves at ~1/6 HBM peak. NOT run by default — measured as
    # explicit BENCH_FAMILIES selections when the plain rows fail.
    ("finetune_8step_scanblocks", None, {"n_future": 7, "scan_blocks": True}, 1, 6, 0.125),
    ("depth24_scanblocks", "swin_73var_geo_depth24_chweight_invar", {"scan_blocks": True}, 1, 12, 0.5),
    # 8-step with bf16 rollout stacks (rollout_stack_dtype, the documented
    # HBM-fit option — the fp32 stacks alone put 8-step past 16 GB)
    ("finetune_8step_bf16stack", None,
     {"n_future": 7, "rollout_stack_dtype": "bfloat16"}, 1, 6, 0.125),
]
DEFAULT_SKIP = {
    "finetune_8step_scanblocks", "depth24_scanblocks", "finetune_8step_bf16stack",
}


def model_flops_fwd(params) -> float:
    """Analytic matmul FLOPs of ONE forward pass (one rollout step)."""
    h, w = int(params["img_shape_x"]), int(params["img_shape_y"])
    p = int(params["patch_size"])
    c = int(params["embed_dim"])
    depth = int(params["depth"])
    cin = int(params["n_in_channels"])
    cout = int(params["n_out_channels"])
    ratio = int(params["window_ratio"])
    mlp_ratio = float(params.get("mlp_ratio", 4.0))
    hp, wp = h // p, w // p
    t = hp * wp
    l = (h // ratio) * (w // ratio)  # window sequence length (9*18 = 162)
    f = 2.0 * t * (cin * p * p) * c  # patch embed (space-to-depth matmul)
    per_block = 2.0 * t * c * (3 * c) + 2 * (2.0 * t * l * c) + 2.0 * t * c * c
    per_block += 2 * (2.0 * t * c * (mlp_ratio * c))  # fc1 + fc2
    f += depth * per_block
    f += 2.0 * t * c * (cout * p * p)  # head
    return f


def build_params(name, overrides):
    from __graft_entry__ import _flagship_params

    if name is None:
        params = _flagship_params()
    else:
        from swin_v2_weather_tpu.config.yparams import YParams, default_config_path
        from swin_v2_weather_tpu.data.preprocess import derived_channel_counts

        params = YParams(default_config_path(), name)
        params["in_channels"] = np.asarray(params["in_channels"])
        params["out_channels"] = np.asarray(params["out_channels"])
        n_in, n_out = derived_channel_counts(params)
        params["n_in_channels"], params["n_out_channels"] = n_in, n_out
        params["img_shape_x"] = int(params.img_size[0])
        params["img_shape_y"] = int(params.img_size[1])
    params["data_loader_config"] = "synthetic"  # device-resident random batch
    params["activation_ckpt"] = True  # fit 720x1440 depth-12 on one chip
    # measured-best single-chip config (see ROADMAP.md): qkv-fused attention
    # kernel + min-recompute 'mlp3' remat policy + unrolled block pairs +
    # fused MLP Pallas kernels (fc1+GELU pair single-step, whole-MLP pair
    # for multi-step/depth-24 — gated in models/swin.py:get_model)
    params["attn_impl"] = "pallas_qkv"
    params["remat_policy"] = "mlp3"
    params["scan_blocks"] = False
    for k, v in overrides.items():
        params[k] = v
    return params


def measure(params, bs, iters):
    import jax
    import jax.numpy as jnp

    from swin_v2_weather_tpu.data.preprocess import Preprocessor
    from swin_v2_weather_tpu.models.wrappers import get_model
    from swin_v2_weather_tpu.ops.losses import LossHandler
    from swin_v2_weather_tpu.parallel.mesh import make_mesh
    from swin_v2_weather_tpu.training.optim import build_optimizer
    from swin_v2_weather_tpu.training.step import TrainState, build_train_step

    mesh = make_mesh(None, devices=jax.devices()[:1])
    model = get_model(params)
    loss_obj = LossHandler(params)
    preprocessor = Preprocessor(params)
    optimizer = build_optimizer(params)

    h, w = params["img_shape_x"], params["img_shape_y"]
    n_data = len(params["in_channels"])
    n_out = int(params["n_out_channels"])
    n_steps_roll = int(params.get("n_future", 0) or 0) + 1
    rng = np.random.default_rng(0)
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

    # AOT compile so the ONE compile also yields the compiler's HBM
    # analysis (the axon tunnel device exposes no runtime memory_stats);
    # the compiled object is then called directly for warmup + measurement
    compiled = train_step.lower(state, batch, key).compile()
    try:
        ma = compiled.memory_analysis()
        peak_gb = (
            ma.temp_size_in_bytes
            + ma.argument_size_in_bytes
            + ma.output_size_in_bytes
            - ma.alias_size_in_bytes
        ) / 2**30
    except Exception:  # noqa: BLE001 — analysis is backend-optional
        peak_gb = 0.0

    # warmup: the first few state-feedback steps pay a one-time
    # buffer-layout adoption; measure steady state only
    for _ in range(6):
        state, metrics = compiled(state, batch, key)
    _ = float(metrics["loss"])  # forces a host fetch (tunnel-safe sync)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = compiled(state, batch, key)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    return dt, n_steps_roll, peak_gb


def load_committed_rows() -> dict:
    """Committed in-round measurements (scripts/bench_families.py, same
    measurement path + chip): when the budget forces a family to be skipped
    in THIS run, its committed row is attached instead, labeled with its
    provenance — the driver-captured artifact then still carries the full
    table, with the source of every number explicit."""
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_FAMILIES_r05.json")
        ) as f:
            return {
                r["family"]: r
                for r in json.load(f).get("rows", [])
                if "ms_step" in r
            }
    except (OSError, ValueError):
        return {}


def emit(flagship_sps, rows):
    """Print ONE complete JSON line for the current cumulative state."""
    out = {
        "metric": "flagship_train_throughput_single_step",
        "value": round(flagship_sps or 0.0, 4),
        "unit": "samples/sec/chip",
        "vs_baseline": round((flagship_sps or 0.0) / A100_SINGLE_STEP_BASELINE, 4),
        "mfu_note": (
            "3x analytic fwd model FLOPs / time / 197 TFLOP/s (v5e bf16 peak); "
            "remat recompute not counted. Validated vs XLA cost_analysis on the "
            "lowered step (scripts/mfu_check.py): xla/analytic = 1.23 at "
            "flagship, i.e. hardware FLOP/s ~23% above this model-FLOPs figure"
        ),
        "families": rows,
    }
    print(json.dumps(out), flush=True)


def main():
    import jax

    # persistent XLA compile cache: repeat bench runs skip the ~3-min compile
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_xla_cache"),
    )

    flagship_only = os.environ.get("BENCH_FLAGSHIP_ONLY", "0") == "1"
    # BENCH_FAMILIES=finetune_8step,depth24 — run a subset (fresh-process
    # retries of rows that hit transient remote-compile failures)
    only = os.environ.get("BENCH_FAMILIES")
    only = set(only.split(",")) if only else None
    # Wall-clock budget between families: never let a multi-family sweep
    # overrun the driver's timeout and lose everything (that was r4:
    # rc=124, parsed=null). Physics on this dev tunnel (measured r5): each
    # family's remote compile is ~10 min and the axon path ignores the
    # local persistent compile cache, so the default budget deliberately
    # covers the flagship row plus slack only; the remaining rows are
    # emitted as skipped. The full family table measured on the same chip
    # lives in BENCH_FAMILIES_r05.json (builder-measured, committed);
    # re-measure any row with BENCH_FAMILIES=<name> BENCH_BUDGET_S=3600.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "900"))
    t_start = time.perf_counter()

    todo = [
        f
        for f in FAMILIES
        if not (flagship_only and f[0] != "flagship_1step")
        and not (only is not None and f[0] not in only)
        and not (only is None and f[0] in DEFAULT_SKIP)
    ]
    committed = load_committed_rows()

    rows = []
    flagship_sps = None
    family_costs = []  # observed wall seconds per measured family
    out_of_budget = False
    for name, cfg, overrides, bs, iters, baseline in todo:
        elapsed = time.perf_counter() - t_start
        # projected cost of the next family: the worst observed family so
        # far with headroom (compiles vary), floor 150 s for the cold case
        projected = max(150.0, *(1.3 * c for c in family_costs)) if family_costs else 150.0
        if rows and (out_of_budget or elapsed + projected > budget_s):
            out_of_budget = True
            # fall back to the measured scan-blocks form where the plain
            # form's remote compile crashed (depth24 this round)
            hit = committed.get(name) or committed.get(f"{name}_scanblocks")
            if hit:
                row = dict(hit)
                row["source"] = (
                    "BENCH_FAMILIES_r05.json — builder-measured in-round by "
                    "scripts/bench_families.py (same chip, same measurement "
                    "path); not re-measured in this run (budget)"
                )
                rows.append(row)
            else:
                rows.append({"family": name, "skipped": "budget"})
            continue
        t_fam = time.perf_counter()
        try:
            params = build_params(cfg, overrides)
            dt, n_steps_roll, peak_gb = measure(params, bs, iters)
            sps = bs / dt
            fwd = model_flops_fwd(params) * n_steps_roll * bs
            mfu = 3.0 * fwd / dt / V5E_BF16_PEAK
            row = {
                "family": name,
                "ms_step": round(dt * 1e3, 1),
                "samples_s_chip": round(sps, 4),
                "vs_a100_baseline": round(sps / baseline, 3),
                "mfu": round(mfu, 3),
                "peak_hbm_gb": round(peak_gb, 2),
            }
            if name == "flagship_1step":
                flagship_sps = sps
        except Exception as e:  # noqa: BLE001 — record and keep benching
            row = {"family": name, "error": f"{type(e).__name__}: {e}"[:300]}
        family_costs.append(time.perf_counter() - t_fam)
        rows.append(row)
        # cumulative snapshot after EVERY family: if anything downstream
        # dies or the process is killed, the last stdout line still carries
        # every row measured so far
        emit(flagship_sps, rows)

    # final line: includes any budget-skipped rows appended after the last
    # measured family (a duplicate of the previous snapshot is harmless —
    # every line is complete and the last one wins)
    emit(flagship_sps, rows)


if __name__ == "__main__":
    main()
