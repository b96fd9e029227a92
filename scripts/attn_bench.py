"""Standalone timing for the Pallas window-attention kernels on the real chip.

Times the v3 (qkv-fused) forward and backward kernels — and optionally the
v2 grid kernels (CPB-bias / rel_pos case) — at flagship shape, in isolation
from the rest of the train step, so kernel-schedule iterations compile in
minutes instead of the full-step ~15.

Method: the kernel output shape equals its input shape at flagship geometry
(C_in == C), so N invocations are chained inside one jit via fori_loop —
no per-call dispatch, and the axon-tunnel non-blocking-dispatch gotcha is
handled by fetching a scalar reduction of the result.

Usage:
    python scripts/attn_bench.py [--iters 50] [--which v3,v2] [--fwd-wc 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_chain(fn, x0, iters):
    import jax
    import jax.numpy as jnp

    f = jax.jit(
        lambda x: jax.lax.fori_loop(0, iters, lambda i, xx: fn(xx).astype(xx.dtype), x)
    )
    r = f(x0)
    _ = float(jnp.sum(r.astype(jnp.float32)))  # warm + force fetch
    best = float("inf")
    for trial in range(2):
        # repeated identical calls can be served from a cache through the
        # axon tunnel (measured: a 50-iter chain "ran" in 0.15 ms total) —
        # every timed call must see a unique input
        x_t = x0 + x0.dtype.type(1e-3 * (trial + 1))
        x_t.block_until_ready()
        t0 = time.perf_counter()
        r = f(x_t)
        _ = float(jnp.sum(r.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--which", default="v3")
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--json", default=None, help="append results to this JSONL file")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_xla_cache"),
    )
    import jax.numpy as jnp

    from swin_v2_weather_tpu.models.swin import make_shift_mask

    # A/B against historical kernel generations: SWIN_WA_MODULE=<path.py>
    # loads that file as the window_attention module instead (it is
    # self-contained modulo jax/pallas imports)
    alt = os.environ.get("SWIN_WA_MODULE")
    if alt:
        import importlib.util

        spec = importlib.util.spec_from_file_location("wa_alt", alt)
        wa = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(wa)
    else:
        from swin_v2_weather_tpu.ops import window_attention as wa

    H, W, C, heads, C_in = 180, 360, 768, 8, 768
    wh, ww = 9, 18
    rng = np.random.default_rng(0)
    patt = make_shift_mask((H, W), (wh, ww), (wh // 2, ww // 2))[-1]
    results = {}
    which = set(args.which.split(","))

    x = jnp.asarray(rng.standard_normal((1, H, W, C_in)) * 0.5, jnp.bfloat16)
    w_qkv = jnp.asarray(rng.standard_normal((C_in, 3 * C)) * 0.02, jnp.bfloat16)
    b_qkv = jnp.asarray(rng.standard_normal(3 * C) * 0.01, jnp.float32)
    w_o = jnp.asarray(rng.standard_normal((C, C)) * 0.02, jnp.bfloat16)
    b_o = jnp.asarray(rng.standard_normal(C) * 0.01, jnp.bfloat16)
    scale = jnp.asarray(
        np.exp(rng.standard_normal(heads) * 0.1 + 1.0), jnp.float32
    )

    # backward-only chain: vjp residuals captured once, cotangent chained
    def bwd_chain(fn, x0, g0, iters):
        def outer(xx, gg):
            y, vjp = jax.vjp(fn, xx)
            def body(i, g):
                (dx,) = vjp(g)
                return dx.astype(g.dtype)
            return jax.lax.fori_loop(0, iters, body, gg)

        f = jax.jit(outer)
        r = f(x0, g0)
        _ = float(jnp.sum(r.astype(jnp.float32)))
        best = float("inf")
        for trial in range(2):  # unique inputs: see _time_chain
            g_t = g0 + g0.dtype.type(1e-3 * (trial + 1))
            g_t.block_until_ready()
            t0 = time.perf_counter()
            r = f(x0, g_t)
            _ = float(jnp.sum(r.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    if "v3" in which:
        def fwd(xx):
            return wa.fused_window_attention_qkv(
                xx, w_qkv, b_qkv, scale, (wh, ww), mask_pattern=patt
            )

        results["v3_fwd_ms"] = _time_chain(fwd, x, args.iters) * 1e3

        if args.fwd_only:
            print(json.dumps({k: round(v, 3) for k, v in results.items()}))
            return

        g0 = jnp.asarray(rng.standard_normal((1, H, W, C)) * 0.5, jnp.bfloat16)
        # subtract one fwd (the vjp's primal) amortized over iters: negligible
        results["v3_bwd_ms"] = bwd_chain(fwd, x, g0, args.iters) * 1e3

    if "v3b" in which:
        # v3 with the CPB bias riding the kernels (rel_pos=true path):
        # overhead vs the v3 rows is the in-kernel bias cost
        l = wh * ww
        bias0 = jnp.asarray(rng.standard_normal((heads, l, l)) * 0.1, jnp.float32)

        def fwdb(xx):
            return wa.fused_window_attention_qkv(
                xx, w_qkv, b_qkv, scale, (wh, ww), mask_pattern=patt, bias=bias0
            )

        results["v3b_fwd_ms"] = _time_chain(fwdb, x, args.iters) * 1e3
        if not args.fwd_only:
            g0 = jnp.asarray(rng.standard_normal((1, H, W, C)) * 0.5, jnp.bfloat16)
            results["v3b_bwd_ms"] = bwd_chain(fwdb, x, g0, args.iters) * 1e3

    if "v3p" in which:
        # attention + the following proj matmul: the unit the model runs,
        # for apples-to-apples comparison with v6 (whose proj absorbs the
        # lane padding)
        def fwd3p(xx):
            o = wa.fused_window_attention_qkv(
                xx, w_qkv, b_qkv, scale, (wh, ww), mask_pattern=patt
            )
            return (jnp.dot(o, w_o) + b_o).astype(xx.dtype)

        results["v3p_fwd_ms"] = _time_chain(fwd3p, x, args.iters) * 1e3
        g0 = jnp.asarray(rng.standard_normal((1, H, W, C)) * 0.5, jnp.bfloat16)
        if not args.fwd_only:
            results["v3p_bwd_ms"] = bwd_chain(fwd3p, x, g0, args.iters) * 1e3

    if "v6" in which:
        def fwd6(xx):
            o = wa.fused_window_attention_qkv_padded(
                xx, w_qkv, b_qkv, scale, (wh, ww), mask_pattern=patt
            )
            return (
                jnp.dot(o, wa.pad_proj_rows(w_o, heads)) + b_o
            ).astype(xx.dtype)

        results["v6p_fwd_ms"] = _time_chain(fwd6, x, args.iters) * 1e3
        g0 = jnp.asarray(rng.standard_normal((1, H, W, C)) * 0.5, jnp.bfloat16)
        if not args.fwd_only:
            results["v6p_bwd_ms"] = bwd_chain(fwd6, x, g0, args.iters) * 1e3

    if "v2" in which:
        l = wh * ww
        q = jnp.asarray(rng.standard_normal((1, H, W, C)) * 0.5, jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((1, H, W, C)) * 0.5, jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((1, H, W, C)) * 0.5, jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((heads, l, l)) * 0.1, jnp.float32)
        scale = jnp.asarray(
            np.exp(rng.standard_normal(heads) * 0.1 + 1.0), jnp.float32
        )

        def fwd2(qq):
            return wa.fused_window_attention_grid(
                qq, k, v, scale, (wh, ww), bias=bias, mask_pattern=patt
            )

        results["v2_bias_fwd_ms"] = _time_chain(fwd2, q, args.iters) * 1e3

        def outer2(qq, gg):
            y, vjp = jax.vjp(fwd2, qq)
            def body(i, g):
                (dq,) = vjp(g)
                return dq.astype(g.dtype)
            return jax.lax.fori_loop(0, args.iters, body, gg)

        f2 = jax.jit(outer2)
        g0 = jnp.asarray(rng.standard_normal((1, H, W, C)) * 0.5, jnp.bfloat16)
        r = f2(q, g0)
        _ = float(jnp.sum(r.astype(jnp.float32)))
        best = float("inf")
        for trial in range(2):  # unique inputs: see _time_chain
            g_t = g0 + jnp.bfloat16(1e-3 * (trial + 1))
            g_t.block_until_ready()
            t0 = time.perf_counter()
            r = f2(q, g_t)
            _ = float(jnp.sum(r.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        results["v2_bias_bwd_ms"] = best * 1e3

    env = {
        k: os.environ[k]
        for k in ("SWIN_QKV_FWD_WC", "SWIN_QKV_BWD_WC", "SWIN_ATTN_CHUNKS")
        if k in os.environ
    }
    line = {"shape": f"{H}x{W}x{C} h{heads} w{wh}x{ww}", **env,
            **{k: round(v, 3) for k, v in results.items()}}
    print(json.dumps(line))
    if args.json:
        with open(args.json, "a") as f:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
