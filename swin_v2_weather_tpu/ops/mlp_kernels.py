"""Fused fc1+GELU Pallas kernels for the Swin MLP.

Why this exists (r3 roofline, scripts/trace_summary.py on the flagship
step): XLA emits the fc1 matmul and the exact-erf GELU as ONE fusion that
runs the MXU phase and the VPU transcendental phase back-to-back — 3.62 ms
per call at 88 TFLOP/s (45% MXU) with dual 380 MB outputs, 18 calls/step
= 65 ms of a 431 ms step, vs a ~1.9 ms pipelined floor. The reference hits
the same op through cuBLAS + a separate GELU kernel (timm ``Mlp``,
``networks/swinv2_global.py:12``). A tiled Pallas matmul overlaps the GELU
epilogue with the next tile's dot and stores a SINGLE output:

  * ``fc1_gelu(x2, w, b)``      -> gelu(x2 @ w + b)           (forward)
  * ``fc1_dpre(x2, w, b, g)``   -> g * gelu'(x2 @ w + b)      (backward)

The backward kernel folds the GELU derivative into the pre-activation
recompute, so the wide [tokens, hidden] tensors never hit HBM twice: the
custom_vjp in ``fused_fc1_gelu`` reads x and the cotangent once, writes
dpre once, and chains dx/dW/db through plain XLA matmuls (which run at
~95% MXU peak without epilogues).

Numerics match the unfused path: the matmul accumulates fp32, rounds to
bf16 exactly where ``flax.linen.Dense(dtype=bf16)`` does, and the GELU is
the exact erf form (``jax.nn.gelu(approximate=False)``), evaluated in fp32.
"""

from __future__ import annotations

import functools
import math
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


# token-tile target (rows per grid step). 648 divides the flagship's
# 64800 tokens; sweepable for A/B (smaller tiles = more grid steps = more
# DMA/compute overlap opportunity, bigger = fewer per-step overheads).
MLP_TM = int(_os.environ.get("SWIN_MLP_TM", "648"))

# defvjp(optimize_remat=...): when '1', jax makes the custom_vjp residuals
# rematerializable (replaying the residual-producing forward under remat).
# MEASURED A NO-OP for this op: the single-step program compiles
# bit-identically (compile-cache hit, same 14.32G/416 ms) and the 2-step
# fused rollout still OOMs at 20.37G — the multi-step memory caveat is the
# fwd kernel's PRIMAL outputs (the [tokens, hidden] gelu slabs) staying
# live as HLO temps, which XLA's rematerializer does not reclaim for
# opaque tpu_custom_calls; the residuals (x, w, b) were never the problem.
# Kept as an A/B knob, default off.
MLP_OPT_REMAT = _os.environ.get("SWIN_MLP_OPT_REMAT", "0") == "1"


def _pick_tile(tokens: int, target: int = None) -> int:
    """Largest multiple-of-8 divisor of ``tokens`` at or below ``target``."""
    if target is None:
        target = MLP_TM
    best = 8
    for t in range(8, min(tokens, target) + 1, 8):
        if tokens % t == 0:
            best = t
    return best


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7).

    Mosaic has no erf lowering; this uses only mul/add/exp, is odd-extended
    via sign, and its error is ~4 decimal orders below the bf16 output
    resolution of the surrounding network."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(z):
    return 0.5 * z * (1.0 + _erf(z * _INV_SQRT2))


def _gelu_grad(z):
    phi = jnp.exp(z * z * -0.5) * _INV_SQRT2PI
    cdf = 0.5 * (1.0 + _erf(z * _INV_SQRT2))
    return cdf + z * phi


# N-chunk software pipeline knob: chunk c+1's dot issued before chunk c's
# GELU (the attention kernels' head-chunk schedule). MEASURED NEUTRAL at
# flagship shape (417.2 vs 416.9 ms/step for 4 vs 1): Mosaic schedules the
# unchunked body equally well, so the simpler form is the default and the
# knob is kept for A/B on other shapes.
MLP_CHUNKS = int(_os.environ.get("SWIN_MLP_CHUNKS", "1"))


def _n_chunks(hidden: int) -> int:
    nc = max(1, MLP_CHUNKS)
    while nc > 1 and (hidden % nc or (hidden // nc) % 128):
        nc -= 1
    return nc


def _make_fwd_kernel(compute_dtype, hidden: int):
    nc = _n_chunks(hidden)
    hc = hidden // nc

    def kernel(x_ref, w_ref, b_ref, o_ref):
        x = x_ref[...]
        acc = [None] * nc
        acc[0] = jax.lax.dot_general(
            x, w_ref[:, :hc],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for ci in range(nc):
            lo = ci * hc
            if ci + 1 < nc:
                acc[ci + 1] = jax.lax.dot_general(
                    x, w_ref[:, lo + hc : lo + 2 * hc],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            # round to the Dense(dtype) output precision BEFORE the
            # activation, exactly like the unfused fc1 -> gelu path
            pre = (acc[ci] + b_ref[0, lo : lo + hc]).astype(compute_dtype).astype(
                jnp.float32
            )
            o_ref[:, lo : lo + hc] = _gelu_exact(pre).astype(o_ref.dtype)

    return kernel


def _make_bwd_kernel(compute_dtype, hidden: int):
    nc = _n_chunks(hidden)
    hc = hidden // nc

    def kernel(x_ref, w_ref, b_ref, g_ref, o_ref):
        x = x_ref[...]
        acc = [None] * nc
        acc[0] = jax.lax.dot_general(
            x, w_ref[:, :hc],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for ci in range(nc):
            lo = ci * hc
            if ci + 1 < nc:
                acc[ci + 1] = jax.lax.dot_general(
                    x, w_ref[:, lo + hc : lo + 2 * hc],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            pre = (acc[ci] + b_ref[0, lo : lo + hc]).astype(compute_dtype).astype(
                jnp.float32
            )
            o_ref[:, lo : lo + hc] = (
                g_ref[:, lo : lo + hc].astype(jnp.float32) * _gelu_grad(pre)
            ).astype(o_ref.dtype)

    return kernel


def _common_specs(tm: int, c_in: int, hidden: int):
    return [
        pl.BlockSpec((tm, c_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c_in, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def fc1_gelu_pallas(x2, w, b, interpret=None):
    """gelu(x2 @ w + b): [T, C_in] @ [C_in, H] -> [T, H] (dtype of x2)."""
    t, c_in = x2.shape
    hidden = w.shape[-1]
    tm = _pick_tile(t)
    interp = (not _on_tpu()) if interpret is None else interpret
    kernel = _make_fwd_kernel(x2.dtype, hidden)
    return pl.pallas_call(
        kernel,
        grid=(t // tm,),
        in_specs=_common_specs(tm, c_in, hidden),
        out_specs=pl.BlockSpec((tm, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, hidden), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * c_in * hidden,
            bytes_accessed=(t * c_in + c_in * hidden + t * hidden) * x2.dtype.itemsize,
            transcendentals=t * hidden,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interp,
    )(x2, w.astype(x2.dtype), b.reshape(1, -1).astype(jnp.float32))


def fc1_dpre_pallas(x2, w, b, g, interpret=None):
    """g * gelu'(x2 @ w + b): the fused backward pre-activation cotangent."""
    t, c_in = x2.shape
    hidden = w.shape[-1]
    tm = _pick_tile(t)
    interp = (not _on_tpu()) if interpret is None else interpret
    kernel = _make_bwd_kernel(x2.dtype, hidden)
    specs = _common_specs(tm, c_in, hidden)
    specs.append(
        pl.BlockSpec((tm, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        kernel,
        grid=(t // tm,),
        in_specs=specs,
        out_specs=pl.BlockSpec((tm, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, hidden), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * c_in * hidden,
            bytes_accessed=(t * c_in + c_in * hidden + 2 * t * hidden)
            * x2.dtype.itemsize,
            transcendentals=2 * t * hidden,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interp,
    )(x2, w.astype(x2.dtype), b.reshape(1, -1).astype(jnp.float32), g)


@functools.lru_cache(maxsize=8)
def _build(interpret_key):
    # NOTE: the custom_vjp takes x in its ORIGINAL [..., C_in] shape and
    # reshapes inside — the saved residual is then value-identical to the
    # tensor the remat policy already keeps ('block_mid'), so XLA can alias
    # the two saves instead of materializing a duplicate per block.

    @jax.custom_vjp
    def fused(x, w, b):
        x2 = x.reshape(-1, x.shape[-1])
        return fc1_gelu_pallas(x2, w, b).reshape(*x.shape[:-1], w.shape[-1])

    def f_fwd(x, w, b):
        return fused(x, w, b), (x, w, b)

    def f_bwd(res, g):
        x, w, b = res
        cdt = x.dtype
        x2 = x.reshape(-1, x.shape[-1])
        g2 = g.reshape(-1, g.shape[-1]).astype(cdt)
        dpre = fc1_dpre_pallas(x2, w, b, g2)
        # projection backward at full MXU rate (no epilogues): bf16 in,
        # fp32 accumulate
        dx = jnp.dot(dpre, w.astype(cdt).T, preferred_element_type=jnp.float32)
        dw = jax.lax.dot_general(
            x2, dpre,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db = jnp.sum(dpre.astype(jnp.float32), axis=0)
        return (
            dx.astype(x.dtype).reshape(x.shape),
            dw.astype(w.dtype),
            db.astype(b.dtype),
        )

    fused.defvjp(f_fwd, f_bwd, optimize_remat=MLP_OPT_REMAT)
    return fused


def fused_fc1_gelu(x, w, b):
    """gelu(x @ w + b) with the Pallas kernel pair; x: [..., C_in]."""
    return _build(not _on_tpu())(x, w, b)


# ---------------------------------------------------------------------------
# Whole-MLP kernel (fc1 + GELU + fc2 in ONE pallas_call): the [T, hidden]
# gelu slab never exists in HBM. vs the fc1-fused path this removes one
# 380 MB write + one 380 MB read per forward at flagship shape, and — the
# structural point — removes the custom_vjp PRIMAL [T, hidden] output whose
# HLO-temp liveness makes the fc1-fused path OOM on multi-step rollouts
# (see the ROADMAP fused-MLP memory caveat). The backward recomputes
# pre/gelu per tile in one kernel that also folds in the fc2 input
# cotangent, then chains dW1/dW2/dx/db through epilogue-free XLA matmuls —
# the same 5 matmul-units the fc1-fused backward pays, with the saved `a`
# read traded for an in-kernel recompute write.
# ---------------------------------------------------------------------------


def _make_mlp_fwd_kernel(compute_dtype):
    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        x = x_ref[...]
        pre = jax.lax.dot_general(
            x, w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # round exactly where Dense(dtype) rounds in the unfused path
        pre = (pre + b1_ref[0]).astype(compute_dtype).astype(jnp.float32)
        a = _gelu_exact(pre).astype(compute_dtype)
        out = jax.lax.dot_general(
            a, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Dense rounds the dot to compute dtype, THEN adds the bias in it
        o_ref[...] = out.astype(compute_dtype) + b2_ref[0].astype(compute_dtype)

    return kernel


def _make_mlp_bwd_kernel(compute_dtype):
    """Recompute pre/a and produce (a, dpre) in one x/g read per tile:
    a feeds dW2, dpre feeds dx/dW1/db1 (plain XLA matmuls outside)."""

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, g_ref, a_ref, dpre_ref):
        x = x_ref[...]
        pre = jax.lax.dot_general(
            x, w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pre = (pre + b1_ref[0]).astype(compute_dtype).astype(jnp.float32)
        a_ref[...] = _gelu_exact(pre).astype(compute_dtype)
        # da = g @ W2^T (contract the feature dim of both)
        da = jax.lax.dot_general(
            g_ref[...], w2_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpre_ref[...] = (da * _gelu_grad(pre)).astype(compute_dtype)

    return kernel


def mlp_fwd_pallas(x2, w1, b1, w2, b2, interpret=None):
    """gelu(x2 @ w1 + b1) @ w2 + b2: [T, C] -> [T, C_out], one kernel."""
    t, c_in = x2.shape
    hidden = w1.shape[-1]
    c_out = w2.shape[-1]
    tm = _pick_tile(t)
    interp = (not _on_tpu()) if interpret is None else interpret
    return pl.pallas_call(
        _make_mlp_fwd_kernel(x2.dtype),
        grid=(t // tm,),
        in_specs=[
            pl.BlockSpec((tm, c_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, c_out), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * hidden * (c_in + c_out),
            bytes_accessed=(t * c_in + c_in * hidden + hidden * c_out + t * c_out)
            * x2.dtype.itemsize,
            transcendentals=t * hidden,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interp,
    )(
        x2,
        w1.astype(x2.dtype),
        b1.reshape(1, -1).astype(jnp.float32),
        w2.astype(x2.dtype),
        b2.reshape(1, -1).astype(jnp.float32),
    )


def mlp_bwd_pallas(x2, w1, b1, w2, g2, interpret=None):
    """(a, dpre) for the whole-MLP backward; one fused recompute kernel."""
    t, c_in = x2.shape
    hidden = w1.shape[-1]
    c_out = w2.shape[-1]
    tm = _pick_tile(t)
    interp = (not _on_tpu()) if interpret is None else interpret
    return pl.pallas_call(
        _make_mlp_bwd_kernel(x2.dtype),
        grid=(t // tm,),
        in_specs=[
            pl.BlockSpec((tm, c_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, hidden), x2.dtype),
            jax.ShapeDtypeStruct((t, hidden), x2.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t * hidden * (c_in + c_out),
            bytes_accessed=(t * c_in + c_in * hidden + hidden * c_out + t * c_out
                            + 2 * t * hidden) * x2.dtype.itemsize,
            transcendentals=2 * t * hidden,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interp,
    )(
        x2,
        w1.astype(x2.dtype),
        b1.reshape(1, -1).astype(jnp.float32),
        w2.astype(x2.dtype),
        g2,
    )


@functools.lru_cache(maxsize=8)
def _build_mlp(interpret_key):
    @jax.custom_vjp
    def fused(x, w1, b1, w2, b2):
        x2 = x.reshape(-1, x.shape[-1])
        return mlp_fwd_pallas(x2, w1, b1, w2, b2).reshape(
            *x.shape[:-1], w2.shape[-1]
        )

    def f_fwd(x, w1, b1, w2, b2):
        return fused(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)

    def f_bwd(res, g):
        x, w1, b1, w2, b2 = res
        cdt = x.dtype
        x2 = x.reshape(-1, x.shape[-1])
        g2 = g.reshape(-1, g.shape[-1]).astype(cdt)
        a, dpre = mlp_bwd_pallas(x2, w1, b1, w2, g2)
        dw2 = jax.lax.dot_general(
            a, g2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db2 = jnp.sum(g2.astype(jnp.float32), axis=0)
        dx = jnp.dot(dpre, w1.astype(cdt).T, preferred_element_type=jnp.float32)
        dw1 = jax.lax.dot_general(
            x2, dpre, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db1 = jnp.sum(dpre.astype(jnp.float32), axis=0)
        return (
            dx.astype(x.dtype).reshape(x.shape),
            dw1.astype(w1.dtype),
            db1.astype(b1.dtype),
            dw2.astype(w2.dtype),
            db2.astype(b2.dtype),
        )

    fused.defvjp(f_fwd, f_bwd)
    return fused


def fused_mlp(x, w1, b1, w2, b2):
    """gelu(x @ w1 + b1) @ w2 + b2, whole-MLP Pallas pair; x: [..., C_in]."""
    return _build_mlp(not _on_tpu())(x, w1, b1, w2, b2)
