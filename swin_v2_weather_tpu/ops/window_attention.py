"""Fused scaled-cosine window attention (Pallas TPU kernel).

The reference computes window attention as separate torch ops
(``networks/swinv2_global.py:170-201``): normalize q/k, batched matmul to a
``[B*nW, heads, L, L]`` logit tensor, add bias/mask, softmax, dropout,
batched matmul with v. Under XLA the same graph materializes the logits in
HBM between the two matmuls — for the flagship model that is
``400 windows * 8 heads * 162^2`` fp32 ≈ 336 MB per sample *per block*, read
and written once each way. This kernel keeps the logits in VMEM:

  * grid = (window_rows * batch, heads); each step processes one full row of
    windows (``n_windows_per_row`` windows — 20 for the 720x1440 flagship
    grid) for one head, so a step is a pair of well-shaped batched matmuls
    (~0.2 GFLOP) with the softmax fused between them;
  * q/k L2-normalization, logit scaling and softmax run in fp32 on the VPU;
    both matmuls run in bf16 on the MXU with fp32 accumulation;
  * the shifted-window mask exploits the reference's latitude-only structure
    (``networks/swinv2_global.py:403-424``): every masked window lives in
    the **last window row** and they all share one [L, L] pattern, so the
    kernel takes a single pattern plus a "am I in the boundary row?"
    predicate derived from the grid index — no [nW, L, L] mask tensor in
    memory at all;
  * sequence length is padded to the bf16 sublane tile (162 -> 176); padded
    key columns are masked with -1e30 before the softmax, padded query rows
    are sliced off by the wrapper.

Three generations of the kernel live here, all with handwritten Pallas
backwards (the XLA recompute VJPs of round 1 are retired):

  * **v1** (``fused_window_attention``): consumes pre-windowed
    ``[B*nW, heads, L, D]`` tensors; backward is a flash-style kernel in the
    same layout (normalization + its vjp in-kernel, d(scale)/d(bias) in
    VMEM-resident accumulators).
  * **v2** (``fused_window_attention_grid``) — the production path: consumes
    q/k/v in the model's natural NHWC grid layout ``[B, H, W, C]`` and does
    the windowing *inside* the kernel via BlockSpec indexing, eliminating
    the window-partition / head-split / window-reverse HBM transposes that
    cost more than the attention math itself at flagship size. Heads are
    DMA'd in groups sized so the block's lane width is a multiple of 128
    (4 heads x 96 = 384 for the flagship) and computed batched — one dot
    per role over a [group*windows] batch, like the v3 kernels. The cyclic
    shift commutes with the linear qkv projection, so shifted blocks roll
    the qkv tensor once.
    q/k L2-normalization (and its vjp) stays in XLA — elementwise work the
    compiler fuses, expressed with layout-preserving head-segment matmuls.
    The backward is a handwritten Pallas kernel that recomputes the softmax
    in VMEM and emits dqn/dkn/dv plus per-step d(scale) partials; in the
    rel-pos (CPB bias) case the window-shared ``[heads, L, L]`` d(bias)
    accumulates in a VMEM-resident block across the sequential grid.

Dropout on attention probabilities is not fused; callers fall back to the
XLA path when ``attn_drop > 0`` in training (the flagship configs train with
attention dropout 0).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# W-chunk budgets (windows per grid step) for the grid kernels; tunable for
# sweeps. Larger chunks amortize grid overhead but raise per-step VMEM.
# Swept on v5e at flagship size: fwd flat at 8-16, bwd best at 8.
FWD_WINDOW_BUDGET = 8
BWD_WINDOW_BUDGET = 8

import os as _os

# backward implementation for the qkv-fused (v3) kernel: 'pallas' = the
# fully-fused backward kernel; 'xla' = recompute qkv in XLA + v2 grid
# backward kernel + XLA projection chain (kept for A/B measurement,
# env-overridable)
QKV_BWD_IMPL = _os.environ.get("SWIN_QKV_BWD_IMPL", "pallas")
if QKV_BWD_IMPL not in ("pallas", "xla"):
    # fail fast: a typo (e.g. 'Pallas') would otherwise silently route the
    # backward through the slower XLA path and invalidate perf measurements
    raise ValueError(
        f"SWIN_QKV_BWD_IMPL={QKV_BWD_IMPL!r} invalid; expected 'pallas' or 'xla'"
    )

# window chunks per grid step for the v3 kernels (env-overridable for
# sweeps; at flagship geometry the only valid values are 4 and 20 — and 20
# was measured infeasible: the fwd kernel needs ~105 MB of scoped VMEM and
# the Mosaic compile for it OOMs server-side, so 4 is both default and max)

QKV_FWD_WC = int(_os.environ.get("SWIN_QKV_FWD_WC", "4"))
QKV_BWD_WC = int(_os.environ.get("SWIN_QKV_BWD_WC", "4"))

# head-chunk software pipelining for the v3 kernels: the [hb, L, L] score /
# softmax work is split into this many head chunks, and chunk c+1's score
# matmul is issued before chunk c's softmax so Mosaic can overlap MXU and
# VPU work (the round-2 profile showed the kernels serialize them). Must
# divide the head count; 1 = no chunking.
ATTN_CHUNKS = int(_os.environ.get("SWIN_ATTN_CHUNKS", "2"))

# cost-decomposition modes for scripts/attn_bench.py (NEVER set in training):
# 'proj' = qkv projection + windowing + staging only; 'nosoftmax' = skip the
# exp/rowsum VPU chain; 'nonorm' = skip the q/k L2 normalization.
ATTN_DEBUG = _os.environ.get("SWIN_ATTN_DEBUG", "")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bflag_arr(bflag) -> jnp.ndarray:
    """[1, 1] fp32 boundary gate: 1.0 unsharded (the local last window row
    IS the global pole boundary); under spatial sharding the caller passes
    is_last_shard so interior shards never mask (parallel/spatial.py)."""
    if bflag is None:
        return jnp.ones((1, 1), jnp.float32)
    return jnp.asarray(bflag, jnp.float32).reshape(1, 1)


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


# ---------------------------------------------------------------------------
# reference XLA implementation (backward recompute + numerical oracle)
# ---------------------------------------------------------------------------


def reference_attention(
    q: jnp.ndarray,  # [Bw, heads, L, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: jnp.ndarray,  # [heads]
    bias: Optional[jnp.ndarray],  # [heads, L, L]
    mask_pattern: Optional[np.ndarray],  # [L, L], applies to last window row
    window_grid: Optional[Tuple[int, int]],  # (n_window_rows, n_windows_per_row)
) -> jnp.ndarray:
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qf = qf * jax.lax.rsqrt(jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24))
    kf = kf * jax.lax.rsqrt(jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24))
    s = jnp.einsum(
        "bhld,bhmd->bhlm",
        qf.astype(jnp.bfloat16),
        kf.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    s = s * scale.astype(jnp.float32)[None, :, None, None]
    if bias is not None:
        s = s + bias[None].astype(jnp.float32)
    if mask_pattern is not None:
        nwh, nww = window_grid
        bw, h, l, _ = s.shape
        s = s.reshape(-1, nwh, nww, h, l, l)
        s = s.at[:, -1].add(jnp.asarray(mask_pattern, jnp.float32))
        s = s.reshape(bw, h, l, l)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhlm,bhmd->bhld", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


# ---------------------------------------------------------------------------
# pallas kernel
# ---------------------------------------------------------------------------


def _make_kernel(seq_len: int, seq_pad: int, n_window_rows: int, has_bias: bool,
                 has_mask: bool):
    col_mask_needed = seq_pad > seq_len

    def kernel(*refs):
        i = 0
        scale_ref = refs[i]; i += 1
        q_ref = refs[i]; i += 1
        k_ref = refs[i]; i += 1
        v_ref = refs[i]; i += 1
        bias_ref = None
        mask_ref = None
        if has_bias:
            bias_ref = refs[i]; i += 1
        if has_mask:
            mask_ref = refs[i]; i += 1
        out_ref = refs[i]

        q = q_ref[:, 0, :, :].astype(jnp.float32)  # [TG, Lp, D]
        k = k_ref[:, 0, :, :].astype(jnp.float32)
        v = v_ref[:, 0, :, :]

        q = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
        k = k * jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))

        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16),
            k.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [TG, Lp, Lp]
        s = s * scale_ref[pl.program_id(1), 0]
        if bias_ref is not None:
            s = s + bias_ref[0]
        if mask_ref is not None:
            # grid axis 0 enumerates (batch, window_row); boundary = last row
            row = pl.program_id(0) % n_window_rows
            on_boundary = (row == n_window_rows - 1).astype(jnp.float32)
            s = s + on_boundary * mask_ref[:, :]
        if col_mask_needed:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, seq_pad, seq_pad), 2)
            s = jnp.where(col >= seq_len, _NEG_INF, s)

        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)

        out = jax.lax.dot_general(
            p.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [TG, Lp, D]
        out_ref[:, 0, :, :] = out.astype(out_ref.dtype)

    return kernel


def _pallas_forward(q, k, v, scale, bias, mask_pattern, window_grid, interpret):
    bw, heads, l, d = q.shape
    nwh, nww = window_grid
    lp = _round_up(l, 16)
    has_bias = bias is not None
    has_mask = mask_pattern is not None

    pad = [(0, 0), (0, 0), (0, lp - l), (0, 0)]
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)

    grid = (bw // nww, heads)
    qkv_spec = pl.BlockSpec(
        (nww, 1, lp, d), lambda i, h: (i, h, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((heads, 1), lambda i, h: (0, 0), memory_space=pltpu.SMEM),
        qkv_spec,
        qkv_spec,
        qkv_spec,
    ]
    args = [scale.astype(jnp.float32).reshape(heads, 1), qp, kp, vp]
    if has_bias:
        biasp = jnp.pad(bias.astype(jnp.float32), [(0, 0), (0, lp - l), (0, lp - l)])
        in_specs.append(
            pl.BlockSpec((1, lp, lp), lambda i, h: (h, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(biasp)
    if has_mask:
        patt = np.zeros((lp, lp), np.float32)
        patt[:l, :l] = np.asarray(mask_pattern, np.float32)
        in_specs.append(
            pl.BlockSpec((lp, lp), lambda i, h: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(jnp.asarray(patt))

    kernel = _make_kernel(l, lp, nwh, has_bias, has_mask)
    flops_step = 2 * 2 * nww * lp * lp * d
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((bw, heads, lp, d), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_step * grid[0] * grid[1],
            bytes_accessed=4 * bw * heads * lp * d * qp.dtype.itemsize,
            transcendentals=grid[0] * grid[1] * nww * lp * lp,
        ),
        interpret=interpret,
    )(*args)
    return out[:, :, :l, :]


# ---------------------------------------------------------------------------
# v1 backward: handwritten flash-style kernel in the windowed layout
# (normalization + its vjp in-kernel, since the v1 forward normalizes
# in-kernel too); dscale/dbias accumulate in VMEM-resident blocks
# ---------------------------------------------------------------------------


def _make_v1_bwd_kernel(seq_len: int, seq_pad: int, n_window_rows: int,
                        has_bias: bool, has_mask: bool):
    col_mask_needed = seq_pad > seq_len

    def kernel(*refs):
        i = 0
        scale_ref = refs[i]; i += 1
        q_ref = refs[i]; i += 1
        k_ref = refs[i]; i += 1
        v_ref = refs[i]; i += 1
        g_ref = refs[i]; i += 1
        bias_ref = refs[i] if has_bias else None; i += has_bias
        mask_ref = refs[i] if has_mask else None; i += has_mask
        dq_ref = refs[i]; i += 1
        dk_ref = refs[i]; i += 1
        dv_ref = refs[i]; i += 1
        dscale_ref = refs[i]; i += 1
        dbias_ref = refs[i] if has_bias else None

        h = pl.program_id(1)
        first = (pl.program_id(0) == 0) & (h == 0)

        @pl.when(first)
        def _init_accumulators():
            dscale_ref[...] = jnp.zeros_like(dscale_ref)
            if has_bias:
                dbias_ref[...] = jnp.zeros_like(dbias_ref)

        q = q_ref[:, 0, :, :].astype(jnp.float32)  # [TG, Lp, D]
        k = k_ref[:, 0, :, :].astype(jnp.float32)
        v = v_ref[:, 0, :, :]
        g = g_ref[:, 0, :, :].astype(jnp.bfloat16)

        inv_q = jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
        inv_k = jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))
        qn = q * inv_q
        kn = k * inv_k

        scale = scale_ref[h, 0]
        s_pre = jax.lax.dot_general(
            qn.astype(jnp.bfloat16), kn.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s_pre * scale
        if has_bias:
            s = s + bias_ref[0]
        if has_mask:
            row = pl.program_id(0) % n_window_rows
            on_boundary = (row == n_window_rows - 1).astype(jnp.float32)
            s = s + on_boundary * mask_ref[:, :]
        if col_mask_needed:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, seq_pad, seq_pad), 2)
            s = jnp.where(col >= seq_len, _NEG_INF, s)

        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)

        p16 = p.astype(jnp.bfloat16)
        dv = jax.lax.dot_general(
            p16, g,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            g, v.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax vjp

        # d(scale) partial for this head at accumulator slot [0, h]
        val = jnp.sum(ds * s_pre)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        coli = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        dscale_ref[...] += jnp.where((rowi == 0) & (coli == h), val, 0.0)
        if has_bias:
            dbias_ref[h] += jnp.sum(ds, axis=0)

        dsb = (ds * scale).astype(jnp.bfloat16)
        dqn = jax.lax.dot_general(
            dsb, kn.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dkn = jax.lax.dot_general(
            dsb, qn.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # normalization vjp (in-kernel, matching the in-kernel forward norm)
        dq = (dqn - qn * jnp.sum(qn * dqn, -1, keepdims=True)) * inv_q
        dk = (dkn - kn * jnp.sum(kn * dkn, -1, keepdims=True)) * inv_k

        dq_ref[:, 0, :, :] = dq.astype(dq_ref.dtype)
        dk_ref[:, 0, :, :] = dk.astype(dk_ref.dtype)
        dv_ref[:, 0, :, :] = dv.astype(dv_ref.dtype)

    return kernel


def _v1_backward(q, k, v, scale, g, bias, mask_pattern, window_grid, interpret):
    bw, heads, l, d = q.shape
    nwh, nww = window_grid
    lp = _round_up(l, 16)
    has_bias = bias is not None
    has_mask = mask_pattern is not None

    pad = [(0, 0), (0, 0), (0, lp - l), (0, 0)]
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)
    gp = jnp.pad(g, pad)

    grid = (bw // nww, heads)
    qkv_spec = pl.BlockSpec(
        (nww, 1, lp, d), lambda i, h: (i, h, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((heads, 1), lambda i, h: (0, 0), memory_space=pltpu.SMEM),
        qkv_spec, qkv_spec, qkv_spec, qkv_spec,
    ]
    args = [scale.astype(jnp.float32).reshape(heads, 1), qp, kp, vp, gp]
    if has_bias:
        biasp = jnp.pad(bias.astype(jnp.float32), [(0, 0), (0, lp - l), (0, lp - l)])
        in_specs.append(
            pl.BlockSpec((1, lp, lp), lambda i, h: (h, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(biasp)
    if has_mask:
        patt = np.zeros((lp, lp), np.float32)
        patt[:l, :l] = np.asarray(mask_pattern, np.float32)
        in_specs.append(
            pl.BlockSpec((lp, lp), lambda i, h: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(jnp.asarray(patt))

    acc = lambda shape: pl.BlockSpec(  # noqa: E731 — resident accumulator
        shape, lambda i, h: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out_specs = [qkv_spec, qkv_spec, qkv_spec, acc((8, 128))]
    out_shape = [
        jax.ShapeDtypeStruct(qp.shape, q.dtype),
        jax.ShapeDtypeStruct(kp.shape, k.dtype),
        jax.ShapeDtypeStruct(vp.shape, v.dtype),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ]
    if has_bias:
        out_specs.append(acc((heads, lp, lp)))
        out_shape.append(jax.ShapeDtypeStruct((heads, lp, lp), jnp.float32))

    kernel = _make_v1_bwd_kernel(l, lp, nwh, has_bias, has_mask)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=6 * 2 * nww * lp * lp * d * grid[0] * grid[1],
            bytes_accessed=8 * bw * heads * lp * d * qp.dtype.itemsize,
            transcendentals=grid[0] * grid[1] * nww * lp * lp,
        ),
        interpret=interpret,
    )(*args)
    dq = outs[0][:, :, :l, :]
    dk = outs[1][:, :, :l, :]
    dv = outs[2][:, :, :l, :]
    dscale = outs[3][0, :heads].astype(scale.dtype)
    if has_bias:
        return dq, dk, dv, dscale, outs[4][:, :l, :l].astype(bias.dtype)
    return dq, dk, dv, dscale


# ---------------------------------------------------------------------------
# public API: custom-VJP wrapper (handwritten Pallas backward, both cases)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _build(nwh: int, nww: int, has_bias: bool, pattern_key, interpret: bool):
    mask_pattern = None
    if pattern_key is not None:
        buf, shape = pattern_key
        mask_pattern = np.frombuffer(buf, np.float32).reshape(shape)

    def fwd_impl(q, k, v, scale, bias):
        return _pallas_forward(
            q, k, v, scale, bias, mask_pattern, (nwh, nww), interpret
        )

    if has_bias:

        @jax.custom_vjp
        def fused(q, k, v, scale, bias):
            return fwd_impl(q, k, v, scale, bias)

        def fused_fwd(q, k, v, scale, bias):
            return fwd_impl(q, k, v, scale, bias), (q, k, v, scale, bias)

        def fused_bwd(res, g):
            q, k, v, scale, bias = res
            return _v1_backward(
                q, k, v, scale, g, bias, mask_pattern, (nwh, nww), interpret
            )

        fused.defvjp(fused_fwd, fused_bwd)
        return fused

    @jax.custom_vjp
    def fused4(q, k, v, scale):
        return fwd_impl(q, k, v, scale, None)

    def fused4_fwd(q, k, v, scale):
        return fused4(q, k, v, scale), (q, k, v, scale)

    def fused4_bwd(res, g):
        q, k, v, scale = res
        return _v1_backward(
            q, k, v, scale, g, None, mask_pattern, (nwh, nww), interpret
        )

    fused4.defvjp(fused4_fwd, fused4_bwd)
    return fused4


# ---------------------------------------------------------------------------
# v2: grid-layout kernel — windowing via BlockSpec indexing, zero layout
# transforms in HBM
# ---------------------------------------------------------------------------
#
# The v1 kernel (above) consumes [B*nW, heads, L, D], which obliges the model
# to materialize window-partition + head-split transposes in HBM (~6 ms per
# block at flagship size, more than the attention math itself). v2 takes
# q/k/v in the model's natural NHWC grid layout [B, H, W, C]: each grid step
# DMAs one (window row x W-chunk x head) slab directly and rearranges it into
# windows inside VMEM. The cyclic shift commutes with the linear qkv
# projection, so shifted blocks just roll the qkv tensor once.


def _pick_wc(w: int, ww: int, nww: int, budget_windows: int) -> int:
    """Largest W-chunk (pixels) that is a whole number of windows, divides
    the row evenly, honors Mosaic's second-to-last-dim tiling rule
    (divisible by 8, or the full row), and stays under the window budget."""
    valid = [
        nc for nc in range(1, nww + 1)
        if nww % nc == 0 and (nc * ww == w or (nc * ww) % 8 == 0)
    ]
    under = [nc for nc in valid if nc <= budget_windows]
    nc = max(under) if under else min(valid)
    return nc * ww


def _head_group(heads: int, hd: int) -> int:
    """Heads per grid step: the smallest divisor g of `heads` whose combined
    lane width g*hd satisfies Mosaic's last-dim rule (multiple of 128), or
    all heads (full channel dim, always allowed)."""
    for g in range(1, heads + 1):
        if heads % g == 0 and (g * hd) % 128 == 0:
            return g
    return heads


def _make_grid_kernel(wh: int, ww: int, nc: int, group: int, n_window_rows: int,
                      has_bias: bool, has_mask: bool):
    l = wh * ww

    def kernel(*refs):
        i = 0
        scale_ref = refs[i]; i += 1
        q_ref = refs[i]; i += 1
        k_ref = refs[i]; i += 1
        v_ref = refs[i]; i += 1
        bias_ref = refs[i] if has_bias else None; i += has_bias
        mask_ref = refs[i] if has_mask else None; i += has_mask
        bflag_ref = refs[i] if has_mask else None; i += has_mask
        out_ref = refs[i]; i += 1
        qh_ref = refs[i]; i += 1  # scratch [group, nc, l, hd] bf16
        kh_ref = refs[i]; i += 1
        vh_ref = refs[i]

        gc = q_ref.shape[-1]  # group * hd
        hd = gc // group
        hg = pl.program_id(3)
        gb = group * nc

        def to_windows(ref):
            # [1, WH, nc*WW, gc] -> [nc, L, gc]
            x = ref[0]
            x = x.reshape(wh, nc, ww, gc)
            x = x.transpose(1, 0, 2, 3)
            return x.reshape(nc, l, gc)

        q_all = to_windows(q_ref)
        k_all = to_windows(k_ref)
        v_all = to_windows(v_ref)
        # stage per-head slabs (static lane slices) so the attention runs as
        # one batched dot per role with the head group vectorized — same
        # batched-head structure as the v3 kernels
        for j in range(group):
            sl = slice(j * hd, (j + 1) * hd)
            qh_ref[j] = q_all[:, :, sl].astype(jnp.bfloat16)
            kh_ref[j] = k_all[:, :, sl].astype(jnp.bfloat16)
            vh_ref[j] = v_all[:, :, sl].astype(jnp.bfloat16)

        if has_mask:
            # boundary gate: last local window row AND the runtime flag (1.0
            # unsharded; is_last_shard under spatial sharding)
            row = pl.program_id(1)
            on_boundary = (row == n_window_rows - 1).astype(jnp.float32)
            mask_add = (on_boundary * bflag_ref[0, 0]) * mask_ref[:, :]

        # q/k arrive L2-normalized (the cheap elementwise normalization and
        # its vjp live in XLA; see fused_window_attention_grid)
        s = jax.lax.dot_general(
            qh_ref[...].reshape(gb, l, hd), kh_ref[...].reshape(gb, l, hd),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [gb, L, L]
        # per-head logit scale (+ CPB bias) via static batch-dim slices
        s = jnp.concatenate(
            [
                s[j * nc : (j + 1) * nc] * scale_ref[hg * group + j, 0]
                + (bias_ref[j] if has_bias else 0.0)
                for j in range(group)
            ],
            0,
        )
        if has_mask:
            s = s + mask_add
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p16 = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            p16, vh_ref[...].reshape(gb, l, hd),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [gb, L, hd]
        for j in range(group):  # slab-ify + store per head
            o = out[j * nc : (j + 1) * nc].reshape(nc, wh, ww, hd).transpose(1, 0, 2, 3)
            out_ref[0, :, :, j * hd : (j + 1) * hd] = o.reshape(
                wh, nc * ww, hd
            ).astype(out_ref.dtype)

    return kernel


def _grid_forward(q, k, v, scale, bias, mask_pattern, window, interpret,
                  w_chunk_windows: int = None, bflag=None):
    if w_chunk_windows is None:
        w_chunk_windows = FWD_WINDOW_BUDGET
    b, h, w, c = q.shape
    wh, ww = window
    nwh, nww = h // wh, w // ww
    heads = scale.shape[0]
    hd = c // heads
    l = wh * ww
    wc = _pick_wc(w, ww, nww, w_chunk_windows)
    nc = wc // ww
    group = _head_group(heads, hd)
    has_bias = bias is not None
    has_mask = mask_pattern is not None

    grid = (b, nwh, nww // nc, heads // group)
    qkv_spec = pl.BlockSpec(
        (1, wh, wc, group * hd), lambda bi, r, wcix, hg: (bi, r, wcix, hg),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((heads, 1), lambda bi, r, wcix, hg: (0, 0), memory_space=pltpu.SMEM),
        qkv_spec, qkv_spec, qkv_spec,
    ]
    args = [scale.astype(jnp.float32).reshape(heads, 1), q, k, v]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((group, l, l), lambda bi, r, wcix, hg: (hg, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias.astype(jnp.float32))
    if has_mask:
        in_specs.append(
            pl.BlockSpec((l, l), lambda bi, r, wcix, hg: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(jnp.asarray(np.asarray(mask_pattern, np.float32)))
        in_specs.append(
            pl.BlockSpec((1, 1), lambda bi, r, wcix, hg: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(_bflag_arr(bflag))

    kernel = _make_grid_kernel(wh, ww, nc, group, nwh, has_bias, has_mask)
    flops = 2 * 2 * l * l * hd * heads * nc * (b * nwh * (nww // nc))
    head_scratch = pltpu.VMEM((group, nc, l, hd), jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), v.dtype),
        scratch_shapes=[head_scratch, head_scratch, head_scratch],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * b * h * w * c * q.dtype.itemsize,
            transcendentals=b * nwh * nww * heads * l * l,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _make_grid_bwd_kernel(wh: int, ww: int, nc: int, group: int,
                          n_window_rows: int, has_bias: bool, has_mask: bool):
    """Backward for the grid kernel (bias-free and CPB-bias cases).

    Recomputes each window's softmax in VMEM and emits dq/dk/dv in grid
    layout plus a per-step, per-head partial of d(scale) (padded to an
    (8, 128) tile; the wrapper reduces it). Six MXU matmuls per head per
    step — the classic flash-attention backward shape. With bias, the
    [heads, L, L] d(bias) accumulates in a VMEM-resident output block
    across the sequential TPU grid (the bias is shared by every window, so
    its cotangent is the sum of ds over all grid steps).
    """
    l = wh * ww

    def kernel(*refs):
        i = 0
        scale_ref = refs[i]; i += 1
        q_ref = refs[i]; i += 1
        k_ref = refs[i]; i += 1
        v_ref = refs[i]; i += 1
        g_ref = refs[i]; i += 1
        bias_ref = refs[i] if has_bias else None; i += has_bias
        mask_ref = refs[i] if has_mask else None; i += has_mask
        bflag_ref = refs[i] if has_mask else None; i += has_mask
        dq_ref = refs[i]; i += 1
        dk_ref = refs[i]; i += 1
        dv_ref = refs[i]; i += 1
        dscale_ref = refs[i]; i += 1
        dbias_ref = refs[i] if has_bias else None; i += has_bias
        qh_ref = refs[i]; i += 1  # scratch [group, nc, l, hd] bf16
        kh_ref = refs[i]; i += 1
        vh_ref = refs[i]; i += 1
        gh_ref = refs[i]

        if has_bias:
            first = (
                (pl.program_id(0) == 0)
                & (pl.program_id(1) == 0)
                & (pl.program_id(2) == 0)
                & (pl.program_id(3) == 0)
            )

            @pl.when(first)
            def _init_dbias():
                dbias_ref[...] = jnp.zeros_like(dbias_ref)

        gc = q_ref.shape[-1]  # group * hd
        hd = gc // group
        hg = pl.program_id(3)

        def to_windows(ref):
            x = ref[0]
            x = x.reshape(wh, nc, ww, gc)
            return x.transpose(1, 0, 2, 3).reshape(nc, l, gc)

        q_all = to_windows(q_ref)
        k_all = to_windows(k_ref)
        v_all = to_windows(v_ref)
        g_all = to_windows(g_ref)

        if has_mask:
            row = pl.program_id(1)
            on_boundary = (row == n_window_rows - 1).astype(jnp.float32)
            mask_add = (on_boundary * bflag_ref[0, 0]) * mask_ref[:, :]

        # stage per-head slabs, then one batched dot per role (batched-head
        # structure; see the v3 kernels). q/k arrive L2-normalized.
        for j in range(group):
            sl = slice(j * hd, (j + 1) * hd)
            qh_ref[j] = q_all[:, :, sl].astype(jnp.bfloat16)
            kh_ref[j] = k_all[:, :, sl].astype(jnp.bfloat16)
            vh_ref[j] = v_all[:, :, sl].astype(jnp.bfloat16)
            gh_ref[j] = g_all[:, :, sl].astype(jnp.bfloat16)
        gb = group * nc
        qn = qh_ref[...].reshape(gb, l, hd)
        kn = kh_ref[...].reshape(gb, l, hd)
        vv = vh_ref[...].reshape(gb, l, hd)
        gg = gh_ref[...].reshape(gb, l, hd)

        s = jax.lax.dot_general(
            qn, kn,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [gb, L, L] == s_pre
        s = jnp.concatenate(
            [
                s[j * nc : (j + 1) * nc] * scale_ref[hg * group + j, 0]
                + (bias_ref[j] if has_bias else 0.0)
                for j in range(group)
            ],
            0,
        )
        if has_mask:
            s = s + mask_add
        # minimal-pass softmax recompute + vjp (see the v3 backward): with
        # r = 1/sum(e), ds = (dp - r*sum(dp*e)) * e * r and p16 = e*r
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        p16 = (e * r).astype(jnp.bfloat16)
        dv = jax.lax.dot_general(
            p16, gg,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [gb, L, hd]
        dp = jax.lax.dot_general(
            gg, vv,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [gb, L, L]
        u = jnp.sum(dp * e, axis=-1, keepdims=True)
        ds = (dp - u * r) * e * r  # unscaled softmax-vjp (feeds dbias too)
        if has_bias:
            # bias is window-shared: accumulate ds over this step's windows
            # into the resident [heads, L, L] block (dynamic head index;
            # sequential grid makes += race-free)
            for j in range(group):
                dbias_ref[hg * group + j] += jnp.sum(
                    ds[j * nc : (j + 1) * nc], axis=0
                )
        dsb = jnp.concatenate(
            [
                ds[j * nc : (j + 1) * nc] * scale_ref[hg * group + j, 0]
                for j in range(group)
            ],
            0,
        ).astype(jnp.bfloat16)
        # dqn = ds_scaled @ kn ; dkn = ds_scaled^T @ qn
        dqn = jax.lax.dot_general(
            dsb, kn,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dkn = jax.lax.dot_general(
            dsb, qn,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # the L2-normalization vjp happens in XLA outside the kernel

        for j in range(group):
            sl = slice(j * hd, (j + 1) * hd)

            def write(ref, x):
                x = x.reshape(nc, wh, ww, hd).transpose(1, 0, 2, 3)
                ref[0, :, :, sl] = x.reshape(wh, nc * ww, hd).astype(ref.dtype)

            write(dq_ref, dqn[j * nc : (j + 1) * nc])
            write(dk_ref, dkn[j * nc : (j + 1) * nc])
            write(dv_ref, dv[j * nc : (j + 1) * nc])

        # d(scale): sum(ds*s_pre) == sum(qn*(ds@kn)) == sum(qn*dqn)/scale
        # (qn here is already the normalized input; identity is bias-safe)
        qd = jnp.sum(qn.astype(jnp.float32) * dqn, -1, keepdims=True)
        dscales = [
            jnp.sum(qd[j * nc : (j + 1) * nc]) / scale_ref[hg * group + j, 0]
            for j in range(group)
        ]
        # place the group's dscale partials in row 0, cols 0..group-1
        # (no scatter: pad + row mask, which Mosaic lowers natively)
        vals = jnp.pad(jnp.stack(dscales), (0, 128 - len(dscales)))
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        dscale_ref[0] = jnp.where(row == 0, vals[None, :], 0.0)

    return kernel


def _grid_backward(q, k, v, scale, g, bias, mask_pattern, window, interpret,
                   w_chunk_windows: int = None, bflag=None):
    if w_chunk_windows is None:
        w_chunk_windows = BWD_WINDOW_BUDGET
    b, h, w, c = q.shape
    wh, ww = window
    nwh, nww = h // wh, w // ww
    heads = scale.shape[0]
    hd = c // heads
    l = wh * ww
    wc = _pick_wc(w, ww, nww, w_chunk_windows)
    nc = wc // ww
    group = _head_group(heads, hd)
    hgn = heads // group
    has_bias = bias is not None
    has_mask = mask_pattern is not None

    grid = (b, nwh, nww // nc, hgn)
    qkv_spec = pl.BlockSpec(
        (1, wh, wc, group * hd), lambda bi, r, wcix, hg: (bi, r, wcix, hg),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((heads, 1), lambda bi, r, wcix, hg: (0, 0), memory_space=pltpu.SMEM),
        qkv_spec, qkv_spec, qkv_spec, qkv_spec,
    ]
    args = [scale.astype(jnp.float32).reshape(heads, 1), q, k, v, g]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((group, l, l), lambda bi, r, wcix, hg: (hg, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias.astype(jnp.float32))
    if has_mask:
        in_specs.append(
            pl.BlockSpec((l, l), lambda bi, r, wcix, hg: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(jnp.asarray(np.asarray(mask_pattern, np.float32)))
        in_specs.append(
            pl.BlockSpec((1, 1), lambda bi, r, wcix, hg: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(_bflag_arr(bflag))

    n_steps = b * nwh * (nww // nc) * hgn
    dscale_spec = pl.BlockSpec(
        (1, 8, 128),
        lambda bi, r, wcix, hg: (
            ((bi * nwh + r) * (nww // nc) + wcix) * hgn + hg, 0, 0,
        ),
        memory_space=pltpu.VMEM,
    )
    out_specs = [qkv_spec, qkv_spec, qkv_spec, dscale_spec]
    out_shape = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
        jax.ShapeDtypeStruct((n_steps, 8, 128), jnp.float32),
    ]
    if has_bias:
        # VMEM-resident accumulator (constant index map): written once at end
        out_specs.append(
            pl.BlockSpec((heads, l, l), lambda bi, r, wcix, hg: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((heads, l, l), jnp.float32))
    kernel = _make_grid_bwd_kernel(wh, ww, nc, group, nwh, has_bias, has_mask)
    head_scratch = pltpu.VMEM((group, nc, l, hd), jnp.bfloat16)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[head_scratch] * 4,
        cost_estimate=pl.CostEstimate(
            flops=6 * 2 * l * l * hd * heads * nc * n_steps,
            bytes_accessed=8 * b * h * w * c * q.dtype.itemsize,
            transcendentals=b * nwh * nww * heads * l * l,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    dq, dk, dv, dscale_part = outs[:4]
    # step order has the head-group index fastest; slot j holds head hg*group+j
    dscale = dscale_part[:, 0, :group].reshape(-1, hgn, group).sum(axis=0).reshape(heads)
    if has_bias:
        return dq, dk, dv, dscale.astype(scale.dtype), outs[4].astype(bias.dtype)
    return dq, dk, dv, dscale.astype(scale.dtype)


def reference_attention_grid(q, k, v, scale, bias, mask_pattern, window):
    """Pure-XLA oracle for the grid-layout kernel (backward recompute)."""
    b, h, w, c = q.shape
    wh, ww = window
    heads = scale.shape[0]
    hd = c // heads

    def to_windows(x):
        x = x.reshape(b, h // wh, wh, w // ww, ww, heads, hd)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6)  # [b, nwh, nww, heads, wh, ww, hd]
        return x.reshape(b * (h // wh) * (w // ww), heads, wh * ww, hd)

    out = reference_attention(
        to_windows(q), to_windows(k), to_windows(v), scale, bias, mask_pattern,
        (h // wh, w // ww),
    )  # [bw, heads, l, hd]
    nwh, nww = h // wh, w // ww
    out = out.reshape(b, nwh, nww, heads, wh, ww, hd)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6)
    return out.reshape(b, h, w, c)


@functools.lru_cache(maxsize=8)
def _head_segment_matrices(c: int, heads: int):
    """M [c, heads] summing channels into heads; M^T broadcasting back.

    Keeps per-head reductions in the native [*, C] layout: a 5D reshape to
    [*, heads, hd] forces an expensive relayout on TPU, while these two
    skinny matmuls ride the MXU inside the surrounding fusion.
    """
    hd = c // heads
    m = np.zeros((c, heads), np.float32)
    for i in range(c):
        m[i, i // hd] = 1.0
    # cache host numpy only: caching jnp arrays would capture trace-time
    # constants and leak tracers across jit traces
    return m, np.ascontiguousarray(m.T)


def _normalize_heads(x, heads: int):
    """Per-head L2 normalization in fp32, layout-preserving.

    Returns (x_normalized in x.dtype, inv_norm fp32 [B, H, W, heads]).
    """
    c = x.shape[-1]
    m, mt = _head_segment_matrices(c, heads)
    m, mt = jnp.asarray(m), jnp.asarray(mt)
    xf = x.astype(jnp.float32)
    seg = jnp.einsum("...c,cg->...g", xf * xf, m)  # per-head sum of squares
    inv = jax.lax.rsqrt(jnp.maximum(seg, 1e-24))
    xn = (xf * jnp.einsum("...g,gc->...c", inv, mt)).astype(x.dtype)
    return xn, inv


def _normalize_vjp(xn, inv, dxn, heads: int, out_dtype):
    """Chain rule through x/|x|: dx = (dxn - xn * <xn, dxn>_head) * inv."""
    c = xn.shape[-1]
    m, mt = _head_segment_matrices(c, heads)
    m, mt = jnp.asarray(m), jnp.asarray(mt)
    xnf = xn.astype(jnp.float32)
    dxnf = dxn.astype(jnp.float32)
    ip = jnp.einsum("...c,cg->...g", xnf * dxnf, m)  # per-head <xn, dxn>
    dx = (dxnf - xnf * jnp.einsum("...g,gc->...c", ip, mt)) * jnp.einsum(
        "...g,gc->...c", inv, mt
    )
    return dx.astype(out_dtype)


@functools.lru_cache(maxsize=64)
def _build_grid(window, has_bias: bool, pattern_key, interpret: bool):
    mask_pattern = None
    if pattern_key is not None:
        buf, shape = pattern_key
        mask_pattern = np.frombuffer(buf, np.float32).reshape(shape)

    def fwd_impl(q, k, v, scale, bias, bflag):
        heads = scale.shape[0]
        qn, _ = _normalize_heads(q, heads)
        kn, _ = _normalize_heads(k, heads)
        return _grid_forward(qn, kn, v, scale, bias, mask_pattern, window, interpret,
                             bflag=bflag)

    if has_bias:

        @jax.custom_vjp
        def fusedg(q, k, v, scale, bias, bflag):
            return fwd_impl(q, k, v, scale, bias, bflag)

        def fg_fwd(q, k, v, scale, bias, bflag):
            heads = scale.shape[0]
            qn, inv_q = _normalize_heads(q, heads)
            kn, inv_k = _normalize_heads(k, heads)
            out = _grid_forward(qn, kn, v, scale, bias, mask_pattern, window,
                                interpret, bflag=bflag)
            return out, (qn, kn, v, scale, bias, bflag, inv_q, inv_k)

        def fg_bwd(res, g):
            # CPB/bias case: same handwritten Pallas backward, plus the
            # window-shared d(bias) accumulated in VMEM across the grid
            qn, kn, v, scale, bias, bflag, inv_q, inv_k = res
            heads = scale.shape[0]
            dqn, dkn, dv, dscale, dbias = _grid_backward(
                qn, kn, v, scale, g, bias, mask_pattern, window, interpret,
                bflag=bflag,
            )
            dq = _normalize_vjp(qn, inv_q, dqn, heads, qn.dtype)
            dk = _normalize_vjp(kn, inv_k, dkn, heads, kn.dtype)
            return dq, dk, dv, dscale, dbias, jnp.zeros_like(bflag)

        fusedg.defvjp(fg_fwd, fg_bwd)
        return fusedg

    @jax.custom_vjp
    def fusedg4(q, k, v, scale, bflag):
        return fwd_impl(q, k, v, scale, None, bflag)

    def fg4_fwd(q, k, v, scale, bflag):
        heads = scale.shape[0]
        qn, inv_q = _normalize_heads(q, heads)
        kn, inv_k = _normalize_heads(k, heads)
        out = _grid_forward(qn, kn, v, scale, None, mask_pattern, window,
                            interpret, bflag=bflag)
        return out, (qn, kn, v, scale, bflag, inv_q, inv_k)

    def fg4_bwd(res, g):
        # bias-free case: handwritten Pallas backward (recompute-in-VMEM),
        # then the normalization vjp in XLA
        qn, kn, v, scale, bflag, inv_q, inv_k = res
        heads = scale.shape[0]
        dqn, dkn, dv, dscale = _grid_backward(
            qn, kn, v, scale, g, None, mask_pattern, window, interpret,
            bflag=bflag,
        )
        # qn retains q's dtype, so the vjp output dtype matches the input's
        dq = _normalize_vjp(qn, inv_q, dqn, heads, qn.dtype)
        dk = _normalize_vjp(kn, inv_k, dkn, heads, kn.dtype)
        return dq, dk, dv, dscale, jnp.zeros_like(bflag)

    fusedg4.defvjp(fg4_fwd, fg4_bwd)
    return fusedg4


def fused_window_attention_grid(
    q: jnp.ndarray,  # [B, H, W, C] (already rolled for shifted blocks)
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: jnp.ndarray,  # [heads]
    window: Tuple[int, int],
    bias: Optional[jnp.ndarray] = None,  # [heads, L, L]
    mask_pattern: Optional[np.ndarray] = None,  # [L, L] boundary-row mask
    boundary_flag=None,  # scalar gate on the mask (spatial sharding)
) -> jnp.ndarray:
    """Grid-layout fused window attention: [B, H, W, C] -> [B, H, W, C]."""
    wh, ww = int(window[0]), int(window[1])
    if q.shape[1] % wh or q.shape[2] % ww:
        raise ValueError(f"grid {q.shape[1:3]} not divisible by window {window}")
    pattern_key = None
    if mask_pattern is not None:
        arr = np.ascontiguousarray(np.asarray(mask_pattern, np.float32))
        pattern_key = (arr.tobytes(), arr.shape)
    fn = _build_grid((wh, ww), bias is not None, pattern_key, not _on_tpu())
    bf = _bflag_arr(boundary_flag)
    if bias is not None:
        return fn(q, k, v, scale, bias, bf)
    return fn(q, k, v, scale, bf)


# ---------------------------------------------------------------------------
# v3: qkv-fused kernel — the attention block is HBM-IO bound (a copy-only
# kernel over the same blocks costs 3.4 of 4.3 ms), so the win is reading
# the activation once and computing the qkv projection in VMEM instead of
# streaming three pre-projected tensors from HBM. Opt-in: attn_impl
# 'pallas_qkv' (bias-free configs only).
# ---------------------------------------------------------------------------


def _attn_chunks(heads: int) -> int:
    ch = ATTN_CHUNKS
    while ch > 1 and heads % ch:
        ch -= 1
    return max(ch, 1)


def _make_qkv_kernel(wh: int, ww: int, nc: int, heads: int, n_window_rows: int,
                     has_mask: bool, has_bias: bool = False):
    l = wh * ww

    def kernel(*refs):
        i = 0
        scale_ref = refs[i]; i += 1  # SMEM [heads, 1] (unused fwd; API parity)
        shb_ref = refs[i]; i += 1  # VMEM [hb, 1] fp32: scale repeated per window
        x_ref = refs[i]; i += 1
        w_ref = refs[i]; i += 1
        b_ref = refs[i]; i += 1
        mask_ref = refs[i] if has_mask else None; i += has_mask
        bflag_ref = refs[i] if has_mask else None; i += has_mask
        # CPB additive term [hb, L, L] fp32, head-major-repeated and
        # pre-folded on the host as badd = shifted_bias - scale, so the
        # in-kernel logits are z = s*scale + badd — the bias rides the
        # existing multiply-add traversal instead of costing its own
        # reshape/broadcast VPU pass (z <= 0 bound preserved: s <= 1 and
        # shifted_bias <= 0 give z <= (s-1)*scale <= 0)
        bias_ref = refs[i] if has_bias else None; i += has_bias
        out_ref = refs[i]; i += 1
        qkv_ref = refs[i]

        del scale_ref
        c_in = x_ref.shape[-1]
        c3 = w_ref.shape[-1]
        c = c3 // 3
        hd = c // heads
        wc = nc * ww
        hb = heads * nc

        # qkv projection in VMEM: [wh*wc, c_in] @ [c_in, 3C]
        x2 = x_ref[0].reshape(wh * wc, c_in)
        qkv = jax.lax.dot_general(
            x2.astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0]

        if ATTN_DEBUG == "matmul":  # DMA + proj matmul + bias/cast only
            out_ref[0] = qkv[:, :c].reshape(wh, wc, c).astype(out_ref.dtype)
            return

        # window rearrangement (VMEM transposes are ~free), staged into a
        # scratch ref head-by-head with STATIC lane slices (Mosaic supports
        # neither dynamic indexing of values nor lane-splitting reshapes)
        if ATTN_DEBUG == "notranspose":  # bench: skip the sublane permute
            # WRONG window contents, identical op costs for everything else
            t = qkv.astype(jnp.bfloat16).reshape(nc, l, c3)
        else:
            t = qkv.astype(jnp.bfloat16).reshape(wh, nc, ww, c3)
            t = t.transpose(1, 0, 2, 3).reshape(nc, l, c3)
        for hh in range(heads):  # static unroll: slice+copy only, no temps
            qkv_ref[0, hh] = t[:, :, hh * hd : (hh + 1) * hd]
            qkv_ref[1, hh] = t[:, :, c + hh * hd : c + (hh + 1) * hd]
            qkv_ref[2, hh] = t[:, :, 2 * c + hh * hd : 2 * c + (hh + 1) * hd]
        # qkv_ref: [3, heads, nc, L, hd]

        if has_mask:
            row = pl.program_id(1)
            on_boundary = (row == n_window_rows - 1).astype(jnp.float32)
            mask_add = (on_boundary * bflag_ref[0, 0]) * mask_ref[:, :]
        else:
            mask_add = None

        if ATTN_DEBUG == "proj":  # front-end cost only (bench decomposition)
            for hh in range(heads):
                o = qkv_ref[0, hh]  # [nc, L, hd]
                o = o.reshape(nc, wh, ww, hd).transpose(1, 0, 2, 3).reshape(
                    wh, wc, hd
                )
                out_ref[0, :, :, hh * hd : (hh + 1) * hd] = o.astype(out_ref.dtype)
            return

        # all heads together: one batched dot per role, softmax vectorized
        # over the [heads*nc] batch (a per-head fori_loop spends ~half its
        # time in dispatch overhead at these small per-head shapes).
        # L2-normalize WITHOUT materializing fp32 copies of q/k: each
        # bf16->fp32 chain is consumed exactly once, so Mosaic fuses the
        # upcast + square + row-reduce (resp. upcast + scale + downcast)
        # into single passes over the bf16 slabs — the r3 probes showed the
        # kernel is VPU-copy-bound, and the old fp32 q/k temporaries were
        # ~20 MB of traffic per grid step.
        qr = qkv_ref[0].reshape(hb, l, hd)
        kr = qkv_ref[1].reshape(hb, l, hd)
        v = qkv_ref[2].reshape(hb, l, hd)
        if ATTN_DEBUG != "nonorm":
            inv_q = jax.lax.rsqrt(jnp.maximum(
                jnp.sum(jnp.square(qr.astype(jnp.float32)), -1, keepdims=True),
                1e-24))
            inv_k = jax.lax.rsqrt(jnp.maximum(
                jnp.sum(jnp.square(kr.astype(jnp.float32)), -1, keepdims=True),
                1e-24))
            q16 = (qr.astype(jnp.float32) * inv_q).astype(jnp.bfloat16)
            k16 = (kr.astype(jnp.float32) * inv_k).astype(jnp.bfloat16)
        else:
            q16, k16 = qr[...], kr[...]

        # head-chunk software pipeline: chunk c+1's score matmul is issued
        # before chunk c's softmax so the MXU runs ahead of the VPU. The
        # softmax is MAX-FREE: scaled-cosine logits are bounded by the
        # per-head scale (|qn.kn| <= 1, diagonal == 1 exactly), so
        # exp((s - 1) * scale) <= 1 with at least one row entry == 1 — the
        # usual running-max pass and its serial dependency are provably
        # unnecessary. The per-head scale arrives as a [hb, 1] vector and
        # broadcast-fuses into the same VPU pass as the exp (the former
        # per-head concatenate materialized a full second copy of s).
        n_ch = _attn_chunks(heads)
        sz = hb // n_ch
        hpc = heads // n_ch
        s_c: list = [None] * n_ch
        s_c[0] = jax.lax.dot_general(
            q16[:sz], k16[:sz],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        for ci in range(n_ch):
            lo, hi = ci * sz, (ci + 1) * sz
            if ci + 1 < n_ch:
                s_c[ci + 1] = jax.lax.dot_general(
                    q16[hi : hi + sz], k16[hi : hi + sz],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
            scl = shb_ref[lo:hi, :].reshape(sz, 1, 1)
            if ATTN_DEBUG == "nosoftmax":  # bench decomposition only
                e16 = (s_c[ci] * 0.01).astype(jnp.bfloat16)
                r = jnp.float32(1.0)
            else:
                if has_bias:
                    # z = s*scale + (shifted_bias - scale): one fused FMA
                    # pass; badd arrives once per head [heads, L, L] and the
                    # per-window-lane repeat is a register broadcast
                    bb = bias_ref[ci * hpc : (ci + 1) * hpc]
                    bb = jnp.broadcast_to(
                        bb[:, None], (hpc, nc, l, l)
                    ).reshape(sz, l, l)
                    z = s_c[ci] * scl + bb
                else:
                    z = (s_c[ci] - 1.0) * scl
                if mask_add is not None:
                    z = z + mask_add
                e = jnp.exp(z)
                # softmax denominator folded into the [*, L, hd] output (a
                # ~40% smaller array than p = e*r over [*, L, L]); e feeds
                # the MXU in bf16 directly
                r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
                e16 = e.astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                e16, v[lo:hi],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * r  # [sz, L, hd]
            for j in range(hpc):  # static unroll: slab-ify + store per head
                hh = ci * hpc + j
                o = out[j * nc : (j + 1) * nc]  # [nc, L, hd]
                o = o.reshape(nc, wh, ww, hd).transpose(1, 0, 2, 3).reshape(
                    wh, wc, hd
                )
                out_ref[0, :, :, hh * hd : (hh + 1) * hd] = o.astype(out_ref.dtype)

    return kernel


def _qkv_forward(x, w_qkv, b_qkv, scale, mask_pattern, window, interpret,
                 w_chunk_windows: int = None, bflag=None, bias=None,
                 prefolded: bool = False):
    if w_chunk_windows is None:
        w_chunk_windows = QKV_FWD_WC
    b, h, w, c_in = x.shape
    wh, ww = window
    nwh, nww = h // wh, w // ww
    heads = scale.shape[0]
    c3 = w_qkv.shape[-1]
    c = c3 // 3
    hd = c // heads
    l = wh * ww
    wc = _pick_wc(w, ww, nww, w_chunk_windows)
    nc = wc // ww
    has_mask = mask_pattern is not None

    grid = (b, nwh, nww // nc)
    hb = heads * nc
    x_spec = pl.BlockSpec(
        (1, wh, wc, c_in), lambda bi, r, wcix: (bi, r, wcix, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, wh, wc, c), lambda bi, r, wcix: (bi, r, wcix, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((heads, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((hb, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM),
        x_spec,
        pl.BlockSpec((c_in, c3), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c3), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM),
    ]
    scale_f = scale.astype(jnp.float32)
    args = [
        scale_f.reshape(heads, 1),
        jnp.repeat(scale_f, nc).reshape(hb, 1),  # head-major [hb, 1]
        x,
        w_qkv,
        b_qkv.reshape(1, c3).astype(jnp.float32),
    ]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((l, l), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(jnp.asarray(np.asarray(mask_pattern, np.float32)))
        in_specs.append(
            pl.BlockSpec((1, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(_bflag_arr(bflag))
    if bias is not None:
        in_specs.append(
            pl.BlockSpec(
                (heads, l, l), lambda bi, r, wcix: (0, 0, 0), memory_space=pltpu.VMEM
            )
        )
        # badd = shifted_bias - scale, ONCE PER HEAD [heads, L, L]: the
        # kernel broadcasts it across the nc window lanes in registers, so
        # the logits become z = s*scale + badd in the same FMA traversal the
        # bias-free path already pays (the former jnp.repeat materialized
        # and DMA'd an [hb, L, L] operand — ~4 MB of extra HBM traffic per
        # block each direction). With prefolded=True the caller passes badd
        # directly (fold_cpb_bias, computed ONCE per block and
        # checkpoint-saved — the backward's remat recompute then skips the
        # shift/fold chain entirely).
        badd = bias.astype(jnp.float32)
        if not prefolded:
            badd = badd - scale_f[:, None, None]
        args.append(badd)

    kernel = _make_qkv_kernel(wh, ww, nc, heads, nwh, has_mask,
                              has_bias=bias is not None)
    n_steps = b * nwh * (nww // nc)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, heads, nc, l, hd), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * wh * wc * c_in * c3 + 2 * 2 * l * l * hd * heads * nc) * n_steps,
            bytes_accessed=(b * h * w * (c_in + c) + c_in * c3) * x.dtype.itemsize,
            transcendentals=b * nwh * nww * heads * l * l,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _make_qkv_bwd_kernel(wh: int, ww: int, nc: int, heads: int,
                         n_window_rows: int, has_mask: bool,
                         has_bias: bool = False):
    """Fully-fused backward for the qkv kernel.

    Per grid step it reads the activation block x and the cotangent block g
    ONCE from HBM plus the (step-invariant, VMEM-resident) weight tile, and
    does everything else in VMEM: recompute qkv projection + q/k
    normalization + softmax, attention backward, the normalization vjp, and
    the projection backward. dx streams out per block; dW / db / dscale
    accumulate in VMEM-resident output blocks across the sequential TPU
    grid and are written back once at the end. HBM traffic per block: read
    x + g, write dx — ~3 tensors instead of the ~10 the unfused XLA path
    moves.

    All heads are processed TOGETHER: the six flash-style matmuls run as
    three double-batched dots over a [2*heads*nc] batch dim and the
    softmax/vjp elementwise work vectorizes across heads (the round-1
    per-head fori_loop spent ~half the kernel in dispatch overhead and
    per-head VPU passes — measured 12.2 ms vs the ~6 ms structural floor).
    d(scale) uses the identity sum(ds*s_pre) = sum(qn*dqn)/scale, so s_pre
    dies right after the softmax recompute.
    """
    l = wh * ww

    def kernel(*refs):
        i = 0
        scale_ref = refs[i]; i += 1
        shb_ref = refs[i]; i += 1  # VMEM [hb, 1] fp32: scale repeated per window
        x_ref = refs[i]; i += 1
        w_ref = refs[i]; i += 1
        b_ref = refs[i]; i += 1
        g_ref = refs[i]; i += 1
        mask_ref = refs[i] if has_mask else None; i += has_mask
        bflag_ref = refs[i] if has_mask else None; i += has_mask
        bias_ref = refs[i] if has_bias else None; i += has_bias
        dx_ref = refs[i]; i += 1
        dw_ref = refs[i]; i += 1
        db_ref = refs[i]; i += 1
        dscale_ref = refs[i]; i += 1
        dbias_ref = refs[i] if has_bias else None; i += has_bias
        dqkv_ref = refs[i]; i += 1  # scratch [nc, l, 3C] bf16
        qkvh_ref = refs[i]; i += 1  # scratch [3, heads, nc, l, hd] bf16
        gh_ref = refs[i]  # scratch [heads, nc, l, hd] bf16

        c_in = x_ref.shape[-1]
        c3 = w_ref.shape[-1]
        c = c3 // 3
        hd = c // heads
        wc = nc * ww
        hb = heads * nc

        first = (
            (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
        )

        @pl.when(first)
        def _init_accumulators():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)
            dscale_ref[...] = jnp.zeros_like(dscale_ref)
            if has_bias:
                dbias_ref[...] = jnp.zeros_like(dbias_ref)

        # recompute the qkv projection exactly as the forward kernel does
        x2 = x_ref[0].reshape(wh * wc, c_in)
        qkv = jax.lax.dot_general(
            x2.astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0]

        # window both qkv and the cotangent (sublane-only transposes, ~free)
        t = qkv.astype(jnp.bfloat16).reshape(wh, nc, ww, c3)
        t = t.transpose(1, 0, 2, 3).reshape(nc, l, c3)
        gw = g_ref[0].astype(jnp.bfloat16).reshape(wh, nc, ww, c)
        gw = gw.transpose(1, 0, 2, 3).reshape(nc, l, c)

        # stage per-head slabs (static lane slices; Mosaic cannot lane-split
        # reshapes) so the compute below runs one batched dot per role
        for h in range(heads):
            qkvh_ref[0, h] = t[:, :, h * hd : (h + 1) * hd]
            qkvh_ref[1, h] = t[:, :, c + h * hd : c + (h + 1) * hd]
            qkvh_ref[2, h] = t[:, :, 2 * c + h * hd : 2 * c + (h + 1) * hd]
            gh_ref[h] = gw[:, :, h * hd : (h + 1) * hd]

        if has_mask:
            row = pl.program_id(1)
            on_boundary = (row == n_window_rows - 1).astype(jnp.float32)
            mask_add = (on_boundary * bflag_ref[0, 0]) * mask_ref[:, :]

        qr = qkvh_ref[0].reshape(hb, l, hd)
        kr = qkvh_ref[1].reshape(hb, l, hd)
        v = qkvh_ref[2].reshape(hb, l, hd)
        g = gh_ref[...].reshape(hb, l, hd)

        # normalization without fp32 q/k temporaries (see the forward
        # kernel): fused single passes over the bf16 slabs; only the tiny
        # [hb, L, 1] inverse norms and the normalized bf16 slabs materialize
        inv_q = jax.lax.rsqrt(jnp.maximum(
            jnp.sum(jnp.square(qr.astype(jnp.float32)), -1, keepdims=True), 1e-24))
        inv_k = jax.lax.rsqrt(jnp.maximum(
            jnp.sum(jnp.square(kr.astype(jnp.float32)), -1, keepdims=True), 1e-24))
        qn16 = (qr.astype(jnp.float32) * inv_q).astype(jnp.bfloat16)
        kn16 = (kr.astype(jnp.float32) * inv_k).astype(jnp.bfloat16)

        # head-chunk software pipeline (see the forward kernel): chunk c+1's
        # score matmul issues before chunk c's softmax-vjp VPU work. The
        # minimal-pass softmax recompute never materializes fp32 p — with
        # r = 1/sum(e), p = e*r, the vjp rewrites exactly as
        #   ds = p*(dp - sum(dp*p)) = (dp - r*sum(dp*e)) * e * r
        # and is MAX-FREE: z = (s - 1)*scale <= 0 with a 1 on each row's
        # diagonal in the exp domain (scaled-cosine bound), so no running
        # max is needed. The per-head scale broadcast-fuses into the same
        # passes (the former concatenates copied s and ds once each).
        n_ch = _attn_chunks(heads)
        sz = hb // n_ch
        hpc = heads // n_ch
        dscale_h = [None] * heads
        s_c: list = [None] * n_ch
        s_c[0] = jax.lax.dot_general(
            qn16[:sz], kn16[:sz],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        for ci in range(n_ch):
            lo, hi = ci * sz, (ci + 1) * sz
            if ci + 1 < n_ch:
                s_c[ci + 1] = jax.lax.dot_general(
                    qn16[hi : hi + sz], kn16[hi : hi + sz],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
            scl = shb_ref[lo:hi, :].reshape(sz, 1, 1)
            if has_bias:
                # fused FMA; badd arrives once per head [heads, L, L], the
                # window-lane repeat is a register broadcast (see fwd kernel)
                bb = bias_ref[ci * hpc : (ci + 1) * hpc]
                bb = jnp.broadcast_to(bb[:, None], (hpc, nc, l, l)).reshape(sz, l, l)
                z = s_c[ci] * scl + bb
            else:
                z = (s_c[ci] - 1.0) * scl
            if has_mask:
                z = z + mask_add
            e = jnp.exp(z)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            p16 = (e * r).astype(jnp.bfloat16)

            gc = g[lo:hi]
            dv = jax.lax.dot_general(
                p16, gc,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [sz, L, hd]
            dp = jax.lax.dot_general(
                gc, v[lo:hi],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [sz, L, L]
            u = jnp.sum(dp * e, axis=-1, keepdims=True)
            # ds (the s_pre cotangent) in ONE fused pass, bias or not
            dsf = (dp - u * r) * e * (r * scl)
            if has_bias:
                # bias cotangent dz = ds/scale, accumulated PER WINDOW LANE
                # ([hb, L, L], head-major) — no in-kernel reshape or
                # window-sum; the nc lanes are reduced once outside the
                # kernel. One read-modify-write pass, the only extra
                # traversal the bias costs the backward.
                dbias_ref[lo:hi] += dsf * (1.0 / scl)
            dsb = dsf.astype(jnp.bfloat16)
            dqn = jax.lax.dot_general(
                dsb, kn16[lo:hi],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dkn = jax.lax.dot_general(
                dsb, qn16[lo:hi],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            # d(scale): sum(ds*s_pre) == sum(qn*(ds@kn)) == sum(qn*dqn)/scale
            # (qn read back as the normalized bf16 slabs; fp32 accumulate)
            qnc, knc = qn16[lo:hi], kn16[lo:hi]
            qd = jnp.sum(qnc * dqn, -1, keepdims=True)  # [sz, L, 1] fp32
            kd = jnp.sum(knc * dkn, -1, keepdims=True)
            for j in range(hpc):
                hh = ci * hpc + j
                dscale_h[hh] = (
                    jnp.sum(qd[j * nc : (j + 1) * nc]) / scale_ref[hh, 0]
                )
            # normalization vjp: dq = (dqn - qn <qn, dqn>) * inv
            dq = (dqn - qnc * qd) * inv_q[lo:hi]
            dk = (dkn - knc * kd) * inv_k[lo:hi]

            for j in range(hpc):  # static lane slices back into the 3C slab
                hh = ci * hpc + j
                sl = slice(j * nc, (j + 1) * nc)
                dqkv_ref[:, :, hh * hd : (hh + 1) * hd] = dq[sl].astype(
                    jnp.bfloat16
                )
                dqkv_ref[:, :, c + hh * hd : c + (hh + 1) * hd] = dk[sl].astype(
                    jnp.bfloat16
                )
                dqkv_ref[:, :, 2 * c + hh * hd : 2 * c + (hh + 1) * hd] = dv[
                    sl
                ].astype(jnp.bfloat16)

        # un-window dqkv back to the slab layout: [nc, L, 3C] -> [wh*wc, 3C]
        d = dqkv_ref[...].reshape(nc, wh, ww, c3).transpose(1, 0, 2, 3)
        d = d.reshape(wh * wc, c3)

        # projection backward: dx per block; dW/db accumulated across steps
        dx = jax.lax.dot_general(
            d, w_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx_ref[0] = dx.reshape(wh, wc, c_in).astype(dx_ref.dtype)
        dw_ref[...] += jax.lax.dot_general(
            x2.astype(jnp.bfloat16), d,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ones = jnp.ones((8, wh * wc), jnp.bfloat16)
        db_ref[...] += jax.lax.dot_general(
            ones, d,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == 0, 1.0, 0.0
        )
        vals = jnp.pad(jnp.stack(dscale_h), (0, 128 - heads))
        rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        dscale_ref[...] += jnp.where(rowi == 0, vals[None, :], 0.0)

    return kernel


def _qkv_backward(x, w_qkv, b_qkv, scale, g, mask_pattern, window, interpret,
                  w_chunk_windows: int = None, bflag=None, bias=None,
                  prefolded: bool = False):
    if w_chunk_windows is None:
        w_chunk_windows = QKV_BWD_WC
    b, h, w, c_in = x.shape
    wh, ww = window
    nwh, nww = h // wh, w // ww
    heads = scale.shape[0]
    c3 = w_qkv.shape[-1]
    c = c3 // 3
    hd = c // heads
    l = wh * ww
    wc = _pick_wc(w, ww, nww, w_chunk_windows)
    nc = wc // ww
    has_mask = mask_pattern is not None

    grid = (b, nwh, nww // nc)
    hb = heads * nc
    x_spec = pl.BlockSpec(
        (1, wh, wc, c_in), lambda bi, r, wcix: (bi, r, wcix, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (1, wh, wc, c), lambda bi, r, wcix: (bi, r, wcix, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((heads, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((hb, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM),
        x_spec,
        pl.BlockSpec((c_in, c3), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c3), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM),
        g_spec,
    ]
    scale_f = scale.astype(jnp.float32)
    args = [
        scale_f.reshape(heads, 1),
        jnp.repeat(scale_f, nc).reshape(hb, 1),  # head-major [hb, 1]
        x,
        w_qkv,
        b_qkv.reshape(1, c3).astype(jnp.float32),
        g,
    ]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((l, l), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(jnp.asarray(np.asarray(mask_pattern, np.float32)))
        in_specs.append(
            pl.BlockSpec((1, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(_bflag_arr(bflag))
    has_bias = bias is not None
    if has_bias:
        in_specs.append(
            pl.BlockSpec(
                (heads, l, l), lambda bi, r, wcix: (0, 0, 0), memory_space=pltpu.VMEM
            )
        )
        # once per head; in-kernel register broadcast (see the forward)
        badd = bias.astype(jnp.float32)
        if not prefolded:
            badd = badd - scale_f[:, None, None]
        args.append(badd)

    acc_spec = lambda shape: pl.BlockSpec(  # noqa: E731 — VMEM-resident accumulator
        shape, lambda bi, r, wcix: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    kernel = _make_qkv_bwd_kernel(wh, ww, nc, heads, nwh, has_mask, has_bias=has_bias)
    n_steps = b * nwh * (nww // nc)
    out_specs = [x_spec, acc_spec((c_in, c3)), acc_spec((8, c3)), acc_spec((8, 128))]
    out_shapes = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((c_in, c3), jnp.float32),
        jax.ShapeDtypeStruct((8, c3), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ]
    if has_bias:
        out_specs.append(acc_spec((hb, l, l)))
        out_shapes.append(jax.ShapeDtypeStruct((hb, l, l), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[
            pltpu.VMEM((nc, l, c3), jnp.bfloat16),
            pltpu.VMEM((3, heads, nc, l, hd), jnp.bfloat16),
            pltpu.VMEM((heads, nc, l, hd), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(3 * 2 * wh * wc * c_in * c3 + 6 * 2 * l * l * hd * heads * nc)
            * n_steps,
            bytes_accessed=(b * h * w * (2 * c_in + c) + 2 * c_in * c3)
            * x.dtype.itemsize,
            transcendentals=b * nwh * nww * heads * l * l,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    dx, dw, db, dscale = outs[:4]
    if has_bias:
        # reduce the per-window-lane accumulator to [heads, L, L] (head-major
        # lanes; one tiny XLA reduce vs an in-kernel pass per grid step)
        dbias = jnp.sum(outs[4].reshape(heads, nc, l, l), axis=1)
        return dx, dw, db[0], dscale[0, :heads], dbias
    return dx, dw, db[0], dscale[0, :heads]


@functools.lru_cache(maxsize=64)
def _build_qkv(window, pattern_key, interpret: bool):
    mask_pattern = None
    if pattern_key is not None:
        buf, shape = pattern_key
        mask_pattern = np.frombuffer(buf, np.float32).reshape(shape)

    @jax.custom_vjp
    def fused(x, w_qkv, b_qkv, scale, bflag):
        return _qkv_forward(x, w_qkv, b_qkv, scale, mask_pattern, window, interpret,
                            bflag=bflag)

    def f_fwd(x, w_qkv, b_qkv, scale, bflag):
        return fused(x, w_qkv, b_qkv, scale, bflag), (x, w_qkv, b_qkv, scale, bflag)

    def f_bwd(res, g):
        x, w_qkv, b_qkv, scale, bflag = res
        if QKV_BWD_IMPL == "pallas":
            # fully-fused backward: qkv recompute, attention backward,
            # normalization vjp and projection backward in ONE kernel; dW/db
            # accumulate in VMEM across the sequential grid
            dx, dw, db, dscale = _qkv_backward(
                x, w_qkv, b_qkv, scale, g, mask_pattern, window, interpret,
                bflag=bflag,
            )
            return (
                dx,
                dw.astype(w_qkv.dtype),
                db.astype(b_qkv.dtype),
                dscale.astype(scale.dtype),
                jnp.zeros_like(bflag),
            )
        # fallback: recompute qkv in XLA, reuse the grid backward kernel,
        # then chain through the projection for dx/dW/db
        heads = scale.shape[0]
        c = w_qkv.shape[-1] // 3
        qkv = (
            jnp.einsum(
                "bhwc,cd->bhwd", x.astype(jnp.bfloat16), w_qkv.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            + b_qkv
        ).astype(x.dtype)
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        qn, inv_q = _normalize_heads(q, heads)
        kn, inv_k = _normalize_heads(k, heads)
        dqn, dkn, dv, dscale = _grid_backward(
            qn, kn, v, scale, g, None, mask_pattern, window, interpret,
            bflag=bflag,
        )
        # bf16 cotangent through the projection: halves the HBM traffic of
        # the 3C-wide concat; both einsums accumulate in fp32 on the MXU
        dq = _normalize_vjp(qn, inv_q, dqn, heads, jnp.bfloat16)
        dk = _normalize_vjp(kn, inv_k, dkn, heads, jnp.bfloat16)
        dqkv = jnp.concatenate([dq, dk, dv.astype(jnp.bfloat16)], axis=-1)
        dx = jnp.einsum(
            "bhwd,cd->bhwc", dqkv, w_qkv.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        dw = jnp.einsum(
            "bhwc,bhwd->cd", x.astype(jnp.bfloat16), dqkv,
            preferred_element_type=jnp.float32,
        ).astype(w_qkv.dtype)
        db = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1, 2)).astype(b_qkv.dtype)
        return dx, dw, db, dscale, jnp.zeros_like(bflag)

    fused.defvjp(f_fwd, f_bwd)
    return fused


def fold_cpb_bias(bias: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Pre-fold the CPB bias into the kernel-ready additive term.

    ``badd_base = (bias - rowmax(bias)) - scale``, fp32 [heads, L, L] — the
    exact term the v3 kernels add to the scaled cosine scores (see
    :func:`_build_qkv_bias` for the softmax-rigor argument). Folding in the
    MODEL (once, under a ``checkpoint_name`` save) instead of inside the
    custom_vjp means neither the forward nor the backward's remat recompute
    re-runs the shift/fold chain — the r4 profile showed those ~7 small
    bias-pipeline fusions per block cost ~8 ms/step at flagship shape.

    Gradient: d(badd)/d(bias) is the identity (the rowmax is
    ``stop_gradient``) and the ``-scale`` fold contributes
    ``-sum_[L,L](d_badd)`` to d(scale) — algebraically zero, because the
    softmax vjp's rows sum to zero; XLA computes the tiny [heads] reduce.
    """
    b32 = bias.astype(jnp.float32)
    shifted = b32 - jax.lax.stop_gradient(jnp.max(b32, axis=-1, keepdims=True))
    return shifted - scale.astype(jnp.float32)[:, None, None]


@functools.lru_cache(maxsize=64)
def _build_qkv_bias(window, pattern_key, interpret: bool, prefolded: bool = False):
    """v3 qkv-fused kernel with the CPB relative-position bias (exact).

    The [heads, L, L] bias is row-max-shifted on the host (softmax is
    invariant to row-constant shifts) so the kernel's max-free softmax stays
    rigorous: z = s*scale + (bias_shift - scale) + mask <= 0 (algebraically
    (s-1)*scale + bias_shift), and each row keeps an entry with
    bias_shift == 0, bounding the denominator below by exp(-2*scale_max)
    ~= 1e-4. d(bias) w.r.t. the ORIGINAL bias equals d(bias_shift):
    softmax-vjp rows sum to zero, so the row-max subtraction contributes
    nothing. The same row-sum-zero argument keeps the in-kernel d(scale)
    identity sum(dz*s) == sum(qn*dqn)/scale valid with bias.

    Cost shape (the r4 restructure): the kernels receive the bias as a
    pre-folded, head-major-repeated additive term badd = bias_shift - scale
    [hb, L, L], so the forward's logit pass is the SAME single FMA traversal
    the bias-free path runs (no broadcast/reshape pass), and the backward's
    only extra traversal is the dbias read-modify-write into a per-window-
    lane [hb, L, L] VMEM accumulator (window lanes reduced outside the
    kernel). This took the rel_pos=true step from ~27 ms over the flagship
    (four extra score-slab VPU passes) to the cost of one.
    """
    mask_pattern = None
    if pattern_key is not None:
        buf, shape = pattern_key
        mask_pattern = np.frombuffer(buf, np.float32).reshape(shape)

    if prefolded:
        # ``bias`` arriving here IS badd_base = fold_cpb_bias(raw_bias, scale)
        # (computed once in the model and checkpoint-saved); no shift/fold
        # anywhere in this build. d(bias) returned is d(badd_base), which the
        # model-side fold chains back to the raw bias (identity) and scale.
        def _shift(bias):
            return bias
    else:
        def _shift(bias):
            b32 = bias.astype(jnp.float32)
            return b32 - jax.lax.stop_gradient(jnp.max(b32, axis=-1, keepdims=True))

    @jax.custom_vjp
    def fused(x, w_qkv, b_qkv, scale, bias, bflag):
        return _qkv_forward(x, w_qkv, b_qkv, scale, mask_pattern, window, interpret,
                            bflag=bflag, bias=_shift(bias), prefolded=prefolded)

    def f_fwd(x, w_qkv, b_qkv, scale, bias, bflag):
        return (
            fused(x, w_qkv, b_qkv, scale, bias, bflag),
            (x, w_qkv, b_qkv, scale, bias, bflag),
        )

    def f_bwd(res, g):
        x, w_qkv, b_qkv, scale, bias, bflag = res
        if QKV_BWD_IMPL == "pallas":
            dx, dw, db, dscale, dbias = _qkv_backward(
                x, w_qkv, b_qkv, scale, g, mask_pattern, window, interpret,
                bflag=bflag, bias=_shift(bias), prefolded=prefolded,
            )
            return (
                dx,
                dw.astype(w_qkv.dtype),
                db.astype(b_qkv.dtype),
                dscale.astype(scale.dtype),
                dbias.astype(bias.dtype),
                jnp.zeros_like(bflag),
            )
        # fallback: recompute qkv in XLA, reuse the grid backward kernel
        # (which recomputes softmax with the raw bias — softmax-equivalent),
        # then chain through the projection for dx/dW/db
        heads = scale.shape[0]
        c = w_qkv.shape[-1] // 3
        qkv = (
            jnp.einsum(
                "bhwc,cd->bhwd", x.astype(jnp.bfloat16), w_qkv.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            + b_qkv
        ).astype(x.dtype)
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        qn, inv_q = _normalize_heads(q, heads)
        kn, inv_k = _normalize_heads(k, heads)
        dqn, dkn, dv, dscale, dbias = _grid_backward(
            qn, kn, v, scale, g, bias, mask_pattern, window, interpret,
            bflag=bflag,
        )
        dq = _normalize_vjp(qn, inv_q, dqn, heads, jnp.bfloat16)
        dk = _normalize_vjp(kn, inv_k, dkn, heads, jnp.bfloat16)
        dqkv = jnp.concatenate([dq, dk, dv.astype(jnp.bfloat16)], axis=-1)
        dx = jnp.einsum(
            "bhwd,cd->bhwc", dqkv, w_qkv.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        dw = jnp.einsum(
            "bhwc,bhwd->cd", x.astype(jnp.bfloat16), dqkv,
            preferred_element_type=jnp.float32,
        ).astype(w_qkv.dtype)
        db = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1, 2)).astype(b_qkv.dtype)
        return dx, dw, db, dscale, dbias.astype(bias.dtype), jnp.zeros_like(bflag)

    fused.defvjp(f_fwd, f_bwd)
    return fused


_HD_PAD = 128  # lane-aligned padded head width (v6 kernel; also the retired v4 pad-heads variant)


def _pad_heads_w(w_qkv, heads: int):
    c_in, c3 = w_qkv.shape
    c = c3 // 3
    hd = c // heads
    w4 = w_qkv.reshape(c_in, 3, heads, hd)
    w4 = jnp.pad(w4, [(0, 0), (0, 0), (0, 0), (0, _HD_PAD - hd)])
    return w4.reshape(c_in, 3 * heads * _HD_PAD)


def _pad_heads_vec(b_qkv, heads: int):
    c3 = b_qkv.shape[-1]
    hd = c3 // 3 // heads
    b4 = b_qkv.reshape(3, heads, hd)
    return jnp.pad(b4, [(0, 0), (0, 0), (0, _HD_PAD - hd)]).reshape(-1)


def _unpad_heads(x, heads: int, hd: int):
    """[..., heads*_HD_PAD] -> [..., heads*hd] (XLA gather, fuses)."""
    shp = x.shape[:-1]
    return x.reshape(*shp, heads, _HD_PAD)[..., :hd].reshape(*shp, heads * hd)


def _pad_heads_x(x, heads: int, hd: int):
    """[..., heads*hd] -> [..., heads*_HD_PAD] zero-padded per head."""
    shp = x.shape[:-1]
    x4 = x.reshape(*shp, heads, hd)
    return jnp.pad(
        x4, [(0, 0)] * len(shp) + [(0, 0), (0, _HD_PAD - hd)]
    ).reshape(*shp, heads * _HD_PAD)



# ---------------------------------------------------------------------------
# v6: lane-ALIGNED padded-head qkv kernel. Three structurally different
# schedules (v3 packed staging, v4 XLA window-major prestage, v5 per-head
# projection matmuls) all measured ~4.3 ms fwd / ~10.5 ms bwd at flagship
# shape, because the head split at hd=96 is lane-misaligned WHOEVER performs
# it: slicing 96-lane slabs out of 128-lane vector registers lowers to
# lane-granular shuffles (~2 ms per full pass) on the VPU, and XLA's
# transpose pays the same (scripts/prestage_probe.py: 7.7 ms measured vs a
# 0.73 ms bandwidth bound). v6 removes the misalignment instead of moving
# it: the qkv weight columns are reordered + zero-padded OUTSIDE the kernel
# to [C_in, 3*heads*128], so every per-head slab in the projection output
# sits on a 128-lane tile boundary and all in-kernel slices/writes become
# register-granular copies. The price is 33% more MXU work on the
# projection matmuls (N: 2304 -> 3072) — MXU time is cheap, the VPU
# shuffles were not. The kernel returns [B, H, W, heads*128] with pad lanes
# EXACTLY zero; the caller absorbs the padding into the next (attn proj)
# matmul by zero-padding that weight's rows — mathematically exact, so no
# unpad relayout over the activation ever runs (the v4 pad_heads variant
# paid exactly that relayout back, measuring 5.6/12.8 ms).
# All other math is identical to v3 (max-free softmax, fused bf16
# normalization, head-chunk pipeline); zero pad lanes are provably inert:
# they add 0 to the q/k norms, 0 to the q.k scores, and propagate exact
# zeros through e@v and every backward contraction.
# ---------------------------------------------------------------------------


def _make_qkv6_kernel(wh: int, ww: int, nc: int, heads: int,
                      n_window_rows: int, has_mask: bool):
    l = wh * ww

    def kernel(*refs):
        i = 0
        scale_ref = refs[i]; i += 1  # SMEM [heads, 1] (unused fwd; API parity)
        shb_ref = refs[i]; i += 1  # VMEM [hb, 1] fp32: scale repeated per window
        x_ref = refs[i]; i += 1
        w_ref = refs[i]; i += 1  # [c_in, 3*heads*_HD_PAD] bf16 (padded)
        b_ref = refs[i]; i += 1  # [1, 3*heads*_HD_PAD] fp32 (padded)
        mask_ref = refs[i] if has_mask else None; i += has_mask
        bflag_ref = refs[i] if has_mask else None; i += has_mask
        out_ref = refs[i]; i += 1
        qkv_ref = refs[i]  # scratch [3, heads, nc, l, _HD_PAD] bf16

        del scale_ref
        c_in = x_ref.shape[-1]
        c3p = w_ref.shape[-1]
        hp = c3p // 3 // heads  # == _HD_PAD
        wc = nc * ww
        hb = heads * nc

        # qkv projection in VMEM: [wh*wc, c_in] @ [c_in, 3*heads*hp]
        x2 = x_ref[0].reshape(wh * wc, c_in)
        qkv = jax.lax.dot_general(
            x2.astype(jnp.bfloat16), w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0]

        # window rearrangement + head staging: every lane slice below starts
        # on a 128 multiple -> register-granular copies, no shuffles
        t = qkv.astype(jnp.bfloat16).reshape(wh, nc, ww, c3p)
        t = t.transpose(1, 0, 2, 3).reshape(nc, l, c3p)
        for hh in range(heads):
            qkv_ref[0, hh] = t[:, :, hh * hp : (hh + 1) * hp]
            qkv_ref[1, hh] = t[:, :, (heads + hh) * hp : (heads + hh + 1) * hp]
            qkv_ref[2, hh] = t[
                :, :, (2 * heads + hh) * hp : (2 * heads + hh + 1) * hp
            ]

        if has_mask:
            row = pl.program_id(1)
            on_boundary = (row == n_window_rows - 1).astype(jnp.float32)
            mask_add = (on_boundary * bflag_ref[0, 0]) * mask_ref[:, :]
        else:
            mask_add = None

        # identical to the v3 compute (see that kernel's comments); the pad
        # lanes are zero so norms/scores/outputs match v3 bit-for-bit in
        # exact arithmetic
        qr = qkv_ref[0].reshape(hb, l, hp)
        kr = qkv_ref[1].reshape(hb, l, hp)
        v = qkv_ref[2].reshape(hb, l, hp)
        inv_q = jax.lax.rsqrt(jnp.maximum(
            jnp.sum(jnp.square(qr.astype(jnp.float32)), -1, keepdims=True),
            1e-24))
        inv_k = jax.lax.rsqrt(jnp.maximum(
            jnp.sum(jnp.square(kr.astype(jnp.float32)), -1, keepdims=True),
            1e-24))
        q16 = (qr.astype(jnp.float32) * inv_q).astype(jnp.bfloat16)
        k16 = (kr.astype(jnp.float32) * inv_k).astype(jnp.bfloat16)

        n_ch = _attn_chunks(heads)
        sz = hb // n_ch
        hpc = heads // n_ch
        s_c: list = [None] * n_ch
        s_c[0] = jax.lax.dot_general(
            q16[:sz], k16[:sz],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        for ci in range(n_ch):
            lo, hi = ci * sz, (ci + 1) * sz
            if ci + 1 < n_ch:
                s_c[ci + 1] = jax.lax.dot_general(
                    q16[hi : hi + sz], k16[hi : hi + sz],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
            scl = shb_ref[lo:hi, :].reshape(sz, 1, 1)
            z = (s_c[ci] - 1.0) * scl
            if mask_add is not None:
                z = z + mask_add
            e = jnp.exp(z)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            e16 = e.astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                e16, v[lo:hi],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * r  # [sz, L, hp]
            hpc = heads // n_ch
            for j in range(hpc):  # aligned per-head output writes
                hh = ci * hpc + j
                o = out[j * nc : (j + 1) * nc]  # [nc, L, hp]
                o = o.reshape(nc, wh, ww, hp).transpose(1, 0, 2, 3).reshape(
                    wh, wc, hp
                )
                out_ref[0, :, :, hh * hp : (hh + 1) * hp] = o.astype(out_ref.dtype)

    return kernel


def _qkv6_forward(x, wp, bp, scale, mask_pattern, window, interpret,
                  bflag=None):
    b, h, w, c_in = x.shape
    wh, ww = window
    nwh, nww = h // wh, w // ww
    heads = scale.shape[0]
    c3p = wp.shape[-1]
    cp = c3p // 3
    hp = cp // heads
    l = wh * ww
    wc = _pick_wc(w, ww, nww, QKV_FWD_WC)
    nc = wc // ww
    has_mask = mask_pattern is not None

    grid = (b, nwh, nww // nc)
    hb = heads * nc
    x_spec = pl.BlockSpec(
        (1, wh, wc, c_in), lambda bi, r, wcix: (bi, r, wcix, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, wh, wc, cp), lambda bi, r, wcix: (bi, r, wcix, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((heads, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((hb, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM),
        x_spec,
        pl.BlockSpec((c_in, c3p), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c3p), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM),
    ]
    scale_f = scale.astype(jnp.float32)
    args = [
        scale_f.reshape(heads, 1),
        jnp.repeat(scale_f, nc).reshape(hb, 1),  # head-major [hb, 1]
        x,
        wp,
        bp,
    ]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((l, l), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(jnp.asarray(np.asarray(mask_pattern, np.float32)))
        in_specs.append(
            pl.BlockSpec((1, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(_bflag_arr(bflag))

    kernel = _make_qkv6_kernel(wh, ww, nc, heads, nwh, has_mask)
    n_steps = b * nwh * (nww // nc)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, heads, nc, l, hp), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * wh * wc * c_in * c3p + 2 * 2 * l * l * hp * heads * nc)
            * n_steps,
            bytes_accessed=(b * h * w * (c_in + cp) + c_in * c3p)
            * x.dtype.itemsize,
            transcendentals=b * nwh * nww * heads * l * l,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _make_qkv6_bwd_kernel(wh: int, ww: int, nc: int, heads: int,
                          n_window_rows: int, has_mask: bool):
    """v6 fully-fused backward: the v3 backward with every head slice on a
    128-lane tile boundary (padded weight; see the v6 banner). dW/db
    accumulate PADDED; the caller unpads them (a few MB, outside the hot
    path). The incoming cotangent g is [*, heads*128] (the model absorbs
    the padding into the proj weight's rows, so g's pad lanes are zero)."""
    l = wh * ww

    def kernel(*refs):
        i = 0
        scale_ref = refs[i]; i += 1
        shb_ref = refs[i]; i += 1  # VMEM [hb, 1] fp32
        x_ref = refs[i]; i += 1
        w_ref = refs[i]; i += 1  # [c_in, c3p] bf16 (padded)
        b_ref = refs[i]; i += 1  # [1, c3p] fp32 (padded)
        g_ref = refs[i]; i += 1  # [1, wh, wc, heads*hp]
        mask_ref = refs[i] if has_mask else None; i += has_mask
        bflag_ref = refs[i] if has_mask else None; i += has_mask
        dx_ref = refs[i]; i += 1
        dw_ref = refs[i]; i += 1  # [c_in, c3p] fp32 accumulator
        db_ref = refs[i]; i += 1  # [8, c3p] fp32 accumulator
        dscale_ref = refs[i]; i += 1
        dqkv_ref = refs[i]; i += 1  # scratch [nc, l, c3p] bf16
        qkvh_ref = refs[i]; i += 1  # scratch [3, heads, nc, l, hp] bf16
        gh_ref = refs[i]  # scratch [heads, nc, l, hp] bf16

        c_in = x_ref.shape[-1]
        c3p = w_ref.shape[-1]
        hp = c3p // 3 // heads
        cp = heads * hp
        wc = nc * ww
        hb = heads * nc

        first = (
            (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
        )

        @pl.when(first)
        def _init_accumulators():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)
            dscale_ref[...] = jnp.zeros_like(dscale_ref)

        # recompute the qkv projection exactly as the forward kernel does
        x2 = x_ref[0].reshape(wh * wc, c_in)
        qkv = jax.lax.dot_general(
            x2.astype(jnp.bfloat16), w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0]

        t = qkv.astype(jnp.bfloat16).reshape(wh, nc, ww, c3p)
        t = t.transpose(1, 0, 2, 3).reshape(nc, l, c3p)
        gw = g_ref[0].astype(jnp.bfloat16).reshape(wh, nc, ww, cp)
        gw = gw.transpose(1, 0, 2, 3).reshape(nc, l, cp)

        for h in range(heads):  # all aligned: register-granular copies
            qkvh_ref[0, h] = t[:, :, h * hp : (h + 1) * hp]
            qkvh_ref[1, h] = t[:, :, (heads + h) * hp : (heads + h + 1) * hp]
            qkvh_ref[2, h] = t[
                :, :, (2 * heads + h) * hp : (2 * heads + h + 1) * hp
            ]
            gh_ref[h] = gw[:, :, h * hp : (h + 1) * hp]

        if has_mask:
            row = pl.program_id(1)
            on_boundary = (row == n_window_rows - 1).astype(jnp.float32)
            mask_add = (on_boundary * bflag_ref[0, 0]) * mask_ref[:, :]

        qr = qkvh_ref[0].reshape(hb, l, hp)
        kr = qkvh_ref[1].reshape(hb, l, hp)
        v = qkvh_ref[2].reshape(hb, l, hp)
        g = gh_ref[...].reshape(hb, l, hp)

        inv_q = jax.lax.rsqrt(jnp.maximum(
            jnp.sum(jnp.square(qr.astype(jnp.float32)), -1, keepdims=True), 1e-24))
        inv_k = jax.lax.rsqrt(jnp.maximum(
            jnp.sum(jnp.square(kr.astype(jnp.float32)), -1, keepdims=True), 1e-24))
        qn16 = (qr.astype(jnp.float32) * inv_q).astype(jnp.bfloat16)
        kn16 = (kr.astype(jnp.float32) * inv_k).astype(jnp.bfloat16)

        # identical to the v3 backward compute (see that kernel's comments)
        n_ch = _attn_chunks(heads)
        sz = hb // n_ch
        hpc = heads // n_ch
        dscale_h = [None] * heads
        s_c: list = [None] * n_ch
        s_c[0] = jax.lax.dot_general(
            qn16[:sz], kn16[:sz],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        for ci in range(n_ch):
            lo, hi = ci * sz, (ci + 1) * sz
            if ci + 1 < n_ch:
                s_c[ci + 1] = jax.lax.dot_general(
                    qn16[hi : hi + sz], kn16[hi : hi + sz],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
            scl = shb_ref[lo:hi, :].reshape(sz, 1, 1)
            z = (s_c[ci] - 1.0) * scl
            if has_mask:
                z = z + mask_add
            e = jnp.exp(z)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            p16 = (e * r).astype(jnp.bfloat16)

            gc = g[lo:hi]
            dv = jax.lax.dot_general(
                p16, gc,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [sz, L, hp]
            dp = jax.lax.dot_general(
                gc, v[lo:hi],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [sz, L, L]
            u = jnp.sum(dp * e, axis=-1, keepdims=True)
            dsb = ((dp - u * r) * e * (r * scl)).astype(jnp.bfloat16)
            dqn = jax.lax.dot_general(
                dsb, kn16[lo:hi],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dkn = jax.lax.dot_general(
                dsb, qn16[lo:hi],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            qnc, knc = qn16[lo:hi], kn16[lo:hi]
            qd = jnp.sum(qnc * dqn, -1, keepdims=True)  # [sz, L, 1] fp32
            kd = jnp.sum(knc * dkn, -1, keepdims=True)
            for j in range(hpc):
                hh = ci * hpc + j
                dscale_h[hh] = (
                    jnp.sum(qd[j * nc : (j + 1) * nc]) / scale_ref[hh, 0]
                )
            dq = (dqn - qnc * qd) * inv_q[lo:hi]
            dk = (dkn - knc * kd) * inv_k[lo:hi]

            for j in range(hpc):  # aligned lane writes into the padded slab
                hh = ci * hpc + j
                sl = slice(j * nc, (j + 1) * nc)
                dqkv_ref[:, :, hh * hp : (hh + 1) * hp] = dq[sl].astype(
                    jnp.bfloat16
                )
                dqkv_ref[
                    :, :, (heads + hh) * hp : (heads + hh + 1) * hp
                ] = dk[sl].astype(jnp.bfloat16)
                dqkv_ref[
                    :, :, (2 * heads + hh) * hp : (2 * heads + hh + 1) * hp
                ] = dv[sl].astype(jnp.bfloat16)

        # un-window dqkv back to the slab layout: [nc, L, c3p] -> [wh*wc, c3p]
        d = dqkv_ref[...].reshape(nc, wh, ww, c3p).transpose(1, 0, 2, 3)
        d = d.reshape(wh * wc, c3p)

        # projection backward: dx per block; dW/db accumulated across steps.
        # The padded (zero) weight columns contribute exactly 0 to dx.
        dx = jax.lax.dot_general(
            d, w_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx_ref[0] = dx.reshape(wh, wc, c_in).astype(dx_ref.dtype)
        dw_ref[...] += jax.lax.dot_general(
            x2.astype(jnp.bfloat16), d,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ones = jnp.ones((8, wh * wc), jnp.bfloat16)
        db_ref[...] += jax.lax.dot_general(
            ones, d,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == 0, 1.0, 0.0
        )
        vals = jnp.pad(jnp.stack(dscale_h), (0, 128 - heads))
        rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        dscale_ref[...] += jnp.where(rowi == 0, vals[None, :], 0.0)

    return kernel


def _qkv6_backward(x, wp, bp, scale, g, mask_pattern, window, interpret,
                   bflag=None):
    b, h, w, c_in = x.shape
    wh, ww = window
    nwh, nww = h // wh, w // ww
    heads = scale.shape[0]
    c3p = wp.shape[-1]
    cp = c3p // 3
    l = wh * ww
    wc = _pick_wc(w, ww, nww, QKV_BWD_WC)
    nc = wc // ww
    hp = cp // heads
    has_mask = mask_pattern is not None

    grid = (b, nwh, nww // nc)
    hb = heads * nc
    x_spec = pl.BlockSpec(
        (1, wh, wc, c_in), lambda bi, r, wcix: (bi, r, wcix, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (1, wh, wc, cp), lambda bi, r, wcix: (bi, r, wcix, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((heads, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((hb, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM),
        x_spec,
        pl.BlockSpec((c_in, c3p), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c3p), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM),
        g_spec,
    ]
    scale_f = scale.astype(jnp.float32)
    args = [
        scale_f.reshape(heads, 1),
        jnp.repeat(scale_f, nc).reshape(hb, 1),  # head-major [hb, 1]
        x,
        wp,
        bp,
        g,
    ]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((l, l), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(jnp.asarray(np.asarray(mask_pattern, np.float32)))
        in_specs.append(
            pl.BlockSpec((1, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(_bflag_arr(bflag))

    acc_spec = lambda shape: pl.BlockSpec(  # noqa: E731 — VMEM-resident accumulator
        shape, lambda bi, r, wcix: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    kernel = _make_qkv6_bwd_kernel(wh, ww, nc, heads, nwh, has_mask)
    n_steps = b * nwh * (nww // nc)
    dx, dw, db, dscale = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(x_spec, acc_spec((c_in, c3p)), acc_spec((8, c3p)), acc_spec((8, 128))),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((c_in, c3p), jnp.float32),
            jax.ShapeDtypeStruct((8, c3p), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nc, l, c3p), jnp.bfloat16),
            pltpu.VMEM((3, heads, nc, l, hp), jnp.bfloat16),
            pltpu.VMEM((heads, nc, l, hp), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(3 * 2 * wh * wc * c_in * c3p + 6 * 2 * l * l * hp * heads * nc)
            * n_steps,
            bytes_accessed=(b * h * w * (2 * c_in + cp) + 2 * c_in * c3p)
            * x.dtype.itemsize,
            transcendentals=b * nwh * nww * heads * l * l,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return dx, dw, db[0], dscale[0, :heads]


@functools.lru_cache(maxsize=64)
def _build_qkv6(window, pattern_key, interpret: bool):
    mask_pattern = None
    if pattern_key is not None:
        buf, shape = pattern_key
        mask_pattern = np.frombuffer(buf, np.float32).reshape(shape)

    def _prep(w_qkv, b_qkv, heads):
        wp = _pad_heads_w(w_qkv, heads).astype(jnp.bfloat16)
        bp = _pad_heads_vec(b_qkv, heads).reshape(1, -1).astype(jnp.float32)
        return wp, bp

    @jax.custom_vjp
    def fused(x, w_qkv, b_qkv, scale, bflag):
        heads = scale.shape[0]
        wp, bp = _prep(w_qkv, b_qkv, heads)
        return _qkv6_forward(x, wp, bp, scale, mask_pattern, window, interpret,
                             bflag=bflag)

    def f_fwd(x, w_qkv, b_qkv, scale, bflag):
        return fused(x, w_qkv, b_qkv, scale, bflag), (x, w_qkv, b_qkv, scale, bflag)

    def f_bwd(res, g):
        x, w_qkv, b_qkv, scale, bflag = res
        heads = scale.shape[0]
        hd = w_qkv.shape[-1] // 3 // heads
        wp, bp = _prep(w_qkv, b_qkv, heads)
        dx, dwp, dbp, dscale = _qkv6_backward(
            x, wp, bp, scale, g, mask_pattern, window, interpret, bflag=bflag,
        )
        # unpad the weight grads (a few MB; outside the hot path)
        dw = _unpad_heads(dwp, 3 * heads, hd).reshape(w_qkv.shape)
        db = _unpad_heads(dbp, 3 * heads, hd).reshape(b_qkv.shape)
        return (
            dx,
            dw.astype(w_qkv.dtype),
            db.astype(b_qkv.dtype),
            dscale.astype(scale.dtype),
            jnp.zeros_like(bflag),
        )

    fused.defvjp(f_fwd, f_bwd)
    return fused


def fused_window_attention_qkv_padded(
    x: jnp.ndarray,  # [B, H, W, C_in] (already rolled for shifted blocks)
    w_qkv: jnp.ndarray,  # [C_in, 3C]
    b_qkv: jnp.ndarray,  # [3C]
    scale: jnp.ndarray,  # [heads]
    window: Tuple[int, int],
    mask_pattern: Optional[np.ndarray] = None,
    boundary_flag=None,  # scalar gate on the mask (spatial sharding)
) -> jnp.ndarray:
    """v6 qkv-fused window attention: [B,H,W,Cin] -> [B,H,W,heads*128].

    Per-head outputs live at 128-lane-aligned offsets with pad lanes
    exactly zero; absorb the padding into the next matmul by zero-padding
    its rows per head (see ``pad_proj_rows``) — never unpad the activation.
    """
    wh, ww = int(window[0]), int(window[1])
    if x.shape[1] % wh or x.shape[2] % ww:
        raise ValueError(f"grid {x.shape[1:3]} not divisible by window {window}")
    heads = int(scale.shape[0])
    hd = int(w_qkv.shape[-1]) // 3 // heads
    if hd > _HD_PAD:
        raise ValueError(f"head_dim {hd} > {_HD_PAD} unsupported by the v6 kernel")
    pattern_key = None
    if mask_pattern is not None:
        arr = np.ascontiguousarray(np.asarray(mask_pattern, np.float32))
        pattern_key = (arr.tobytes(), arr.shape)
    fn = _build_qkv6((wh, ww), pattern_key, not _on_tpu())
    return fn(x, w_qkv, b_qkv, scale, _bflag_arr(boundary_flag))


def pad_proj_rows(w_proj: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[heads*hd, F] -> [heads*128, F]: zero rows for the v6 pad lanes.

    ``x_padded @ pad_proj_rows(W) == x @ W`` exactly when ``x_padded`` is a
    v6 output (its pad lanes are zero — and even for nonzero pad lanes the
    zero rows make the product identical)."""
    chd, f = w_proj.shape
    hd = chd // heads
    w = w_proj.reshape(heads, hd, f)
    w = jnp.pad(w, [(0, 0), (0, _HD_PAD - hd), (0, 0)])
    return w.reshape(heads * _HD_PAD, f)


# v3 = in-kernel windowing + packed staging; v4 = window-major rearrangement
# in XLA; v5 = per-head projection matmuls, no staging; v6 = lane-aligned
# padded heads (different output contract: fused_window_attention_qkv_padded).
# Env-selectable for A/B measurement.
QKV_IMPL = _os.environ.get("SWIN_QKV_IMPL", "v3")
if QKV_IMPL not in ("v3", "v4", "v5", "v6"):
    raise ValueError(
        f"SWIN_QKV_IMPL={QKV_IMPL!r} invalid; expected 'v3', 'v4', 'v5' or 'v6'"
    )


def fused_window_attention_qkv(
    x: jnp.ndarray,  # [B, H, W, C_in] (already rolled for shifted blocks)
    w_qkv: jnp.ndarray,  # [C_in, 3C]
    b_qkv: jnp.ndarray,  # [3C]
    scale: jnp.ndarray,  # [heads]
    window: Tuple[int, int],
    mask_pattern: Optional[np.ndarray] = None,
    boundary_flag=None,  # scalar gate on the mask (spatial sharding)
    impl: Optional[str] = None,  # None = module default (SWIN_QKV_IMPL)
    bias: Optional[jnp.ndarray] = None,  # CPB [heads, L, L] (v3 schedule)
    bias_prefolded: bool = False,  # bias is already fold_cpb_bias(raw, scale)
) -> jnp.ndarray:
    """qkv projection + window attention fused: [B,H,W,Cin] -> [B,H,W,C]."""
    wh, ww = int(window[0]), int(window[1])
    if x.shape[1] % wh or x.shape[2] % ww:
        raise ValueError(f"grid {x.shape[1:3]} not divisible by window {window}")
    pattern_key = None
    if mask_pattern is not None:
        arr = np.ascontiguousarray(np.asarray(mask_pattern, np.float32))
        pattern_key = (arr.tobytes(), arr.shape)
    if bias is not None:
        # CPB bias rides the v3 schedule (the default and the measured-best;
        # the A/B variants v4/v5/v6 are bias-free measurement kernels)
        fn = _build_qkv_bias((wh, ww), pattern_key, not _on_tpu(),
                             prefolded=bias_prefolded)
        return fn(x, w_qkv, b_qkv, scale, bias, _bflag_arr(boundary_flag))
    sel = impl or QKV_IMPL
    if sel in ("v4", "v5"):
        # retired A/B schedules (lost the round-3 chip measurements); live
        # in ops/attic/ and are lazy-imported so the default path never
        # traces or even parses them
        from swin_v2_weather_tpu.ops.attic import window_attention_v45 as _v45

        if sel == "v4":
            heads = int(scale.shape[0])
            hd = int(w_qkv.shape[-1]) // 3 // heads
            fn = _v45._build_qkv4(
                (wh, ww), (int(x.shape[1]), int(x.shape[2])), pattern_key,
                not _on_tpu(), _v45.QKV_PAD_HEADS and hd % _HD_PAD != 0,
            )
        else:
            fn = _v45._build_qkv5((wh, ww), pattern_key, not _on_tpu())
    elif sel == "v6":
        raise ValueError(
            "impl 'v6' returns a padded [B,H,W,heads*128] output; call "
            "fused_window_attention_qkv_padded (the caller must absorb the "
            "padding into the following matmul)"
        )
    else:
        fn = _build_qkv((wh, ww), pattern_key, not _on_tpu())
    return fn(x, w_qkv, b_qkv, scale, _bflag_arr(boundary_flag))


def fused_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask_pattern: Optional[np.ndarray] = None,
    window_grid: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Fused window attention: [Bw, heads, L, D] -> [Bw, heads, L, D].

    ``mask_pattern`` is the shared [L, L] additive mask of the boundary
    (last) window row — ``make_shift_mask(...)[-1]`` — or None for the
    unshifted blocks. ``window_grid`` = (window rows, windows per row) of
    one image; Bw must be batch * rows * cols.
    """
    if window_grid is None:
        raise ValueError("window_grid=(n_window_rows, n_windows_per_row) is required")
    nwh, nww = int(window_grid[0]), int(window_grid[1])
    if q.shape[0] % (nwh * nww):
        raise ValueError(f"Bw={q.shape[0]} not a multiple of window grid {nwh}x{nww}")
    pattern_key = None
    if mask_pattern is not None:
        arr = np.ascontiguousarray(np.asarray(mask_pattern, np.float32))
        pattern_key = (arr.tobytes(), arr.shape)
    fn = _build(nwh, nww, bias is not None, pattern_key, not _on_tpu())
    if bias is not None:
        return fn(q, k, v, scale, bias)
    return fn(q, k, v, scale)
