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

The backward pass is a recompute-based custom VJP: the forward saves only
(q, k, v, scale, bias) and the gradient is taken through a pure-XLA
reference implementation of the same math (numerically identical fp32
softmax). This matches the activation-checkpoint behavior the reference
uses for its big configs — nothing materialized between forward and
backward — while a handwritten Pallas backward remains a drop-in upgrade.

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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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
# public API: custom-VJP wrapper with recompute backward
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

    def ref_impl(q, k, v, scale, bias):
        return reference_attention(q, k, v, scale, bias, mask_pattern, (nwh, nww))

    if has_bias:

        @jax.custom_vjp
        def fused(q, k, v, scale, bias):
            return fwd_impl(q, k, v, scale, bias)

        def fused_fwd(q, k, v, scale, bias):
            return fwd_impl(q, k, v, scale, bias), (q, k, v, scale, bias)

        def fused_bwd(res, g):
            _, vjp = jax.vjp(ref_impl, *res)
            return vjp(g)

        fused.defvjp(fused_fwd, fused_bwd)
        return fused

    @jax.custom_vjp
    def fused4(q, k, v, scale):
        return fwd_impl(q, k, v, scale, None)

    def fused4_fwd(q, k, v, scale):
        return fused4(q, k, v, scale), (q, k, v, scale)

    def fused4_bwd(res, g):
        q, k, v, scale = res
        _, vjp = jax.vjp(lambda q_, k_, v_, s_: ref_impl(q_, k_, v_, s_, None), q, k, v, scale)
        return vjp(g)

    fused4.defvjp(fused4_fwd, fused4_bwd)
    return fused4


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
