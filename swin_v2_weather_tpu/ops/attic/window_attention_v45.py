"""v4/v5 qkv-fused window-attention schedules (retired A/B kernels).

Both were built during the round-3 attention campaign, verified for full
fwd+bwd parity, measured SLOWER than the committed v3 schedule at flagship
shape (v4: 4.36/11.07 ms, v4+pad 5.56/12.81, v5: 4.87/10.72 vs v3
4.28/10.50 — ROADMAP.md round-3 table), and retired here. They remain
selectable via SWIN_QKV_IMPL=v4|v5 (the dispatch in
``ops/window_attention.py`` lazy-imports this module) so any future
hardware generation can re-run the A/B without re-writing them.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swin_v2_weather_tpu.ops.window_attention import (
    ATTN_DEBUG,
    QKV_BWD_WC,
    QKV_FWD_WC,
    _HD_PAD,
    _NEG_INF,
    _pad_heads_vec,
    _pad_heads_w,
    _pad_heads_x,
    _unpad_heads,
    _attn_chunks,
    _bflag_arr,
    _pick_wc,
    _round_up,
)

# ---------------------------------------------------------------------------
# v5: per-head-projection qkv kernel. The r3 cost decomposition localized
# ~2 ms of the 4.4 ms v3 forward in the per-head staging copies: slicing the
# packed [*, 3C] projection output at hd=96-lane offsets is tile-MISALIGNED
# (96 is not a multiple of the 128-lane tile), so Mosaic lowers each slab
# copy to lane-granular shuffles. v5 removes the packed intermediate
# entirely: the projection weight is pre-reordered (in XLA, once, 3.5 MB) to
# [3*heads, C_in, hd] and the kernel runs one [tokens, C_in] @ [C_in, hd]
# matmul per (role, head) — each per-head q/k/v then EXISTS as its own
# tile-aligned value and no staging copy ever happens. The proj matmuls pay
# N=96 -> 75% MXU utilization (+0.4 ms) to save ~2 ms of VPU shuffles.
# Heads are software-pipelined: head h+1's projections + score matmul issue
# before head h's softmax, keeping the MXU ahead of the VPU.
# ---------------------------------------------------------------------------


def _w5_reorder(w_qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[C_in, 3C] -> [3*heads, C_in, hd] bf16 (XLA-side, tiny: ~3.5 MB)."""
    c_in, c3 = w_qkv.shape
    hd = c3 // 3 // heads
    w = w_qkv.reshape(c_in, 3, heads, hd).transpose(1, 2, 0, 3)
    return w.reshape(3 * heads, c_in, hd).astype(jnp.bfloat16)


def _b5_reorder(b_qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[3C] -> [3*heads, hd] fp32."""
    c3 = b_qkv.shape[-1]
    hd = c3 // 3 // heads
    return b_qkv.reshape(3 * heads, hd).astype(jnp.float32)


def _make_qkv5_kernel(wh: int, ww: int, nc: int, heads: int,
                      n_window_rows: int, has_mask: bool):
    l = wh * ww

    def kernel(*refs):
        i = 0
        scale_ref = refs[i]; i += 1  # SMEM [heads, 1]
        w5_ref = refs[i]; i += 1  # VMEM [3*heads, c_in, hd] bf16
        b5_ref = refs[i]; i += 1  # VMEM [3*heads, hd] fp32
        x_ref = refs[i]; i += 1  # [1, wh, wc, c_in]
        mask_ref = refs[i] if has_mask else None; i += has_mask
        bflag_ref = refs[i] if has_mask else None; i += has_mask
        out_ref = refs[i]

        c_in = x_ref.shape[-1]
        hd = w5_ref.shape[-1]
        wc = nc * ww

        x2 = x_ref[0].reshape(wh * wc, c_in).astype(jnp.bfloat16)

        def proj(idx):
            """One tile-aligned [tokens, C_in] @ [C_in, hd] matmul; windowed.

            Returns the (role, head) slab as a standalone [nc, L, hd] bf16
            value — the per-head slab never exists inside a packed [*, 3C]
            tensor, so no misaligned lane slice is ever needed."""
            m = jax.lax.dot_general(
                x2, w5_ref[idx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b5_ref[idx : idx + 1, :]
            t = m.astype(jnp.bfloat16).reshape(wh, nc, ww, hd)
            return t.transpose(1, 0, 2, 3).reshape(nc, l, hd)

        def qknorm(hh):
            """Normalized q/k (bf16) for one head + its score matmul."""
            qh = proj(hh)
            kh = proj(heads + hh)
            inv_q = jax.lax.rsqrt(jnp.maximum(
                jnp.sum(jnp.square(qh.astype(jnp.float32)), -1, keepdims=True),
                1e-24))
            inv_k = jax.lax.rsqrt(jnp.maximum(
                jnp.sum(jnp.square(kh.astype(jnp.float32)), -1, keepdims=True),
                1e-24))
            q16 = (qh.astype(jnp.float32) * inv_q).astype(jnp.bfloat16)
            k16 = (kh.astype(jnp.float32) * inv_k).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                q16, k16,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [nc, L, L]

        if has_mask:
            row = pl.program_id(1)
            on_boundary = (row == n_window_rows - 1).astype(jnp.float32)
            mask_add = (on_boundary * bflag_ref[0, 0]) * mask_ref[:, :]
        else:
            mask_add = None

        # head software pipeline: head h+1's proj + score matmuls are issued
        # before head h's softmax (max-free: see the v3 kernel derivation)
        s_next = qknorm(0)
        for hh in range(heads):
            s = s_next
            if hh + 1 < heads:
                s_next = qknorm(hh + 1)
            vh = proj(2 * heads + hh)
            scl = scale_ref[hh, 0]
            z = (s - 1.0) * scl
            if mask_add is not None:
                z = z + mask_add
            e = jnp.exp(z)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                e.astype(jnp.bfloat16), vh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * r  # [nc, L, hd]
            o = o.reshape(nc, wh, ww, hd).transpose(1, 0, 2, 3).reshape(
                wh, wc, hd
            )
            out_ref[0, :, :, hh * hd : (hh + 1) * hd] = o.astype(out_ref.dtype)

    return kernel


def _qkv5_forward(x, w5, b5, scale, mask_pattern, window, interpret,
                  bflag=None):
    b, h, w, c_in = x.shape
    wh, ww = window
    nwh, nww = h // wh, w // ww
    heads = scale.shape[0]
    hd = w5.shape[-1]
    c = heads * hd
    l = wh * ww
    wc = _pick_wc(w, ww, nww, QKV_FWD_WC)
    nc = wc // ww
    has_mask = mask_pattern is not None

    grid = (b, nwh, nww // nc)
    x_spec = pl.BlockSpec(
        (1, wh, wc, c_in), lambda bi, r, wcix: (bi, r, wcix, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, wh, wc, c), lambda bi, r, wcix: (bi, r, wcix, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((heads, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((3 * heads, c_in, hd), lambda bi, r, wcix: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * heads, hd), lambda bi, r, wcix: (0, 0),
                     memory_space=pltpu.VMEM),
        x_spec,
    ]
    args = [scale.astype(jnp.float32).reshape(heads, 1), w5, b5, x]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((l, l), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(jnp.asarray(np.asarray(mask_pattern, np.float32)))
        in_specs.append(
            pl.BlockSpec((1, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(_bflag_arr(bflag))

    kernel = _make_qkv5_kernel(wh, ww, nc, heads, nwh, has_mask)
    n_steps = b * nwh * (nww // nc)
    c3 = 3 * c
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=(2 * wh * wc * c_in * c3 + 2 * 2 * l * l * hd * heads * nc) * n_steps,
            bytes_accessed=(b * h * w * (c_in + c) + c_in * c3) * x.dtype.itemsize,
            transcendentals=b * nwh * nww * heads * l * l,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _make_qkv5_bwd_kernel(wh: int, ww: int, nc: int, heads: int,
                          n_window_rows: int, has_mask: bool):
    """v5 fully-fused backward: the v3 backward with the per-head INPUT
    staging replaced by per-(role, head) projection matmuls (see the v5
    banner). The dqkv write-back staging and the packed dx/dW/db projection
    backward are kept from v3 — packing dq/dk/dv into the [*, 3C] slab is
    required anyway so dx and dW run as two large MXU matmuls instead of 48
    K=96 ones with VPU accumulation."""
    l = wh * ww

    def kernel(*refs):
        i = 0
        scale_ref = refs[i]; i += 1  # SMEM [heads, 1]
        w5_ref = refs[i]; i += 1  # VMEM [3*heads, c_in, hd] bf16
        b5_ref = refs[i]; i += 1  # VMEM [3*heads, hd] fp32
        w_ref = refs[i]; i += 1  # VMEM [c_in, 3C] (packed, for dx/dW)
        x_ref = refs[i]; i += 1
        g_ref = refs[i]; i += 1
        mask_ref = refs[i] if has_mask else None; i += has_mask
        bflag_ref = refs[i] if has_mask else None; i += has_mask
        dx_ref = refs[i]; i += 1
        dw_ref = refs[i]; i += 1
        db_ref = refs[i]; i += 1
        dscale_ref = refs[i]; i += 1
        dqkv_ref = refs[i]  # scratch [nc, l, 3C] bf16

        c_in = x_ref.shape[-1]
        hd = w5_ref.shape[-1]
        c = heads * hd
        c3 = 3 * c
        wc = nc * ww

        first = (
            (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
        )

        @pl.when(first)
        def _init_accumulators():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)
            dscale_ref[...] = jnp.zeros_like(dscale_ref)

        x2 = x_ref[0].reshape(wh * wc, c_in).astype(jnp.bfloat16)
        gw = g_ref[0].astype(jnp.bfloat16).reshape(wh, nc, ww, c)
        gw = gw.transpose(1, 0, 2, 3).reshape(nc, l, c)

        def proj(idx):
            m = jax.lax.dot_general(
                x2, w5_ref[idx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b5_ref[idx : idx + 1, :]
            t = m.astype(jnp.bfloat16).reshape(wh, nc, ww, hd)
            return t.transpose(1, 0, 2, 3).reshape(nc, l, hd)

        def qknorm(hh):
            """(qn16, kn16, inv_q, inv_k, s) for one head."""
            qh = proj(hh)
            kh = proj(heads + hh)
            inv_q = jax.lax.rsqrt(jnp.maximum(
                jnp.sum(jnp.square(qh.astype(jnp.float32)), -1, keepdims=True),
                1e-24))
            inv_k = jax.lax.rsqrt(jnp.maximum(
                jnp.sum(jnp.square(kh.astype(jnp.float32)), -1, keepdims=True),
                1e-24))
            qn16 = (qh.astype(jnp.float32) * inv_q).astype(jnp.bfloat16)
            kn16 = (kh.astype(jnp.float32) * inv_k).astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                qn16, kn16,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return qn16, kn16, inv_q, inv_k, s

        if has_mask:
            row = pl.program_id(1)
            on_boundary = (row == n_window_rows - 1).astype(jnp.float32)
            mask_add = (on_boundary * bflag_ref[0, 0]) * mask_ref[:, :]

        dscale_h = [None] * heads
        nxt = qknorm(0)
        for hh in range(heads):
            qn16, kn16, inv_q, inv_k, s = nxt
            if hh + 1 < heads:
                nxt = qknorm(hh + 1)
            vh = proj(2 * heads + hh)
            gh = gw[:, :, hh * hd : (hh + 1) * hd]
            scl = scale_ref[hh, 0]
            z = (s - 1.0) * scl
            if has_mask:
                z = z + mask_add
            e = jnp.exp(z)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            p16 = (e * r).astype(jnp.bfloat16)

            dv = jax.lax.dot_general(
                p16, gh,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [nc, L, hd]
            dp = jax.lax.dot_general(
                gh, vh,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [nc, L, L]
            u = jnp.sum(dp * e, axis=-1, keepdims=True)
            dsb = ((dp - u * r) * e * (r * scl)).astype(jnp.bfloat16)
            dqn = jax.lax.dot_general(
                dsb, kn16,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dkn = jax.lax.dot_general(
                dsb, qn16,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            qd = jnp.sum(qn16 * dqn, -1, keepdims=True)  # fp32 accumulate
            kd = jnp.sum(kn16 * dkn, -1, keepdims=True)
            dscale_h[hh] = jnp.sum(qd) / scl
            dq = (dqn - qn16 * qd) * inv_q
            dk = (dkn - kn16 * kd) * inv_k

            dqkv_ref[:, :, hh * hd : (hh + 1) * hd] = dq.astype(jnp.bfloat16)
            dqkv_ref[:, :, c + hh * hd : c + (hh + 1) * hd] = dk.astype(
                jnp.bfloat16
            )
            dqkv_ref[:, :, 2 * c + hh * hd : 2 * c + (hh + 1) * hd] = dv.astype(
                jnp.bfloat16
            )

        # un-window dqkv back to the slab layout: [nc, L, 3C] -> [wh*wc, 3C]
        d = dqkv_ref[...].reshape(nc, wh, ww, c3).transpose(1, 0, 2, 3)
        d = d.reshape(wh * wc, c3)

        dx = jax.lax.dot_general(
            d, w_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx_ref[0] = dx.reshape(wh, wc, c_in).astype(dx_ref.dtype)
        dw_ref[...] += jax.lax.dot_general(
            x2, d,
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


def _qkv5_backward(x, w_qkv, w5, b5, scale, g, mask_pattern, window,
                   interpret, bflag=None):
    b, h, w, c_in = x.shape
    wh, ww = window
    nwh, nww = h // wh, w // ww
    heads = scale.shape[0]
    hd = w5.shape[-1]
    c = heads * hd
    c3 = 3 * c
    l = wh * ww
    wc = _pick_wc(w, ww, nww, QKV_BWD_WC)
    nc = wc // ww
    has_mask = mask_pattern is not None

    grid = (b, nwh, nww // nc)
    x_spec = pl.BlockSpec(
        (1, wh, wc, c_in), lambda bi, r, wcix: (bi, r, wcix, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (1, wh, wc, c), lambda bi, r, wcix: (bi, r, wcix, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((heads, 1), lambda bi, r, wcix: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((3 * heads, c_in, hd), lambda bi, r, wcix: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * heads, hd), lambda bi, r, wcix: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c_in, c3), lambda bi, r, wcix: (0, 0), memory_space=pltpu.VMEM),
        x_spec,
        g_spec,
    ]
    args = [scale.astype(jnp.float32).reshape(heads, 1), w5, b5, w_qkv, x, g]
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
    kernel = _make_qkv5_bwd_kernel(wh, ww, nc, heads, nwh, has_mask)
    n_steps = b * nwh * (nww // nc)
    dx, dw, db, dscale = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(x_spec, acc_spec((c_in, c3)), acc_spec((8, c3)), acc_spec((8, 128))),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((c_in, c3), jnp.float32),
            jax.ShapeDtypeStruct((8, c3), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nc, l, c3), jnp.bfloat16),
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
    return dx, dw, db[0], dscale[0, :heads]


@functools.lru_cache(maxsize=64)
def _build_qkv5(window, pattern_key, interpret: bool):
    mask_pattern = None
    if pattern_key is not None:
        buf, shape = pattern_key
        mask_pattern = np.frombuffer(buf, np.float32).reshape(shape)

    @jax.custom_vjp
    def fused(x, w_qkv, b_qkv, scale, bflag):
        heads = scale.shape[0]
        return _qkv5_forward(
            x, _w5_reorder(w_qkv, heads), _b5_reorder(b_qkv, heads), scale,
            mask_pattern, window, interpret, bflag=bflag,
        )

    def f_fwd(x, w_qkv, b_qkv, scale, bflag):
        return fused(x, w_qkv, b_qkv, scale, bflag), (x, w_qkv, b_qkv, scale, bflag)

    def f_bwd(res, g):
        x, w_qkv, b_qkv, scale, bflag = res
        heads = scale.shape[0]
        dx, dw, db, dscale = _qkv5_backward(
            x, w_qkv, _w5_reorder(w_qkv, heads), _b5_reorder(b_qkv, heads),
            scale, g, mask_pattern, window, interpret, bflag=bflag,
        )
        return (
            dx,
            dw.astype(w_qkv.dtype),
            db.astype(b_qkv.dtype),
            dscale.astype(scale.dtype),
            jnp.zeros_like(bflag),
        )

    fused.defvjp(f_fwd, f_bwd)
    return fused


# ---------------------------------------------------------------------------
# v4: window-major qkv-fused kernel. The r3 cost decomposition of v3 (see
# scripts/attn_bench.py, SWIN_ATTN_DEBUG): per fwd invocation at flagship
# shape, DMA + qkv matmul + bias = 1.28 ms, window transpose + head staging
# relayouts = 2.08 ms, attention dots + softmax + normalize = ~1.06 ms — the
# kernel is RELAYOUT-bound, not FLOP- or softmax-bound. v4 moves the
# window-major rearrangement into XLA (one fused HBM pass at memory
# bandwidth, ~0.25 ms, instead of VPU sublane permutes in VMEM) and the
# kernel consumes [B, nW, L, C] blocks whose window tokens are already
# contiguous: in-kernel data movement reduces to per-head lane slices.
# ---------------------------------------------------------------------------


def window_major(x: jnp.ndarray, window: Tuple[int, int]) -> jnp.ndarray:
    """[B, H, W, C] -> [B, nW, L_pad, C] (window-major token order, XLA).

    The token dim is zero-padded to a sublane multiple (162 -> 168 for the
    flagship window) so the kernel's [nW-chunk, L_pad, C] -> [chunk*L_pad, C]
    flattening is layout-free (Mosaic merges leading dims for free only when
    the sublane dim is 8-divisible). Zero pad tokens are masked out of the
    softmax in-kernel and carry exactly zero gradient (zero x rows contribute
    nothing to dW; zero g rows nothing to dv)."""
    b, h, w, c = x.shape
    wh, ww = window
    nwh, nww = h // wh, w // ww
    l = wh * ww
    xw = x.reshape(b, nwh, wh, nww, ww, c).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(b, nwh * nww, l, c)
    lp = _round_up(l, 8)
    if lp != l:
        xw = jnp.pad(xw, [(0, 0), (0, 0), (0, lp - l), (0, 0)])
    return xw


def window_major_inverse(xw: jnp.ndarray, window: Tuple[int, int],
                         hw: Tuple[int, int]) -> jnp.ndarray:
    """[B, nW, L_pad, C] -> [B, H, W, C] (inverse of :func:`window_major`)."""
    b, nw, lp, c = xw.shape
    wh, ww = window
    h, w = hw
    nwh, nww = h // wh, w // ww
    x = xw[:, :, : wh * ww].reshape(b, nwh, nww, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _make_qkv4_kernel(l: int, lp: int, nwc: int, heads: int,
                      chunks_per_row: int, n_window_rows: int, has_mask: bool):
    pad_cols = lp > l

    def kernel(*refs):
        i = 0
        scale_ref = refs[i]; i += 1  # SMEM (API parity; unused in fwd)
        shb_ref = refs[i]; i += 1  # VMEM [hb, 1] fp32
        x_ref = refs[i]; i += 1  # [1, nwc, Lp, C_in]
        w_ref = refs[i]; i += 1
        b_ref = refs[i]; i += 1
        mask_ref = refs[i] if has_mask else None; i += has_mask
        bflag_ref = refs[i] if has_mask else None; i += has_mask
        out_ref = refs[i]; i += 1
        qkv_ref = refs[i]  # scratch [3, heads, nwc, Lp, hd] bf16

        del scale_ref
        c_in = x_ref.shape[-1]
        c3 = w_ref.shape[-1]
        c = c3 // 3
        hd = c // heads
        hb = heads * nwc

        # flat qkv projection: [nwc*Lp, C_in] @ [C_in, 3C]. Lp is 8-divisible
        # by construction (window_major pads), so the flatten is layout-free
        # and the matmul runs at the v3 kernel's best MXU shape.
        x2 = x_ref[0].reshape(nwc * lp, c_in)
        qkv = jax.lax.dot_general(
            x2.astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0]
        t = qkv.astype(jnp.bfloat16).reshape(nwc, lp, c3)

        for hh in range(heads):  # per-head lane slices (no sublane permutes)
            qkv_ref[0, hh] = t[:, :, hh * hd : (hh + 1) * hd]
            qkv_ref[1, hh] = t[:, :, c + hh * hd : c + (hh + 1) * hd]
            qkv_ref[2, hh] = t[:, :, 2 * c + hh * hd : 2 * c + (hh + 1) * hd]

        if has_mask:
            row = pl.program_id(1) // chunks_per_row
            on_boundary = (row == n_window_rows - 1).astype(jnp.float32)
            mask_add = (on_boundary * bflag_ref[0, 0]) * mask_ref[:, :]
        else:
            mask_add = None

        q = qkv_ref[0].reshape(hb, lp, hd).astype(jnp.float32)
        k = qkv_ref[1].reshape(hb, lp, hd).astype(jnp.float32)
        v = qkv_ref[2].reshape(hb, lp, hd)
        q = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
        k = k * jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))
        q16 = q.astype(jnp.bfloat16)
        k16 = k.astype(jnp.bfloat16)

        # chunked max-free softmax (see the v3 kernel for the derivation);
        # zero-pad KEY tokens are masked to -inf (their e underflows to 0)
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
            if pad_cols:
                col = jax.lax.broadcasted_iota(jnp.int32, (1, lp, lp), 2)
                z = jnp.where(col >= l, _NEG_INF, z)
            e = jnp.exp(z)
            p16 = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))).astype(
                jnp.bfloat16
            )
            out = jax.lax.dot_general(
                p16, v[lo:hi],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [sz, Lp, hd]
            for j in range(hpc):  # aligned-by-construction lane writes
                hh = ci * hpc + j
                out_ref[0, :, :, hh * hd : (hh + 1) * hd] = out[
                    j * nwc : (j + 1) * nwc
                ].astype(out_ref.dtype)

    return kernel


def _pick_nwc(n_windows: int, nww: int, budget: int) -> int:
    """Windows per grid step: divides the window-row width (so a step never
    straddles the boundary row) and the total, under the budget."""
    valid = [c for c in range(1, nww + 1) if nww % c == 0 and n_windows % c == 0]
    under = [c for c in valid if c <= budget]
    return max(under) if under else min(valid)


def _pad_mask_lp(mask_pattern, l: int, lp: int):
    patt = np.zeros((lp, lp), np.float32)
    patt[:l, :l] = np.asarray(mask_pattern, np.float32)
    return jnp.asarray(patt)


def _qkv4_forward(xw, w_qkv, b_qkv, scale, mask_pattern, window_grid,
                  seq_len, interpret, bflag=None, budget=None):
    b, n_w, lp, c_in = xw.shape
    l = seq_len
    nwh, nww = window_grid
    heads = scale.shape[0]
    c3 = w_qkv.shape[-1]
    c = c3 // 3
    nwc = _pick_nwc(n_w, nww, budget if budget is not None else QKV_FWD_WC)
    chunks_per_row = nww // nwc
    hb = heads * nwc
    hd = c // heads
    has_mask = mask_pattern is not None

    grid = (b, n_w // nwc)
    x_spec = pl.BlockSpec(
        (1, nwc, lp, c_in), lambda bi, ci: (bi, ci, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, nwc, lp, c), lambda bi, ci: (bi, ci, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((heads, 1), lambda bi, ci: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((hb, 1), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
        x_spec,
        pl.BlockSpec((c_in, c3), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c3), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
    ]
    scale_f = scale.astype(jnp.float32)
    args = [
        scale_f.reshape(heads, 1),
        jnp.repeat(scale_f, nwc).reshape(hb, 1),
        xw,
        w_qkv,
        b_qkv.reshape(1, c3).astype(jnp.float32),
    ]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((lp, lp), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(_pad_mask_lp(mask_pattern, l, lp))
        in_specs.append(
            pl.BlockSpec((1, 1), lambda bi, ci: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(_bflag_arr(bflag))

    kernel = _make_qkv4_kernel(l, lp, nwc, heads, chunks_per_row, nwh, has_mask)
    n_steps = b * (n_w // nwc)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_w, lp, c), xw.dtype),
        scratch_shapes=[pltpu.VMEM((3, heads, nwc, lp, hd), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=(2 * nwc * lp * c_in * c3 + 2 * 2 * lp * lp * hd * heads * nwc)
            * n_steps,
            bytes_accessed=(b * n_w * lp * (c_in + c) + c_in * c3)
            * xw.dtype.itemsize,
            transcendentals=b * n_w * heads * lp * lp,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _make_qkv4_bwd_kernel(l: int, lp: int, nwc: int, heads: int,
                          chunks_per_row: int, n_window_rows: int,
                          has_mask: bool):
    """v4 backward: the v3 fully-fused backward in window-major layout —
    qkv recompute + softmax recompute + attention backward + normalization
    vjp + projection backward per block, with dW/db/dscale accumulating in
    VMEM-resident outputs. No sublane permutes: windowing happened in XLA;
    zero pad tokens contribute exactly zero to dW/db (zero x/g rows)."""
    pad_cols = lp > l

    def kernel(*refs):
        i = 0
        scale_ref = refs[i]; i += 1
        shb_ref = refs[i]; i += 1
        x_ref = refs[i]; i += 1  # [1, nwc, Lp, C_in]
        w_ref = refs[i]; i += 1
        b_ref = refs[i]; i += 1
        g_ref = refs[i]; i += 1  # [1, nwc, Lp, C]
        mask_ref = refs[i] if has_mask else None; i += has_mask
        bflag_ref = refs[i] if has_mask else None; i += has_mask
        dx_ref = refs[i]; i += 1
        dw_ref = refs[i]; i += 1
        db_ref = refs[i]; i += 1
        dscale_ref = refs[i]; i += 1
        dqkv_ref = refs[i]; i += 1  # scratch [nwc, Lp, 3C] bf16
        qkvh_ref = refs[i]; i += 1  # scratch [3, heads, nwc, Lp, hd] bf16
        gh_ref = refs[i]  # scratch [heads, nwc, Lp, hd] bf16

        c_in = x_ref.shape[-1]
        c3 = w_ref.shape[-1]
        c = c3 // 3
        hd = c // heads
        hb = heads * nwc

        first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

        @pl.when(first)
        def _init_accumulators():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)
            dscale_ref[...] = jnp.zeros_like(dscale_ref)

        x2 = x_ref[0].reshape(nwc * lp, c_in).astype(jnp.bfloat16)
        qkv = jax.lax.dot_general(
            x2, w_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0]
        t = qkv.astype(jnp.bfloat16).reshape(nwc, lp, c3)
        g16 = g_ref[0].astype(jnp.bfloat16)

        for hh in range(heads):  # per-head lane slices, no permutes
            qkvh_ref[0, hh] = t[:, :, hh * hd : (hh + 1) * hd]
            qkvh_ref[1, hh] = t[:, :, c + hh * hd : c + (hh + 1) * hd]
            qkvh_ref[2, hh] = t[:, :, 2 * c + hh * hd : 2 * c + (hh + 1) * hd]
            gh_ref[hh] = g16[:, :, hh * hd : (hh + 1) * hd]

        if has_mask:
            row = pl.program_id(1) // chunks_per_row
            on_boundary = (row == n_window_rows - 1).astype(jnp.float32)
            mask_add = (on_boundary * bflag_ref[0, 0]) * mask_ref[:, :]

        q = qkvh_ref[0].reshape(hb, lp, hd).astype(jnp.float32)
        k = qkvh_ref[1].reshape(hb, lp, hd).astype(jnp.float32)
        v = qkvh_ref[2].reshape(hb, lp, hd)
        g = gh_ref[...].reshape(hb, lp, hd)

        inv_q = jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-24))
        inv_k = jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-24))
        qn = q * inv_q
        kn = k * inv_k
        qn16 = qn.astype(jnp.bfloat16)
        kn16 = kn.astype(jnp.bfloat16)

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
            if pad_cols:
                col = jax.lax.broadcasted_iota(jnp.int32, (1, lp, lp), 2)
                z = jnp.where(col >= l, _NEG_INF, z)
            e = jnp.exp(z)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            p16 = (e * r).astype(jnp.bfloat16)

            gc = g[lo:hi]
            dv = jax.lax.dot_general(
                p16, gc,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                gc, v[lo:hi],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
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
            qnc, knc = qn[lo:hi], kn[lo:hi]
            qd = jnp.sum(qnc * dqn, -1, keepdims=True)
            kd = jnp.sum(knc * dkn, -1, keepdims=True)
            for j in range(hpc):
                hh = ci * hpc + j
                dscale_h[hh] = (
                    jnp.sum(qd[j * nwc : (j + 1) * nwc]) / scale_ref[hh, 0]
                )
            dq = (dqn - qnc * qd) * inv_q[lo:hi]
            dk = (dkn - knc * kd) * inv_k[lo:hi]

            for j in range(hpc):
                hh = ci * hpc + j
                sl = slice(j * nwc, (j + 1) * nwc)
                dqkv_ref[:, :, hh * hd : (hh + 1) * hd] = dq[sl].astype(
                    jnp.bfloat16
                )
                dqkv_ref[:, :, c + hh * hd : c + (hh + 1) * hd] = dk[sl].astype(
                    jnp.bfloat16
                )
                dqkv_ref[:, :, 2 * c + hh * hd : 2 * c + (hh + 1) * hd] = dv[
                    sl
                ].astype(jnp.bfloat16)

        d2 = dqkv_ref[...].reshape(nwc * lp, c3)  # bf16, free flatten
        dx = jax.lax.dot_general(
            d2, w_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [nwc*Lp, C_in]
        dx_ref[0] = dx.reshape(nwc, lp, c_in).astype(dx_ref.dtype)
        # flat projection backward: zero pad rows of x2 contribute nothing
        dw_ref[...] += jax.lax.dot_general(
            x2, d2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ones = jnp.ones((8, nwc * lp), jnp.bfloat16)
        db_ref[...] += jax.lax.dot_general(
            ones, d2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == 0, 1.0, 0.0
        )
        vals = jnp.pad(jnp.stack(dscale_h), (0, 128 - heads))
        rowi2 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        dscale_ref[...] += jnp.where(rowi2 == 0, vals[None, :], 0.0)

    return kernel


def _qkv4_backward(xw, w_qkv, b_qkv, scale, gw, mask_pattern, window_grid,
                   seq_len, interpret, bflag=None, budget=None):
    b, n_w, lp, c_in = xw.shape
    l = seq_len
    nwh, nww = window_grid
    heads = scale.shape[0]
    c3 = w_qkv.shape[-1]
    c = c3 // 3
    hd = c // heads
    nwc = _pick_nwc(n_w, nww, budget if budget is not None else QKV_BWD_WC)
    chunks_per_row = nww // nwc
    hb = heads * nwc
    has_mask = mask_pattern is not None

    grid = (b, n_w // nwc)
    x_spec = pl.BlockSpec(
        (1, nwc, lp, c_in), lambda bi, ci: (bi, ci, 0, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (1, nwc, lp, c), lambda bi, ci: (bi, ci, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((heads, 1), lambda bi, ci: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((hb, 1), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
        x_spec,
        pl.BlockSpec((c_in, c3), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c3), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM),
        g_spec,
    ]
    scale_f = scale.astype(jnp.float32)
    args = [
        scale_f.reshape(heads, 1),
        jnp.repeat(scale_f, nwc).reshape(hb, 1),
        xw,
        w_qkv,
        b_qkv.reshape(1, c3).astype(jnp.float32),
        gw,
    ]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((lp, lp), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(_pad_mask_lp(mask_pattern, l, lp))
        in_specs.append(
            pl.BlockSpec((1, 1), lambda bi, ci: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(_bflag_arr(bflag))

    acc_spec = lambda shape: pl.BlockSpec(  # noqa: E731 — resident accumulator
        shape, lambda bi, ci: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    kernel = _make_qkv4_bwd_kernel(l, lp, nwc, heads, chunks_per_row, nwh, has_mask)
    n_steps = b * (n_w // nwc)
    dx, dw, db, dscale = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(x_spec, acc_spec((c_in, c3)), acc_spec((8, c3)), acc_spec((8, 128))),
        out_shape=(
            jax.ShapeDtypeStruct(xw.shape, xw.dtype),
            jax.ShapeDtypeStruct((c_in, c3), jnp.float32),
            jax.ShapeDtypeStruct((8, c3), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nwc, lp, c3), jnp.bfloat16),
            pltpu.VMEM((3, heads, nwc, lp, hd), jnp.bfloat16),
            pltpu.VMEM((heads, nwc, lp, hd), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(3 * 2 * nwc * lp * c_in * c3 + 6 * 2 * lp * lp * hd * heads * nwc)
            * n_steps,
            bytes_accessed=(b * n_w * lp * (2 * c_in + c) + 2 * c_in * c3)
            * xw.dtype.itemsize,
            transcendentals=b * n_w * heads * lp * lp,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return dx, dw, db[0], dscale[0, :heads]


# pad each head's qkv weight columns 96 -> 128 so every in-kernel lane slice
# is tile-aligned (the r3 probes localized the v3 cost in the misaligned
# head staging). Costs ~33% more proj-matmul FLOPs; env-selectable for A/B.
QKV_PAD_HEADS = _os.environ.get("SWIN_QKV_PAD_HEADS", "0") == "1"










@functools.lru_cache(maxsize=64)
def _build_qkv4(window, hw, pattern_key, interpret: bool, pad_heads: bool):
    mask_pattern = None
    if pattern_key is not None:
        buf, shape = pattern_key
        mask_pattern = np.frombuffer(buf, np.float32).reshape(shape)
    wh, ww = window
    h, w = hw
    wgrid = (h // wh, w // ww)

    @jax.custom_vjp
    def fused(x, w_qkv, b_qkv, scale, bflag):
        heads = scale.shape[0]
        hd = w_qkv.shape[-1] // 3 // heads
        xw = window_major(x, window)
        wk, bk = w_qkv, b_qkv
        if pad_heads:
            wk, bk = _pad_heads_w(w_qkv, heads), _pad_heads_vec(b_qkv, heads)
        ow = _qkv4_forward(xw, wk, bk, scale, mask_pattern, wgrid,
                           wh * ww, interpret, bflag=bflag)
        if pad_heads:
            ow = _unpad_heads(ow, heads, hd)
        return window_major_inverse(ow, window, hw)

    def f_fwd(x, w_qkv, b_qkv, scale, bflag):
        return fused(x, w_qkv, b_qkv, scale, bflag), (x, w_qkv, b_qkv, scale, bflag)

    def f_bwd(res, g):
        x, w_qkv, b_qkv, scale, bflag = res
        heads = scale.shape[0]
        hd = w_qkv.shape[-1] // 3 // heads
        xw = window_major(x, window)
        gw = window_major(g, window)
        wk, bk = w_qkv, b_qkv
        if pad_heads:
            wk, bk = _pad_heads_w(w_qkv, heads), _pad_heads_vec(b_qkv, heads)
            gw = _pad_heads_x(gw, heads, hd)
        dxw, dw, db, dscale = _qkv4_backward(
            xw, wk, bk, scale, gw, mask_pattern, wgrid, wh * ww,
            interpret, bflag=bflag,
        )
        if pad_heads:
            dw = _unpad_heads(dw, 3 * heads, hd).reshape(w_qkv.shape)
            db = _unpad_heads(db, 3 * heads, hd).reshape(b_qkv.shape)
        dx = window_major_inverse(dxw, window, hw)
        return (
            dx,
            dw.astype(w_qkv.dtype),
            db.astype(b_qkv.dtype),
            dscale.astype(scale.dtype),
            jnp.zeros_like(bflag),
        )

    fused.defvjp(f_fwd, f_bwd)
    return fused


