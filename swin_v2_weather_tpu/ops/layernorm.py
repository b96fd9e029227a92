"""Fused LayerNorm (Pallas TPU kernel).

The transformer blocks carry fp32-stat LayerNorms over [B, H, W, C]
activations; under XLA each costs ~8x the HBM speed-of-light at flagship
size (multiple passes + fp32 materialization). This kernel does one pass:
read a bf16 row tile, compute mean/var in fp32 on the VPU, write the
normalized bf16 tile. The backward is a second single-pass kernel emitting
dx plus per-tile partials of d(scale)/d(bias) that the wrapper reduces.

Semantics match ``flax.linen.LayerNorm(epsilon=eps, dtype=float32)`` as the
model uses it (reference block norms, ``networks/swinv2_global.py:426-430``):
stats and the affine transform in fp32, output cast back to the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _row_tile(n: int, cap: int = 2048) -> int:
    """Largest divisor of n that is <= cap and a multiple of 8 (or n)."""
    best = None
    for t in range(8, min(cap, n) + 1, 8):
        if n % t == 0:
            best = t
    return best or n


def _ln_fwd_kernel(x_ref, scale_ref, bias_ref, eps_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps_ref[0, 0])
    y = xc * rstd * scale_ref[0] + bias_ref[0]
    out_ref[:] = y.astype(out_ref.dtype)


def _ln_bwd_kernel(x_ref, scale_ref, eps_ref, g_ref, dx_ref, dscale_ref, dbias_ref):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    c = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps_ref[0, 0])
    xhat = xc * rstd

    # per-tile partials live in row 0 of an 8-row tile (Mosaic's minimum
    # sublane granularity for an output block)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, c), 0)
    dscale_ref[0] = jnp.where(row == 0, jnp.sum(g * xhat, axis=0)[None, :], 0.0)
    dbias_ref[0] = jnp.where(row == 0, jnp.sum(g, axis=0)[None, :], 0.0)

    gg = g * scale_ref[0]
    m1 = jnp.mean(gg, axis=-1, keepdims=True)
    m2 = jnp.mean(gg * xhat, axis=-1, keepdims=True)
    dx = (gg - m1 - xhat * m2) * rstd
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _fwd(x2, scale, bias, eps, interpret):
    n, c = x2.shape
    # fp32 temporaries are ~3 tiles wide; keep the stack well under VMEM
    tr = _row_tile(n, cap=max(8, (4 << 20) // (12 * c)))
    eps_arr = jnp.full((1, 1), eps, jnp.float32)
    return pl.pallas_call(
        _ln_fwd_kernel,
        grid=(n // tr,),
        in_specs=[
            pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), x2.dtype),
        interpret=interpret,
    )(x2, scale.astype(jnp.float32).reshape(1, c), bias.astype(jnp.float32).reshape(1, c),
      eps_arr)


def _bwd(x2, scale, eps, g2, interpret):
    n, c = x2.shape
    # backward holds ~7 fp32 tiles (x, g, xc, xhat, gg, dx, partials)
    tr = _row_tile(n, cap=max(8, (4 << 20) // (28 * c)))
    eps_arr = jnp.full((1, 1), eps, jnp.float32)
    dx, dscale_p, dbias_p = pl.pallas_call(
        _ln_bwd_kernel,
        grid=(n // tr,),
        in_specs=[
            pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, c), g2.dtype),
            jax.ShapeDtypeStruct((n // tr, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((n // tr, 8, c), jnp.float32),
        ),
        interpret=interpret,
    )(x2, scale.astype(jnp.float32).reshape(1, c), eps_arr, g2)
    return dx, dscale_p[:, 0].sum(axis=0), dbias_p[:, 0].sum(axis=0)


@functools.lru_cache(maxsize=8)
def _build(eps: float, interpret: bool):
    @jax.custom_vjp
    def ln(x2, scale, bias):
        return _fwd(x2, scale, bias, eps, interpret)

    def ln_fwd(x2, scale, bias):
        return ln(x2, scale, bias), (x2, scale)

    def ln_bwd(res, g2):
        x2, scale = res
        dx, dscale, dbias = _bwd(x2, scale, eps, g2.astype(x2.dtype), interpret)
        return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)

    ln.defvjp(ln_fwd, ln_bwd)
    return ln


def fused_layernorm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """LayerNorm over the last axis, fp32 stats, output in x.dtype."""
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    out = _build(float(eps), not _on_tpu())(x2, scale, bias)
    return out.reshape(shape)
