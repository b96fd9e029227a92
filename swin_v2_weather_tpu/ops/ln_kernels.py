"""Fused LayerNorm + drop-path + residual-add Pallas kernels.

Why this exists (r3 trace on the 417 ms flagship step,
scripts/trace_summary.py): the post-norm residual branches
``x + drop_path(norm(y))`` (reference ``networks/swinv2_global.py:489-494``)
cost ~29 ms/step of ``convert_reduce`` LN-statistics fusions plus the
apply/add elementwise passes — XLA reads the 100 MB branch tensor once for
the fp32 mean/var reduce and again for the normalize+add, and the backward
repeats the pattern (plus, under ``remat_policy='mlp3'``, a proj+roll
recompute just to rebuild norm1's input for the LN vjp).

These kernels collapse each direction to ONE HBM pass:

  * fwd:  ``out = x + m * cast(LN(z) * gamma + beta)`` — per-row (token)
    statistics live entirely in registers (the norm axis C is resident in
    lanes), so the kernel reads z and x once and writes out once.
  * bwd:  reads z and the cotangent once, recomputes the row statistics
    in-register, emits dz in the same pass, and accumulates dgamma/dbeta
    in a VMEM-resident [1, C] output across the sequential grid (the same
    pattern as the attention kernels' d(bias)). dx is the cotangent itself
    (identity through the residual add) — zero traffic.

The custom_vjp saves z itself as the residual, which under
``remat_policy='mlp3'`` is the tensor already kept as the ``mlp_out`` named
save (the policy drops that name when this op is active, exactly like the
``block_mid``/fused-MLP interplay), so the step's HBM footprint for norm2
is unchanged; norm1's z becomes a saved residual in exchange for dropping
the backward proj+roll recompute.

Numerics: statistics and normalize in fp32 (``Fp32LayerNorm`` semantics,
eps 1e-5, biased variance); the normalized branch is rounded to the compute
dtype exactly where the unfused path casts, so the deterministic
(``m == 1``) output is bit-identical to ``x + LN(z).astype(dtype)``.
``m`` is the per-sample drop-path multiplier (mask/keep, 0 when dropped);
it is a function of the dropout rng, not a parameter, so its cotangent is
discarded (flax Dropout semantics).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5

# token-tile target (rows per grid step); sweepable like SWIN_MLP_TM.
LNADD_TM = int(_os.environ.get("SWIN_LNADD_TM", "648"))


def _pick_tile(tokens: int, target: int = None) -> int:
    if target is None:
        target = LNADD_TM
    best = 8
    for t in range(8, min(tokens, target) + 1, 8):
        if tokens % t == 0:
            best = t
    return best


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def supported(tokens: int, channels: int) -> bool:
    """Shapes the kernels handle: lane-aligned norm axis, 8-row tiles."""
    return channels % 128 == 0 and tokens % 8 == 0


def _row_stats(zf):
    mean = jnp.mean(zf, axis=-1, keepdims=True)
    zc = zf - mean
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    return zc, rstd


def _make_fwd_kernel(compute_dtype):
    def kernel(z_ref, x_ref, g_ref, b_ref, m_ref, o_ref):
        zf = z_ref[...].astype(jnp.float32)
        zc, rstd = _row_stats(zf)
        y = zc * rstd * g_ref[0] + b_ref[0]
        # round to compute dtype exactly where the unfused path casts
        # (norm output), then the drop-path multiply in compute dtype
        yb = y.astype(compute_dtype) * m_ref[...].astype(compute_dtype)
        o_ref[...] = (x_ref[...] + yb).astype(o_ref.dtype)

    return kernel


def _make_bwd_kernel():
    def kernel(z_ref, g_ref, gamma_ref, m_ref, dz_ref, dg_ref, db_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            dg_ref[...] = jnp.zeros_like(dg_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        zf = z_ref[...].astype(jnp.float32)
        zc, rstd = _row_stats(zf)
        hhat = zc * rstd
        dy = g_ref[...].astype(jnp.float32) * m_ref[...].astype(jnp.float32)
        dg_ref[...] += jnp.sum(dy * hhat, axis=0, keepdims=True)
        db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
        dh = dy * gamma_ref[0]
        t1 = jnp.mean(dh * hhat, axis=-1, keepdims=True)
        t2 = jnp.mean(dh, axis=-1, keepdims=True)
        dz_ref[...] = (rstd * (dh - t2 - hhat * t1)).astype(dz_ref.dtype)

    return kernel


def ln_dp_add_fwd_pallas(z2, x2, gamma, beta, m2, interpret=None):
    """x2 + m2 * cast(LN(z2)*gamma+beta): [T, C] -> [T, C] (dtype of x2)."""
    t, c = z2.shape
    tm = _pick_tile(t)
    interp = (not _on_tpu()) if interpret is None else interpret
    kernel = _make_fwd_kernel(x2.dtype)
    row = pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mcol = pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(t // tm,),
        in_specs=[row, row, vec, vec, mcol],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((t, c), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * t * c,
            bytes_accessed=3 * t * c * x2.dtype.itemsize,
            transcendentals=t,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interp,
    )(
        z2,
        x2,
        gamma.reshape(1, -1).astype(jnp.float32),
        beta.reshape(1, -1).astype(jnp.float32),
        m2,
    )


def ln_dp_add_bwd_pallas(z2, g2, gamma, m2, interpret=None):
    """One-pass backward: (dz, dgamma, dbeta) from (z, cotangent)."""
    t, c = z2.shape
    tm = _pick_tile(t)
    interp = (not _on_tpu()) if interpret is None else interpret
    kernel = _make_bwd_kernel()
    row = pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mcol = pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(t // tm,),
        in_specs=[row, row, vec, mcol],
        out_specs=[row, acc, acc],
        out_shape=[
            jax.ShapeDtypeStruct((t, c), z2.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=14 * t * c,
            bytes_accessed=3 * t * c * z2.dtype.itemsize,
            transcendentals=t,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interp,
    )(z2, g2, gamma.reshape(1, -1).astype(jnp.float32), m2)


@functools.lru_cache(maxsize=8)
def _build(interpret_key):
    import math

    @jax.custom_vjp
    def fused(z, x, gamma, beta, m):
        t = math.prod(z.shape[:-1])
        z2 = z.reshape(t, z.shape[-1])
        x2 = x.reshape(t, x.shape[-1])
        m2 = jnp.broadcast_to(
            m.reshape(m.shape[0], 1, 1), (m.shape[0], t // m.shape[0], 1)
        ).reshape(t, 1)
        return ln_dp_add_fwd_pallas(z2, x2, gamma, beta, m2).reshape(x.shape)

    def f_fwd(z, x, gamma, beta, m):
        # residuals: z (the tensor remat policies already keep), gamma, m —
        # NOT x: the residual-add cotangent is the output cotangent itself
        return fused(z, x, gamma, beta, m), (z, gamma, m)

    def f_bwd(res, g):
        z, gamma, m = res
        t = math.prod(z.shape[:-1])
        z2 = z.reshape(t, z.shape[-1])
        g2 = g.reshape(t, g.shape[-1])
        m2 = jnp.broadcast_to(
            m.reshape(m.shape[0], 1, 1), (m.shape[0], t // m.shape[0], 1)
        ).reshape(t, 1)
        dz2, dgamma, dbeta = ln_dp_add_bwd_pallas(z2, g2, gamma, m2)
        return (
            dz2.reshape(z.shape),
            g,  # d(residual): identity
            dgamma.reshape(-1).astype(gamma.dtype),
            dbeta.reshape(-1).astype(gamma.dtype),
            jnp.zeros_like(m),  # rng-derived multiplier: no grad consumer
        )

    fused.defvjp(f_fwd, f_bwd)
    return fused


def fused_ln_droppath_add(z, x, gamma, beta, m):
    """``x + m * cast(LN(z) * gamma + beta)`` with per-sample m; z,x: [B, ..., C].

    The fused TPU form of the reference's post-norm residual branch
    (``networks/swinv2_global.py:489-494``). m is the drop-path multiplier
    per sample (1.0 everywhere when deterministic). Caller must check
    :func:`supported` for the (tokens, channels) shape.
    """
    return _build(not _on_tpu())(z, x, gamma, beta, m)
