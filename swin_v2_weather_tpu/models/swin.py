"""SwinV2 for global weather forecasting — TPU-native Flax implementation.

Same capabilities as the reference ``networks/swinv2_global.py`` (a
single-stage SwinV2-CR adapted from timm for the 0.25-degree ERA5 grid),
re-designed for TPU rather than translated:

  * **NHWC (channels-last) end to end** — the TPU-native layout. The public
    ``__call__`` accepts NCHW (the reference's and the data files' layout) and
    transposes once at ingress/egress; XLA folds these into neighbouring ops.
  * **Patch embedding as space-to-depth + matmul** instead of a strided
    conv (reference ``networks/swinv2_global.py:526-546``): a k=stride conv
    is exactly a reshape followed by a dense layer, which maps straight onto
    the MXU with no im2col.
  * **Window partition/reverse as pure reshapes** (reference ``:89-119``) —
    zero-copy layout changes under XLA.
  * **Cyclic shift via jnp.roll** (reference ``:446-478``; the torch-XLA
    workaround comments there do not apply — roll lowers to efficient
    slice/concat on TPU).
  * **lax.scan over block pairs** with stacked parameters: one compiled
    (no-shift, shift) body instead of `depth` unrolled blocks. Cuts compile
    time and lets XLA reuse one optimized layer program. Per-block
    stochastic-depth rates ride along as scanned inputs.
  * **fp32 parameters, bf16 compute** (configurable): matmuls run on the MXU
    in bf16; q/k normalization, logit scaling and softmax stay in fp32 for
    stability (replacing the reference's fp16 AMP + GradScaler, which TPU
    bf16 does not need).
  * Optional fused Pallas window-attention kernel (ops/window_attention.py)
    replacing the materialized [B*nW, heads, L, L] attention tensor round
    trip through HBM.

Numerics match the reference architecture: scaled cosine attention with
per-head clamped learnable logit scale (reference ``:184-187``), log-spaced
continuous relative position bias MLP when ``rel_pos`` (``:251-287``),
latitude-only shift mask so longitude wraps periodically while pole-crossing
rows are masked (``:403-424``), post-norm residual blocks with LayerNorm
scale initialized to zero so blocks start as identities (``:426-430,489-494``),
stochastic depth with a linspace rate schedule (``:737``), bias-free
unpatchify head (``:767,784-792``) and optional global input residual
(``:794-803``). Parameter initializers reproduce torch's Linear/Conv defaults
(uniform +-1/sqrt(fan_in)) so training dynamics are comparable.
"""

from __future__ import annotations

import math
import os as _os
from functools import lru_cache, partial
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# initializers reproducing torch defaults (the reference skips its custom
# init and uses torch layer defaults, networks/swinv2_global.py:772-775)
# ---------------------------------------------------------------------------


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default."""
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _dense(features: int, in_features: int, use_bias: bool = True, dtype=None, name=None):
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(in_features),
        dtype=dtype,
        name=name,
    )


# ---------------------------------------------------------------------------
# window partition / reverse (pure reshapes; reference :89-119)
# ---------------------------------------------------------------------------


def window_partition(x: jnp.ndarray, window_size: Tuple[int, int]) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, wh, ww, C] with h-major window ordering."""
    b, h, w, c = x.shape
    wh, ww = window_size
    x = x.reshape(b, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh, ww, c)


def window_reverse(windows: jnp.ndarray, window_size: Tuple[int, int], img_size: Tuple[int, int]) -> jnp.ndarray:
    """[B*nW, wh, ww, C] -> [B, H, W, C]."""
    h, w = img_size
    wh, ww = window_size
    c = windows.shape[-1]
    x = windows.reshape(-1, h // wh, w // ww, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


# ---------------------------------------------------------------------------
# static mask / relative-coordinate tables (host-side numpy, baked as consts)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def make_shift_mask(
    feat_size: Tuple[int, int], window_size: Tuple[int, int], shift_size: Tuple[int, int]
) -> np.ndarray:
    """Latitude-only attention mask for the shifted case (host-side numpy).

    Reference ``networks/swinv2_global.py:403-424``: the region counter only
    slices along H, so longitude (W) is never masked — after the cyclic roll,
    windows wrapping around in W attend freely (periodic longitude), while
    rows rolled across the pole boundary are masked with -100.

    Returns [nW, L, L] float32 additive mask (0 or -100). Computed in numpy
    at trace time and baked into the compiled program as a constant; cached
    so repeated traces reuse it. Do not mutate the returned array.
    """
    h, w = feat_size
    wh, ww = window_size
    sh, _ = shift_size
    img_mask = np.zeros((h, w), dtype=np.float32)
    cnt = 0
    for hs in (slice(0, h - wh), slice(h - sh, None)):
        img_mask[hs, :] = cnt
        cnt += 1
    mask_windows = (
        img_mask.reshape(h // wh, wh, w // ww, ww)
        .transpose(0, 2, 1, 3)
        .reshape(-1, wh * ww)
    )
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


def make_log_relative_coords(window_size: Tuple[int, int]) -> np.ndarray:
    """sign(d) * log(1 + |d|) pairwise relative coordinates, [L*L, 2].

    Reference ``networks/swinv2_global.py:251-261``.
    """
    wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [2, L, L]
    rel = rel.transpose(1, 2, 0).reshape(-1, 2).astype(np.float32)
    return np.sign(rel) * np.log1p(np.abs(rel))


@lru_cache(maxsize=16)
def make_log_relative_coords_unique(window_size: Tuple[int, int]):
    """Distinct-delta CPB table: ``(coords [D, 2], idx [L*L] int32)``.

    The [L*L, 2] pairwise table of :func:`make_log_relative_coords` contains
    only ``D = (2*wh-1) * (2*ww-1)`` distinct rows (595 for the 9x18 weather
    window vs 26,244 pairs), because the coordinate is a pure function of
    the delta. Running the CPB meta-MLP on the distinct rows and expanding
    with a static gather (``table[idx]`` == the full pairwise table, exact)
    removes ~98% of the meta-MLP compute, its hidden activations and its
    dropout RNG draws from every block — measured ~25 ms/step at flagship
    shape, almost entirely XLA small-op and RNG overhead, not FLOPs.
    """
    wh, ww = window_size
    dr = np.arange(-(wh - 1), wh)
    dc = np.arange(-(ww - 1), ww)
    # float32 BEFORE log1p: bitwise-identical to make_log_relative_coords
    deltas = (
        np.stack(np.meshgrid(dr, dc, indexing="ij"), axis=-1)
        .reshape(-1, 2)
        .astype(np.float32)
    )
    coords = np.sign(deltas) * np.log1p(np.abs(deltas))

    pos = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")).reshape(2, -1)
    rel = (pos[:, :, None] - pos[:, None, :]).transpose(1, 2, 0).reshape(-1, 2)
    idx = (rel[:, 0] + wh - 1) * (2 * ww - 1) + (rel[:, 1] + ww - 1)
    return coords, idx.astype(np.int32)


@lru_cache(maxsize=16)
def _cpb_expand_factored(window_size: Tuple[int, int]):
    """Kronecker factors of the delta expansion: ``(R [wh,wh,Dr], C [ww,ww,Dc])``.

    The [D, L*L] one-hot of :func:`_cpb_expand_onehot` is separable — the
    pair index only enters through ``(ri-rj, ci-cj)`` — so
    ``onehot = R ⊗ C`` with ``R[ri,rj,dr] = 1[ri-rj+wh-1 == dr]`` and
    ``C[ci,cj,dc] = 1[ci-cj+ww-1 == dc]``. The expansion becomes
    ``bias[h,(ri,ci),(rj,cj)] = Σ_{dr,dc} R·T·C`` — two SMALL matmul
    contractions (9 KB + 45 KB of constants at the 9x18 weather window)
    instead of one matmul against a 62 MB HBM-resident constant; exactly
    one (dr, dc) term is nonzero per output, so fp32 results stay bit-exact
    vs the gather. The r4 profile attributed ~1.8 ms/step of regrown
    loop-fusion traffic to the 62 MB constant reads (VERDICT r4 next #5).
    """
    wh, ww = window_size
    r = np.zeros((wh, wh, 2 * wh - 1), np.float32)
    ri, rj = np.meshgrid(np.arange(wh), np.arange(wh), indexing="ij")
    r[ri, rj, ri - rj + wh - 1] = 1.0
    c = np.zeros((ww, ww, 2 * ww - 1), np.float32)
    ci, cj = np.meshgrid(np.arange(ww), np.arange(ww), indexing="ij")
    c[ci, cj, ci - cj + ww - 1] = 1.0
    return r, c


@lru_cache(maxsize=16)
def _cpb_expand_onehot(window_size: Tuple[int, int]) -> np.ndarray:
    """Static 0/1 expansion matrix [D, L*L]: ``onehot[d, p] = (idx[p] == d)``.

    ``cpb.T [heads, D] @ onehot`` == the gathered-and-transposed full
    pairwise bias [heads, L*L], exactly (fp32 products with 0/1 are exact).
    ~62 MB fp32 at the 9x18 weather window — an HBM-resident constant the
    MXU streams once per block, replacing the gather+transpose fusion pair
    (forward) and the scatter-add (backward of ``jnp.take``).
    """
    _, idx = make_log_relative_coords_unique(window_size)
    d = (2 * window_size[0] - 1) * (2 * window_size[1] - 1)
    m = np.zeros((d, idx.shape[0]), np.float32)
    m[idx, np.arange(idx.shape[0])] = 1.0
    return m


def calc_window_shift(
    feat_size: Tuple[int, int], target_window: Tuple[int, int], target_shift: Tuple[int, int]
) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Clamp window/shift to the feature size (reference ``:398-401``)."""
    window = tuple(f if f <= w else w for f, w in zip(feat_size, target_window))
    shift = tuple(0 if f <= w else s for f, w, s in zip(feat_size, window, target_shift))
    return window, shift


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


# LayerNorm statistics form. 'twopass' (default) is the textbook centered
# form; 'onepass' computes var = E[x^2] - E[x]^2 so both reduces share one
# read pass over the (bf16) input and no fp32 centered intermediate is
# materialized between reduce fusions — an A/B lever for the ~69 ms/step of
# convert_reduce LN fusions (ROADMAP lever 1). fp32 accumulation keeps the
# cancellation error ~2^-24 * mean^2, negligible for O(1-10) activations.
LN_IMPL = _os.environ.get("SWIN_LN_IMPL", "twopass")

# CPB meta-MLP dedup (rel_pos configs): the `cpb_unique` CONFIG key (default
# true) selects evaluating the meta-MLP on the distinct relative deltas +
# static expand; false = the reference-shaped per-pair evaluation (exact
# per-pair dropout semantics). Train-time divergence note: the dedup draws
# hidden-layer dropout per distinct delta, not per pair — deterministic and
# eval are bitwise identical either way. The env var, IF EXPLICITLY SET,
# overrides the config for A/B archaeology (VERDICT r4 next #6).
_CPB_UNIQUE_ENV = _os.environ.get("SWIN_CPB_UNIQUE")
CPB_UNIQUE = (_CPB_UNIQUE_ENV or "1") != "0"
# How the [D, heads] unique CPB table expands to [heads, L, L]:
#   'factored' (default, r5) — two small matmul contractions against the
#          Kronecker factors of the one-hot (exact; see
#          :func:`_cpb_expand_factored`) — no 62 MB HBM constant.
#   'dot'  — one fp32 matmul against a static 0/1 [D, L*L] matrix,
#          exact (each output picks exactly one table value * 1.0). One MXU
#          op replaces the [L*L, heads] gather + the minor-dim transpose,
#          and the BACKWARD becomes a matmul instead of a scatter-add.
#   'take' — jnp.take + transpose (the r4s1 form, kept for A/B).
CPB_EXPAND = _os.environ.get("SWIN_CPB_EXPAND", "factored")
if CPB_EXPAND not in ("factored", "dot", "take"):
    raise ValueError(
        f"SWIN_CPB_EXPAND={CPB_EXPAND!r} invalid; expected 'factored', "
        "'dot' or 'take'"
    )
# Fusion wall around the assembled CPB bias (pallas_qkv path): the r4
# profile showed XLA re-associating the per-block bias chains into the big
# [180,360,768] loop fusions, growing them ~1.8 ms/step. An
# optimization_barrier pins the assembled badd as its own fusion root
# (both directions — the barrier's vjp is a barrier).
CPB_BARRIER = _os.environ.get("SWIN_CPB_BARRIER", "1") != "0"
if LN_IMPL not in ("twopass", "onepass"):
    raise ValueError(
        f"SWIN_LN_IMPL={LN_IMPL!r} invalid; expected 'twopass' or 'onepass'"
    )


class Fp32LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics regardless of compute dtype.

    Parameter names/shapes match ``nn.LayerNorm``. (A fused Pallas LN kernel
    was built and benchmarked in rounds 1-2 — including a matmul-with-ones
    MXU row reduction — and never beat this XLA form end-to-end at flagship
    size, 475.8 vs 469.9 ms/step, so it was cut per the win-or-cut rule.)
    """

    epsilon: float = 1e-5
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        if LN_IMPL == "onepass":
            meansq = jnp.mean(xf * xf, axis=-1, keepdims=True)
            var = jnp.maximum(meansq - mean * mean, 0.0)
            xc = xf - mean
        else:
            xc = xf - mean
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics); the rate may be
    a traced scalar (it rides along the block-pair scan)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, rate, deterministic: bool) -> jnp.ndarray:
        if deterministic:
            return x
        keep = 1.0 - rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x * mask / jnp.asarray(keep, x.dtype)


# Post-norm residual branch implementation. 'fused' routes
# x + drop_path(norm(y)) through the one-pass Pallas kernel pair in
# ops/ln_kernels.py (reads the branch tensor once per direction instead of
# XLA's separate stats reduce + apply/add passes, and drops the backward
# proj+roll recompute under remat_policy='mlp3'). 'xla' is the unfused
# Fp32LayerNorm + DropPath composition and the DEFAULT: measured on the
# flagship step the fused op runs at its bandwidth floor (~0.47 ms/call,
# convert_reduce 29.2 -> 7.6 ms/step) yet the END-TO-END step regresses
# 416.7 -> 424.2 ms — the residual cotangent that previously rode the
# matmul-epilogue fusions becomes standalone add_any passes (+7.2 ms) and
# the surrounding convolution fusions re-associate (+~26 ms), eating the
# win. Third LN lever measured and cut (after the standalone Pallas LN and
# the onepass stats form); kept selectable for A/B. Shapes the kernels
# cannot tile (C not lane-aligned) silently use 'xla'.
LNADD_IMPL = _os.environ.get("SWIN_LNADD_IMPL", "xla")
if LNADD_IMPL not in ("fused", "xla"):
    raise ValueError(
        f"SWIN_LNADD_IMPL={LNADD_IMPL!r} invalid; expected 'fused' or 'xla'"
    )


class LnParams(nn.Module):
    """Parameter-only stand-in for Fp32LayerNorm (same path/shapes/init) so
    the fused LN+drop-path+add kernel can consume the raw scale/bias;
    checkpoints stay interchangeable with the unfused path."""

    features: int
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self):
        scale = self.param("scale", self.scale_init, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class DropPathMask(nn.Module):
    """The rng-consuming half of DropPath: returns the per-sample multiplier
    mask/keep as a [B] vector. Named identically to the DropPath module it
    replaces so the dropout rng stream (folded over the module path) and the
    drawn mask match the unfused path exactly."""

    @nn.compact
    def __call__(self, batch: int, rate, deterministic: bool) -> jnp.ndarray:
        if deterministic:
            return jnp.ones((batch,), jnp.float32)
        keep = 1.0 - rate
        rng = self.make_rng("dropout")
        # same shape as DropPath's bernoulli draw -> same random bits
        mask = jax.random.bernoulli(rng, keep, (batch, 1, 1, 1))
        return (mask.astype(jnp.float32) / jnp.float32(keep)).reshape(batch)


# MLP fc1+GELU implementation. 'fused' routes fc1 + exact-erf GELU through
# the Pallas kernel pair in ops/mlp_kernels.py (single-output, MXU/VPU
# pipelined; XLA's fusion serializes the erf after the matmul — 88 vs 188
# TFLOP/s on the epilogue-free fc2). 'plain' is the unfused Dense + gelu.
# NOTE: under 'fused' the pre-activation never materializes, so the
# remat_policy='mlp_fc1' named save has nothing to save (that policy
# measured worse than 'mlp3' anyway and is kept for A/B only).
# 'fused2' fuses the WHOLE MLP (fc1+GELU+fc2) into one kernel pair — the
# [T, hidden] gelu slab never exists in HBM (ops/mlp_kernels.py fused_mlp);
# requires drop[0] == 0 (true for every reference config), else falls back
# to 'fused' for that module.
MLP_IMPL = _os.environ.get("SWIN_MLP_IMPL", "fused")
if MLP_IMPL not in ("fused", "fused2", "plain"):
    raise ValueError(
        f"SWIN_MLP_IMPL={MLP_IMPL!r} invalid; expected 'fused', 'fused2' or 'plain'"
    )

_GELU_EXACT = partial(jax.nn.gelu, approximate=False)


class DenseParams(nn.Module):
    """Parameter-only stand-in for a Dense layer (same path/shapes/init) so
    fused kernels can consume the raw weight matrices; checkpoints stay
    interchangeable with the unfused path."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_kernel_init, (self.in_features, self.features))
        bias = self.param("bias", torch_bias_init(self.in_features), (self.features,))
        return kernel, bias


class Mlp(nn.Module):
    """Dense -> GELU -> Dropout -> Dense -> Dropout (timm Mlp semantics)."""

    in_features: int
    hidden_features: int
    out_features: int
    drop: Tuple[float, float] = (0.0, 0.0)
    act: Callable = _GELU_EXACT
    dtype: Any = None
    impl: Optional[str] = None  # None -> module default (SWIN_MLP_IMPL)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from jax.ad_checkpoint import checkpoint_name

        impl = self.impl or MLP_IMPL
        if impl == "fused2" and self.act is _GELU_EXACT and self.drop[0] == 0.0:
            from swin_v2_weather_tpu.ops.mlp_kernels import fused_mlp

            k1, b1 = DenseParams(
                features=self.hidden_features, in_features=self.in_features,
                name="fc1",
            )()
            k2, b2 = DenseParams(
                features=self.out_features, in_features=self.hidden_features,
                name="fc2",
            )()
            x = fused_mlp(x.astype(self.dtype or x.dtype), k1, b1, k2, b2)
            return nn.Dropout(self.drop[1])(x, deterministic=deterministic)
        if impl in ("fused", "fused2") and self.act is _GELU_EXACT:
            from swin_v2_weather_tpu.ops.mlp_kernels import fused_fc1_gelu

            k, b = DenseParams(
                features=self.hidden_features, in_features=self.in_features,
                name="fc1",
            )()
            x = fused_fc1_gelu(x.astype(self.dtype or x.dtype), k, b)
        else:
            x = _dense(
                self.hidden_features, self.in_features, dtype=self.dtype, name="fc1"
            )(x)
            # saved only under remat_policy='mlp_fc1' (backward recomputes
            # just the gelu); other policies ignore the name
            x = checkpoint_name(x, "mlp_fc1")
            x = self.act(x)
        x = nn.Dropout(self.drop[0])(x, deterministic=deterministic)
        x = _dense(self.out_features, self.hidden_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop[1])(x, deterministic=deterministic)
        return x


class CpbMlp(nn.Module):
    """Continuous position bias meta-network: 2 -> 384 -> heads, ReLU.

    Reference ``networks/swinv2_global.py:240-246`` (dropout (0.125, 0) on
    the hidden layer).
    """

    num_heads: int
    hidden: int = 384
    dtype: Any = None

    @nn.compact
    def __call__(self, coords: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = _dense(self.hidden, 2, dtype=self.dtype, name="fc1")(coords)
        x = jax.nn.relu(x)
        x = nn.Dropout(0.125)(x, deterministic=deterministic)
        x = _dense(self.num_heads, self.hidden, dtype=self.dtype, name="fc2")(x)
        return x


class QkvParams(nn.Module):
    """Parameter-only stand-in for the qkv Dense (same path/shapes/init) so
    the fused qkv kernel can consume the raw weight matrices."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_kernel_init, (self.in_features, self.features))
        bias = self.param("bias", torch_bias_init(self.in_features), (self.features,))
        return kernel, bias


class WindowAttention(nn.Module):
    """Scaled cosine window attention, with optional CPB relative bias.

    Covers both reference attention variants (``WindowMultiHeadAttention``
    and ``...NoPos``, ``networks/swinv2_global.py:122-321``) behind the
    ``rel_pos`` flag. The attention mask (shift case) is a static [nW, L, L]
    constant. Softmax and q/k normalization run in fp32.
    """

    dim: int
    num_heads: int
    window_size: Tuple[int, int]
    rel_pos: bool = False
    drop_attn: float = 0.0
    drop_proj: float = 0.0
    dtype: Any = None
    attn_impl: str = "xla"  # 'xla' | 'pallas'
    window_grid: Optional[Tuple[int, int]] = None  # (rows, cols) of windows
    # CPB meta-MLP dedup: None -> module default (config key `cpb_unique`
    # threads through here; an explicitly-set SWIN_CPB_UNIQUE env wins)
    cpb_unique: Optional[bool] = None

    def _cpb_unique(self) -> bool:
        if self.cpb_unique is not None and _CPB_UNIQUE_ENV is None:
            return bool(self.cpb_unique)
        return CPB_UNIQUE

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [Bw, L, C] windowed, or [B, H, W, C] grid mode
        mask: Optional[np.ndarray] = None,  # [nW, L, L] static or None
        deterministic: bool = True,
        grid_input: bool = False,
        boundary_flag=None,  # runtime mask gate (spatial sharding)
    ) -> jnp.ndarray:
        c = x.shape[-1]
        hd = c // self.num_heads
        l = self.window_size[0] * self.window_size[1]

        # per-head learnable logit scale, init log(10), clamped at log(100)
        logit_scale = self.param(
            "logit_scale", lambda key, shape: jnp.full(shape, math.log(10.0)), (self.num_heads,)
        )
        scale = jnp.exp(jnp.clip(logit_scale, max=math.log(1.0 / 0.01)))

        bias = None
        if self.rel_pos:
            if self._cpb_unique():
                # evaluate the meta-MLP on the D distinct deltas only and
                # expand with a static gather — exact (every pair's row is
                # the same function of its delta), except that the hidden-
                # layer dropout draws one mask per distinct delta instead of
                # one per pair (the reference regularizes per pair; no
                # reference config enables rel_pos, and deterministic/eval
                # is bitwise-identical either way)
                coords_u, idx = make_log_relative_coords_unique(self.window_size)
                cpb = CpbMlp(self.num_heads, dtype=self.dtype, name="meta_mlp")(
                    jnp.asarray(coords_u), deterministic=deterministic
                )  # [D, heads]
                if CPB_EXPAND == "factored":
                    rmat, cmat = _cpb_expand_factored(self.window_size)
                    wh, ww = self.window_size
                    t3 = cpb.astype(jnp.float32).reshape(
                        2 * wh - 1, 2 * ww - 1, self.num_heads
                    )
                    # i=ri, j=rj, k=ci, m=cj; exactly one (dr, dc) term is
                    # nonzero per output element -> bit-exact vs the gather
                    bias = jnp.einsum(
                        "ijr,rch,kmc->hikjm",
                        jnp.asarray(rmat), t3, jnp.asarray(cmat),
                    ).reshape(self.num_heads, l, l)
                elif CPB_EXPAND == "dot":
                    bias = jax.lax.dot_general(
                        cpb.astype(jnp.float32).T,
                        jnp.asarray(_cpb_expand_onehot(self.window_size)),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                    ).reshape(self.num_heads, l, l)
                else:
                    cpb = jnp.take(cpb, jnp.asarray(idx), axis=0)  # [L*L, heads]
                    bias = cpb.transpose(1, 0).reshape(self.num_heads, l, l)
            else:
                rel_coords = jnp.asarray(make_log_relative_coords(self.window_size))
                cpb = CpbMlp(self.num_heads, dtype=self.dtype, name="meta_mlp")(
                    rel_coords, deterministic=deterministic
                )  # [L*L, heads]
                bias = cpb.transpose(1, 0).reshape(self.num_heads, l, l)
            # tiny (heads*L*L ~ 0.8 MB): always worth saving under remat so
            # the backward never re-runs the CPB graph (see _remat_policy).
            # The pallas_qkv path below saves the FOLDED term instead (same
            # name) so its backward skips the shift/fold chain too.
            from jax.ad_checkpoint import checkpoint_name

            if not (grid_input and self.attn_impl == "pallas_qkv"):
                bias = checkpoint_name(bias, "cpb_bias")

        if grid_input and self.attn_impl == "pallas_qkv":
            # v3/v6: the qkv projection itself runs inside the kernel (the
            # attention block is HBM-IO bound; this reads x once instead of
            # three pre-projected tensors). Params live at the same
            # attn/qkv/{kernel,bias} path as the Dense, so checkpoints are
            # interchangeable across attn_impl values. The CPB bias
            # (rel_pos) rides the v3 schedule with an exact in-kernel bias
            # add + VMEM-accumulated d(bias).
            from swin_v2_weather_tpu.ops import window_attention as wa

            w_b = QkvParams(features=3 * c, in_features=c, name="qkv")()
            pattern = mask[-1] if mask is not None else None
            from jax.ad_checkpoint import checkpoint_name

            if bias is not None:
                # fold shift + scale ONCE here (r4s2): the saved "cpb_bias"
                # is the kernel-ready badd_base, so the backward's remat
                # recompute reads it and only the per-window-lane repeat
                # remains outside the kernels (see wa.fold_cpb_bias)
                bias = wa.fold_cpb_bias(bias, scale)
                if CPB_BARRIER:
                    # wall the assembled badd off from XLA's fusion
                    # re-association (both directions; see CPB_BARRIER)
                    bias = jax.lax.optimization_barrier(bias)
                bias = checkpoint_name(bias, "cpb_bias")

            if wa.QKV_IMPL == "v6" and bias is None:
                # lane-aligned padded-head kernel: [B,H,W,heads*128] with
                # pad lanes exactly zero; the proj weight's rows are
                # zero-padded to absorb them (identical math, no unpad
                # relayout over the activation — see the v6 banner)
                out = wa.fused_window_attention_qkv_padded(
                    x, w_b[0].astype(self.dtype or x.dtype), w_b[1], scale,
                    self.window_size, mask_pattern=pattern,
                    boundary_flag=boundary_flag,
                )
                out = checkpoint_name(out, "attn_kernel_out")
                pk, pb = QkvParams(features=c, in_features=c, name="proj")()
                cdt = self.dtype or x.dtype
                out = (
                    jnp.dot(
                        out.astype(cdt),
                        wa.pad_proj_rows(pk, self.num_heads).astype(cdt),
                    )
                    + pb.astype(cdt)
                )
                out = nn.Dropout(self.drop_proj)(out, deterministic=deterministic)
                return out

            out = wa.fused_window_attention_qkv(
                x, w_b[0].astype(self.dtype or x.dtype), w_b[1], scale,
                self.window_size, mask_pattern=pattern,
                boundary_flag=boundary_flag, bias=bias,
                bias_prefolded=bias is not None,
            )
            # saving this under remat_policy='mlp' means backward never
            # re-runs the attention kernel (the proj vjp needs its input)
            out = checkpoint_name(out, "attn_kernel_out")
            out = _dense(c, c, dtype=self.dtype, name="proj")(out)
            out = nn.Dropout(self.drop_proj)(out, deterministic=deterministic)
            return out

        qkv = _dense(3 * c, c, dtype=self.dtype, name="qkv")(x)

        if grid_input:
            # grid-layout fused kernel: windowing happens inside the kernel
            # via BlockSpec indexing — no partition/head-split transposes
            from swin_v2_weather_tpu.ops.window_attention import (
                fused_window_attention_grid,
            )

            pattern = mask[-1] if mask is not None else None
            q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
            out = fused_window_attention_grid(
                q, k, v, scale, self.window_size, bias=bias, mask_pattern=pattern,
                boundary_flag=boundary_flag,
            )
        else:
            bw = x.shape[0]
            qkv = qkv.reshape(bw, l, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]

            if self.attn_impl in ("pallas", "pallas_v1") and not (
                self.drop_attn > 0.0 and not deterministic
            ):
                from swin_v2_weather_tpu.ops.window_attention import fused_window_attention

                # the [nW, L, L] mask collapses to one boundary-row pattern
                # (latitude-only masking; see ops/window_attention.py docstring)
                pattern = mask[-1] if mask is not None else None
                out = fused_window_attention(
                    q, k, v, scale, bias=bias, mask_pattern=pattern,
                    window_grid=self.window_grid,
                )
            else:
                # cosine similarity attention in fp32
                qf = q.astype(jnp.float32)
                kf = k.astype(jnp.float32)
                qf = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-12)
                kf = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True), 1e-12)
                attn = jnp.einsum("bhld,bhmd->bhlm", qf, kf)
                attn = attn * scale[None, :, None, None]
                if bias is not None:
                    attn = attn + bias[None].astype(attn.dtype)
                if mask is not None:
                    nw = mask.shape[0]
                    attn = attn.reshape(bw // nw, nw, self.num_heads, l, l)
                    attn = attn + jnp.asarray(mask)[None, :, None, :, :]
                    attn = attn.reshape(bw, self.num_heads, l, l)
                attn = jax.nn.softmax(attn, axis=-1)
                attn = nn.Dropout(self.drop_attn)(attn, deterministic=deterministic)
                out = jnp.einsum(
                    "bhlm,bhmd->bhld", attn.astype(v.dtype), v
                )
            out = out.transpose(0, 2, 1, 3).reshape(bw, l, c)

        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(out, "attn_kernel_out")
        out = _dense(c, c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.drop_proj)(out, deterministic=deterministic)
        return out


class SwinBlock(nn.Module):
    """One SwinV2-CR block: post-norm attention + MLP residual branches.

    Reference ``networks/swinv2_global.py:324-497``. ``shifted`` selects the
    cyclic-roll + masked-attention path; LayerNorm scales start at
    ``init_values`` (0 in all weather configs) so the block begins as an
    identity map.
    """

    dim: int
    num_heads: int
    feat_size: Tuple[int, int]
    window_size: Tuple[int, int]
    shift_size: Tuple[int, int]
    shifted: bool
    mlp_ratio: float = 4.0
    init_values: Optional[float] = 0.0
    proj_drop: float = 0.0
    drop_attn: float = 0.0
    rel_pos: bool = False
    dtype: Any = None
    attn_impl: str = "xla"
    mlp_impl: Optional[str] = None
    lnadd_impl: Optional[str] = None  # None -> module default (SWIN_LNADD_IMPL)
    cpb_unique: Optional[bool] = None
    deterministic: bool = True
    # spatial sharding: feat_size is LOCAL rows; runs inside shard_map with
    # H split over `spatial_axis` (see parallel/spatial.py)
    spatial_shards: int = 1
    spatial_axis: str = "model"

    def _scale_init(self):
        return (
            nn.initializers.constant(self.init_values)
            if self.init_values is not None
            else nn.initializers.ones
        )

    def _norm(self, name: str):
        return Fp32LayerNorm(epsilon=1e-5, scale_init=self._scale_init(), name=name)

    def _ln_branch(self, norm_name, dp_name, y, x, rate, deterministic):
        """x + drop_path(norm(y)) — the post-norm residual branch
        (reference ``networks/swinv2_global.py:489-494``), fused into the
        one-pass Pallas op when the shape tiles (ops/ln_kernels.py)."""
        import math

        from swin_v2_weather_tpu.ops import ln_kernels

        c = y.shape[-1]
        if (self.lnadd_impl or LNADD_IMPL) == "fused" and ln_kernels.supported(
            math.prod(y.shape[:-1]), c
        ):
            scale, bias = LnParams(c, self._scale_init(), name=norm_name)()
            m = DropPathMask(name=dp_name)(y.shape[0], rate, deterministic)
            return ln_kernels.fused_ln_droppath_add(y, x, scale, bias, m)
        y = self._norm(norm_name)(y).astype(x.dtype)
        return x + DropPath(name=dp_name)(y, rate, deterministic)

    @nn.compact
    def __call__(self, x: jnp.ndarray, drop_path_rate) -> jnp.ndarray:
        deterministic = self.deterministic
        b, h, w, c = x.shape
        window, shift = calc_window_shift(self.feat_size, self.window_size, self.shift_size)
        do_shift = self.shifted and any(shift)

        # ---- attention branch (op -> norm -> drop-path -> residual add) ----
        # grid mode (default on TPU): the fused kernel windows via BlockSpec
        # indexing, so only the cyclic roll touches HBM layout; the roll
        # commutes with the linear qkv projection (roll(qkv(x)) == qkv(roll(x)))
        use_grid = self.attn_impl in ("pallas", "pallas_qkv") and not (
            self.drop_attn > 0.0 and not deterministic
        )
        spatial = self.spatial_shards > 1
        if spatial and self.attn_impl not in ("xla", "pallas", "pallas_qkv"):
            raise NotImplementedError(
                "spatial sharding supports attn_impl 'xla', 'pallas' and "
                "'pallas_qkv' (v1 windowed kernel has no boundary gate)"
            )
        mask = make_shift_mask(self.feat_size, window, shift) if do_shift else None
        boundary_flag = None
        if spatial and mask is not None:
            # only the shard owning the LAST global window row masks the
            # pole-crossing rows; interior shards' wrapped-in halo rows are
            # true latitude neighbours (reference lat-only mask semantics,
            # networks/swinv2_global.py:403-424)
            is_last = jax.lax.axis_index(self.spatial_axis) == self.spatial_shards - 1
            if use_grid:
                # pallas kernels keep the STATIC mask pattern and gate it
                # with a runtime scalar instead
                boundary_flag = is_last.astype(jnp.float32)
            else:
                mask = jnp.where(is_last, jnp.asarray(mask), 0.0)
        attn = WindowAttention(
            dim=c,
            num_heads=self.num_heads,
            window_size=window,
            rel_pos=self.rel_pos,
            drop_attn=self.drop_attn,
            drop_proj=self.proj_drop,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            window_grid=(self.feat_size[0] // window[0], self.feat_size[1] // window[1]),
            cpb_unique=self.cpb_unique,
            name="attn",
        )
        y = x
        if do_shift:
            if spatial:
                from swin_v2_weather_tpu.parallel.spatial import roll_h_sharded

                y = roll_h_sharded(y, -shift[0], self.spatial_axis)
                y = jnp.roll(y, -shift[1], axis=2)
            else:
                y = jnp.roll(y, shift=(-shift[0], -shift[1]), axis=(1, 2))
        if use_grid:
            y = attn(y, mask=mask, deterministic=deterministic, grid_input=True,
                     boundary_flag=boundary_flag)
        else:
            y = window_partition(y, window).reshape(-1, window[0] * window[1], c)
            y = attn(y, mask=mask, deterministic=deterministic)
            y = window_reverse(y.reshape(-1, window[0], window[1], c), window, self.feat_size)
        if do_shift:
            if spatial:
                from swin_v2_weather_tpu.parallel.spatial import roll_h_sharded

                y = roll_h_sharded(y, shift[0], self.spatial_axis)
                y = jnp.roll(y, shift[1], axis=2)
            else:
                y = jnp.roll(y, shift=(shift[0], shift[1]), axis=(1, 2))
        # named checkpoint: with remat_policy='attn' the backward pass keeps
        # this tensor instead of re-running the attention branch
        from jax.ad_checkpoint import checkpoint_name
        y = checkpoint_name(y, "attn_out")
        x = self._ln_branch("norm1", "drop_path1", y, x, drop_path_rate, deterministic)
        x = checkpoint_name(x, "block_mid")

        # ---- MLP branch ----
        y = Mlp(
            in_features=c,
            hidden_features=int(c * self.mlp_ratio),
            out_features=c,
            drop=(self.proj_drop, self.proj_drop),
            dtype=self.dtype,
            impl=self.mlp_impl,
            name="mlp",
        )(x, deterministic=deterministic)
        y = checkpoint_name(y, "mlp_out")
        x = self._ln_branch("norm2", "drop_path2", y, x, drop_path_rate, deterministic)
        return x


class BlockPair(nn.Module):
    """(no-shift, shift) block pair — the scan unit.

    Alternating blocks use shift = window // 2 (reference ``:612``); scanning
    over pairs keeps the shift pattern static inside one compiled body while
    parameters are stacked along the scan axis.
    """

    dim: int
    num_heads: int
    feat_size: Tuple[int, int]
    window_size: Tuple[int, int]
    mlp_ratio: float
    init_values: Optional[float]
    proj_drop: float
    drop_attn: float
    rel_pos: bool
    dtype: Any
    attn_impl: str
    deterministic: bool
    mlp_impl: Optional[str] = None
    lnadd_impl: Optional[str] = None
    cpb_unique: Optional[bool] = None
    spatial_shards: int = 1
    spatial_axis: str = "model"

    @nn.compact
    def __call__(self, x: jnp.ndarray, dpr_pair: jnp.ndarray):
        shift = tuple(ws // 2 for ws in self.window_size)
        common = dict(
            dim=self.dim,
            num_heads=self.num_heads,
            feat_size=self.feat_size,
            window_size=self.window_size,
            shift_size=shift,
            mlp_ratio=self.mlp_ratio,
            init_values=self.init_values,
            proj_drop=self.proj_drop,
            drop_attn=self.drop_attn,
            rel_pos=self.rel_pos,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            mlp_impl=self.mlp_impl,
            lnadd_impl=self.lnadd_impl,
            cpb_unique=self.cpb_unique,
            deterministic=self.deterministic,
            spatial_shards=self.spatial_shards,
            spatial_axis=self.spatial_axis,
        )
        x = SwinBlock(**common, shifted=False, name="block0")(x, dpr_pair[0])
        x = SwinBlock(**common, shifted=True, name="block1")(x, dpr_pair[1])
        return x, None


class PatchMerging(nn.Module):
    """2x2 space-to-depth + LayerNorm + Dense 4C->2C (reference ``:500-523``).

    Not active in the weather configs (single-stage model) but part of the
    reference API surface.
    """

    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 4, 2, 5)
        x = x.reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(x.dtype)
        x = _dense(2 * c, 4 * c, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return x


class PatchEmbed(nn.Module):
    """Patchify as space-to-depth + Dense (== stride-k conv on the MXU).

    Reference ``networks/swinv2_global.py:526-546`` (Conv2d k=stride=patch
    then LayerNorm). The dense kernel is initialized with the conv fan-in
    (in_chans * patch^2), matching torch Conv2d defaults.
    """

    patch_size: int
    in_chans: int
    embed_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, H, W, C]
        b, h, w, c = x.shape
        p = self.patch_size
        x = x.reshape(b, h // p, p, w // p, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h // p, w // p, p * p * c)
        x = _dense(self.embed_dim, p * p * c, dtype=self.dtype, name="proj")(x)
        x = Fp32LayerNorm(epsilon=1e-5, name="norm")(x)
        return x


class SwinTransformerV2(nn.Module):
    """The full single-stage SwinV2-CR weather model.

    Reference ``networks/swinv2_global.py:657-803`` with the weather-config
    specialization baked in: one stage (``depths=(depth,)``), no downscaling,
    constant resolution and embedding dimension.

    Input/output are NCHW at the public boundary for reference parity
    ([B, in_chans, H, W] -> [B, out_chans, H, W]); all internal compute is
    NHWC.
    """

    img_size: Tuple[int, int] = (720, 1440)
    patch_size: int = 4
    in_chans: int = 73
    out_chans: int = 73
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 8
    window_size: Optional[Tuple[int, int]] = None
    img_window_ratio: int = 80
    mlp_ratio: float = 4.0
    init_values: Optional[float] = 0.0
    drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    full_pos_embed: bool = False
    rel_pos: bool = True
    residual: bool = False
    checkpoint_stages: bool = False  # remat each block pair
    remat_policy: str = "full"  # 'full' | 'attn' (keep attention outputs)
    scan_blocks: bool = True
    dtype: Any = jnp.bfloat16  # compute dtype; params are fp32
    attn_impl: str = "xla"
    # MLP fc1+gelu implementation: None -> module default (SWIN_MLP_IMPL).
    # Multi-step rollout training sets 'plain': the fused op's custom_vjp
    # residuals bypass remat's save-dedup, and the duplicated per-step MLP
    # inputs push the 2-step flagship past a v5e's 16 GB HBM.
    mlp_impl: Optional[str] = None
    # post-norm residual branch: None -> module default (SWIN_LNADD_IMPL).
    # Same multi-step memory caveat as mlp_impl: the fused op saves its LN
    # input as a custom_vjp residual that remat cannot discard, so
    # get_model gates it to 'xla' when n_future > 0.
    lnadd_impl: Optional[str] = None
    # CPB meta-MLP dedup (config key `cpb_unique`, default true): None ->
    # module default; see WindowAttention.cpb_unique for the divergence note
    cpb_unique: Optional[bool] = None
    # spatial sharding over the mesh's `model` axis: when > 1, __call__ runs
    # inside shard_map on a LOCAL H slice [B, C, H/shards, W]; shifted-block
    # rolls halo-exchange over ICI (parallel/spatial.py) and the pole mask
    # applies only on the last shard. Parameters stay replicated; pos_embed
    # keeps its global shape and each shard slices its rows.
    spatial_shards: int = 1
    spatial_axis: str = "model"

    def _window(self) -> Tuple[int, int]:
        if self.window_size is not None:
            return tuple(self.window_size)
        return tuple(s // self.img_window_ratio for s in self.img_size)

    def with_input_size(self, img_size: Tuple[int, int], window_ratio: Optional[int] = None):
        """Clone configured for a new resolution (reference
        ``update_input_size``, ``networks/swinv2_global.py:805-832``).

        Masks and window geometry are derived at trace time here, so a new
        resolution only needs a re-jit — no buffer surgery. Parameters carry
        over unchanged except ``pos_embed`` when ``full_pos_embed`` is set
        (it is resolution-shaped, as in the reference)."""
        return self.clone(
            img_size=tuple(img_size),
            img_window_ratio=int(window_ratio or self.img_window_ratio),
        )

    def _remat_policy(self):
        """Named-checkpoint policy for activation_ckpt (None = recompute all).

        With the fused MLP (SWIN_MLP_IMPL=fused) the 'block_mid' named save
        is DROPPED from the mlp/mlp_fc1/mlp3 policies: the fused op's
        custom_vjp residual already carries that exact tensor (remat cannot
        discard custom_vjp residuals), and block_mid's only backward
        consumer is the MLP vjp — keeping both double-saves ~100 MB/block
        (measured: depth-24 18.9 GB vs 15.75 capacity; with the drop the
        footprint returns to the unfused layout).
        """
        # fused2's residual set includes the same MLP-input tensor, so the
        # block_mid drop applies to both fused generations
        fused_mlp = (self.mlp_impl or MLP_IMPL) in ("fused", "fused2")
        # with the fused LN+drop-path+add branch, the LN inputs (attn_out =
        # z of norm1, mlp_out = z of norm2) are custom_vjp residuals that
        # remat cannot discard — the named saves would double-store them
        fused_ln = (
            (self.lnadd_impl or LNADD_IMPL) == "fused" and self.embed_dim % 128 == 0
        )

        def names(*ns):
            drop = {"block_mid"} if fused_mlp else set()
            if fused_ln:
                drop |= {"attn_out", "mlp_out"}
            keep = [n for n in ns if n not in drop]
            if self.rel_pos:
                # ~0.8 MB/block: saving it means backward never re-runs the
                # CPB meta-MLP graph (harmless no-op for rel_pos=false)
                keep.append("cpb_bias")
            return jax.checkpoint_policies.save_only_these_names(*keep)

        if self.remat_policy == "attn":
            # trade ~100 MB/block of HBM for skipping the attention
            # branch's forward recompute during backward
            return names("attn_out")
        if self.remat_policy == "mlp":
            # min-recompute policy: save exactly the four ~100 MB
            # tensors per block whose absence forces expensive
            # recompute (attention-kernel output = proj input, norm1
            # input, post-attention residual = fc1 input, fc2 output
            # = norm2 input). Backward then re-runs only fc1 + gelu
            # (~3.7 of the 11.7 TFLOP full-forward recompute) and
            # cheap elementwise ops, at ~0.4 GB/block of HBM — the
            # wide mlp hidden tensors are never stored. (An exclude-
            # list policy was tried first and OOMed at 33 GB: "save
            # anything except" also keeps every fp32 upcast and roll
            # copy.)
            return names("attn_kernel_out", "attn_out", "block_mid", "mlp_out")
        if self.remat_policy == "mlp_fc1":
            # like 'mlp' but also saves the 400 MB/block fc1 output:
            # backward recomputes only the gelu. Measured 513 vs 503.7 ms
            # pre-kernel-rewrite: the extra save traffic cancels the
            # recompute win.
            return names(
                "attn_kernel_out", "attn_out", "block_mid", "mlp_out", "mlp_fc1"
            )
        if self.remat_policy == "mlp3":
            # 'mlp' minus the attn_out save: backward recomputes the
            # proj matmul + roll-back from the saved kernel output.
            # -1.2 GB of save traffic per step for +0.9 TFLOP.
            return names("attn_kernel_out", "block_mid", "mlp_out")
        return None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b = x.shape[0]
        h, w = self.img_size
        p = self.patch_size
        gh, gw = h // p, w // p
        window = self._window()
        deterministic = not train
        n_sp = int(self.spatial_shards)
        if gh % n_sp:
            raise ValueError(f"patch rows {gh} not divisible by spatial_shards {n_sp}")
        if n_sp > 1 and train and (self.proj_drop_rate > 0 or self.attn_drop_rate > 0):
            # per-shard rngs are shared so DropPath masks stay per-sample
            # consistent across latitude bands (correct); elementwise dropout
            # would silently draw CORRELATED masks across bands instead —
            # refuse rather than bias training. (All reference configs train
            # these rates at 0; drop_path is fully supported under SP.)
            raise NotImplementedError(
                "elementwise dropout (proj/attn) under spatial sharding would "
                "correlate masks across latitude shards; train with these "
                "rates at 0 or without spatial_shards"
            )
        gh_local = gh // n_sp  # == gh when unsharded
        if n_sp > 1 and gh_local % window[0]:
            raise ValueError(
                f"local patch rows {gh_local} must be a whole number of window "
                f"rows ({window[0]}) for spatial sharding"
            )

        skip = x
        x = x.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        x = x.astype(self.dtype)

        x = PatchEmbed(
            patch_size=p, in_chans=self.in_chans, embed_dim=self.embed_dim,
            dtype=self.dtype, name="patch_embed",
        )(x)

        if self.full_pos_embed:
            # reference stores [1, C, gh, gw] * 0.02 randn (:769-770); ours is
            # [1, gh, gw, C] for the NHWC layout. Global shape even under
            # spatial sharding (params replicated); each shard slices its rows
            pos = self.param(
                "pos_embed",
                lambda key, shape: 0.02 * jax.random.normal(key, shape, jnp.float32),
                (1, gh, gw, self.embed_dim),
            )
            if n_sp > 1:
                row0 = jax.lax.axis_index(self.spatial_axis) * gh_local
                pos = jax.lax.dynamic_slice_in_dim(pos, row0, gh_local, axis=1)
            x = x + pos.astype(x.dtype)

        # stochastic depth linspace over blocks (reference :737)
        dpr = np.linspace(0.0, self.drop_path_rate, self.depth, dtype=np.float32)

        pair_kwargs = dict(
            dim=self.embed_dim,
            num_heads=self.num_heads,
            feat_size=(gh_local, gw),
            window_size=window,
            mlp_ratio=self.mlp_ratio,
            init_values=self.init_values,
            proj_drop=self.proj_drop_rate,
            drop_attn=self.attn_drop_rate,
            rel_pos=self.rel_pos,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            mlp_impl=self.mlp_impl,
            lnadd_impl=self.lnadd_impl,
            cpb_unique=self.cpb_unique,
            deterministic=deterministic,
            spatial_shards=n_sp,
            spatial_axis=self.spatial_axis,
        )

        if self.scan_blocks and self.depth % 2 == 0 and self.depth >= 2:
            n_pairs = self.depth // 2
            body = BlockPair
            if self.checkpoint_stages:
                body = nn.remat(body, prevent_cse=False, policy=self._remat_policy())
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=n_pairs,
                in_axes=0,
            )
            dpr_pairs = jnp.asarray(dpr.reshape(n_pairs, 2))
            x, _ = scanned(**pair_kwargs, name="pairs")(x, dpr_pairs)
        else:
            # unrolled fallback (odd depths, debugging, param surgery)
            shift = tuple(ws // 2 for ws in window)
            block_cls = (
                nn.remat(SwinBlock, prevent_cse=False, policy=self._remat_policy())
                if self.checkpoint_stages
                else SwinBlock
            )
            for i in range(self.depth):
                x = block_cls(
                    dim=self.embed_dim,
                    num_heads=self.num_heads,
                    feat_size=(gh_local, gw),
                    window_size=window,
                    shift_size=shift,
                    shifted=(i % 2 == 1),
                    mlp_ratio=self.mlp_ratio,
                    init_values=self.init_values,
                    proj_drop=self.proj_drop_rate,
                    drop_attn=self.attn_drop_rate,
                    rel_pos=self.rel_pos,
                    dtype=self.dtype,
                    attn_impl=self.attn_impl,
                    mlp_impl=self.mlp_impl,
                    lnadd_impl=self.lnadd_impl,
                    cpb_unique=self.cpb_unique,
                    deterministic=deterministic,
                    spatial_shards=n_sp,
                    spatial_axis=self.spatial_axis,
                    name=f"block{i}",
                )(x, jnp.float32(dpr[i]))

        # bias-free head + unpatchify (reference :767,784-792)
        x = _dense(
            self.out_chans * p * p, self.embed_dim, use_bias=False, dtype=self.dtype, name="head"
        )(x)
        x = x.reshape(b, gh_local, gw, p, p, self.out_chans)
        # nhwpqc -> nchpwq: interleave patch pixels back into the full grid
        x = x.transpose(0, 5, 1, 3, 2, 4).reshape(b, self.out_chans, h // n_sp, w)
        x = x.astype(jnp.float32)

        if self.residual:
            x = x + skip[:, : self.out_chans, :, :].astype(jnp.float32)
        return x


def convert_block_layout(params_tree: dict, to_scan: bool) -> dict:
    """Convert model params between the scanned and unrolled block layouts.

    ``scan_blocks=True`` stores blocks as ``pairs/{block0,block1}`` with a
    stacked ``[n_pairs, ...]`` leading axis; ``False`` stores flat
    ``block{i}`` entries. Checkpoints written under one layout restore into
    the other through this pure tree transform (used by
    ``training/checkpoint.py``). Non-block entries pass through untouched;
    trees already in the target layout are returned as-is.
    """
    import re

    tree = dict(params_tree)
    has_pairs = "pairs" in tree
    block_keys = sorted(
        (k for k in tree if re.fullmatch(r"block\d+", k)),
        key=lambda k: int(k[5:]),
    )
    if to_scan:
        if has_pairs or not block_keys:
            return tree
        n = len(block_keys)
        if n % 2:
            raise ValueError(f"cannot pair {n} unrolled blocks for the scan layout")
        evens = [tree.pop(f"block{i}") for i in range(0, n, 2)]
        odds = [tree.pop(f"block{i}") for i in range(1, n, 2)]
        stack = lambda blocks: jax.tree_util.tree_map(  # noqa: E731
            lambda *ls: jnp.stack(ls), *blocks
        )
        tree["pairs"] = {"block0": stack(evens), "block1": stack(odds)}
        return tree
    if not has_pairs:
        return tree
    pairs = tree.pop("pairs")
    n_pairs = jax.tree_util.tree_leaves(pairs["block0"])[0].shape[0]
    for i in range(n_pairs):
        take = lambda t: jax.tree_util.tree_map(lambda a: a[i], t)  # noqa: E731,B023
        tree[f"block{2 * i}"] = take(pairs["block0"])
        tree[f"block{2 * i + 1}"] = take(pairs["block1"])
    return tree


def build_swin_from_params(params, dtype=None) -> SwinTransformerV2:
    """Construct the model from a YParams-style config.

    Mirrors the reference factory ``swinv2net`` (``networks/swinv2_global.py:57-74``).
    """
    if dtype is None:
        name = str(getattr(params, "compute_dtype", "bfloat16"))
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]
    return SwinTransformerV2(
        img_size=tuple(params.img_size),
        patch_size=int(params.patch_size),
        in_chans=int(params.n_in_channels),
        out_chans=int(params.n_out_channels),
        embed_dim=int(params.embed_dim),
        depth=int(params.depth),
        num_heads=int(params.num_heads),
        img_window_ratio=int(params.window_ratio),
        mlp_ratio=float(params.mlp_ratio),
        drop_path_rate=float(params.drop_path_rate),
        full_pos_embed=bool(params.full_pos_embed),
        rel_pos=bool(params.rel_pos),
        residual=bool(params.residual),
        checkpoint_stages=bool(getattr(params, "activation_ckpt", False)),
        remat_policy=str(getattr(params, "remat_policy", None) or "full"),
        scan_blocks=bool(getattr(params, "scan_blocks", True)),
        dtype=dtype,
        attn_impl=str(getattr(params, "attn_impl", "xla")),
        # MLP kernel selection by config family (all chip-measured, r3/r4):
        #  * single-step depth<=12: 'fused' (fc1+GELU kernel pair, 416.9 ms
        #    vs 420.0 fused2 vs 430.7 plain) — fastest, and its extra
        #    [tokens, hidden] primal slab fits at single step.
        #  * multi-step or depth>12: 'fused2' (whole-MLP kernel pair) — the
        #    gelu slab never exists in HBM, so the custom_vjp liveness that
        #    OOM'd the fc1-fused path on rollouts (20.4 GB at 2-step) is
        #    gone: 2-step measures 879.8 ms/15.08 GB vs 898.9 ms plain.
        # A config key `mlp_impl` overrides either way.
        mlp_impl=(
            str(params["mlp_impl"]) if "mlp_impl" in params
            else (
                "fused2"
                if int(getattr(params, "n_future", 0) or 0) > 0
                or int(params.depth) > 12
                else None
            )
        ),
        # same gating for the fused LN+drop-path+add branch: its custom_vjp
        # residuals (the two LN inputs per block) likewise bypass remat's
        # save-dedup, so multi-step rollouts and deep stacks stay unfused
        # unless the config says otherwise.
        lnadd_impl=(
            str(params["lnadd_impl"]) if "lnadd_impl" in params
            else (
                "xla"
                if int(getattr(params, "n_future", 0) or 0) > 0
                or int(params.depth) > 12
                else None
            )
        ),
        # `cpb_unique` is a documented config key (divergence note at the
        # module-level CPB_UNIQUE constant); an explicitly-set
        # SWIN_CPB_UNIQUE env var still overrides for A/B archaeology
        cpb_unique=(
            bool(params["cpb_unique"]) if "cpb_unique" in params else None
        ),
        spatial_shards=int(getattr(params, "spatial_shards", 1) or 1),
    )
