"""On-TPU numerical parity check for the Pallas window-attention kernels.

The pytest suite exercises the kernels in interpret mode on the CPU mesh;
this script runs the REAL Mosaic-compiled kernels on the attached chip and
compares forward + gradients against the pure-XLA reference at flagship
shape. Run: python scripts/tpu_kernel_check.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from swin_v2_weather_tpu.models.swin import make_shift_mask
    from swin_v2_weather_tpu.ops.window_attention import (
        fused_window_attention_grid,
        fused_window_attention_qkv,
        reference_attention_grid,
    )

    assert jax.devices()[0].platform == "tpu", "needs the real chip"
    H, W, C, heads, C_in = 180, 360, 768, 8, 768
    wh, ww = 9, 18
    rng = np.random.default_rng(0)
    patt = make_shift_mask((H, W), (wh, ww), (wh // 2, ww // 2))[-1]

    # ---- v3 (qkv-fused) vs reference ----
    x = jnp.asarray(rng.standard_normal((1, H, W, C_in)) * 0.5, jnp.bfloat16)
    w_qkv = jnp.asarray(rng.standard_normal((C_in, 3 * C)) * 0.02, jnp.bfloat16)
    b_qkv = jnp.asarray(rng.standard_normal(3 * C) * 0.01, jnp.float32)
    scale = jnp.asarray(np.exp(rng.standard_normal(heads) * 0.1 + 1.0), jnp.float32)

    def ref_v3(x, w_qkv, b_qkv, scale):
        qkv = (
            jnp.einsum(
                "bhwc,cd->bhwd", x.astype(jnp.float32), w_qkv.astype(jnp.float32)
            )
            + b_qkv
        ).astype(x.dtype)
        q, k, v = qkv[..., :C], qkv[..., C : 2 * C], qkv[..., 2 * C :]
        return reference_attention_grid(q, k, v, scale, None, patt, (wh, ww))

    def loss_fused(x, w, b, s):
        return jnp.sum(
            fused_window_attention_qkv(x, w, b, s, (wh, ww), mask_pattern=patt)
            .astype(jnp.float32) ** 2
        )

    def loss_ref(x, w, b, s):
        return jnp.sum(ref_v3(x, w, b, s).astype(jnp.float32) ** 2)

    out_f = jax.jit(
        lambda *a: fused_window_attention_qkv(*a, (wh, ww), mask_pattern=patt)
    )(x, w_qkv, b_qkv, scale)
    out_r = jax.jit(ref_v3)(x, w_qkv, b_qkv, scale)
    fwd_err = float(
        jnp.max(jnp.abs(out_f.astype(jnp.float32) - out_r.astype(jnp.float32)))
    )
    ref_scale = float(jnp.max(jnp.abs(out_r.astype(jnp.float32))))

    g_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(x, w_qkv, b_qkv, scale)
    g_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))(x, w_qkv, b_qkv, scale)
    grad_errs = {}
    for name, a, b in zip(("dx", "dw", "db", "dscale"), g_f, g_r):
        af, bf = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(1e-3, float(np.abs(bf).max()))
        grad_errs[name] = float(np.abs(af - bf).max()) / denom

    print(f"v3 fwd: max_abs_err={fwd_err:.4f} (ref max {ref_scale:.2f})")
    print("v3 grads (rel to max):", {k: round(v, 4) for k, v in grad_errs.items()})
    ok = fwd_err < 0.05 * ref_scale and all(v < 0.05 for v in grad_errs.values())

    # ---- v2 (grid, with CPB bias) vs reference ----
    l = wh * ww
    qkv = jnp.asarray(rng.standard_normal((3, 1, H, W, C)) * 0.5, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((heads, l, l)) * 0.1, jnp.float32)

    def loss_v2(q, k, v, s, b):
        return jnp.sum(
            fused_window_attention_grid(
                q, k, v, s, (wh, ww), bias=b, mask_pattern=patt
            ).astype(jnp.float32) ** 2
        )

    def loss_v2_ref(q, k, v, s, b):
        return jnp.sum(
            reference_attention_grid(q, k, v, s, b, patt, (wh, ww))
            .astype(jnp.float32) ** 2
        )

    g2_f = jax.jit(jax.grad(loss_v2, argnums=(0, 1, 2, 3, 4)))(*qkv, scale, bias)
    g2_r = jax.jit(jax.grad(loss_v2_ref, argnums=(0, 1, 2, 3, 4)))(*qkv, scale, bias)
    v2_errs = {}
    for name, a, b in zip(("dq", "dk", "dv", "dscale", "dbias"), g2_f, g2_r):
        af, bf = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(1e-3, float(np.abs(bf).max()))
        v2_errs[name] = float(np.abs(af - bf).max()) / denom
    print("v2+bias grads (rel to max):", {k: round(v, 4) for k, v in v2_errs.items()})
    ok = ok and all(v < 0.05 for v in v2_errs.values())

    # ---- v3 (qkv-fused) WITH CPB bias vs reference ----
    def ref_v3b(x, w, b, s, bi):
        qkv = (
            jnp.einsum("bhwc,cd->bhwd", x.astype(jnp.float32), w.astype(jnp.float32))
            + b
        ).astype(x.dtype)
        q, k, v = qkv[..., :C], qkv[..., C : 2 * C], qkv[..., 2 * C :]
        return reference_attention_grid(q, k, v, s, bi, patt, (wh, ww))

    def loss_v3b(x, w, b, s, bi):
        return jnp.sum(
            fused_window_attention_qkv(
                x, w, b, s, (wh, ww), mask_pattern=patt, bias=bi
            ).astype(jnp.float32) ** 2
        )

    def loss_v3b_ref(x, w, b, s, bi):
        return jnp.sum(ref_v3b(x, w, b, s, bi).astype(jnp.float32) ** 2)

    out3b = jax.jit(
        lambda *a: fused_window_attention_qkv(
            a[0], a[1], a[2], a[3], (wh, ww), mask_pattern=patt, bias=a[4]
        )
    )(x, w_qkv, b_qkv, scale, bias)
    ref3b = jax.jit(ref_v3b)(x, w_qkv, b_qkv, scale, bias)
    fwd3b_err = float(
        jnp.max(jnp.abs(out3b.astype(jnp.float32) - ref3b.astype(jnp.float32)))
    )
    ref3b_scale = float(jnp.max(jnp.abs(ref3b.astype(jnp.float32))))
    g3b_f = jax.jit(jax.grad(loss_v3b, argnums=(0, 1, 2, 3, 4)))(
        x, w_qkv, b_qkv, scale, bias
    )
    g3b_r = jax.jit(jax.grad(loss_v3b_ref, argnums=(0, 1, 2, 3, 4)))(
        x, w_qkv, b_qkv, scale, bias
    )
    v3b_errs = {}
    for name, a, b in zip(("dx", "dw", "db", "dscale", "dbias"), g3b_f, g3b_r):
        af, bf = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(1e-3, float(np.abs(bf).max()))
        v3b_errs[name] = float(np.abs(af - bf).max()) / denom
    print(f"v3+bias fwd: max_abs_err={fwd3b_err:.4f} (ref max {ref3b_scale:.2f})")
    print("v3+bias grads (rel to max):", {k: round(v, 4) for k, v in v3b_errs.items()})
    ok = ok and fwd3b_err < 0.05 * ref3b_scale and all(
        v < 0.05 for v in v3b_errs.values()
    )

    print("ON-TPU KERNEL PARITY:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
