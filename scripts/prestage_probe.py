"""Probe: cost of the v5 'prestage' transpose in XLA (see ops/window_attention.py).

The v5 hypothesis: the fused-kernel head staging (~2 ms VPU relayout per
forward) can be replaced by one XLA HBM transpose at memory bandwidth:
  [B, H, W, 3C] -> [3, B, nW, heads, Lp, hd]   (window-major + head-major)
This times that transpose (+ its inverse) standalone on the attached chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_xla_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_xla_cache")

    B, H, W, C, heads = 1, 180, 360, 768, 8
    wh, ww = 9, 18
    nwh, nww = H // wh, W // ww
    nw = nwh * nww
    l = wh * ww
    lp = 168
    hd = C // heads
    c3 = 3 * C

    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, H, W, c3)), jnp.bfloat16)

    def prestage(t):
        t = t.reshape(B, nwh, wh, nww, ww, 3, heads, hd)
        t = t.transpose(5, 0, 1, 3, 6, 2, 4, 7)  # [3,B,nwh,nww,heads,wh,ww,hd]
        t = t.reshape(3, B, nw, heads, l, hd)
        return jnp.pad(t, [(0, 0)] * 4 + [(0, lp - l), (0, 0)])

    def unstage(s):
        t = s[..., :l, :]
        t = t.reshape(1, B, nwh, nww, heads, wh, ww, hd)
        t = t.transpose(1, 2, 5, 3, 6, 4, 7, 0)
        return t.reshape(B, H, W, hd * heads)

    iters = 50

    # A Pallas consumer pins the staged array's physical layout (XLA would
    # otherwise satisfy the transpose as a free layout assignment, which the
    # real v5 attention kernel cannot accept). Kernel: sum the three roles.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nc = 4

    def _consume(s_ref, o_ref):
        o_ref[...] = s_ref[0] + s_ref[1] + s_ref[2]

    def consume(s):
        return pl.pallas_call(
            _consume,
            grid=(nw // nc,),
            in_specs=[pl.BlockSpec((3, B, nc, heads, lp, hd),
                                   lambda i: (0, 0, i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, nc, heads, lp, hd),
                                   lambda i: (0, i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nw, heads, lp, hd), s.dtype),
        )(s)

    # chained: each round trip feeds the next, so the device can't overlap
    # independent copies; measures prestage + kernel + unstage per iter
    @jax.jit
    def chain(t):
        def body(i, t):
            s = prestage(t)
            u = unstage(consume(s)[None])
            return jnp.concatenate([u, u, u], axis=-1) + jnp.bfloat16(1e-3) * i
        return jax.lax.fori_loop(0, iters, body, t)

    r = chain(qkv)
    r.block_until_ready()
    print("checksum0", float(jnp.sum(r.astype(jnp.float32))))
    best = float("inf")
    for trial in range(3):
        x_t = qkv + jnp.bfloat16(1e-3 * (trial + 1))  # unique input per call
        x_t.block_until_ready()
        t0 = time.perf_counter()
        r = chain(x_t)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"trial {trial}: {dt*1e3:.3f} ms/iter")
        best = min(best, dt)
    dt = best

    gb = qkv.size * 2 * 2 / 1e9  # read + write of the full qkv, prestage only
    print(
        f"prestage+unstage round trip {dt*1e3:.3f} ms "
        f"(prestage-only bandwidth bound would be {gb/819*1e3:.3f} ms)"
    )


if __name__ == "__main__":
    main()
