"""Fused LN + drop-path + residual kernels vs the unfused XLA composite.

The op fuses the reference's post-norm residual branch
``x + drop_path(norm(y))`` (reference ``networks/swinv2_global.py:489-494``)
into one HBM pass per direction (ops/ln_kernels.py). On CPU the kernels run
in interpret mode — the same numerics path the compiled TPU kernel executes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swin_v2_weather_tpu.ops import ln_kernels as lk

EPS = 1e-5


def xla_composite(z, x, gamma, beta, m):
    """The unfused Fp32LayerNorm + DropPath + add path, op for op."""
    zf = z.astype(jnp.float32)
    mean = jnp.mean(zf, axis=-1, keepdims=True)
    zc = zf - mean
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    y = zc * jax.lax.rsqrt(var + EPS) * gamma + beta
    yb = y.astype(x.dtype)
    mb = m.reshape(m.shape[0], *([1] * (x.ndim - 1))).astype(x.dtype)
    return x + yb * mb


def make_inputs(rng, shape=(2, 6, 4, 128), dtype=jnp.bfloat16, mixed_mask=True):
    b = shape[0]
    z = jnp.asarray(rng.standard_normal(shape) * 1.7 + 0.3, dtype)
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    gamma = jnp.asarray(rng.standard_normal(shape[-1]) * 0.2, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(shape[-1]) * 0.1, jnp.float32)
    if mixed_mask:
        m = jnp.asarray((rng.random(b) > 0.5) / 0.9, jnp.float32)
    else:
        m = jnp.ones((b,), jnp.float32)
    return z, x, gamma, beta, m


class TestFusedForward:
    def test_matches_xla_composite(self, rng):
        z, x, gamma, beta, m = make_inputs(rng)
        got = lk.fused_ln_droppath_add(z, x, gamma, beta, m)
        want = xla_composite(z, x, gamma, beta, m)
        assert got.dtype == x.dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0, atol=1e-6,
        )

    def test_deterministic_mask_is_exact(self, rng):
        z, x, gamma, beta, m = make_inputs(rng, mixed_mask=False)
        got = lk.fused_ln_droppath_add(z, x, gamma, beta, m)
        want = xla_composite(z, x, gamma, beta, m)
        assert np.array_equal(np.asarray(got, np.float32), np.asarray(want, np.float32))

    def test_fp32_inputs(self, rng):
        z, x, gamma, beta, m = make_inputs(rng, dtype=jnp.float32)
        got = lk.fused_ln_droppath_add(z, x, gamma, beta, m)
        want = xla_composite(z, x, gamma, beta, m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)

    def test_fp64_oracle(self, rng):
        z, x, gamma, beta, m = make_inputs(rng, dtype=jnp.float32)
        got = np.asarray(lk.fused_ln_droppath_add(z, x, gamma, beta, m), np.float64)
        z64 = np.asarray(z, np.float64)
        mean = z64.mean(-1, keepdims=True)
        var = ((z64 - mean) ** 2).mean(-1, keepdims=True)
        y = (z64 - mean) / np.sqrt(var + EPS) * np.asarray(gamma, np.float64) + np.asarray(
            beta, np.float64
        )
        want = np.asarray(x, np.float64) + y * np.asarray(m, np.float64).reshape(-1, 1, 1, 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestFusedBackward:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_all_grads_match_xla(self, rng, dtype):
        z, x, gamma, beta, m = make_inputs(rng, dtype=dtype)
        w = jnp.asarray(rng.standard_normal(z.shape), jnp.float32)

        def loss_fused(z, x, gamma, beta):
            out = lk.fused_ln_droppath_add(z, x, gamma, beta, m)
            return jnp.sum(out.astype(jnp.float32) * w)

        def loss_xla(z, x, gamma, beta):
            out = xla_composite(z, x, gamma, beta, m)
            return jnp.sum(out.astype(jnp.float32) * w)

        got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(z, x, gamma, beta)
        want = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(z, x, gamma, beta)
        names = ["dz", "dx", "dgamma", "dbeta"]
        tol = 1e-5 if dtype == jnp.float32 else 3e-2
        for g, wnt, n in zip(got, want, names):
            assert g.dtype == wnt.dtype, n
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(wnt, np.float32),
                rtol=tol, atol=tol, err_msg=n,
            )

    def test_dx_is_identity_cotangent(self, rng):
        z, x, gamma, beta, m = make_inputs(rng)
        w = jnp.asarray(rng.standard_normal(z.shape), jnp.float32)
        dx = jax.grad(
            lambda x: jnp.sum(
                lk.fused_ln_droppath_add(z, x, gamma, beta, m).astype(jnp.float32) * w
            )
        )(x)
        # residual add passes the cotangent straight through
        np.testing.assert_allclose(
            np.asarray(dx, np.float32), np.asarray(w.astype(x.dtype), np.float32)
        )

    def test_zero_gamma_still_flows_beta_and_stats(self, rng):
        # init_values=0 starts scale at zero; dgamma/dbeta must be nonzero
        z, x, _, beta, m = make_inputs(rng, mixed_mask=False)
        gamma = jnp.zeros_like(beta)

        def loss(gamma, beta):
            return jnp.sum(
                lk.fused_ln_droppath_add(z, x, gamma, beta, m).astype(jnp.float32) ** 2
            )

        dg, db = jax.grad(loss, argnums=(0, 1))(gamma, beta)
        assert float(jnp.abs(dg).max()) > 0
        assert float(jnp.abs(db).max()) > 0


class TestSupported:
    def test_lane_alignment_gate(self):
        assert lk.supported(64800, 768)
        assert not lk.supported(64800, 96)
        assert not lk.supported(63, 768)


class TestModelIntegration:
    def _build(self, lnadd_impl, drop_path_rate=0.0):
        from swin_v2_weather_tpu.models.swin import SwinTransformerV2

        return SwinTransformerV2(
            img_size=(16, 32), patch_size=4, in_chans=5, out_chans=3,
            embed_dim=128, depth=2, num_heads=4, img_window_ratio=8,
            full_pos_embed=True, rel_pos=False, residual=True,
            drop_path_rate=drop_path_rate, dtype=jnp.bfloat16,
            scan_blocks=False, attn_impl="xla", lnadd_impl=lnadd_impl,
        )

    def test_forward_and_grads_match_unfused(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 5, 16, 32)), jnp.float32)
        fused = self._build("fused")
        plain = self._build("xla")
        variables = fused.init(jax.random.key(0), x)
        # identical param trees (LnParams mirrors Fp32LayerNorm paths)
        v2 = plain.init(jax.random.key(0), x)
        t1 = jax.tree_util.tree_structure(variables)
        t2 = jax.tree_util.tree_structure(v2)
        assert t1 == t2

        out_f = fused.apply(variables, x)
        out_p = plain.apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_p), rtol=0, atol=1e-6
        )

        def loss(m, params):
            return jnp.mean(m.apply({"params": params}, x).astype(jnp.float32) ** 2)

        gf = jax.grad(lambda p: loss(fused, p))(variables["params"])
        gp = jax.grad(lambda p: loss(plain, p))(variables["params"])
        flat_f = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(gf)}
        for key, leaf in jax.tree_util.tree_leaves_with_path(gp):
            ks = jax.tree_util.keystr(key)
            np.testing.assert_allclose(
                np.asarray(flat_f[ks], np.float32), np.asarray(leaf, np.float32),
                rtol=2e-2, atol=2e-2, err_msg=ks,
            )

    def test_droppath_rng_stream_matches_unfused(self, rng):
        # same dropout rng => same per-sample drop decisions in both impls
        x = jnp.asarray(rng.standard_normal((4, 5, 16, 32)), jnp.float32)
        fused = self._build("fused", drop_path_rate=0.7)
        plain = self._build("xla", drop_path_rate=0.7)
        variables = fused.init(jax.random.key(0), x)
        # init_values=0 zeroes every norm scale/bias, making the residual
        # branches (and thus drop-path) invisible — perturb all params so
        # the branch actually contributes
        keys = iter(jax.random.split(jax.random.key(99), 10_000))
        variables = jax.tree_util.tree_map(
            lambda a: a + 0.3 * jax.random.normal(next(keys), a.shape, a.dtype),
            variables,
        )
        key = jax.random.key(7)
        out_f = fused.apply(variables, x, train=True, rngs={"dropout": key})
        out_p = plain.apply(variables, x, train=True, rngs={"dropout": key})
        # identical drop decisions leave only the one-ulp bf16 rounding of
        # (y*mask)/keep vs y*(mask/keep); a mask mismatch would produce
        # O(activation)-sized differences
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_p), rtol=1e-2, atol=0.05
        )
        # and drop-path is actually active: some key yields a different
        # result (keep=0.3, so a single key can drop/keep everything)
        others = [
            np.asarray(
                fused.apply(variables, x, train=True, rngs={"dropout": jax.random.key(k)})
            )
            for k in range(8, 12)
        ]
        assert any(not np.allclose(np.asarray(out_f), o) for o in others)

    def test_grads_under_remat_match_unfused(self, rng):
        # the LN-aware remat policy (attn_out/mlp_out dropped from the named
        # saves when the custom_vjp residuals already keep them) must not
        # change gradients
        from swin_v2_weather_tpu.models.swin import SwinTransformerV2

        x = jnp.asarray(rng.standard_normal((2, 5, 16, 32)), jnp.float32)

        def build(lnadd_impl, ckpt):
            return SwinTransformerV2(
                img_size=(16, 32), patch_size=4, in_chans=5, out_chans=3,
                embed_dim=128, depth=2, num_heads=4, img_window_ratio=8,
                full_pos_embed=True, rel_pos=False, residual=True,
                dtype=jnp.bfloat16, scan_blocks=False, attn_impl="xla",
                lnadd_impl=lnadd_impl, checkpoint_stages=ckpt,
                remat_policy="mlp3",
            )

        variables = build("fused", True).init(jax.random.key(0), x)

        def loss(m, params):
            return jnp.mean(m.apply({"params": params}, x).astype(jnp.float32) ** 2)

        g_remat = jax.jit(jax.grad(lambda p: loss(build("fused", True), p)))(
            variables["params"]
        )
        g_plain = jax.jit(jax.grad(lambda p: loss(build("xla", False), p)))(
            variables["params"]
        )
        flat_r = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(g_remat)}
        for key, leaf in jax.tree_util.tree_leaves_with_path(g_plain):
            ks = jax.tree_util.keystr(key)
            np.testing.assert_allclose(
                np.asarray(flat_r[ks], np.float32), np.asarray(leaf, np.float32),
                rtol=2e-2, atol=2e-2, err_msg=ks,
            )
