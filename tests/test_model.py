"""Model tests: shapes, init-identity blocks, mask semantics, patch-embed ==
conv, longitude periodicity, scan/unrolled parity, multistep wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swin_v2_weather_tpu.models.swin import (
    PatchEmbed,
    SwinBlock,
    SwinTransformerV2,
    calc_window_shift,
    make_log_relative_coords,
    make_shift_mask,
    window_partition,
    window_reverse,
)
from swin_v2_weather_tpu.models.wrappers import MultiStepWrapper, SingleStepWrapper


def tiny_model(**over):
    kw = dict(
        img_size=(24, 48),
        patch_size=2,
        in_chans=5,
        out_chans=4,
        embed_dim=32,
        depth=2,
        num_heads=2,
        img_window_ratio=8,  # window (3, 6) on the (12, 24) grid
        drop_path_rate=0.1,
        full_pos_embed=True,
        rel_pos=False,
        residual=True,
        dtype=jnp.float32,
        scan_blocks=True,
    )
    kw.update(over)
    return SwinTransformerV2(**kw)


class TestShapes:
    def test_forward_shape(self):
        model = tiny_model()
        x = jnp.ones((2, 5, 24, 48))
        params = model.init(jax.random.key(0), x)
        y = model.apply(params, x)
        assert y.shape == (2, 4, 24, 48)
        assert y.dtype == jnp.float32

    def test_window_roundtrip(self):
        x = jnp.arange(2 * 12 * 24 * 3, dtype=jnp.float32).reshape(2, 12, 24, 3)
        w = window_partition(x, (3, 6))
        assert w.shape == (2 * 4 * 4, 3, 6, 3)
        back = window_reverse(w, (3, 6), (12, 24))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_window_clamps_to_feat_size(self):
        win, shift = calc_window_shift((4, 24), (9, 6), (4, 3))
        assert win == (4, 6)
        assert shift == (0, 3)  # H dim fully covered -> no shift in H


class TestMask:
    def test_lat_only_mask_structure(self):
        feat, win, shift = (12, 24), (3, 6), (1, 3)
        mask = make_shift_mask(feat, win, shift)
        nh, nw = feat[0] // win[0], feat[1] // win[1]
        assert mask.shape == (nh * nw, win[0] * win[1], win[0] * win[1])
        # all windows except the last row band are unmasked
        per_window = np.abs(mask).sum(axis=(1, 2))
        assert (per_window[: (nh - 1) * nw] == 0).all()
        assert (per_window[(nh - 1) * nw :] > 0).all()
        # within a masked window: rows from different lat bands blocked
        wmask = mask[-1].reshape(win[0], win[1], win[0], win[1])
        # band boundary at row h - shift_h within the window: last `shift`
        # rows of the rolled field came from across the pole
        sh = shift[0]
        assert (wmask[: win[0] - sh, :, : win[0] - sh, :] == 0).all()
        assert (wmask[win[0] - sh :, :, win[0] - sh :, :] == 0).all()
        assert (wmask[: win[0] - sh, :, win[0] - sh :, :] == -100).all()

    def test_mask_matches_reference_algorithm(self):
        # independent oracle following networks/swinv2_global.py:403-424
        feat, win, shift = (12, 24), (3, 6), (1, 3)
        h, w = feat
        img = np.zeros((h, w))
        cnt = 0
        for hs in (slice(0, h - win[0]), slice(h - shift[0], None)):
            img[hs, :] = cnt
            cnt += 1
        mw = (
            img.reshape(h // win[0], win[0], w // win[1], win[1])
            .transpose(0, 2, 1, 3)
            .reshape(-1, win[0] * win[1])
        )
        diff = mw[:, None, :] - mw[:, :, None]
        want = np.where(diff != 0, -100.0, 0.0)
        np.testing.assert_array_equal(make_shift_mask(feat, win, shift), want)


class TestPatchEmbed:
    def test_equals_strided_conv(self, rng):
        p, cin, cout = 4, 7, 16
        pe = PatchEmbed(patch_size=p, in_chans=cin, embed_dim=cout, dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(2, 16, 32, cin)), jnp.float32)
        params = pe.init(jax.random.key(1), x)
        y = pe.apply(params, x)

        # same math via lax strided convolution with the dense kernel
        # reshaped to [p, p, cin, cout] (space-to-depth ordering)
        kernel = params["params"]["proj"]["kernel"].reshape(p, p, cin, cout)
        bias = params["params"]["proj"]["bias"]
        conv = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(p, p), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        # apply the same LayerNorm
        ln_scale = params["params"]["norm"]["scale"]
        ln_bias = params["params"]["norm"]["bias"]
        mu = conv.mean(-1, keepdims=True)
        var = ((conv - mu) ** 2).mean(-1, keepdims=True)
        want = (conv - mu) / jnp.sqrt(var + 1e-5) * ln_scale + ln_bias
        np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=2e-5)


class TestLayerNormImpls:
    def test_onepass_matches_twopass(self, rng):
        # SWIN_LN_IMPL=onepass (E[x^2]-E[x]^2 in fp32) must agree with the
        # default centered form to fp32 rounding, incl. large means and bf16
        # inputs, and its gradients must match too.
        from swin_v2_weather_tpu.models import swin as swin_mod
        from swin_v2_weather_tpu.models.swin import Fp32LayerNorm

        x32 = jnp.asarray(rng.normal(size=(4, 7, 96)) * 3.0 + 15.0, jnp.float32)
        ln = Fp32LayerNorm()
        params = ln.init(jax.random.key(0), x32)
        params = jax.tree.map(
            lambda p: p + 0.3 * jnp.asarray(rng.normal(size=p.shape), p.dtype), params
        )

        def run(impl, x):
            old = swin_mod.LN_IMPL
            swin_mod.LN_IMPL = impl
            try:
                y, g = jax.value_and_grad(
                    lambda xx: jnp.sum(jnp.sin(ln.apply(params, xx)))
                )(x)
            finally:
                swin_mod.LN_IMPL = old
            return np.asarray(y), np.asarray(g)

        for x in (x32, x32.astype(jnp.bfloat16)):
            y2, g2 = run("twopass", x)
            y1, g1 = run("onepass", x)
            np.testing.assert_allclose(y1, y2, rtol=2e-5, atol=2e-4)
            np.testing.assert_allclose(g1, g2, rtol=2e-4, atol=2e-4)


class TestFusedMlp:
    def test_kernel_matches_plain_composition(self, rng):
        """fused_fc1_gelu (Pallas fwd + fused-dpre bwd) vs Dense+gelu, fwd
        and all gradients, fp32 and bf16."""
        from swin_v2_weather_tpu.ops.mlp_kernels import fused_fc1_gelu

        t, c_in, hidden = 48, 24, 64
        x32 = jnp.asarray(rng.standard_normal((t, c_in)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((c_in, hidden)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal(hidden) * 0.1, jnp.float32)

        def plain(x, w, b):
            pre = (
                jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
                + b
            ).astype(x.dtype)
            return jax.nn.gelu(pre.astype(jnp.float32), approximate=False).astype(
                x.dtype
            )

        for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
            x = x32.astype(dtype)
            y_f = fused_fc1_gelu(x, w, b)
            y_p = plain(x, w, b)
            np.testing.assert_allclose(
                np.asarray(y_f, np.float32), np.asarray(y_p, np.float32), atol=tol
            )
            g_f = jax.grad(
                lambda *a: jnp.sum(fused_fc1_gelu(*a).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2),
            )(x, w, b)
            g_p = jax.grad(
                lambda *a: jnp.sum(plain(*a).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2),
            )(x, w, b)
            for name, a, b_ in zip(("dx", "dw", "db"), g_f, g_p):
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(b_, np.float32),
                    err_msg=f"{name} {dtype}", atol=tol * 30, rtol=2e-2,
                )

    def test_model_fused_equals_plain(self, rng):
        """Whole-model outputs + grads agree across SWIN_MLP_IMPL, from the
        same params (checkpoint interchangeability)."""
        from swin_v2_weather_tpu.models import swin as swin_mod

        model = tiny_model()
        x = jnp.asarray(rng.normal(size=(1, 5, 24, 48)), jnp.float32)

        def run(impl):
            old = swin_mod.MLP_IMPL
            swin_mod.MLP_IMPL = impl
            try:
                params = model.init(jax.random.key(0), x)
                y = model.apply(params, x)
                g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
            finally:
                swin_mod.MLP_IMPL = old
            return params, np.asarray(y), g

        p_f, y_f, g_f = run("fused")
        p_p, y_p, g_p = run("plain")
        p_2, y_2, g_2 = run("fused2")
        # same init (identical param paths/shapes -> identical rng draws)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            p_f, p_p,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            p_2, p_p,
        )
        np.testing.assert_allclose(y_f, y_p, atol=1e-4)
        np.testing.assert_allclose(y_2, y_p, atol=1e-4)
        flat_f = jax.tree_util.tree_leaves_with_path(g_f)
        flat_p = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(g_p)}
        flat_2 = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(g_2)}
        for k, v in flat_f:
            ks = jax.tree_util.keystr(k)
            a, b = np.asarray(v), np.asarray(flat_p[ks])
            denom = max(1.0, float(np.max(np.abs(b))))
            assert float(np.max(np.abs(a - b))) <= 1e-4 * denom, ks
            c = np.asarray(flat_2[ks])
            assert float(np.max(np.abs(c - b))) <= 1e-4 * denom, f"fused2 {ks}"

    def test_whole_mlp_kernel_matches_plain_composition(self, rng):
        """fused_mlp (fc1+GELU+fc2 in one Pallas call + fused-recompute
        backward) vs the Dense->gelu->Dense composition, fwd and all five
        gradients, fp32 and bf16."""
        from swin_v2_weather_tpu.ops.mlp_kernels import fused_mlp

        t, c_in, hidden = 48, 24, 64
        x32 = jnp.asarray(rng.standard_normal((t, c_in)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((c_in, hidden)) * 0.2, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(hidden) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((hidden, c_in)) * 0.2, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(c_in) * 0.1, jnp.float32)

        def plain(x, w1, b1, w2, b2):
            pre = (
                jnp.dot(x, w1.astype(x.dtype), preferred_element_type=jnp.float32)
                + b1
            ).astype(x.dtype)
            a = jax.nn.gelu(pre.astype(jnp.float32), approximate=False).astype(x.dtype)
            y = jnp.dot(a, w2.astype(x.dtype)).astype(x.dtype)
            return y + b2.astype(x.dtype)

        for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)):
            x = x32.astype(dtype)
            y_f = fused_mlp(x, w1, b1, w2, b2)
            y_p = plain(x, w1, b1, w2, b2)
            np.testing.assert_allclose(
                np.asarray(y_f, np.float32), np.asarray(y_p, np.float32), atol=tol
            )
            g_f = jax.grad(
                lambda *a: jnp.sum(fused_mlp(*a).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2, 3, 4),
            )(x, w1, b1, w2, b2)
            g_p = jax.grad(
                lambda *a: jnp.sum(plain(*a).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2, 3, 4),
            )(x, w1, b1, w2, b2)
            for name, a, b_ in zip(("dx", "dw1", "db1", "dw2", "db2"), g_f, g_p):
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(b_, np.float32),
                    err_msg=f"{name} {dtype}", atol=tol * 30, rtol=3e-2,
                )


class TestInitBehavior:
    def test_blocks_start_as_identity(self, rng):
        # init_values=0 zeroes both post-norms -> block(x) == x at init
        blk = SwinBlock(
            dim=16, num_heads=2, feat_size=(8, 12), window_size=(4, 6),
            shift_size=(2, 3), shifted=True, dtype=jnp.float32,
        )
        x = jnp.asarray(rng.normal(size=(2, 8, 12, 16)), jnp.float32)
        params = blk.init(jax.random.key(0), x, 0.0)
        y = blk.apply(params, x, 0.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_model_at_init_with_residual_is_near_input(self, rng):
        # blocks are identity at init; head is not zero but the residual
        # dominates only if head output is small — just check finiteness and
        # that the residual path is present (output != pure head output)
        model = tiny_model()
        x = jnp.asarray(rng.normal(size=(1, 5, 24, 48)), jnp.float32)
        params = model.init(jax.random.key(0), x)
        y_res = model.apply(params, x)
        model_nores = tiny_model(residual=False)
        y_nores = model_nores.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(y_res - y_nores), np.asarray(x[:, :4]), atol=1e-5
        )


def _activate_blocks(params):
    """Set post-norm scales to 1 so blocks contribute (init is identity)."""

    def fix(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if ("norm1" in names or "norm2" in names) and names[-1] == "scale":
            return jnp.ones_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, params)


class TestCpbUnique:
    """Distinct-delta CPB evaluation (models/swin.py:make_log_relative_coords_unique)."""

    def test_unique_table_expands_to_full(self):
        from swin_v2_weather_tpu.models.swin import (
            make_log_relative_coords,
            make_log_relative_coords_unique,
        )

        for window in [(3, 6), (9, 18), (4, 4)]:
            coords_u, idx = make_log_relative_coords_unique(window)
            full = make_log_relative_coords(window)
            wh, ww = window
            assert coords_u.shape == ((2 * wh - 1) * (2 * ww - 1), 2)
            assert idx.shape == ((wh * ww) ** 2,)
            np.testing.assert_array_equal(coords_u[idx], full)

    def test_model_output_and_grads_match_full_pairs(self, rng, monkeypatch):
        """cpb-unique fwd + grads == the reference-shaped per-pair path
        (deterministic mode; dropout off is the parity regime)."""
        from swin_v2_weather_tpu.models import swin as swin_mod

        x = jnp.asarray(rng.normal(size=(1, 5, 24, 48)), jnp.float32)
        outs, grads = [], []
        for unique in (True, False):
            monkeypatch.setattr(swin_mod, "CPB_UNIQUE", unique)
            model = tiny_model(full_pos_embed=False, rel_pos=True,
                               drop_path_rate=0.0)
            params = _activate_blocks(model.init(jax.random.key(0), x))

            def loss(p):
                return jnp.sum(model.apply(p, x) ** 2)

            outs.append(np.asarray(model.apply(params, x)))
            grads.append(jax.grad(loss)(params))
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
        flat0 = jax.tree_util.tree_leaves_with_path(grads[0])
        flat1 = {jax.tree_util.keystr(k): v for k, v in
                 jax.tree_util.tree_leaves_with_path(grads[1])}
        for key, leaf in flat0:
            ks = jax.tree_util.keystr(key)
            # scatter-add (gather vjp) vs direct-matmul reduction order:
            # bit-different accumulation, agreement to fp32 resolution
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat1[ks]), rtol=2e-5, atol=2e-5,
                err_msg=ks,
            )

    def test_cpb_unique_is_a_config_key(self, monkeypatch):
        """`cpb_unique` threads config -> model attribute -> attention, and
        an explicitly-set SWIN_CPB_UNIQUE env var still wins (VERDICT r4
        next #6: numerics-affecting defaults belong in the config)."""
        from swin_v2_weather_tpu.models import swin as swin_mod
        from swin_v2_weather_tpu.models.swin import WindowAttention

        def resolve(attr, env):
            monkeypatch.setattr(swin_mod, "_CPB_UNIQUE_ENV", env)
            monkeypatch.setattr(
                swin_mod, "CPB_UNIQUE", (env or "1") != "0"
            )
            attn = WindowAttention(
                dim=4, num_heads=2, window_size=(3, 6), cpb_unique=attr
            )
            return attn._cpb_unique()

        assert resolve(None, None) is True      # default
        assert resolve(False, None) is False    # config key honored
        assert resolve(True, None) is True
        assert resolve(True, "0") is False      # explicit env overrides config
        assert resolve(False, "1") is True

        # the factory threads the config key through to the core model
        model = tiny_model(rel_pos=True, full_pos_embed=False)
        assert model.cpb_unique is None  # absent key -> module default
        assert tiny_model(rel_pos=True, cpb_unique=False).cpb_unique is False


class TestPeriodicity:
    def test_longitude_roll_equivariance(self, rng):
        # no absolute pos embed, relative bias only -> rolling the input by a
        # multiple of (window_w * patch) pixels rolls the output identically
        model = tiny_model(full_pos_embed=False, rel_pos=True, residual=False,
                           drop_path_rate=0.0)
        x = jnp.asarray(rng.normal(size=(1, 5, 24, 48)), jnp.float32)
        params = _activate_blocks(model.init(jax.random.key(0), x))
        shift_px = 6 * 2  # window_w(6) * patch(2)
        y = model.apply(params, x)
        assert np.abs(np.asarray(y)).max() > 1e-3  # blocks active
        y_roll = model.apply(params, jnp.roll(x, shift_px, axis=3))
        np.testing.assert_allclose(
            np.asarray(jnp.roll(y, shift_px, axis=3)), np.asarray(y_roll), atol=1e-4
        )

    def test_latitude_roll_not_equivariant(self, rng):
        # the lat-only mask must break meridional periodicity
        model = tiny_model(full_pos_embed=False, rel_pos=True, residual=False,
                           drop_path_rate=0.0)
        x = jnp.asarray(rng.normal(size=(1, 5, 24, 48)), jnp.float32)
        params = _activate_blocks(model.init(jax.random.key(0), x))
        shift_px = 3 * 2
        y = model.apply(params, x)
        y_roll = model.apply(params, jnp.roll(x, shift_px, axis=2))
        assert np.abs(np.asarray(jnp.roll(y, shift_px, axis=2)) - np.asarray(y_roll)).max() > 1e-3


class TestScanParity:
    def test_scan_matches_unrolled(self, rng):
        scan_model = tiny_model(drop_path_rate=0.0)
        unroll_model = tiny_model(drop_path_rate=0.0, scan_blocks=False)
        x = jnp.asarray(rng.normal(size=(1, 5, 24, 48)), jnp.float32)
        sp = scan_model.init(jax.random.key(7), x)

        # build unrolled params from the scan-stacked ones
        up = unroll_model.init(jax.random.key(7), x)
        stacked = sp["params"]["pairs"]
        new = dict(up["params"])
        for i in range(2):  # depth 2 -> 1 pair -> block0, block1
            src = jax.tree.map(lambda a: a[0], stacked[f"block{i}"])
            new[f"block{i}"] = src
        y_scan = scan_model.apply(sp, x)
        y_unroll = unroll_model.apply({"params": new}, x)
        np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_unroll), atol=2e-5)


class TestTraining:
    def test_droppath_changes_train_output(self, rng):
        model = tiny_model(drop_path_rate=0.9)
        x = jnp.asarray(rng.normal(size=(4, 5, 24, 48)), jnp.float32)
        params = _activate_blocks(model.init(jax.random.key(0), x))
        y_det = model.apply(params, x, train=False)
        y_tr = model.apply(params, x, train=True, rngs={"dropout": jax.random.key(1)})
        assert np.abs(np.asarray(y_det) - np.asarray(y_tr)).max() > 0  # stochastic path active

    def test_grads_finite(self, rng):
        model = tiny_model()
        x = jnp.asarray(rng.normal(size=(1, 5, 24, 48)), jnp.float32)
        params = model.init(jax.random.key(0), x)

        def loss_fn(p):
            return jnp.mean(model.apply(p, x) ** 2)

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # some gradient must reach the patch embed
        assert np.abs(np.asarray(g["params"]["patch_embed"]["proj"]["kernel"])).max() > 0

    def test_remat_matches_no_remat(self, rng):
        m1 = tiny_model(drop_path_rate=0.0)
        m2 = tiny_model(drop_path_rate=0.0, checkpoint_stages=True)
        x = jnp.asarray(rng.normal(size=(1, 5, 24, 48)), jnp.float32)
        params = m1.init(jax.random.key(0), x)
        y1 = m1.apply(params, x)
        y2 = m2.apply(params, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


class TestWrappers:
    def _mk(self, n_future):
        core = tiny_model(in_chans=8, out_chans=4, residual=True, drop_path_rate=0.0)
        # in_chans = 4 pred + 1 zenith + 3 invar
        if n_future > 0:
            return MultiStepWrapper(model=core, n_future=n_future, n_invar=3)
        return SingleStepWrapper(model=core)

    def test_single_step(self, rng):
        wrapper = self._mk(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 24, 48)), jnp.float32)
        params = wrapper.init(jax.random.key(0), x)
        y = wrapper.apply(params, x, coszen=None)
        assert y.shape == (2, 4, 24, 48)

    def test_multi_step_rollout_shape(self, rng):
        n_future = 2
        wrapper = self._mk(n_future)
        x = jnp.asarray(rng.normal(size=(2, 8, 24, 48)), jnp.float32)
        coszen = jnp.asarray(rng.normal(size=(2, n_future + 1, 24, 48)), jnp.float32)
        params = wrapper.init(jax.random.key(0), x, coszen)
        y = wrapper.apply(params, x, coszen)
        assert y.shape == (2, (n_future + 1) * 4, 24, 48)

    def test_scan_rollout_matches_unrolled(self, rng):
        """The nn.scan rollout form is numerically identical to the
        unrolled Python loop (SURVEY §7 step 3) and shares the same param
        tree, so checkpoints are interchangeable between the two forms."""
        n_future = 3
        core = tiny_model(in_chans=8, out_chans=4, residual=True, drop_path_rate=0.0)
        unrolled = MultiStepWrapper(
            model=core, n_future=n_future, n_invar=3, scan_rollout=False
        )
        scanned = MultiStepWrapper(
            model=core, n_future=n_future, n_invar=3, scan_rollout=True
        )
        x = jnp.asarray(rng.normal(size=(2, 8, 24, 48)), jnp.float32)
        coszen = jnp.asarray(rng.normal(size=(2, n_future + 1, 24, 48)), jnp.float32)
        p_u = _activate_blocks(unrolled.init(jax.random.key(0), x, coszen))
        p_s = scanned.init(jax.random.key(0), x, coszen)
        assert jax.tree_util.tree_structure(p_u) == jax.tree_util.tree_structure(p_s)
        y_u = unrolled.apply(p_u, x, coszen)
        y_s = scanned.apply(p_u, x, coszen)
        np.testing.assert_allclose(np.asarray(y_u), np.asarray(y_s), atol=2e-5)
        # gradients agree too (the form must be swappable mid-fine-tune)
        def loss(p, wrapper):
            return jnp.mean(wrapper.apply(p, x, coszen) ** 2)

        g_u = jax.grad(loss)(p_u, unrolled)
        g_s = jax.grad(loss)(p_u, scanned)
        for a, b in zip(jax.tree.leaves(g_u), jax.tree.leaves(g_s)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
            )

    def test_scan_rollout_bf16_stack(self, rng):
        """rollout_stack_dtype='bfloat16' (the 8-step HBM-fit option): the
        scanned rollout with bf16 carry/prediction stacks tracks the fp32
        form within bf16 resolution, returns fp32, and the first step's
        prediction — whose input never went through a bf16 feedback — is
        exact up to the output stack rounding."""
        n_future = 2
        core = tiny_model(in_chans=8, out_chans=4, residual=True, drop_path_rate=0.0)
        fp32 = MultiStepWrapper(
            model=core, n_future=n_future, n_invar=3, scan_rollout=True
        )
        bf16 = MultiStepWrapper(
            model=core, n_future=n_future, n_invar=3, scan_rollout=True,
            stack_dtype="bfloat16",
        )
        x = jnp.asarray(rng.normal(size=(2, 8, 24, 48)), jnp.float32)
        coszen = jnp.asarray(rng.normal(size=(2, n_future + 1, 24, 48)), jnp.float32)
        params = fp32.init(jax.random.key(0), x, coszen)
        y32 = fp32.apply(params, x, coszen)
        y16 = bf16.apply(params, x, coszen)
        assert y16.dtype == jnp.float32
        assert y16.shape == y32.shape
        # bf16 has ~3 decimal digits; activations are O(1)
        np.testing.assert_allclose(np.asarray(y32), np.asarray(y16), atol=0.05)
        # step-1 diff is pure output rounding (inputs identical): <= 1 ulp
        s1_32, s1_16 = np.asarray(y32[:, :4]), np.asarray(y16[:, :4])
        assert np.max(np.abs(s1_32 - s1_16)) <= 2 ** -7 * np.max(np.abs(s1_32))
        # gradients flow and are finite through the bf16 carries
        g = jax.grad(
            lambda p: jnp.mean(bf16.apply(p, x, coszen) ** 2)
        )(params)
        for leaf in jax.tree.leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_scan_rollout_no_coszen(self, rng):
        """coszen=None: the scan carries [pred, invars] only (the wrapper is
        built with in_chans == out_chans + n_invar in that case)."""
        core = tiny_model(in_chans=7, out_chans=4, residual=False, drop_path_rate=0.0)
        x = jnp.asarray(rng.normal(size=(1, 7, 24, 48)), jnp.float32)
        y_ref = None
        for scan in (False, True):
            wrapper = MultiStepWrapper(
                model=core, n_future=2, n_invar=3, scan_rollout=scan
            )
            params = wrapper.init(jax.random.key(0), x)
            y = wrapper.apply(params, x)
            assert y.shape == (1, 12, 24, 48)
            if scan:
                np.testing.assert_allclose(
                    np.asarray(y), np.asarray(y_ref), atol=2e-5
                )
            else:
                y_ref = y

    def test_multi_step_first_step_equals_single(self, rng):
        wrapper = self._mk(1)
        x = jnp.asarray(rng.normal(size=(1, 8, 24, 48)), jnp.float32)
        coszen = jnp.asarray(rng.normal(size=(1, 2, 24, 48)), jnp.float32)
        params = wrapper.init(jax.random.key(0), x, coszen)
        y = wrapper.apply(params, x, coszen)
        # both wrappers name the inner module "model", so params are shared
        single = SingleStepWrapper(model=wrapper.model)
        y0 = single.apply(params, x)
        np.testing.assert_allclose(np.asarray(y[:, :4]), np.asarray(y0), atol=1e-6)
