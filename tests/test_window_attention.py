"""Fused window attention: pallas (interpret on CPU) vs the XLA reference
path, including bias, the boundary-row mask and gradients; and the model's
pallas/xla end-to-end equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swin_v2_weather_tpu.models.swin import SwinTransformerV2, make_shift_mask
from swin_v2_weather_tpu.ops.window_attention import (
    fused_window_attention,
    reference_attention,
)

B, NWH, NWW, HEADS, L, D = 2, 3, 4, 2, 12, 16
BW = B * NWH * NWW


@pytest.fixture
def qkv(rng):
    q = jnp.asarray(rng.standard_normal((BW, HEADS, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BW, HEADS, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BW, HEADS, L, D)), jnp.float32)
    scale = jnp.asarray(np.exp(rng.standard_normal(HEADS) * 0.1 + 1.0), jnp.float32)
    return q, k, v, scale


def pattern():
    # feat (9, 16), window (3, 4), shift (1, 2): boundary row pattern
    return make_shift_mask((9, 16), (3, 4), (1, 2))[-1]


class TestMaskStructure:
    def test_only_last_row_masked(self):
        mask = make_shift_mask((9, 16), (3, 4), (1, 2))
        nww = 16 // 4
        assert np.abs(mask[:-nww]).max() == 0.0
        for w in range(nww):
            np.testing.assert_array_equal(mask[-nww + w], mask[-1])


class TestForward:
    @pytest.mark.parametrize("use_bias", [False, True])
    @pytest.mark.parametrize("use_mask", [False, True])
    def test_matches_reference(self, qkv, rng, use_bias, use_mask):
        q, k, v, scale = qkv
        bias = (
            jnp.asarray(rng.standard_normal((HEADS, L, L)) * 0.1, jnp.float32)
            if use_bias
            else None
        )
        patt = pattern() if use_mask else None
        out = fused_window_attention(
            q, k, v, scale, bias=bias, mask_pattern=patt, window_grid=(NWH, NWW)
        )
        ref = reference_attention(q, k, v, scale, bias, patt, (NWH, NWW))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)

    def test_requires_window_grid(self, qkv):
        q, k, v, scale = qkv
        with pytest.raises(ValueError):
            fused_window_attention(q, k, v, scale)

    def test_softmax_rows_sum_via_uniform_v(self, qkv):
        """With v = ones the output must be exactly ones (softmax sums to 1),
        including in masked/padded configurations."""
        q, k, v, scale = qkv
        out = fused_window_attention(
            q, k, v.at[:].set(1.0), scale, mask_pattern=pattern(), window_grid=(NWH, NWW)
        )
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-2)


class TestGradients:
    def test_grads_match_reference(self, qkv, rng):
        q, k, v, scale = qkv
        bias = jnp.asarray(rng.standard_normal((HEADS, L, L)) * 0.1, jnp.float32)
        patt = pattern()

        def f(q, k, v, s, b):
            out = fused_window_attention(
                q, k, v, s, bias=b, mask_pattern=patt, window_grid=(NWH, NWW)
            )
            return jnp.sum(out * out)

        def fr(q, k, v, s, b):
            out = reference_attention(q, k, v, s, b, patt, (NWH, NWW))
            return jnp.sum(out * out)

        g = jax.grad(f, argnums=(0, 1, 2, 3, 4))(q, k, v, scale, bias)
        gr = jax.grad(fr, argnums=(0, 1, 2, 3, 4))(q, k, v, scale, bias)
        for name, a, b_ in zip(("dq", "dk", "dv", "dscale", "dbias"), g, gr):
            # handwritten flash-style backward: bf16 MXU matmuls vs the fp32
            # reference vjp; dscale/dbias are window-summed accumulations so
            # a relative term is needed on their larger entries
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=6e-2, rtol=5e-3, err_msg=name
            )


class TestGridKernel:
    """v2: grid-layout kernel (windowing via BlockSpec) + Pallas backward."""

    @pytest.fixture
    def grid_qkv(self, rng):
        H, W, C = 9, 24, HEADS * D
        q = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        scale = jnp.asarray(np.exp(rng.standard_normal(HEADS) * 0.1 + 1.0), jnp.float32)
        return q, k, v, scale

    @pytest.mark.parametrize("use_bias", [False, True])
    @pytest.mark.parametrize("use_mask", [False, True])
    def test_forward_matches_reference(self, grid_qkv, rng, use_bias, use_mask):
        from swin_v2_weather_tpu.ops.window_attention import (
            fused_window_attention_grid,
            reference_attention_grid,
        )

        q, k, v, scale = grid_qkv
        wh, ww = 3, 4
        l = wh * ww
        bias = (
            jnp.asarray(rng.standard_normal((HEADS, l, l)) * 0.1, jnp.float32)
            if use_bias
            else None
        )
        patt = make_shift_mask((9, 24), (wh, ww), (1, 2))[-1] if use_mask else None
        out = fused_window_attention_grid(
            q, k, v, scale, (wh, ww), bias=bias, mask_pattern=patt
        )
        ref = reference_attention_grid(q, k, v, scale, bias, patt, (wh, ww))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)

    def test_pallas_backward_matches_reference(self, grid_qkv):
        """Bias-free case routes through the handwritten Pallas backward."""
        from swin_v2_weather_tpu.ops.window_attention import (
            fused_window_attention_grid,
            reference_attention_grid,
        )

        q, k, v, scale = grid_qkv
        wh, ww = 3, 4
        patt = make_shift_mask((9, 24), (wh, ww), (1, 2))[-1]

        def f(q, k, v, s):
            out = fused_window_attention_grid(q, k, v, s, (wh, ww), mask_pattern=patt)
            return jnp.sum(out * out)

        def fr(q, k, v, s):
            out = reference_attention_grid(q, k, v, s, None, patt, (wh, ww))
            return jnp.sum(out * out)

        g = jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, scale)
        gr = jax.grad(fr, argnums=(0, 1, 2, 3))(q, k, v, scale)
        for name, a, b_ in zip(("dq", "dk", "dv", "dscale"), g, gr):
            # bf16-matmul noise only; dscale is a large global sum -> relative
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=3e-2, rtol=2e-3, err_msg=name
            )

    @pytest.mark.parametrize("use_mask", [False, True])
    def test_pallas_backward_with_bias_matches_reference(self, grid_qkv, rng, use_mask):
        """CPB/bias case: handwritten Pallas backward incl. the VMEM-resident
        d(bias) accumulator (window-shared cotangent)."""
        from swin_v2_weather_tpu.ops.window_attention import (
            fused_window_attention_grid,
            reference_attention_grid,
        )

        q, k, v, scale = grid_qkv
        wh, ww = 3, 4
        l = wh * ww
        bias = jnp.asarray(rng.standard_normal((HEADS, l, l)) * 0.1, jnp.float32)
        patt = make_shift_mask((9, 24), (wh, ww), (1, 2))[-1] if use_mask else None

        def f(q, k, v, s, b):
            out = fused_window_attention_grid(
                q, k, v, s, (wh, ww), bias=b, mask_pattern=patt
            )
            return jnp.sum(out * out)

        def fr(q, k, v, s, b):
            out = reference_attention_grid(q, k, v, s, b, patt, (wh, ww))
            return jnp.sum(out * out)

        g = jax.grad(f, argnums=(0, 1, 2, 3, 4))(q, k, v, scale, bias)
        gr = jax.grad(fr, argnums=(0, 1, 2, 3, 4))(q, k, v, scale, bias)
        for name, a, b_ in zip(("dq", "dk", "dv", "dscale", "dbias"), g, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=3e-2, rtol=2e-3, err_msg=name
            )

    def test_rejects_indivisible_grid(self, grid_qkv):
        from swin_v2_weather_tpu.ops.window_attention import fused_window_attention_grid

        q, k, v, scale = grid_qkv
        with pytest.raises(ValueError):
            fused_window_attention_grid(q, k, v, scale, (4, 5))

    def test_roll_commutes_with_qkv(self, grid_qkv):
        """Shift equivalence: attention(roll(qkv)) == windowed attention of
        rolled input — the identity the grid path relies on."""
        from swin_v2_weather_tpu.ops.window_attention import (
            fused_window_attention_grid,
            reference_attention_grid,
        )

        q, k, v, scale = grid_qkv
        wh, ww = 3, 4
        sh, sw = 1, 2
        patt = make_shift_mask((9, 24), (wh, ww), (sh, sw))[-1]
        rolled = [jnp.roll(t, (-sh, -sw), (1, 2)) for t in (q, k, v)]
        out = fused_window_attention_grid(*rolled, scale, (wh, ww), mask_pattern=patt)
        out = jnp.roll(out, (sh, sw), (1, 2))
        ref = jnp.roll(
            reference_attention_grid(*rolled, scale, None, patt, (wh, ww)), (sh, sw), (1, 2)
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


class TestQkvKernel:
    """v3: qkv-projection-fused kernel + fully-fused Pallas backward."""

    WH, WW = 3, 4
    H, W = 9, 24
    C_IN, C = 24, HEADS * D  # c_in != c to catch transposed-projection bugs

    @pytest.fixture
    def xwbs(self, rng):
        x = jnp.asarray(rng.standard_normal((B, self.H, self.W, self.C_IN)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((self.C_IN, 3 * self.C)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal(3 * self.C) * 0.1, jnp.float32)
        scale = jnp.asarray(np.exp(rng.standard_normal(HEADS) * 0.1 + 1.0), jnp.float32)
        return x, w, b, scale

    def _reference(self, x, w, b, scale, patt):
        from swin_v2_weather_tpu.ops.window_attention import reference_attention_grid

        qkv = jnp.einsum("bhwc,cd->bhwd", x, w) + b
        c = self.C
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        return reference_attention_grid(
            q, k, v, scale, None, patt, (self.WH, self.WW)
        )

    # v4/v5 live in ops/attic (retired measurement-archaeology schedules,
    # dispatched by nothing by default) — their parity guards run in the
    # slow tier only so smoke/default runs spend zero time on them
    # (VERDICT r4 next #9)
    @pytest.mark.parametrize(
        "impl",
        ["v3",
         pytest.param("v4", marks=pytest.mark.slow),
         pytest.param("v5", marks=pytest.mark.slow)],
    )
    @pytest.mark.parametrize("use_mask", [False, True])
    def test_forward_matches_reference(self, xwbs, use_mask, impl):
        from swin_v2_weather_tpu.ops.window_attention import fused_window_attention_qkv

        x, w, b, scale = xwbs
        patt = (
            make_shift_mask((self.H, self.W), (self.WH, self.WW), (1, 2))[-1]
            if use_mask
            else None
        )
        out = fused_window_attention_qkv(
            x, w, b, scale, (self.WH, self.WW), patt, impl=impl
        )
        ref = self._reference(x, w, b, scale, patt)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2)

    @pytest.mark.parametrize(
        "bwd_impl",
        ["pallas", "xla",
         pytest.param("v4", marks=pytest.mark.slow),
         pytest.param("v5", marks=pytest.mark.slow)],
    )
    @pytest.mark.parametrize("use_mask", [False, True])
    def test_backward_matches_reference(self, xwbs, use_mask, bwd_impl, monkeypatch):
        """dx, dW, db, dscale from the fused backward kernel vs the fp32
        XLA composition's jax.grad ('v4'/'v5' = the alternate kernel pairs)."""
        from swin_v2_weather_tpu.ops import window_attention as wa

        impl = bwd_impl if bwd_impl in ("v4", "v5") else "v3"
        if impl == "v3":
            monkeypatch.setattr(wa, "QKV_BWD_IMPL", bwd_impl)
        x, w, b, scale = xwbs
        patt = (
            make_shift_mask((self.H, self.W), (self.WH, self.WW), (1, 2))[-1]
            if use_mask
            else None
        )

        def f(x, w, b, s):
            out = wa.fused_window_attention_qkv(
                x, w, b, s, (self.WH, self.WW), patt, impl=impl
            )
            return jnp.sum(out * out)

        def fr(x, w, b, s):
            out = self._reference(x, w, b, s, patt)
            return jnp.sum(out * out)

        g = jax.grad(f, argnums=(0, 1, 2, 3))(x, w, b, scale)
        gr = jax.grad(fr, argnums=(0, 1, 2, 3))(x, w, b, scale)
        # dW/db sum ~2k bf16-rounded terms per element -> larger noise
        tols = {
            "dW": dict(atol=4e-1, rtol=3e-2),
            "db": dict(atol=4e-1, rtol=3e-2),
        }
        for name, a, b_ in zip(("dx", "dW", "db", "dscale"), g, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), err_msg=name,
                **tols.get(name, dict(atol=8e-2, rtol=5e-3)),
            )

    def _reference_bias(self, x, w, b, scale, bias, patt):
        from swin_v2_weather_tpu.ops.window_attention import reference_attention_grid

        qkv = jnp.einsum("bhwc,cd->bhwd", x, w) + b
        c = self.C
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        return reference_attention_grid(
            q, k, v, scale, bias, patt, (self.WH, self.WW)
        )

    @pytest.mark.parametrize("use_mask", [False, True])
    def test_forward_with_bias_matches_reference(self, xwbs, rng, use_mask):
        """CPB bias riding the v3 schedule (row-max-shifted max-free
        softmax) vs the raw-bias XLA reference."""
        from swin_v2_weather_tpu.ops.window_attention import fused_window_attention_qkv

        x, w, b, scale = xwbs
        l = self.WH * self.WW
        # large positive entries exercise the row-max shift
        bias = jnp.asarray(rng.standard_normal((HEADS, l, l)) * 3.0, jnp.float32)
        patt = (
            make_shift_mask((self.H, self.W), (self.WH, self.WW), (1, 2))[-1]
            if use_mask
            else None
        )
        out = fused_window_attention_qkv(
            x, w, b, scale, (self.WH, self.WW), patt, bias=bias
        )
        ref = self._reference_bias(x, w, b, scale, bias, patt)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2)

    @pytest.mark.parametrize("bwd_impl", ["pallas", "xla"])
    @pytest.mark.parametrize("use_mask", [False, True])
    def test_backward_with_bias_matches_reference(
        self, xwbs, rng, use_mask, bwd_impl, monkeypatch
    ):
        """dx, dW, db, dscale AND d(bias) — the VMEM-accumulated bias
        cotangent — vs the fp32 XLA composition's jax.grad."""
        from swin_v2_weather_tpu.ops import window_attention as wa

        monkeypatch.setattr(wa, "QKV_BWD_IMPL", bwd_impl)
        x, w, b, scale = xwbs
        l = self.WH * self.WW
        # sigma=1.5: still exercises the row-max shift (positive entries)
        # without making the softmax so sharp that the kernel's bf16 qkv
        # rounding dominates the (fp32-reference) comparison
        bias = jnp.asarray(rng.standard_normal((HEADS, l, l)) * 1.5, jnp.float32)
        patt = (
            make_shift_mask((self.H, self.W), (self.WH, self.WW), (1, 2))[-1]
            if use_mask
            else None
        )

        def f(x, w, b, s, bi):
            out = wa.fused_window_attention_qkv(
                x, w, b, s, (self.WH, self.WW), patt, bias=bi
            )
            return jnp.sum(out * out)

        def fr(x, w, b, s, bi):
            out = self._reference_bias(x, w, b, s, bi, patt)
            return jnp.sum(out * out)

        g = jax.grad(f, argnums=(0, 1, 2, 3, 4))(x, w, b, scale, bias)
        gr = jax.grad(fr, argnums=(0, 1, 2, 3, 4))(x, w, b, scale, bias)
        tols = {
            # the bias sharpens the softmax, amplifying the bf16-qkv noise
            # in the ~2k-term dW/db sums vs the fp32 reference; both routes
            # were cross-checked against an fp64 oracle (<1% dscale)
            "dW": dict(atol=6e-1, rtol=3e-2),
            "db": dict(atol=6e-1, rtol=3e-2),
            "dscale": dict(atol=1e-1, rtol=3e-2),
            "dbias": dict(atol=2e-1, rtol=2e-2),
        }
        for name, a, b_ in zip(("dx", "dW", "db", "dscale", "dbias"), g, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), err_msg=name,
                **tols.get(name, dict(atol=8e-2, rtol=5e-3)),
            )

    def test_zero_bias_equals_no_bias(self, xwbs):
        """bias == 0 through the bias kernels must reproduce the no-bias
        kernels bit-near-exactly (immune to the bf16 tolerance question:
        both routes share the same schedule and rounding points)."""
        from swin_v2_weather_tpu.ops import window_attention as wa

        x, w, b, scale = xwbs
        l = self.WH * self.WW
        zero_bias = jnp.zeros((HEADS, l, l), jnp.float32)

        out_b = wa.fused_window_attention_qkv(
            x, w, b, scale, (self.WH, self.WW), None, bias=zero_bias
        )
        out_nb = wa.fused_window_attention_qkv(
            x, w, b, scale, (self.WH, self.WW), None, impl="v3"
        )
        np.testing.assert_allclose(
            np.asarray(out_b), np.asarray(out_nb), atol=1e-5
        )
        g_b = jax.grad(
            lambda *a: jnp.sum(
                wa.fused_window_attention_qkv(
                    a[0], a[1], a[2], a[3], (self.WH, self.WW), None, bias=zero_bias
                )
                ** 2
            ),
            argnums=(0, 1, 2, 3),
        )(x, w, b, scale)
        g_nb = jax.grad(
            lambda *a: jnp.sum(
                wa.fused_window_attention_qkv(
                    a[0], a[1], a[2], a[3], (self.WH, self.WW), None, impl="v3"
                )
                ** 2
            ),
            argnums=(0, 1, 2, 3),
        )(x, w, b, scale)
        for name, a, b_ in zip(("dx", "dW", "db", "dscale"), g_b, g_nb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), err_msg=name, atol=5e-4, rtol=1e-5
            )

    @pytest.mark.parametrize("use_mask", [False, True])
    def test_prefolded_bias_equals_raw_route(self, xwbs, rng, use_mask):
        """bias_prefolded=True fed fold_cpb_bias(bias, scale) must equal the
        raw-bias route: forward bit-equal (identical op sequence, just
        relocated), and TOTAL grads w.r.t. the raw bias and scale matching —
        the prefolded route's d(scale) gains the model-side ``-sum(d_badd)``
        fold term, which is algebraically zero (softmax vjp rows sum to
        zero), so only rounding-level differences are allowed."""
        from swin_v2_weather_tpu.ops import window_attention as wa

        x, w, b, scale = xwbs
        l = self.WH * self.WW
        bias = jnp.asarray(rng.standard_normal((HEADS, l, l)) * 1.5, jnp.float32)
        patt = (
            make_shift_mask((self.H, self.W), (self.WH, self.WW), (1, 2))[-1]
            if use_mask
            else None
        )

        def f_pre(x, w, b, s, bi):
            badd = wa.fold_cpb_bias(bi, s)
            out = wa.fused_window_attention_qkv(
                x, w, b, s, (self.WH, self.WW), patt, bias=badd,
                bias_prefolded=True,
            )
            return jnp.sum(out * out)

        def f_raw(x, w, b, s, bi):
            out = wa.fused_window_attention_qkv(
                x, w, b, s, (self.WH, self.WW), patt, bias=bi
            )
            return jnp.sum(out * out)

        out_pre = wa.fused_window_attention_qkv(
            x, w, b, scale, (self.WH, self.WW), patt,
            bias=wa.fold_cpb_bias(bias, scale), bias_prefolded=True,
        )
        out_raw = wa.fused_window_attention_qkv(
            x, w, b, scale, (self.WH, self.WW), patt, bias=bias
        )
        np.testing.assert_array_equal(np.asarray(out_pre), np.asarray(out_raw))

        g_pre = jax.grad(f_pre, argnums=(0, 1, 2, 3, 4))(x, w, b, scale, bias)
        g_raw = jax.grad(f_raw, argnums=(0, 1, 2, 3, 4))(x, w, b, scale, bias)
        for name, a, b_ in zip(("dx", "dW", "db", "dscale", "dbias"), g_pre, g_raw):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), err_msg=name, atol=5e-4, rtol=1e-5
            )

    def test_cpb_expand_dot_equals_take(self, rng):
        """The one-hot-matmul expansion (SWIN_CPB_EXPAND='dot') is bit-exact
        vs gather+transpose: every fp32 product is value*1.0 or value*0.0 and
        each output row has exactly one nonzero term."""
        from swin_v2_weather_tpu.models.swin import (
            _cpb_expand_onehot,
            make_log_relative_coords_unique,
        )

        ws = (self.WH, self.WW)
        _, idx = make_log_relative_coords_unique(ws)
        d = (2 * self.WH - 1) * (2 * self.WW - 1)
        cpb = jnp.asarray(rng.standard_normal((d, HEADS)), jnp.float32)
        l = self.WH * self.WW

        via_take = jnp.take(cpb, jnp.asarray(idx), axis=0).transpose(1, 0)
        via_dot = jax.lax.dot_general(
            cpb.T, jnp.asarray(_cpb_expand_onehot(ws)),
            dimension_numbers=(((1,), (0,)), ((), ())),
        )
        np.testing.assert_array_equal(
            np.asarray(via_dot.reshape(HEADS, l, l)),
            np.asarray(via_take.reshape(HEADS, l, l)),
        )

    def test_cpb_expand_factored_equals_take(self, rng):
        """The Kronecker-factored expansion (SWIN_CPB_EXPAND='factored', the
        r5 default — no 62 MB one-hot constant) is bit-exact vs
        gather+transpose: exactly one (dr, dc) term is nonzero per output."""
        from swin_v2_weather_tpu.models.swin import (
            _cpb_expand_factored,
            make_log_relative_coords_unique,
        )

        for ws in [(self.WH, self.WW), (9, 18), (4, 4)]:
            wh, ww = ws
            _, idx = make_log_relative_coords_unique(ws)
            d = (2 * wh - 1) * (2 * ww - 1)
            l = wh * ww
            cpb = jnp.asarray(rng.standard_normal((d, HEADS)), jnp.float32)
            via_take = (
                jnp.take(cpb, jnp.asarray(idx), axis=0)
                .transpose(1, 0)
                .reshape(HEADS, l, l)
            )
            rmat, cmat = _cpb_expand_factored(ws)
            t3 = cpb.reshape(2 * wh - 1, 2 * ww - 1, HEADS)
            via_fac = jnp.einsum(
                "ijr,rch,kmc->hikjm", jnp.asarray(rmat), t3, jnp.asarray(cmat)
            ).reshape(HEADS, l, l)
            np.testing.assert_array_equal(np.asarray(via_fac), np.asarray(via_take))

    @pytest.mark.parametrize("use_mask", [False, True])
    def test_v6_padded_forward_matches_reference(self, xwbs, use_mask):
        """v6 output: per-head 128-lane slots, pad lanes EXACTLY zero, real
        lanes matching the reference."""
        from swin_v2_weather_tpu.ops import window_attention as wa

        x, w, b, scale = xwbs
        patt = (
            make_shift_mask((self.H, self.W), (self.WH, self.WW), (1, 2))[-1]
            if use_mask
            else None
        )
        out = wa.fused_window_attention_qkv_padded(
            x, w, b, scale, (self.WH, self.WW), patt
        )
        hd = self.C // HEADS
        o = np.asarray(out).reshape(B, self.H, self.W, HEADS, wa._HD_PAD)
        assert np.all(o[..., hd:] == 0.0), "pad lanes must be exactly zero"
        got = o[..., :hd].reshape(B, self.H, self.W, self.C)
        ref = self._reference(x, w, b, scale, patt)
        np.testing.assert_allclose(got, np.asarray(ref), atol=5e-2)

    @pytest.mark.parametrize("use_mask", [False, True])
    def test_v6_padded_backward_matches_v3(self, xwbs, use_mask, rng):
        """Gradients through the v6 kernel + a pad-absorbing proj equal the
        v3 composition's through the same proj, at TIGHT tolerance (both
        kernels stage qkv in bf16 and the zero pad lanes are inert — the
        math is identical term by term). v3 itself is pinned against the
        fp32 reference by test_backward_matches_reference."""
        from swin_v2_weather_tpu.ops import window_attention as wa

        x, w, b, scale = xwbs
        patt = (
            make_shift_mask((self.H, self.W), (self.WH, self.WW), (1, 2))[-1]
            if use_mask
            else None
        )
        w_o = jnp.asarray(
            rng.standard_normal((self.C, self.C)) * 0.2, jnp.float32
        )

        def f6(x, w, b, s):
            out = wa.fused_window_attention_qkv_padded(
                x, w, b, s, (self.WH, self.WW), patt
            )
            y = jnp.dot(out, wa.pad_proj_rows(w_o, HEADS))
            return jnp.sum(y * y)

        def f3(x, w, b, s):
            out = wa.fused_window_attention_qkv(
                x, w, b, s, (self.WH, self.WW), patt, impl="v3"
            )
            return jnp.sum(jnp.square(jnp.dot(out, w_o)))

        g = jax.grad(f6, argnums=(0, 1, 2, 3))(x, w, b, scale)
        gr = jax.grad(f3, argnums=(0, 1, 2, 3))(x, w, b, scale)
        tols = {
            "dW": dict(atol=2e-1, rtol=2e-2),
            "db": dict(atol=2e-1, rtol=2e-2),
        }
        for name, a, b_ in zip(("dx", "dW", "db", "dscale"), g, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), err_msg=name,
                **tols.get(name, dict(atol=5e-2, rtol=2e-3)),
            )

    def test_bwd_impls_agree(self, xwbs):
        """The fused-kernel backward and the XLA-recompute backward compute
        the same gradients (tight tolerance: same bf16 staging)."""
        from swin_v2_weather_tpu.ops import window_attention as wa

        x, w, b, scale = xwbs
        patt = make_shift_mask((self.H, self.W), (self.WH, self.WW), (1, 2))[-1]

        def grads(impl):
            old = wa.QKV_BWD_IMPL
            wa.QKV_BWD_IMPL = impl
            try:
                def f(x, w, b, s):
                    out = wa.fused_window_attention_qkv(
                        x, w, b, s, (self.WH, self.WW), patt
                    )
                    return jnp.sum(out * out)

                return jax.grad(f, argnums=(0, 1, 2, 3))(x, w, b, scale)
            finally:
                wa.QKV_BWD_IMPL = old

        # the impls stage qkv at different precisions before normalization
        # (pallas: bf16, matching the forward kernel; xla: fp32), so exact
        # agreement is not expected — only same-noise-class agreement
        tols = {"dW": dict(atol=2e-1, rtol=2e-2), "db": dict(atol=2e-1, rtol=2e-2)}
        for name, a, b_ in zip(("dx", "dW", "db", "dscale"), grads("pallas"), grads("xla")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), err_msg=name,
                **tols.get(name, dict(atol=5e-2, rtol=2e-3)),
            )


class TestModelParity:
    def test_pallas_equals_xla_model(self):
        kw = dict(
            img_size=(24, 48), patch_size=2, in_chans=5, out_chans=4, embed_dim=32,
            depth=2, num_heads=2, img_window_ratio=8, rel_pos=True, residual=True,
            full_pos_embed=True, dtype=jnp.float32, scan_blocks=True,
        )
        x = jnp.asarray(np.random.default_rng(7).standard_normal((2, 5, 24, 48)), jnp.float32)
        m_xla = SwinTransformerV2(**kw, attn_impl="xla")
        m_pal = SwinTransformerV2(**kw, attn_impl="pallas")
        params = m_xla.init(jax.random.key(0), x)
        y_xla = m_xla.apply(params, x)
        y_pal = m_pal.apply(params, x)
        np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_pal), atol=5e-2)

    def test_qkv_rel_pos_equals_xla_model(self):
        """rel_pos=True (CPB bias) through attn_impl='pallas_qkv' — the
        v3-with-bias kernels — matches the xla path from the same params,
        forward AND gradients."""
        kw = dict(
            img_size=(24, 48), patch_size=2, in_chans=5, out_chans=4, embed_dim=32,
            depth=2, num_heads=2, img_window_ratio=8, rel_pos=True, residual=True,
            full_pos_embed=False, dtype=jnp.float32, scan_blocks=True,
        )
        x = jnp.asarray(
            np.random.default_rng(7).standard_normal((2, 5, 24, 48)), jnp.float32
        )
        m_xla = SwinTransformerV2(**kw, attn_impl="xla")
        m_qkv = SwinTransformerV2(**kw, attn_impl="pallas_qkv")
        params = m_xla.init(jax.random.key(0), x)
        y_xla = m_xla.apply(params, x)
        y_qkv = m_qkv.apply(params, x)
        np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_qkv), atol=5e-2)

        def loss(m):
            return lambda p: jnp.sum(m.apply(p, x) ** 2)

        g_xla = jax.grad(loss(m_xla))(params)
        g_qkv = jax.grad(loss(m_qkv))(params)
        # CPB meta-MLP params only receive gradient through d(bias) — check
        # they match (the kernel's VMEM-accumulated dbias drives them)
        flat_x = jax.tree_util.tree_leaves_with_path(g_xla)
        flat_q = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(g_qkv)}
        checked_meta = 0
        for k, v in flat_x:
            ks = jax.tree_util.keystr(k)
            a, b = np.asarray(v), np.asarray(flat_q[ks])
            # scale-aware: the two impls round at different points, so
            # compare against each leaf's own gradient magnitude
            denom = max(1.0, float(np.max(np.abs(b))))
            assert float(np.max(np.abs(a - b))) <= 5e-3 * denom, ks
            if "meta_mlp" in ks:
                checked_meta += 1
        assert checked_meta > 0

    def test_qkv_v6_equals_v3_model(self, monkeypatch):
        """attn_impl='pallas_qkv' with the v6 (lane-aligned padded) kernel
        selected produces the same model output from the SAME params as the
        v3 kernel — checkpoints are interchangeable across QKV_IMPL."""
        from swin_v2_weather_tpu.ops import window_attention as wa

        kw = dict(
            img_size=(24, 48), patch_size=2, in_chans=5, out_chans=4, embed_dim=32,
            depth=2, num_heads=2, img_window_ratio=8, rel_pos=False, residual=True,
            full_pos_embed=True, dtype=jnp.float32, scan_blocks=True,
            attn_impl="pallas_qkv",
        )
        x = jnp.asarray(
            np.random.default_rng(7).standard_normal((2, 5, 24, 48)), jnp.float32
        )
        m = SwinTransformerV2(**kw)
        params = m.init(jax.random.key(0), x)
        y_v3 = m.apply(params, x)
        monkeypatch.setattr(wa, "QKV_IMPL", "v6")
        y_v6 = m.apply(params, x)
        np.testing.assert_allclose(np.asarray(y_v3), np.asarray(y_v6), atol=5e-2)


class TestAtticHygiene:
    """The attic (ops/attic/) holds retired kernel generations kept only as
    measurement archaeology. Nothing in the production tree may depend on
    it beyond the single lazy dispatch site (VERDICT r4 next #9)."""

    def test_no_imports_outside_dispatch_site(self):
        import pathlib
        import re

        import swin_v2_weather_tpu

        pkg = pathlib.Path(swin_v2_weather_tpu.__file__).parent
        allowed = {pkg / "ops" / "window_attention.py"}  # lazy v4/v5 dispatch
        offenders = []
        for p in pkg.rglob("*.py"):
            if (pkg / "ops" / "attic") in p.parents or p in allowed:
                continue
            if re.search(r"\battic\b", p.read_text()):
                offenders.append(str(p.relative_to(pkg)))
        assert not offenders, f"attic referenced outside the dispatch site: {offenders}"

    def test_attic_not_imported_by_default_path(self):
        """Importing the production attention module must not load the attic
        (its import is lazy, inside the v4/v5 dispatch branch only)."""
        import subprocess
        import sys

        code = (
            "import sys, swin_v2_weather_tpu.ops.window_attention; "
            "bad = [m for m in sys.modules if 'attic' in m]; "
            "assert not bad, bad"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env={**__import__('os').environ, "JAX_PLATFORMS": "cpu"},
        )
        assert proc.returncode == 0, proc.stderr[-1000:]
