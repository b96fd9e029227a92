"""Fused LayerNorm kernel vs flax/fp64 oracles, values and gradients."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swin_v2_weather_tpu.ops.layernorm import _row_tile, fused_layernorm


class TestRowTile:
    def test_divides_and_aligned(self):
        for n in (64, 64800, 720, 8, 1000):
            t = _row_tile(n)
            assert n % t == 0
            assert t % 8 == 0 or t == n

    def test_prime_rows_falls_back(self):
        assert _row_tile(97) == 97


class TestForward:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_matches_flax(self, rng, dtype):
        x = jnp.asarray(rng.standard_normal((4, 16, 24, 64)) * 3 + 1, dtype)
        scale = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
        out = fused_layernorm(x, scale, bias)
        ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        ref = ln.apply({"params": {"scale": scale, "bias": bias}}, x).astype(dtype)
        atol = 1e-5 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol
        )

    def test_zero_scale_gives_bias(self, rng):
        x = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
        out = fused_layernorm(x, jnp.zeros(32), jnp.full(32, 0.7))
        np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-6)


class TestBackward:
    def test_grads_match_flax(self, rng):
        x = jnp.asarray(rng.standard_normal((6, 40, 64)), jnp.float32)
        scale = jnp.asarray(rng.standard_normal(64) * 0.5 + 1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)

        def f(x, s, b):
            return jnp.sum(jnp.sin(fused_layernorm(x, s, b)))

        def fr(x, s, b):
            ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
            return jnp.sum(jnp.sin(ln.apply({"params": {"scale": s, "bias": b}}, x)))

        g = jax.grad(f, argnums=(0, 1, 2))(x, scale, bias)
        gr = jax.grad(fr, argnums=(0, 1, 2))(x, scale, bias)
        for name, a, b_ in zip(("dx", "dscale", "dbias"), g, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4, err_msg=name
            )

    def test_grads_zero_init_scale(self, rng):
        """The blocks start with scale=0 — gradients must still flow."""
        x = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)

        def f(x, s, b):
            # linear functional: cotangent is 1 even where the output is 0
            return jnp.sum(fused_layernorm(x, s, b))

        dx, dscale, dbias = jax.grad(f, argnums=(0, 1, 2))(x, jnp.zeros(32), jnp.zeros(32))
        assert np.abs(np.asarray(dscale)).max() > 0  # scale grad nonzero
        np.testing.assert_allclose(np.asarray(dx), 0.0, atol=1e-7)  # dx = 0 at scale 0
