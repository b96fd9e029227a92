"""Spatial sharding: H-sharded model under shard_map == unsharded model.

Verifies the latitude-axis sequence parallelism prototype
(parallel/spatial.py + SwinTransformerV2.spatial_shards): activations are
ACTUALLY sharded over the mesh's model axis (checked via per-shard shapes),
the shifted-block roll halo-exchanges via lax.ppermute, and the
pole-boundary mask applies only on the shard owning the last window row.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from swin_v2_weather_tpu.models.swin import SwinTransformerV2
from swin_v2_weather_tpu.parallel.mesh import make_mesh
from swin_v2_weather_tpu.parallel.spatial import roll_h_sharded, spatial_forward

CFG = dict(
    img_size=(24, 48), patch_size=2, in_chans=5, out_chans=4, embed_dim=32,
    depth=4, num_heads=2, img_window_ratio=8,  # window (3, 6), 4x4 windows
    full_pos_embed=True, rel_pos=False, residual=True,
)


@pytest.fixture
def mesh42():
    return make_mesh(devices=jax.devices()[:8], data_parallel=4, model_parallel=2)


class TestRollHSharded:
    @pytest.mark.parametrize("shift", [-3, -1, 1, 2])
    def test_matches_global_roll(self, mesh42, rng, shift):
        x = jnp.asarray(rng.standard_normal((2, 12, 6, 4)), jnp.float32)

        def f(xl):
            return roll_h_sharded(xl, shift, "model")

        out = jax.shard_map(
            f, mesh=mesh42, in_specs=P(None, "model"), out_specs=P(None, "model")
        )(x)
        np.testing.assert_array_equal(np.asarray(out), np.roll(x, shift, axis=1))

    def test_rejects_oversized_halo(self, mesh42):
        x = jnp.zeros((1, 4, 4, 2))

        def f(xl):
            return roll_h_sharded(xl, 3, "model")  # local rows = 2 on 2 shards

        with pytest.raises(ValueError):
            jax.shard_map(
                f, mesh=mesh42, in_specs=P(None, "model"), out_specs=P(None, "model")
            )(x)


class TestSpatialModel:
    def _models(self, attn_impl="xla"):
        common = dict(dtype=jnp.float32, attn_impl=attn_impl, scan_blocks=True)
        ref = SwinTransformerV2(**CFG, **common)
        sp = SwinTransformerV2(**CFG, **common, spatial_shards=2)
        return ref, sp

    @pytest.mark.parametrize("attn_impl", ["xla", "pallas", "pallas_qkv"])
    def test_forward_matches_unsharded(self, mesh42, rng, attn_impl):
        """All three attention impls under SP: xla uses a traced mask, the
        pallas kernels keep the static pattern + runtime boundary gate."""
        ref, sp = self._models(attn_impl)
        x = jnp.asarray(rng.standard_normal((4, 5, 24, 48)), jnp.float32)
        variables = ref.init(jax.random.key(0), x)
        # make blocks non-identity (norm scales are zero-init)
        variables = jax.tree_util.tree_map(
            lambda a: a + 0.3 if a.ndim == 1 else a, variables
        )

        y_ref = ref.apply(variables, x)
        y_sp = spatial_forward(sp, variables, x, mesh42)
        assert y_sp.shape == y_ref.shape
        tol = 2e-5 if attn_impl == "xla" else 5e-2  # bf16 MXU kernels
        np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref), atol=tol)

    def test_four_way_sharding_single_window_row_per_shard(self, rng):
        """Deepest split the test grid allows: 4 spatial shards leave ONE
        window row per shard, so every shifted-roll halo crosses shards and
        three of four shards contain only wrapped-in interior rows."""
        mesh24 = make_mesh(devices=jax.devices()[:8], data_parallel=2, model_parallel=4)
        common = dict(dtype=jnp.float32, attn_impl="xla", scan_blocks=True)
        ref = SwinTransformerV2(**CFG, **common)
        sp = SwinTransformerV2(**CFG, **common, spatial_shards=4)
        x = jnp.asarray(rng.standard_normal((2, 5, 24, 48)), jnp.float32)
        variables = ref.init(jax.random.key(0), x)
        variables = jax.tree_util.tree_map(
            lambda a: a + 0.3 if a.ndim == 1 else a, variables
        )
        y_ref = ref.apply(variables, x)
        y_sp = spatial_forward(sp, variables, x, mesh24)
        np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref), atol=2e-5)

    def test_activations_actually_sharded(self, mesh42, rng):
        """The output device-local shards carry H/2 rows each — the model
        axis genuinely splits H, it does not replicate."""
        ref, sp = self._models()
        x = jnp.asarray(rng.standard_normal((4, 5, 24, 48)), jnp.float32)
        variables = ref.init(jax.random.key(0), x)
        xs = jax.device_put(x, NamedSharding(mesh42, P("data", None, "model", None)))
        y = spatial_forward(sp, variables, xs, mesh42)
        shard_shapes = {s.data.shape for s in y.addressable_shards}
        assert shard_shapes == {(1, 4, 12, 48)}  # B/4, C_out, H/2, W

    def test_gradients_match_unsharded(self, mesh42, rng):
        """ppermute transposes correctly through the halo exchange."""
        ref, sp = self._models()
        x = jnp.asarray(rng.standard_normal((4, 5, 24, 48)), jnp.float32)
        variables = ref.init(jax.random.key(0), x)
        variables = jax.tree_util.tree_map(
            lambda a: a + 0.3 if a.ndim == 1 else a, variables
        )
        params = variables["params"]

        def loss_ref(p):
            return jnp.sum(ref.apply({"params": p}, x) ** 2)

        def loss_sp(p):
            y = spatial_forward(sp, {"params": p}, x, mesh42)
            return jnp.sum(y**2)

        from jax.flatten_util import ravel_pytree

        g_ref = jax.grad(loss_ref)(params)
        g_sp = jax.grad(loss_sp)(params)
        flat_r, _ = ravel_pytree(g_ref)
        flat_s, _ = ravel_pytree(g_sp)
        np.testing.assert_allclose(
            np.asarray(flat_s), np.asarray(flat_r), atol=5e-4, rtol=1e-4
        )


class TestSpatialTrainStep:
    def test_full_train_step_on_sp_mesh(self, mesh42):
        """One jitted train step with H sharded over the model axis: the
        spatial config trains to the same kind of finite loss as DP, with
        the batch genuinely sharded (4 data x 2 spatial shards)."""
        import numpy as onp

        from __graft_entry__ import _flagship_params
        from swin_v2_weather_tpu.data.preprocess import Preprocessor
        from swin_v2_weather_tpu.data.synthetic import SyntheticDataset
        from swin_v2_weather_tpu.models.wrappers import get_model
        from swin_v2_weather_tpu.ops.losses import LossHandler
        from swin_v2_weather_tpu.parallel.mesh import batch_sharding
        from swin_v2_weather_tpu.training.optim import build_optimizer
        from swin_v2_weather_tpu.training.step import TrainState, build_train_step

        params = _flagship_params(tiny=True)
        params["batch_size"] = 4
        # init with an unsharded clone (identical param tree: pos_embed et al
        # keep their GLOBAL shapes under SP); axis_index needs shard_map
        init_model = get_model(params)
        params["spatial_shards"] = 2
        model = get_model(params)
        dataset = SyntheticDataset(params, train=True, n_samples=4)
        samples = [dataset[i] for i in range(4)]
        batch_np = {
            key: onp.stack(parts)
            for key, parts in zip(("inp", "tar", "zen_inp", "zen_tar"), zip(*samples))
        }
        bsh = batch_sharding(mesh42, spatial=True)
        batch = {k: jax.device_put(v, bsh) for k, v in batch_np.items()}
        # H genuinely split over 'model'
        assert batch["inp"].addressable_shards[0].data.shape[2] == batch_np["inp"].shape[2] // 2

        x = jnp.zeros(
            (1, int(params["n_in_channels"]), params["img_shape_x"], params["img_shape_y"]),
            jnp.float32,
        )
        variables = init_model.init(jax.random.key(0), x, train=False)
        optimizer = build_optimizer(params)
        state = TrainState.create(variables["params"], optimizer)
        step = build_train_step(
            model, LossHandler(params), Preprocessor(params), optimizer, mesh42
        )
        state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["grad_norm"]))
