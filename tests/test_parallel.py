"""Mesh construction, sharding helpers, distributed init fallback."""

import jax
import numpy as np
import pytest

from swin_v2_weather_tpu.parallel.mesh import (
    batch_sharding,
    init_distributed,
    make_mesh,
    replicated_sharding,
)


class P(dict):
    __getattr__ = dict.get


class TestMakeMesh:
    def test_auto_uses_all_devices(self):
        mesh = make_mesh(P(mesh_shape="auto"))
        assert mesh.shape["data"] == jax.device_count()
        assert mesh.shape["model"] == 1

    def test_explicit_2d(self):
        mesh = make_mesh(P(mesh_shape=[4, 2]), devices=jax.devices()[:8])
        assert dict(mesh.shape) == {"data": 4, "model": 2}

    def test_subset_of_devices(self):
        mesh = make_mesh(None, devices=jax.devices()[:4])
        assert mesh.size == 4

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            make_mesh(P(mesh_shape=[3, 2]), devices=jax.devices()[:8])


class FakeDev:
    """Stub with the multi-slice attribute real TPU devices carry."""

    def __init__(self, i, slice_index=None):
        self.id = i
        if slice_index is not None:
            self.slice_index = slice_index

    def __repr__(self):
        return f"d{self.id}"


class TestHybridOrder:
    def test_single_slice_identity(self):
        from swin_v2_weather_tpu.parallel.mesh import hybrid_device_order

        devs = [FakeDev(i) for i in range(8)]
        assert list(hybrid_device_order(devs)) == devs

    def test_interleaved_slices_grouped_slice_major(self):
        from swin_v2_weather_tpu.parallel.mesh import hybrid_device_order

        # jax.devices() can interleave slices on multi-slice deployments;
        # the data axis must still come out slice-major with per-slice
        # (ICI-contiguous) order preserved
        devs = [FakeDev(i, slice_index=i % 2) for i in range(8)]
        got = [d.id for d in hybrid_device_order(devs)]
        assert got == [0, 2, 4, 6, 1, 3, 5, 7]

    def test_ragged_slices_raise(self):
        from swin_v2_weather_tpu.parallel.mesh import hybrid_device_order

        devs = [FakeDev(i, slice_index=0 if i < 5 else 1) for i in range(8)]
        with pytest.raises(ValueError, match="ragged"):
            hybrid_device_order(devs)

    def test_model_axis_must_fit_one_slice(self):
        # 2 slices x 4 chips: mp=8 would straddle DCN -> refused; the
        # divisibility check runs before Mesh construction so stub devices
        # exercise it (Mesh itself needs real devices)
        devs = [FakeDev(i, slice_index=i // 4) for i in range(8)]
        with pytest.raises(ValueError, match="DCN|straddle"):
            make_mesh(P(mesh_shape=[1, 8]), devices=devs)


class TestShardings:
    def test_batch_split_over_data(self):
        import jax.numpy as jnp

        mesh = make_mesh(None, devices=jax.devices()[:8])
        x = jax.device_put(jnp.zeros((16, 4)), batch_sharding(mesh))
        assert len(x.sharding.device_set) == 8
        # each device holds 16/8 = 2 rows
        shard = x.addressable_shards[0]
        assert shard.data.shape == (2, 4)

    def test_replicated(self):
        import jax.numpy as jnp

        mesh = make_mesh(None, devices=jax.devices()[:8])
        x = jax.device_put(jnp.zeros((4,)), replicated_sharding(mesh))
        assert x.addressable_shards[0].data.shape == (4,)
        assert len(x.sharding.device_set) == 8

    def test_2d_mesh_batch_sharding(self):
        import jax.numpy as jnp

        mesh = make_mesh(P(mesh_shape=[4, 2]), devices=jax.devices()[:8])
        x = jax.device_put(jnp.zeros((8, 3)), batch_sharding(mesh))
        # split over data(4) only; replicated over model(2)
        assert x.addressable_shards[0].data.shape == (2, 3)


class TestInitDistributed:
    def test_single_process_noop(self, monkeypatch):
        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        idx, count = init_distributed()
        assert (idx, count) == (0, 1)


class TestZero1OptStateSharding:
    """ZeRO-1 (shard_opt_state): Adam moments shard over 'data'; the train
    step runs and matches the replicated step's loss."""

    def _setup(self, mesh):
        import jax.numpy as jnp
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
        params["batch_size"] = 8
        model = get_model(params)
        dataset = SyntheticDataset(params, train=True, n_samples=8)
        samples = [dataset[i] for i in range(8)]
        batch = {
            k: jax.device_put(onp.stack(parts), batch_sharding(mesh))
            for k, parts in zip(("inp", "tar", "zen_inp", "zen_tar"), zip(*samples))
        }
        x = jnp.zeros(
            (1, int(params["n_in_channels"]), params["img_shape_x"], params["img_shape_y"]),
            jnp.float32,
        )
        variables = model.init(jax.random.key(0), x, train=False)
        optimizer = build_optimizer(params)
        return params, model, optimizer, variables, batch, (
            LossHandler(params), Preprocessor(params), TrainState, build_train_step
        )

    def test_sharded_step_matches_replicated(self, mesh8):
        import jax.numpy as jnp

        from swin_v2_weather_tpu.training.step import state_shardings

        params, model, optimizer, variables, batch, (
            loss_obj, pre, TrainState, build_train_step
        ) = self._setup(mesh8)

        abstract = jax.eval_shape(
            lambda p: TrainState.create(p, optimizer), variables["params"]
        )
        ssh = state_shardings(abstract, mesh8, shard_opt_state=True)
        make = jax.jit(lambda p: TrainState.create(p, optimizer), out_shardings=ssh)
        state_z = make(variables["params"])

        # moments are genuinely sharded: the largest opt-state leaf (an Adam
        # moment) has one dim split 8 ways
        leaf = max(jax.tree_util.tree_leaves(state_z.opt_state), key=lambda a: a.size)
        local = leaf.addressable_shards[0].data.shape
        assert np.prod(local) * 8 == leaf.size, (local, leaf.shape)

        step_z = build_train_step(model, loss_obj, pre, optimizer, mesh8,
                                  state_shardings=ssh)
        state_z, metrics_z = step_z(state_z, batch, jax.random.key(1))

        state_r = TrainState.create(variables["params"], optimizer)
        step_r = build_train_step(model, loss_obj, pre, optimizer, mesh8)
        state_r, metrics_r = step_r(state_r, batch, jax.random.key(1))

        np.testing.assert_allclose(
            float(metrics_z["loss"]), float(metrics_r["loss"]), rtol=1e-6
        )
        # updated params agree between layouts
        pz = jax.tree_util.tree_leaves(state_z.params)[0]
        pr = jax.tree_util.tree_leaves(state_r.params)[0]
        np.testing.assert_allclose(np.asarray(pz), np.asarray(pr), atol=1e-6)


class TestFsdpParamSharding:
    """FSDP/ZeRO-3 (shard_params): parameters AND moments shard over 'data';
    GSPMD inserts per-layer gathers + gradient reduce-scatters. This is what
    makes the e2048 family trainable (VERDICT r2 next #4)."""

    def test_sharded_params_step_matches_replicated(self, mesh8):
        from swin_v2_weather_tpu.training.step import state_shardings

        z = TestZero1OptStateSharding()
        params, model, optimizer, variables, batch, (
            loss_obj, pre, TrainState, build_train_step
        ) = z._setup(mesh8)

        abstract = jax.eval_shape(
            lambda p: TrainState.create(p, optimizer), variables["params"]
        )
        ssh = state_shardings(abstract, mesh8, shard_params=True)
        make = jax.jit(lambda p: TrainState.create(p, optimizer), out_shardings=ssh)
        state_f = make(variables["params"])

        # params are genuinely sharded: the largest param leaf is split 8 ways
        leaf = max(jax.tree_util.tree_leaves(state_f.params), key=lambda a: a.size)
        local = leaf.addressable_shards[0].data.shape
        assert np.prod(local) * 8 == leaf.size, (local, leaf.shape)

        step_f = build_train_step(model, loss_obj, pre, optimizer, mesh8,
                                  state_shardings=ssh)
        state_f, metrics_f = step_f(state_f, batch, jax.random.key(1))

        state_r = TrainState.create(variables["params"], optimizer)
        step_r = build_train_step(model, loss_obj, pre, optimizer, mesh8)
        state_r, metrics_r = step_r(state_r, batch, jax.random.key(1))

        np.testing.assert_allclose(
            float(metrics_f["loss"]), float(metrics_r["loss"]), rtol=1e-6
        )
        # updated (sharded) params agree with the replicated layout
        fz = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(state_f.params)}
        for k, pr in jax.tree_util.tree_leaves_with_path(state_r.params):
            ks = jax.tree_util.keystr(k)
            np.testing.assert_allclose(
                np.asarray(fz[ks]), np.asarray(pr), atol=1e-6, err_msg=ks
            )

    @pytest.mark.slow
    def test_e2048_geometry_trains_fsdp(self, mesh8):
        """The full e2048 parameter geometry (embed 2048, depth 24, mlp2 —
        reference ``config/swin.yaml:221-227``; ~807M block params) runs a
        train step on the 8-device mesh with ``shard_params``, at reduced
        image size (the HBM budget argument lives in ROADMAP.md: fp32
        params+moments ≈ 11.4 GB full-geometry, /N per chip under FSDP)."""
        import jax.numpy as jnp
        import numpy as onp

        from __graft_entry__ import _flagship_params
        from swin_v2_weather_tpu.data.preprocess import Preprocessor
        from swin_v2_weather_tpu.data.synthetic import SyntheticDataset
        from swin_v2_weather_tpu.models.wrappers import get_model
        from swin_v2_weather_tpu.ops.losses import LossHandler
        from swin_v2_weather_tpu.parallel.mesh import batch_sharding
        from swin_v2_weather_tpu.training.optim import build_optimizer
        from swin_v2_weather_tpu.training.step import (
            TrainState,
            build_train_step,
            state_shardings,
        )

        params = _flagship_params(tiny=True)
        params["embed_dim"] = 2048
        params["depth"] = 24
        params["mlp_ratio"] = 2
        params["num_heads"] = 8
        params["batch_size"] = 8
        params["activation_ckpt"] = True

        model = get_model(params)
        dataset = SyntheticDataset(params, train=True, n_samples=8)
        samples = [dataset[i] for i in range(8)]
        batch = {
            k: jax.device_put(onp.stack(parts), batch_sharding(mesh8))
            for k, parts in zip(("inp", "tar", "zen_inp", "zen_tar"), zip(*samples))
        }
        x = jnp.zeros(
            (1, int(params["n_in_channels"]), params["img_shape_x"],
             params["img_shape_y"]), jnp.float32,
        )
        variables = model.init(jax.random.key(0), x, train=False)
        optimizer = build_optimizer(params)
        abstract = jax.eval_shape(
            lambda p: TrainState.create(p, optimizer), variables["params"]
        )
        ssh = state_shardings(abstract, mesh8, shard_params=True)
        state = jax.jit(lambda p: TrainState.create(p, optimizer),
                        out_shardings=ssh)(variables["params"])
        del variables

        n_params = sum(int(np.prod(l.shape))
                       for l in jax.tree_util.tree_leaves(state.params))
        assert n_params > 7e8  # the real e2048 block geometry

        step = build_train_step(model, LossHandler(params), Preprocessor(params),
                                optimizer, mesh8, state_shardings=ssh)
        state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
        # every chip holds 1/8 of the big leaves
        leaf = max(jax.tree_util.tree_leaves(state.params), key=lambda a: a.size)
        assert np.prod(leaf.addressable_shards[0].data.shape) * 8 == leaf.size
