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
