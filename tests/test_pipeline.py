"""Data pipeline tests: loader sharding/permutation, collation, prefetch,
preprocessor channel assembly, conditioning inputs."""

import numpy as np
import pytest

from swin_v2_weather_tpu.data.conditioning import static_features
from swin_v2_weather_tpu.data.pipeline import ThreadedLoader, device_prefetch, get_data_loader
from swin_v2_weather_tpu.data.preprocess import Preprocessor, derived_channel_counts
from swin_v2_weather_tpu.data.synthetic import SyntheticDataset


class FakeParams(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def get(self, k, default=None):
        return dict.get(self, k, default)


def micro_params(**over):
    p = FakeParams(
        dt=1,
        n_future=0,
        in_channels=[0, 1, 2],
        out_channels=[0, 1, 2],
        img_size=[16, 32],
        add_zenith=True,
        add_orography=True,
        add_landmask=True,
        orography_path="/nonexistent/oro.nc",
        landmask_path="/nonexistent/lsm.h5",
        seed=333,
        data_loader_config="synthetic",
        batch_size=4,
        num_data_workers=2,
        prefetch_depth=2,
        n_synthetic_samples=16,
    )
    p.update(over)
    return p


class TestDataset:
    def test_shapes_single_step(self):
        ds = SyntheticDataset(micro_params(), train=True)
        inp, tar, zen_inp, zen_tar = ds[0]
        assert inp.shape == (3, 16, 32)
        assert tar.shape == (3, 16, 32)
        assert zen_inp.shape == (1, 16, 32)
        assert zen_tar.shape == (1, 16, 32)

    def test_shapes_multi_step(self):
        ds = SyntheticDataset(micro_params(n_future=2), train=True)
        inp, tar, zen_inp, zen_tar = ds[0]
        assert tar.shape == (9, 16, 32)  # (n_future+1) * C flattened
        assert zen_tar.shape == (3, 16, 32)

    def test_deterministic(self):
        ds = SyntheticDataset(micro_params(), train=True)
        a = ds[3]
        b = ds[3]
        np.testing.assert_array_equal(a[0], b[0])


class TestThreadedLoader:
    def test_epoch_coverage_is_partition(self):
        """All shards together cover each index exactly once per epoch."""
        ds = SyntheticDataset(micro_params(), train=True)
        seen = []
        for shard in range(4):
            loader = ThreadedLoader(ds, batch_size=2, shard_id=shard, num_shards=4,
                                    shuffle=True, seed=1, num_workers=1)
            loader.set_epoch(5)
            seen.append(loader._shard_indices())
        allidx = np.sort(np.concatenate(seen))
        np.testing.assert_array_equal(allidx, np.arange(16))

    def test_epoch_changes_order(self):
        ds = SyntheticDataset(micro_params(), train=True)
        loader = ThreadedLoader(ds, batch_size=2, shuffle=True, seed=1, num_workers=1)
        loader.set_epoch(0)
        a = loader._shard_indices().copy()
        loader.set_epoch(1)
        b = loader._shard_indices().copy()
        assert not np.array_equal(a, b)

    def test_batches(self):
        ds = SyntheticDataset(micro_params(), train=True)
        loader = ThreadedLoader(ds, batch_size=4, shuffle=False, num_workers=2)
        batches = list(iter(loader))
        assert len(batches) == len(loader) == 4
        for b in batches:
            assert set(b) == {"inp", "tar", "zen_inp", "zen_tar"}
            assert b["inp"].shape == (4, 3, 16, 32)
        # sequential order when shuffle off
        ref = np.stack([ds[i][0] for i in range(4)])
        np.testing.assert_array_equal(batches[0]["inp"], ref)

    def test_drop_last(self):
        ds = SyntheticDataset(micro_params(n_synthetic_samples=10), train=True)
        loader = ThreadedLoader(ds, batch_size=4, shuffle=False, num_workers=1)
        assert len(loader) == 2  # 10 // 4

    def test_device_prefetch(self, mesh8):
        import jax

        ds = SyntheticDataset(micro_params(), train=True)
        loader = ThreadedLoader(ds, batch_size=8, shuffle=False, num_workers=1)
        out = list(device_prefetch(iter(loader), mesh8, depth=2))
        assert len(out) == 2
        leaf = out[0]["inp"]
        assert isinstance(leaf, jax.Array)
        assert leaf.shape == (8, 3, 16, 32)
        assert len(leaf.sharding.device_set) == 8  # batch split over the mesh
        np.testing.assert_allclose(np.asarray(leaf)[0], ds[0][0])


class TestGetDataLoader:
    def test_dispatch_synthetic(self):
        p = micro_params()
        loader, ds = get_data_loader(p, "", train=True)
        assert isinstance(ds, SyntheticDataset)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_data_loader(micro_params(data_loader_config="bogus"), "", train=True)


class TestPreprocessor:
    def test_channel_assembly_order(self):
        """[data | zenith | landmask(2) | orography] — reference
        utils/preprocess_utils.py ordering."""
        import jax.numpy as jnp

        p = micro_params()
        pre = Preprocessor(p)
        n_in, n_out = derived_channel_counts(p)
        assert (n_in, n_out) == (3 + 1 + 2 + 1, 3)

        batch = {
            "inp": jnp.ones((2, 3, 16, 32)),
            "tar": jnp.zeros((2, 3, 16, 32)),
            "zen_inp": jnp.full((2, 1, 16, 32), 5.0),
            "zen_tar": jnp.full((2, 1, 16, 32), 7.0),
        }
        inp, tar, tzen = pre(batch)
        assert inp.shape == (2, 7, 16, 32)
        np.testing.assert_allclose(np.asarray(inp[:, 3]), 5.0)  # zenith after data
        # landmask one-hot sums to 1 everywhere
        lsm = np.asarray(inp[0, 4:6])
        np.testing.assert_allclose(lsm.sum(axis=0), 1.0)
        # orography z-scored
        oro = np.asarray(inp[0, 6])
        assert abs(oro.mean()) < 1e-5
        assert abs(oro.std() - 1.0) < 1e-2
        np.testing.assert_allclose(np.asarray(tzen[:, 0]), 7.0)

    def test_device_normalization_matches_host(self, tmp_path):
        """host_normalize=False: z-scoring happens inside the preprocessor
        and matches host-side normalization exactly."""
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        means = rng.standard_normal((1, 3, 1, 1)).astype(np.float32)
        stds = (0.5 + rng.random((1, 3, 1, 1))).astype(np.float32)
        np.save(tmp_path / "m.npy", means)
        np.save(tmp_path / "s.npy", stds)

        p = micro_params(
            n_future=1,
            add_zenith=False, add_orography=False, add_landmask=False,
            host_normalize=False,
            global_means_path=str(tmp_path / "m.npy"),
            global_stds_path=str(tmp_path / "s.npy"),
        )
        pre = Preprocessor(p)
        raw_inp = rng.standard_normal((2, 3, 16, 32)).astype(np.float32)
        raw_tar = rng.standard_normal((2, 6, 16, 32)).astype(np.float32)  # 2 steps
        inp, tar, _ = pre({"inp": jnp.asarray(raw_inp), "tar": jnp.asarray(raw_tar)})

        np.testing.assert_allclose(
            np.asarray(inp), (raw_inp - means) / stds, rtol=1e-6
        )
        exp_tar = (raw_tar - np.tile(means[0], (2, 1, 1))[None]) / np.tile(
            stds[0], (2, 1, 1)
        )[None]
        np.testing.assert_allclose(np.asarray(tar), exp_tar, rtol=1e-6)

    def test_device_normalize_missing_stats_raises(self):
        with pytest.raises(FileNotFoundError):
            Preprocessor(
                micro_params(
                    add_zenith=False, add_orography=False, add_landmask=False,
                    host_normalize=False,
                    global_means_path="/nonexistent/m.npy",
                    global_stds_path="/nonexistent/s.npy",
                )
            )

    def test_no_conditioning(self):
        import jax.numpy as jnp

        p = micro_params(add_zenith=False, add_orography=False, add_landmask=False)
        pre = Preprocessor(p)
        batch = {"inp": jnp.ones((2, 3, 16, 32)), "tar": jnp.zeros((2, 3, 16, 32))}
        inp, tar, tzen = pre(batch)
        assert inp.shape == (2, 3, 16, 32)
        assert tzen is None


class TestConditioningFiles:
    def test_real_files(self, tmp_path):
        import h5py

        rng = np.random.default_rng(0)
        oro_path = str(tmp_path / "oro.nc")
        lsm_path = str(tmp_path / "lsm.h5")
        z = rng.standard_normal((1, 16, 32)) * 5000
        with h5py.File(oro_path, "w") as f:
            f.create_dataset("Z", data=z)
        with h5py.File(lsm_path, "w") as f:
            f.create_dataset("LSM", data=(rng.random((1, 16, 32)) > 0.6).astype(np.float64))
        p = micro_params(orography_path=oro_path, landmask_path=lsm_path)
        static = static_features(p)
        assert static.shape == (3, 16, 32)
        np.testing.assert_allclose(static[0] + static[1], 1.0)  # one-hot
        assert abs(static[2].mean()) < 1e-6  # z-scored orography
