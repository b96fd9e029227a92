"""ERA5 HDF5 dataset tests against generated yearly files: index math,
boundary clamping, channel selection, normalization, multi-step targets,
and native-pread vs h5py path parity."""

import os

import h5py
import numpy as np
import pytest

from swin_v2_weather_tpu.data.era5 import Era5Dataset, is_leap_year


class FakeParams(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def get(self, k, default=None):
        return dict.get(self, k, default)


T, C, H, W = 12, 5, 9, 16  # tiny "year" files; H=9 -> crop to 8


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("era5")
    rng = np.random.default_rng(0)
    for year in (2015, 2016):
        t = T + (4 if is_leap_year(year) else 0)
        fields = rng.standard_normal((t, C, H, W)).astype(np.float32)
        with h5py.File(root / f"{year}.h5", "w") as f:
            f.create_dataset("fields", data=fields)
    means = rng.standard_normal((1, C, 1, 1)).astype(np.float32)
    stds = (0.5 + rng.random((1, C, 1, 1))).astype(np.float32)
    np.save(root / "global_means.npy", means)
    np.save(root / "global_stds.npy", stds)
    return root


def make_params(data_dir, **over):
    p = FakeParams(
        dt=1,
        n_future=0,
        in_channels=[0, 1, 2, 3],
        out_channels=[1, 3],
        img_size=[8, 16],
        add_zenith=False,
        global_means_path=str(data_dir / "global_means.npy"),
        global_stds_path=str(data_dir / "global_stds.npy"),
        use_native_loader="auto",
    )
    p.update(over)
    return p


def raw_fields(data_dir, year):
    with h5py.File(data_dir / f"{year}.h5", "r") as f:
        return np.asarray(f["fields"])


class TestBookkeeping:
    def test_counts_and_offsets(self, data_dir):
        ds = Era5Dataset(make_params(data_dir), str(data_dir), train=True)
        assert ds.n_samples_year == [T, T + 4]  # 2016 is a leap year
        assert len(ds) == 2 * T + 4
        assert ds.year_offsets == [0, T]
        assert (ds.img_shape_x, ds.img_shape_y) == (8, 16)

    def test_locate_boundaries(self, data_dir):
        ds = Era5Dataset(make_params(data_dir), str(data_dir), train=True)
        # index 0 is below dt -> bumped up to dt
        assert ds.locate(0) == (0, 1)
        # last index of year 0 wraps inside the year (cannot read t+1)
        year_idx, local = ds.locate(T - 1)
        assert year_idx == 0 and local + ds.dt < T
        # second year starts at offset T
        assert ds.locate(T + 2)[0] == 1

    def test_missing_dir_raises(self, data_dir, tmp_path):
        with pytest.raises(FileNotFoundError):
            Era5Dataset(make_params(data_dir), str(tmp_path / "empty"), train=True)


class TestSampleContents:
    def test_values_match_file(self, data_dir):
        p = make_params(data_dir)
        ds = Era5Dataset(p, str(data_dir), train=True)
        inp, tar = ds[5]
        fields = raw_fields(data_dir, 2015)
        means = np.load(p["global_means_path"])[0]
        stds = np.load(p["global_stds_path"])[0]
        exp_inp = (fields[5, [0, 1, 2, 3], :8, :16] - means[[0, 1, 2, 3]]) / stds[[0, 1, 2, 3]]
        exp_tar = (fields[6, [1, 3], :8, :16] - means[[1, 3]]) / stds[[1, 3]]
        np.testing.assert_allclose(inp, exp_inp, rtol=1e-6)
        np.testing.assert_allclose(tar, exp_tar, rtol=1e-6)

    def test_noncontiguous_channels(self, data_dir):
        p = make_params(data_dir, in_channels=[0, 2, 4], out_channels=[4, 0])
        ds = Era5Dataset(p, str(data_dir), train=True)
        inp, tar = ds[3]
        fields = raw_fields(data_dir, 2015)
        means = np.load(p["global_means_path"])[0]
        stds = np.load(p["global_stds_path"])[0]
        np.testing.assert_allclose(
            inp, (fields[3, [0, 2, 4], :8, :16] - means[[0, 2, 4]]) / stds[[0, 2, 4]],
            rtol=1e-6,
        )
        # out-channel ORDER is respected ([4, 0], not sorted)
        np.testing.assert_allclose(
            tar, (fields[4, [4, 0], :8, :16] - means[[4, 0]]) / stds[[4, 0]], rtol=1e-6
        )

    def test_multistep_targets(self, data_dir):
        p = make_params(data_dir, n_future=2)
        ds = Era5Dataset(p, str(data_dir), train=True)
        inp, tar = ds[2]
        assert tar.shape == (3 * 2, 8, 16)
        fields = raw_fields(data_dir, 2015)
        means = np.load(p["global_means_path"])[0]
        stds = np.load(p["global_stds_path"])[0]
        for s in range(3):
            exp = (fields[2 + 1 + s, [1, 3], :8, :16] - means[[1, 3]]) / stds[[1, 3]]
            np.testing.assert_allclose(tar[s * 2 : (s + 1) * 2], exp, rtol=1e-6)

    def test_zenith_channels(self, data_dir):
        p = make_params(data_dir, add_zenith=True, n_future=1)
        ds = Era5Dataset(p, str(data_dir), train=True)
        inp, tar, zen_inp, zen_tar = ds[4]
        assert zen_inp.shape == (1, 8, 16)
        assert zen_tar.shape == (2, 8, 16)
        assert np.abs(zen_inp).max() <= 1.0 + 1e-6


class TestNativeParity:
    def test_native_equals_h5py(self, data_dir):
        from swin_v2_weather_tpu.data.native.reader import native_available

        if not native_available():
            pytest.skip("native reader did not build")
        p_native = make_params(data_dir, n_future=1, use_native_loader=True)
        p_py = make_params(data_dir, n_future=1, use_native_loader=False)
        ds_n = Era5Dataset(p_native, str(data_dir), train=True)
        ds_p = Era5Dataset(p_py, str(data_dir), train=True)
        assert ds_n._native is not None
        assert ds_p._native is None
        for idx in [0, 3, T - 1, T + 5, len(ds_n) - 1]:
            a_inp, a_tar = ds_n[idx]
            b_inp, b_tar = ds_p[idx]
            np.testing.assert_allclose(a_inp, b_inp, rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(a_tar, b_tar, rtol=1e-6, atol=1e-6)

    def test_native_unnormalized(self, data_dir):
        from swin_v2_weather_tpu.data.native.reader import NativeEra5Reader, native_available

        if not native_available():
            pytest.skip("native reader did not build")
        paths = sorted(str(p) for p in data_dir.glob("*.h5"))
        r = NativeEra5Reader(paths, n_threads=2)
        out = r.read(0, 2, [1, 4], (8, 16))
        fields = raw_fields(data_dir, 2015)
        np.testing.assert_array_equal(out, fields[2, [1, 4], :8, :16])

    def test_native_rejects_chunked(self, tmp_path):
        from swin_v2_weather_tpu.data.native.reader import (
            NativeEra5Reader,
            native_available,
            probe_files,
        )

        if not native_available():
            pytest.skip("native reader did not build")
        path = str(tmp_path / "chunked_2017.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset(
                "fields", data=np.zeros((2, 2, 4, 4), np.float32), chunks=(1, 1, 4, 4)
            )
        assert probe_files([path]) is None
        with pytest.raises(RuntimeError):
            NativeEra5Reader([path])
