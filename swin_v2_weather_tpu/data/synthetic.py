"""Synthetic ERA5-shaped dataset for tests, CI and benchmarking.

Fills the role of BASELINE.json's "synthetic 73-ch grid" configs (the
reference had no equivalent — its smoke scripts required real data,
SURVEY.md §4). Produces deterministic pseudo-random fields with the same
interface and shapes as :class:`~swin_v2_weather_tpu.data.era5.Era5Dataset`,
including per-sample zenith channels computed from real timestamps, so every
downstream component (preprocessor, wrappers, loss) exercises its true code
path without HDF5 files on disk.
"""

from __future__ import annotations

import datetime
from typing import Tuple

import numpy as np

from swin_v2_weather_tpu.ops.zenith import cos_zenith_angle


class SyntheticDataset:
    """Deterministic random fields shaped like the ERA5 yearly archives."""

    def __init__(self, params, location: str = "", train: bool = True, n_samples: int = 64):
        self.train = train
        self.dt = int(params.dt)
        self.n_future = int(params.n_future)
        self.n_in = len(params.in_channels)
        self.n_out = len(params.out_channels)
        self.img_shape = (int(params.img_size[0]), int(params.img_size[1]))
        self.img_shape_x, self.img_shape_y = self.img_shape
        self.add_zenith = bool(params.add_zenith)
        self.n_samples_total = int(getattr(params, "n_synthetic_samples", n_samples))
        self._base_seed = int(getattr(params, "seed", 333) or 333) + (0 if train else 7919)

        if self.add_zenith:
            h, w = self.img_shape
            longitude = np.arange(0, 360, 360.0 / w)
            latitude = np.linspace(90, -90, h)
            self.lon_grid, self.lat_grid = np.meshgrid(longitude, latitude)

    def __len__(self) -> int:
        return self.n_samples_total

    def _field(self, seed: int, channels: int) -> np.ndarray:
        rng = np.random.default_rng(seed)
        return rng.standard_normal((channels,) + self.img_shape, dtype=np.float32)

    def _zenith(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        t0 = datetime.datetime(2018, 1, 1) + datetime.timedelta(hours=6 * idx)
        zen_inp = cos_zenith_angle(t0, self.lon_grid, self.lat_grid).astype(np.float32)[None]
        zen_tar = np.stack(
            [
                cos_zenith_angle(
                    t0 + datetime.timedelta(hours=6 * self.dt * (s + 1)),
                    self.lon_grid,
                    self.lat_grid,
                ).astype(np.float32)
                for s in range(self.n_future + 1)
            ]
        )
        return zen_inp, zen_tar

    def __getitem__(self, idx: int):
        idx = int(idx)
        inp = self._field(self._base_seed + idx * 31, self.n_in)
        tar = np.concatenate(
            [
                self._field(self._base_seed + (idx + self.dt * (s + 1)) * 31, self.n_out)
                for s in range(self.n_future + 1)
            ],
            axis=0,
        )
        if self.add_zenith:
            zen_inp, zen_tar = self._zenith(idx)
            return inp, tar, zen_inp, zen_tar
        return inp, tar
