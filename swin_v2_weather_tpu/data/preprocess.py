"""Per-batch input assembly: zenith + static conditioning channels.

Behavioral equivalent of the reference ``utils/preprocess_utils.py``:
concatenate the solar-zenith channel to the input, then the static features
(one-hot land mask, z-scored orography), and pass the *future* zenith frames
through for the multi-step wrapper (reference ``:50-68``).

TPU-native design: instead of an nn.Module that moves tensors to the GPU,
the preprocessor is a **pure jnp function** meant to be called inside the
jitted train step — the concatenations fuse into the patch-embed matmul's
input layout under XLA, and the static block is a broadcast compile-time
constant (3 x 720 x 1440 fp32 ≈ 12 MB of HBM, negligible).

Input channel layout after assembly (must match the reference so that
``MultiStepWrapper``'s trailing-invariant slicing lines up,
``networks/helpers.py:26-41``):

    [era5 data (C) | zenith (1) | landmask one-hot (2) | orography (1)]
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from swin_v2_weather_tpu.data.conditioning import static_features


class Preprocessor:
    """Callable (pytree-of-arrays batch) -> (inp, tar, tzen).

    Construct once on the host; ``__call__`` is jit-traceable. The batch is a
    dict with keys ``inp`` [B, C, H, W], ``tar`` [B, C', H, W] and, when
    ``params.add_zenith``, ``zen_inp`` [B, 1, H, W] and ``zen_tar``
    [B, n_future+1, H, W].
    """

    def __init__(self, params, static: Optional[np.ndarray] = None):
        self.add_zenith = bool(params.add_zenith)
        if static is None:
            static = static_features(params)
        self.static = None if static is None else jnp.asarray(static[None], jnp.float32)
        self.n_static = 0 if self.static is None else int(self.static.shape[1])

        # device-side normalization (host_normalize: false): the loader
        # ships raw fields and the z-scoring fuses into the jitted step —
        # the DALI-GPU-normalize role (reference data_loader_era5_dali.py:77-90)
        self.device_normalize = not bool(getattr(params, "host_normalize", True))
        if self.device_normalize:
            import os

            if not os.path.exists(str(params.global_means_path)):
                raise FileNotFoundError(
                    "host_normalize=false requires global_means/stds files"
                )
            in_ch = np.asarray(params.in_channels)
            out_ch = np.asarray(params.out_channels)
            n_fut = int(getattr(params, "n_future", 0) or 0)
            means = np.load(params.global_means_path)[0]
            stds = np.load(params.global_stds_path)[0]
            self.in_means = jnp.asarray(means[in_ch][None], jnp.float32)
            self.in_stds = jnp.asarray(stds[in_ch][None], jnp.float32)
            # targets have (n_future+1) steps flattened into channels
            self.out_means = jnp.asarray(
                np.tile(means[out_ch], (n_fut + 1, 1, 1))[None], jnp.float32
            )
            self.out_stds = jnp.asarray(
                np.tile(stds[out_ch], (n_fut + 1, 1, 1))[None], jnp.float32
            )

    def __call__(
        self, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        inp = batch["inp"].astype(jnp.float32)
        tar = batch["tar"].astype(jnp.float32)
        if self.device_normalize:
            inp = (inp - self.in_means) / self.in_stds
            tar = (tar - self.out_means) / self.out_stds
        tzen = None
        if self.add_zenith:
            inp = jnp.concatenate([inp, batch["zen_inp"].astype(jnp.float32)], axis=1)
            tzen = batch["zen_tar"].astype(jnp.float32)
        if self.static is not None:
            b = inp.shape[0]
            inp = jnp.concatenate(
                [inp, jnp.broadcast_to(self.static, (b,) + self.static.shape[1:])], axis=1
            )
        return inp, tar, tzen


def derived_channel_counts(params) -> Tuple[int, int]:
    """(n_in_channels, n_out_channels) after conditioning channels.

    Reference ``train.py:88-98``.
    """
    n_in = len(params.in_channels)
    if params.add_zenith:
        n_in += 1
    if params.add_landmask:
        n_in += 2
    if params.add_orography:
        n_in += 1
    return n_in, len(params.out_channels)
