"""Geometric (sphere-aware) training losses.

Behavioral equivalent of the reference ``utils/losses.py``: a ``LossHandler``
parses a space-separated loss-spec string (e.g. the flagship
``'weighted absolute temp-std squared geometric l2'``, reference
``config/swin.yaml:165``) into channel weighting + a quadrature-based Lp or
SHT-based H1 loss on the sphere. All weights are precomputed on the host in
float64 and closed over as constants of the jitted loss function; the loss
math itself is pure jnp and differentiates cleanly.

Spec words (reference ``utils/losses.py:47-124``):
  weighted      per-channel weights: 'auto' rule by variable class or an
                explicit list (``:56-70``), renormalized to sum 1 (``:75-76``)
  temp-std      multiply by (global_std / (sqrt(dt) * time_diff_std + eps)),
                squared if the loss is squared (``:89-97``)
  absolute      absolute norms instead of relative (``:79-82``)
  squared       skip the 1/p root (``:84-87``)
  geometric     sphere quadrature (naive rule unless the model grid is
                legendre-gauss, ``:101-104``)
  l2 / l1 / h1  norm choice (``:107-122``)
  pole-masked   zero the first/last row of quadrature weights (``:51-54``)

Reference quirks handled deliberately (documented, not blindly ported):
  - the reference's non-geometric branch passes ``jacobian='flat'`` but
    ``GridQuadrature`` never receives it, so plain 'l2' still integrates with
    the naive sphere rule (``utils/losses.py:112-113`` vs
    ``utils/grids.py:63``). We reproduce that effective behavior.
  - the reference checks ``'geometric h1' in loss_type`` where loss_type is a
    *set of words*, so its H1 branch is unreachable (``utils/losses.py:121``).
    We use the word 'h1', making the H1 loss actually selectable.
  - ``LossHandler`` in the reference stays in training mode during validation
    (train.py never calls ``loss_obj.eval()``), so the multistep weight is
    always applied; ``__call__(training=...)`` here defaults to True.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from swin_v2_weather_tpu.ops.quadrature import GridQuadrature
from swin_v2_weather_tpu.ops.sht import RealSHT

_SURFACE_LOW = ("u10m", "v10m", "u100m", "v100m", "tp", "sp", "msl", "tcwv")
_SURFACE_T = ("t2m", "2d")
_PRESSURE_PREFIXES = ("z", "u", "v", "t", "r", "q")


def auto_channel_weights(channel_names: Sequence[str]) -> np.ndarray:
    """'auto' per-channel weights by variable class.

    Reference: ``utils/losses.py:56-68``. Surface winds/pressure/moisture get
    0.1, 2m temperature 1.0, pressure-level variables 0.001 * level, anything
    else 0.01.
    """
    weights = np.ones(len(channel_names), dtype=np.float64)
    for c, chn in enumerate(channel_names):
        if chn in _SURFACE_LOW:
            weights[c] = 0.1
        elif chn in _SURFACE_T:
            weights[c] = 1.0
        elif chn[0] in _PRESSURE_PREFIXES:
            weights[c] = 0.001 * float(chn[1:])
        else:
            weights[c] = 0.01
    return weights


class GeometricLpLoss:
    """Lp loss on the sphere via grid quadrature.

    Reference: ``utils/losses.py:154-240``. ``__call__(prd, tar, chw)`` with
    [B, C', H, W] fields and [1, C'] (or [C']-broadcastable) channel weights
    returns the summed scalar loss (reduction='sum' over batch and channels,
    as the reference defaults to ``size_average=False``).
    """

    def __init__(
        self,
        img_shape: Tuple[int, int],
        crop_shape: Optional[Tuple[int, int]] = None,
        crop_offset: Tuple[int, int] = (0, 0),
        p: float = 2.0,
        size_average: bool = False,
        reduction: bool = True,
        absolute: bool = False,
        squared: bool = False,
        pole_mask: int = 0,
        quadrature_rule: str = "naive",
    ):
        self.p = p
        self.absolute = absolute
        self.squared = squared
        self.reduction = reduction
        self.size_average = size_average
        self.quadrature = GridQuadrature(
            quadrature_rule,
            img_shape=img_shape,
            crop_shape=crop_shape,
            crop_offset=crop_offset,
            normalize=True,
            pole_mask=pole_mask,
        )

    def _reduce(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.reduction:
            return jnp.mean(x) if self.size_average else jnp.sum(x)
        return x

    def _abs(self, prd, tar, chw):
        b = prd.shape[0]
        all_norms = self.quadrature(jnp.abs(prd - tar) ** self.p).reshape(b, -1)
        if not self.squared:
            all_norms = all_norms ** (1.0 / self.p)
        return self._reduce(chw * all_norms)

    def _rel(self, prd, tar, chw):
        b = prd.shape[0]
        diff_norms = self.quadrature(jnp.abs(prd - tar) ** self.p).reshape(b, -1)
        tar_norms = self.quadrature(jnp.abs(tar) ** self.p).reshape(b, -1)
        frac_norms = diff_norms / tar_norms
        if not self.squared:
            frac_norms = frac_norms ** (1.0 / self.p)
        return self._reduce(chw * frac_norms)

    def __call__(self, prd: jnp.ndarray, tar: jnp.ndarray, chw: jnp.ndarray) -> jnp.ndarray:
        return self._abs(prd, tar, chw) if self.absolute else self._rel(prd, tar, chw)


class GeometricH1Loss:
    """Weighted H1 loss on the sphere via the spherical harmonic transform.

    Reference: ``utils/losses.py:244-338``. alpha balances the L2 and H1
    seminorm contributions; h1 weights are l*(l+1).
    """

    def __init__(
        self,
        img_shape: Tuple[int, int],
        size_average: bool = False,
        reduction: bool = True,
        absolute: bool = False,
        squared: bool = False,
        alpha: float = 0.5,
    ):
        self.reduction = reduction
        self.size_average = size_average
        self.absolute = absolute
        self.squared = squared
        self.alpha = alpha
        self.sht = RealSHT(img_shape[0], img_shape[1], grid="equiangular")
        l = np.arange(self.sht.lmax, dtype=np.float64)
        self.h1_weights = jnp.asarray(l * (l + 1.0), dtype=jnp.float32)

    def _norms(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = x.shape[0]
        coeffs = self.sht(x)
        power = coeffs.real**2 + coeffs.imag**2  # [..., l, m]
        # m=0 counted once, m>0 twice (negative orders), per Parseval
        norm2 = power[..., :, 0] + 2.0 * jnp.sum(power[..., :, 1:], axis=-1)
        l2_norm2 = norm2.reshape(b, -1).sum(axis=-1)
        h1_norm2 = (norm2 * self.h1_weights).reshape(b, -1).sum(axis=-1)
        return l2_norm2, h1_norm2

    def _combine(self, l2_norm2, h1_norm2):
        if not self.squared:
            return self.alpha * jnp.sqrt(l2_norm2) + (1 - self.alpha) * jnp.sqrt(h1_norm2)
        return self.alpha * l2_norm2 + (1 - self.alpha) * h1_norm2

    def _reduce(self, x):
        if self.reduction:
            return jnp.mean(x) if self.size_average else jnp.sum(x)
        return x

    def __call__(self, prd: jnp.ndarray, tar: jnp.ndarray, chw=None) -> jnp.ndarray:
        l2_norm2, h1_norm2 = self._norms(prd - tar)
        if self.absolute:
            return self._reduce(self._combine(l2_norm2, h1_norm2))
        tl2, th1 = self._norms(tar)
        return self._reduce(self._combine(l2_norm2, h1_norm2) / self._combine(tl2, th1))


class LossHandler:
    """Parses the loss spec and computes the training/validation loss.

    Reference: ``utils/losses.py:31-150``. Construct from a params object
    (needs: loss, n_future, img_shape_x/y, n_out_channels, channel_names,
    channel_weights, out_channels, dt, global_stds_path,
    time_diff_stds_path, model_grid_type).
    """

    def __init__(self, params):
        self.n_future = int(params.n_future)
        img_shape = (int(params.img_shape_x), int(params.img_shape_y))
        spec = set(str(params.loss).split())
        self.loss_type = params.loss

        pole_mask = 1 if "pole-masked" in spec else 0

        n_out = int(params.n_out_channels)
        if "weighted" in spec:
            if params.channel_weights == "auto":
                channel_weights = auto_channel_weights(params.channel_names)[:n_out]
            else:
                channel_weights = np.asarray(params.channel_weights, dtype=np.float64)
        else:
            channel_weights = np.ones(n_out, dtype=np.float64)
        channel_weights = channel_weights.reshape(1, -1, 1, 1)
        channel_weights = channel_weights / np.sum(channel_weights)

        absolute = "absolute" in spec
        squared = "squared" in spec

        if "temp-std" in spec:
            import os

            eps = 1e-6
            out_ch = np.asarray(params.out_channels)
            if os.path.exists(str(params.global_stds_path)) and os.path.exists(
                str(params.time_diff_stds_path)
            ):
                global_stds = np.load(params.global_stds_path).reshape(1, -1, 1, 1)[:, out_ch]
                raw_diff_stds = np.load(params.time_diff_stds_path).reshape(1, -1, 1, 1)[:, out_ch]
            elif str(getattr(params, "data_loader_config", "")) == "synthetic":
                # synthetic-data runs: unit-variance fields, no stats files
                global_stds = np.ones((1, len(out_ch), 1, 1))
                raw_diff_stds = np.ones((1, len(out_ch), 1, 1))
            else:
                # a real-data run with missing stats would silently change the
                # loss channel weighting — fail loudly instead
                raise FileNotFoundError(
                    "temp-std loss requires global_stds_path and "
                    f"time_diff_stds_path (got {params.global_stds_path!r}, "
                    f"{params.time_diff_stds_path!r})"
                )
            time_diff_stds = np.sqrt(params.dt) * raw_diff_stds
            time_var_weights = global_stds / (time_diff_stds + eps)
            if squared:
                time_var_weights = time_var_weights**2
            channel_weights = channel_weights * time_var_weights

        # [1, C, 1, 1] fp32 constant
        self.channel_weights = jnp.asarray(channel_weights, dtype=jnp.float32)

        quadrature_rule_type = "naive"
        if getattr(params, "model_grid_type", "equiangular") == "legendre_gauss":
            quadrature_rule_type = "legendre-gauss"

        if "l2" in spec:
            # both the geometric and 'flat' reference branches integrate with
            # the same quadrature (see module docstring)
            self.loss_obj = GeometricLpLoss(
                img_shape, img_shape, (0, 0), p=2, absolute=absolute, squared=squared,
                pole_mask=pole_mask, quadrature_rule=quadrature_rule_type,
            )
        elif "l1" in spec:
            self.loss_obj = GeometricLpLoss(
                img_shape, img_shape, (0, 0), p=1, absolute=absolute, squared=squared,
                pole_mask=pole_mask, quadrature_rule=quadrature_rule_type,
            )
        elif "h1" in spec:
            self.loss_obj = GeometricH1Loss(img_shape, absolute=absolute, squared=squared)
        else:
            raise ValueError(f"Unknown loss function: {self.loss_type}")

        # canonical uniform multistep weight (reference utils/losses.py:127-132)
        msw = np.ones(self.n_future + 1, dtype=np.float64) / float(self.n_future + 1)
        self.multistep_weight = jnp.asarray(msw.reshape(-1, 1, 1, 1), dtype=jnp.float32)

    def __call__(
        self,
        prd: jnp.ndarray,
        tar: jnp.ndarray,
        inp: Optional[jnp.ndarray] = None,
        training: bool = True,
    ) -> jnp.ndarray:
        if training:
            chw = (self.channel_weights * self.multistep_weight).reshape(1, -1)
        else:
            chw = self.channel_weights.reshape(1, -1)
        return self.loss_obj(prd, tar, chw)
