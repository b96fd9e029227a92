"""Single- and multi-step model wrappers.

Behavioral equivalent of the reference ``networks/helpers.py``: the
multi-step wrapper runs the autoregressive rollout *inside* the forward pass
(one differentiable graph), re-appending the per-step future zenith channel
and the trailing static (orography/landmask) channels to each prediction
before feeding it back (reference ``networks/helpers.py:26-41``).

On TPU the whole rollout is jit-compiled on device — there are no host
round-trips between steps. ``n_future`` is small (<= 7 in all reference
configs) and each step's input layout is identical after the first, so the
loop is unrolled into the XLA graph; with ``activation_ckpt`` each inner
model call is already rematted block-by-block, keeping rollout memory flat.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from swin_v2_weather_tpu.models.swin import SwinTransformerV2, build_swin_from_params


class SingleStepWrapper(nn.Module):
    """Forward one 6h step; ignores the future-zenith argument.

    Reference ``networks/helpers.py:7-15``.
    """

    model: SwinTransformerV2

    def __call__(self, inp: jnp.ndarray, coszen: Optional[jnp.ndarray] = None, train: bool = False):
        return self.model(inp, train=train)


class MultiStepWrapper(nn.Module):
    """Autoregressive (n_future + 1)-step rollout inside one forward pass.

    Reference ``networks/helpers.py:18-41``. ``inp`` is [B, C_in, H, W] where
    the trailing ``n_invar`` channels are static conditioning (orography +
    one-hot landmask) and, if ``coszen`` is provided, channel
    ``C_out + ... `` position holds the input-time zenith. Each rollout step
    feeds back [pred, coszen[:, step], invariants]. Output concatenates all
    step predictions on the channel axis: [B, (n_future+1)*C_out, H, W].
    """

    model: SwinTransformerV2
    n_future: int
    n_invar: int  # 1*add_orography + 2*add_landmask

    def __call__(self, inp: jnp.ndarray, coszen: Optional[jnp.ndarray] = None, train: bool = False):
        result = []
        inpt = inp
        invars = inp[:, -self.n_invar :, :, :] if self.n_invar else None
        for step in range(self.n_future + 1):
            pred = self.model(inpt, train=train)
            result.append(pred)
            if step == self.n_future:
                break
            parts = [pred]
            if coszen is not None:
                parts.append(coszen[:, step : step + 1, :, :])
            if invars is not None:
                parts.append(invars)
            inpt = jnp.concatenate(parts, axis=1)
        return jnp.concatenate(result, axis=1)


def get_model(params, dtype: Any = None) -> nn.Module:
    """Model factory: nettype dispatch + single/multi-step wrapping.

    Reference ``networks/helpers.py:43-55``.
    """
    if params.nettype != "swin":
        raise NotImplementedError(f"model type {params.nettype} not implemented")
    core = build_swin_from_params(params, dtype=dtype)
    if int(params.n_future) > 0:
        n_invar = 1 * bool(params.add_orography) + 2 * bool(params.add_landmask)
        return MultiStepWrapper(model=core, n_future=int(params.n_future), n_invar=n_invar)
    return SingleStepWrapper(model=core)
