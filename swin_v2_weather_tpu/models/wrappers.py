"""Single- and multi-step model wrappers.

Behavioral equivalent of the reference ``networks/helpers.py``: the
multi-step wrapper runs the autoregressive rollout *inside* the forward pass
(one differentiable graph), re-appending the per-step future zenith channel
and the trailing static (orography/landmask) channels to each prediction
before feeding it back (reference ``networks/helpers.py:26-41``).

On TPU the whole rollout is jit-compiled on device — there are no host
round-trips between steps. Two in-graph forms are provided:

* **unrolled** (``scan_rollout=False``): each of the ``n_future + 1`` model
  calls is traced into the XLA graph separately. Fine at 2 steps; at 8 the
  program holds 9 traced copies of the network and compile time scales with
  them.
* **scanned** (``scan_rollout=True``, the default for ``n_future >= 2``):
  one ``nn.scan`` body traced ONCE, carrying the full model input
  [B, C_in, H, W] between iterations (every step after the first has the
  identical layout [pred, zenith_step, invariants], and the first step's
  input already has that layout with the data channels in place of pred —
  so the carry needs no special-casing). Compile time and program size are
  flat in ``n_future``; backward residuals are the same per-step remat
  saves either way, stacked along the scan axis.

With ``activation_ckpt`` each inner model call is rematted block-by-block
in both forms, keeping rollout memory linear in steps with a small slope.
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
    # None -> scan for n_future >= 2 (4/8-step fine-tune), unrolled at 2-step
    # (one extra traced copy costs nothing there and XLA can specialize the
    # final step, which needs no feedback concat).
    scan_rollout: Optional[bool] = None
    # Remat the scan body as a unit (None -> on whenever scanning): the scan
    # then stacks ONLY the [B, C_in, H, W] carries (~300 MB/step fp32 at
    # flagship shape) instead of every per-block residual (~9 GB/step —
    # measured 36.7 GB at 4-step, 2.3x over HBM). During step t's backward
    # the body is recomputed from carry t with the model's own block-level
    # remat policy bounding the recompute's memory, so peak HBM is
    # (n_steps x carry) + ONE step's backward footprint, nearly flat in
    # rollout length.
    remat_rollout: Optional[bool] = None
    # dtype of the scanned rollout's stacked carries and prediction stack
    # (config key ``rollout_stack_dtype``). Default fp32 = exact reference
    # semantics. 'bfloat16' halves the two stacks (~5 GB -> 2.5 GB at
    # 8-step flagship shape — what makes 8-step fit a 16 GB chip at all)
    # and is the analog of the reference's own multi-step behavior under
    # AMP, where the rollout feedback IS the fp16 autocast output
    # (reference train.py:277-278 + networks/helpers.py:26-41); our model
    # casts its input to bf16 at the first matmul anyway, so the remaining
    # fp32-sensitive consumers of the carry are the global residual skip
    # and the loss input, both then bf16-rounded. Divergence documented in
    # MIGRATION.md; equivalence-within-bf16 pinned by test.
    stack_dtype: Optional[str] = None

    def _use_scan(self) -> bool:
        if self.scan_rollout is not None:
            return bool(self.scan_rollout)
        return self.n_future >= 2

    def __call__(self, inp: jnp.ndarray, coszen: Optional[jnp.ndarray] = None, train: bool = False):
        if self._use_scan():
            return self._rollout_scanned(inp, coszen, train)
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

    def _rollout_scanned(self, inp, coszen, train: bool):
        """One scanned body for all n_future+1 steps (SURVEY §7 step 3).

        The zenith xs are padded with one unused trailing slice so the scan
        covers the final step too (its feedback concat is computed and
        discarded — one concat of tensors already in HBM, no model call);
        this keeps the traced program to ONE copy of the network instead of
        a scanned body plus an unrolled final call.
        """
        n_steps = self.n_future + 1
        sdt = jnp.dtype(self.stack_dtype) if self.stack_dtype else None
        if sdt is not None:
            # the scan carry must keep one dtype across iterations; the
            # initial input joins the rollout at the stack dtype
            inp = inp.astype(sdt)
        invars = inp[:, -self.n_invar :, :, :] if self.n_invar else None

        if coszen is not None:
            # feedback uses coszen[:, step] for step 0..n_future-1
            # (reference networks/helpers.py:33-38); pad one zero slice for
            # the discarded final-iteration concat.
            zen_xs = jnp.concatenate(
                [
                    coszen[:, : self.n_future, :, :],
                    jnp.zeros_like(coszen[:, :1, :, :]),
                ],
                axis=1,
            )
        else:
            zen_xs = None

        def body(model, carry, zen_step):
            pred = model(carry, train=train)
            parts = [pred if sdt is None else pred.astype(sdt)]
            if zen_step is not None:
                zs = zen_step[:, None, :, :]
                parts.append(zs if sdt is None else zs.astype(sdt))
            if invars is not None:
                parts.append(invars)
            return jnp.concatenate(parts, axis=1), parts[0]

        remat = self.remat_rollout if self.remat_rollout is not None else True
        if remat:
            # prevent_cse=False is required (and safe) under lax.scan
            body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1,   # slice zen_xs over its step axis -> [B, H, W]
            out_axes=1,  # stack preds as [B, n_steps, C_out, H, W]
            length=n_steps,
        )
        _, preds = scan(self.model, inp, zen_xs)
        b, _, c_out, h, w = preds.shape
        out = preds.reshape(b, n_steps * c_out, h, w)
        # losses/metrics consume fp32 regardless of the stack dtype
        return out.astype(jnp.float32) if sdt is not None else out


def get_model(params, dtype: Any = None) -> nn.Module:
    """Model factory: nettype dispatch + single/multi-step wrapping.

    Reference ``networks/helpers.py:43-55``.
    """
    if params.nettype != "swin":
        raise NotImplementedError(f"model type {params.nettype} not implemented")
    core = build_swin_from_params(params, dtype=dtype)
    if int(params.n_future) > 0:
        n_invar = 1 * bool(params.add_orography) + 2 * bool(params.add_landmask)
        scan_rollout = (
            bool(params["scan_rollout"]) if "scan_rollout" in params else None
        )
        remat_rollout = (
            bool(params["remat_rollout"]) if "remat_rollout" in params else None
        )
        stack_dtype = (
            str(params["rollout_stack_dtype"])
            if "rollout_stack_dtype" in params and params["rollout_stack_dtype"]
            else None
        )
        return MultiStepWrapper(
            model=core,
            n_future=int(params.n_future),
            n_invar=n_invar,
            scan_rollout=scan_rollout,
            remat_rollout=remat_rollout,
            stack_dtype=stack_dtype,
        )
    return SingleStepWrapper(model=core)
