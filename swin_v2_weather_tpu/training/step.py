"""Jitted, mesh-sharded train and eval steps.

The reference hot loop (``train.py:273-296``) is: preprocess → autocast
forward → loss → backward (DDP allreduce overlapped) → optimizer step →
blocking scalar allreduce + ``loss.item()`` every iteration. The TPU-native
step folds ALL of that into one compiled program over the device mesh:

  * the batch arrives already sharded over the ``data`` axis (see
    ``data/pipeline.device_prefetch``); parameters/optimizer state are
    replicated;
  * XLA inserts the gradient all-reduce over ICI during compilation and
    overlaps it with backward compute (what DDP's bucketed hooks do, without
    a communication runtime);
  * the optimizer update and the loss reduction happen in the same program —
    there is no per-step host synchronization; the host only reads the loss
    array when it logs (an async fetch, reference's ``loss.item()`` D2H sync
    cost noted in SURVEY §3.1 is designed out);
  * gradient scale: DDP averages per-rank gradient sums, so the effective
    reference loss is ``sum_over_global_batch / world_size``. We reproduce
    it exactly with ``loss / n_data_shards`` — identical training dynamics
    at the same global batch + shard count, and the logged value equals the
    reference's post-allreduce ``loss/world_size``.

Validation (reference ``train.py:305-371``) similarly fuses loss + the
latitude-weighted per-channel RMSE into one program; denormalization by the
global stds happens on the host once per epoch.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from swin_v2_weather_tpu.ops.metrics import weighted_acc, weighted_rmse
from swin_v2_weather_tpu.parallel.mesh import batch_sharding, replicated_sharding


class TrainState(flax.struct.PyTreeNode):
    """Minimal training state pytree: step counter, params, optimizer state."""

    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
        )


def state_shardings(state_abstract, mesh, shard_opt_state: bool = False,
                    shard_params: bool = False):
    """Shardings pytree for a TrainState.

    Default: everything replicated (the reference's DDP layout). With
    ``shard_opt_state`` (ZeRO-1 style), the optimizer moments shard their
    first data-divisible dim over ``data`` — per-chip Adam memory drops by
    the data-axis size; XLA re-gathers the (sharded) updates into the
    replicated params during the fused update, which rides ICI like the
    gradient psum. Worth it beyond ~16 chips (ROADMAP #7).

    With ``shard_params`` (FSDP/ZeRO-3 style, implies sharded moments), the
    *parameters themselves* shard the same way: the SPMD partitioner inserts
    per-layer all-gathers on use in forward/backward and reduce-scatters the
    gradients, so per-chip memory for params+moments+grads drops by the
    data-axis size at the cost of re-gathering weights each step. This is
    what makes the e2048 family (``config/swin.yaml``
    ``swin_73var_geo_depth24_e2048_mlp2_chweight_invar``, reference
    ``config/swin.yaml:221-227``) trainable: its fp32 params + Adam moments
    alone (~11 GB) exceed one v5e's 16 GB HBM. Scalars and indivisible
    leaves stay replicated.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    if not (shard_opt_state or shard_params):
        return jax.tree_util.tree_map(lambda _: repl, state_abstract)
    ndata = int(mesh.shape["data"])

    def opt_leaf(x):
        # Deterministic rule: shard the FIRST data-divisible dim. Scan-stacked
        # params carry a tiny leading axis (< ndata), so it is skipped
        # naturally; for square/tied-dim weights the choice no longer depends
        # on which dim "wins", keeping the ZeRO-1 layout — and therefore
        # checkpoint restore sharding expectations — stable across
        # model-shape tweaks (ADVICE r2).
        shape = getattr(x, "shape", ())
        best = None
        for d, n in enumerate(shape):
            if n >= ndata and n % ndata == 0:
                best = d
                break
        if best is None:
            return repl
        spec = [None] * len(shape)
        spec[best] = "data"
        return NamedSharding(mesh, P(*spec))

    return state_abstract.replace(
        step=repl,
        params=jax.tree_util.tree_map(
            opt_leaf if shard_params else (lambda _: repl), state_abstract.params
        ),
        opt_state=jax.tree_util.tree_map(opt_leaf, state_abstract.opt_state),
    )


def _top_level_modules(grads) -> Dict[str, Any]:
    """Group a gradient pytree by its top-level module names.

    Wrapper trees nest the core under 'model'; unwrap one level so the
    groups are the architectural units (patch_embed, blocks, head, ...).
    """
    tree = grads
    if isinstance(tree, dict) and set(tree.keys()) == {"model"}:
        tree = tree["model"]
    if not isinstance(tree, dict):
        return {"params": tree}
    return dict(tree)


def _model_spatial_shards(model) -> int:
    """spatial_shards of the wrapped core (1 = no spatial sharding)."""
    core = getattr(model, "model", model)
    return int(getattr(core, "spatial_shards", 1) or 1)


def _apply_model(model, mesh, variables, inp, tzen, rng, train: bool):
    """model.apply, inside shard_map over (data, model) when the model is
    spatially sharded (H split over 'model'; parallel/spatial.py). Outside
    the SP case this is a plain apply — GSPMD handles the data axis."""
    n_sp = _model_spatial_shards(model)
    if n_sp <= 1:
        rngs = {"dropout": rng} if train else None
        return model.apply(variables, inp, coszen=tzen, train=train, rngs=rngs)

    from jax.sharding import PartitionSpec as P

    bspec = P("data", None, "model", None)

    def apply_local(v, inp_l, tzen_l, rng_l):
        rngs = None
        if train:
            # decorrelate per-sample dropout/drop-path across data shards
            rngs = {"dropout": jax.random.fold_in(rng_l, jax.lax.axis_index("data"))}
        return model.apply(v, inp_l, coszen=tzen_l, train=train, rngs=rngs)

    return jax.shard_map(
        apply_local, mesh=mesh, in_specs=(P(), bspec, bspec, P()),
        out_specs=bspec, check_vma=False,
    )(variables, inp, tzen, rng)


def make_loss_fn(model, loss_handler, preprocessor, loss_scale: float, mesh=None) -> Callable:
    def loss_fn(params, batch: Dict[str, jnp.ndarray], rng) -> jnp.ndarray:
        inp, tar, tzen = preprocessor(batch)
        gen = _apply_model(model, mesh, {"params": params}, inp, tzen, rng, train=True)
        gen = gen.astype(jnp.float32)
        return loss_handler(gen, tar, inp) * loss_scale

    return loss_fn


def build_train_step(
    model,
    loss_handler,
    preprocessor,
    optimizer: optax.GradientTransformation,
    mesh,
    loss_scale: Optional[float] = None,
    state_shardings=None,
):
    """Compile fn(state, batch, rng) -> (state, loss) over the mesh.

    ``state`` is donated: parameter and optimizer buffers are updated in
    place on device, halving peak optimizer memory.
    """
    if loss_scale is None:
        loss_scale = 1.0 / float(mesh.shape["data"])
    loss_fn = make_loss_fn(model, loss_handler, preprocessor, loss_scale, mesh=mesh)

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        # global + per-top-level-module grad norms: the monitoring role of
        # the reference's wandb.watch(model) histograms (train.py:172-173)
        # at scalar cost — fused into the same program, no extra host sync
        grad_norm = optax.global_norm(grads)
        module_norms = {
            f"grad_norm/{k}": optax.global_norm(v)
            for k, v in _top_level_modules(grads).items()
        }
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, {"loss": loss, "grad_norm": grad_norm, **module_norms}

    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh, spatial=_model_spatial_shards(model) > 1)
    ssh = state_shardings if state_shardings is not None else repl
    return jax.jit(
        step_fn,
        in_shardings=(ssh, bsh, repl),
        out_shardings=(ssh, repl),
        donate_argnums=(0,),
    )


def build_eval_step(model, loss_handler, preprocessor, mesh, n_out_channels: int,
                    loss_scale: Optional[float] = None, params_sharding=None):
    """Compile fn(params, batch) -> {'loss', 'rmse'[C]} over the mesh.

    RMSE is computed on the final rollout step's channels (reference
    ``train.py:327-329``), latitude-weighted, in normalized units; the caller
    rescales by the per-channel global stds.
    """
    if loss_scale is None:
        loss_scale = 1.0 / float(mesh.shape["data"])

    def eval_fn(params, batch):
        inp, tar, tzen = preprocessor(batch)
        gen = _apply_model(model, mesh, {"params": params}, inp, tzen, None, train=False)
        gen = gen.astype(jnp.float32)
        # the reference's LossHandler stays in training mode during
        # validation (multistep weight applied) — see ops/losses.py docstring
        loss = loss_handler(gen, tar, inp) * loss_scale
        gen_last = gen[:, -n_out_channels:]
        tar_last = tar[:, -n_out_channels:]
        # per-channel lat-weighted ACC on the normalized (z-scored) fields —
        # the metric the reference allocates but never computes
        # (train.py:313); normalization by the global means makes these
        # anomaly-like, matching the in-training-validation intent
        return {
            "loss": loss,
            "rmse": weighted_rmse(gen_last, tar_last),
            "acc": weighted_acc(gen_last, tar_last),
        }

    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh, spatial=_model_spatial_shards(model) > 1)
    psh = params_sharding if params_sharding is not None else repl
    return jax.jit(eval_fn, in_shardings=(psh, bsh), out_shardings=repl)
