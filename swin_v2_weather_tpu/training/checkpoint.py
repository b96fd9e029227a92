"""Checkpoint save / restore / finetune / resume.

Reference semantics (``train.py:195-206, 374-393``): a single checkpoint
artifact holding ``{iters, epoch, model_state, optimizer_state}``, written
every epoch (plus ``best_ckpt`` on validation improvement); the *finetune*
path restores model weights only, while *resume* also restores the step
counter, epoch and optimizer state. Unlike the reference (whose LR lives
inside the torch optimizer state), the host-side scheduler state (plateau
best/patience counters, cosine epoch) is persisted explicitly.

TPU-native implementation: orbax sharded checkpoints, written **async** —
``AsyncCheckpointer.save`` blocks only for the device→host copy of each
shard and streams to disk in the background, so the multi-GB flagship state
never stalls the step loop. Each checkpoint is a directory (atomic rename
on completion); restore is mesh-aware — the template carries the live
``NamedSharding`` of every array, so a checkpoint written on N chips
restores sharded onto an M-chip mesh directly (no host gather).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _save_payload(
    state, epoch: int, scheduler_state: Optional[dict], step_in_epoch: int = 0
) -> dict:
    payload = {
        "iters": state.step,  # device arrays: orbax copies to host itself
        "epoch": np.asarray(epoch),
        # nonzero only for graceful-preemption saves (training/preempt.py):
        # how many steps of `epoch` are already applied; resume skips that
        # many batches of the deterministic epoch order
        "step_in_epoch": np.asarray(step_in_epoch),
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if scheduler_state:
        payload["scheduler"] = {k: np.asarray(v) for k, v in scheduler_state.items()}
    return payload


class CheckpointWriter:
    """Async checkpoint writer; holds the background write thread.

    ``save`` returns once device buffers are snapshotted to host (safe to
    donate them into the next step); the disk write overlaps the next
    epoch's compute. A new save waits for the previous one to commit.
    """

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def save(
        self, path: str, state, epoch: int,
        scheduler_state: Optional[dict] = None, step_in_epoch: int = 0,
    ) -> None:
        self._ckptr.wait_until_finished()
        self._ckptr.save(
            path,
            args=ocp.args.PyTreeSave(
                _save_payload(state, epoch, scheduler_state, step_in_epoch)
            ),
            force=True,
        )

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.wait_until_finished()
        self._ckptr.close()


def save_checkpoint(
    path: str, state, epoch: int, scheduler_state: Optional[dict] = None
) -> None:
    """One-shot synchronous save (tests, export); trainer uses CheckpointWriter."""
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        ckptr.save(
            path, args=ocp.args.PyTreeSave(_save_payload(state, epoch, scheduler_state)),
            force=True,
        )


def _convert_layout_anywhere(tree, to_scan: bool):
    """Apply the scan<->unrolled block-layout conversion wherever a params
    subtree appears (the model params AND their mirrors inside optimizer
    moments)."""
    import re

    from swin_v2_weather_tpu.models.swin import convert_block_layout

    if isinstance(tree, dict):
        is_block = lambda k: k == "pairs" or re.fullmatch(r"block\d+", k)  # noqa: E731
        if any(is_block(k) for k in tree):
            tree = convert_block_layout(tree, to_scan)
            # the converted block containers are already in the target
            # layout — do NOT re-descend into them (re-wrapping 'pairs'
            # would recurse forever in the to_scan direction)
            return {
                k: (v if is_block(k) else _convert_layout_anywhere(v, to_scan))
                for k, v in tree.items()
            }
        return {k: _convert_layout_anywhere(v, to_scan) for k, v in tree.items()}
    if isinstance(tree, tuple):
        vals = [_convert_layout_anywhere(v, to_scan) for v in tree]
        # namedtuples (optax states) rebuild by-field; plain tuples by-iterable
        return type(tree)(*vals) if hasattr(tree, "_fields") else tuple(vals)
    if isinstance(tree, list):
        return [_convert_layout_anywhere(v, to_scan) for v in tree]
    return tree


def _tree_mesh(tree):
    """Mesh of the first NamedSharding-carrying leaf, or None."""
    for leaf in jax.tree_util.tree_leaves(tree):
        sh = getattr(leaf, "sharding", None)
        if isinstance(sh, jax.sharding.NamedSharding):
            return sh.mesh
    return None


def _convert_request_template(subtree, to_scan: bool):
    """Layout-convert a restore-request template WITHOUT materializing it.

    ``_convert_layout_anywhere`` stacks/slices live arrays; done eagerly on
    the template that would drop the live mesh shardings and momentarily
    materialize a second copy of the full state. Instead the converted
    template is built from ``jax.eval_shape`` (shapes/dtypes only) with an
    explicit replicated NamedSharding on the live mesh attached to every
    leaf, so ``construct_restore_args`` still carries mesh shardings and the
    restore lands on device directly. The replicated intermediate means a
    layout-converting resume of a ZeRO-1-sharded opt_state briefly holds a
    replicated copy per chip — acceptable at restore time; the post-restore
    conversion re-shards under jit (see ``_convert_payload``).

    Falls back to the eager conversion for host-array templates (tests).
    """
    import functools

    mesh = _tree_mesh(subtree)
    if mesh is None:
        return _convert_layout_anywhere(subtree, to_scan)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    shapes = jax.eval_shape(
        functools.partial(_convert_layout_anywhere, to_scan=to_scan), subtree
    )
    return jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl), shapes
    )


def _convert_payload(restored, template_subtree, to_scan: bool):
    """Convert a restored subtree back to the live layout, keeping the live
    template's shardings (conversion runs under jit with out_shardings)."""
    import functools

    mesh = _tree_mesh(template_subtree)
    fn = functools.partial(_convert_layout_anywhere, to_scan=to_scan)
    if mesh is None:
        return fn(restored)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    out_sh = jax.tree_util.tree_map(
        lambda a: a.sharding
        if isinstance(getattr(a, "sharding", None), jax.sharding.NamedSharding)
        else repl,
        template_subtree,
    )
    return jax.jit(fn, out_shardings=out_sh)(restored)


def _dict_key_paths(tree, prefix="") -> set:
    """All nested dict key paths ('params/pairs/block0/...') in a tree."""
    out = set()
    if isinstance(tree, dict):
        for k, v in tree.items():
            kp = f"{prefix}/{k}" if prefix else str(k)
            out.add(kp)
            out |= _dict_key_paths(v, kp)
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            out |= _dict_key_paths(v, f"{prefix}[{i}]")
    return out


def _leaf_paths(tree, prefix="") -> set:
    """Paths of array leaves only, in orbax's naming: namedtuples by FIELD
    NAME, plain tuples/lists by index. Empty optax states (EmptyState etc.)
    have no leaves and orbax metadata represents them as None/absent, so
    only leaf paths are comparable between a live template and the on-disk
    metadata tree (container paths are not)."""
    out = set()
    if isinstance(tree, dict):
        for k, v in tree.items():
            kp = f"{prefix}/{k}" if prefix else str(k)
            out |= _leaf_paths(v, kp)
    elif hasattr(tree, "_fields"):  # namedtuple (optax states)
        for name, v in zip(tree._fields, tree):
            kp = f"{prefix}/{name}" if prefix else str(name)
            out |= _leaf_paths(v, kp)
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            out |= _leaf_paths(v, f"{prefix}[{i}]")
    elif tree is not None:
        out.add(prefix)
    return out


def _is_scan_layout(key_paths: set) -> bool:
    return any(kp.split("/")[-1] == "pairs" for kp in key_paths)


def restore_checkpoint(
    path: str,
    state,
    resuming: bool,
    scheduler_template: Optional[dict] = None,
) -> Dict[str, Any]:
    """Restore a checkpoint into a state template, sharded onto its mesh.

    Returns {'state': TrainState, 'epoch': int, 'step_in_epoch': int
    [, 'scheduler': dict]}. With
    ``resuming`` False (the finetune path) only the parameters are loaded;
    the optimizer state and counters keep their freshly-initialized values
    (reference ``train.py:390-393`` gates exactly these fields on
    ``resuming``). The template's arrays keep their live shardings, so
    restore lands directly on the current mesh.

    The on-disk structure is inspected FIRST (orbax metadata): a
    scan<->unrolled block-layout mismatch restores through a
    layout-converted template; any other template key missing from disk
    raises instead of being silently filled from the fresh-init template
    (``partial_restore`` would otherwise mask e.g. a depth mismatch as a
    "successful" restore of untrained weights).
    """
    template = {
        "iters": state.step,
        "epoch": np.asarray(0),
        "step_in_epoch": np.asarray(0),
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if scheduler_template:
        template["scheduler"] = {
            k: np.asarray(v) for k, v in scheduler_template.items()
        }

    def _restore(ckptr, item):
        # ArrayRestoreArgs carrying each leaf's live sharding => restore
        # lands sharded on the current mesh, no host gather. partial_restore
        # only tolerates keys the coverage check below has already vetted
        # (e.g. the finetune path never asks for the saved scheduler state).
        restore_args = ocp.checkpoint_utils.construct_restore_args(item)
        return ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(
                item=item, restore_args=restore_args, partial_restore=True
            ),
        )

    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        disk_tree = ckptr.metadata(path).item_metadata.tree
        disk_paths = _dict_key_paths(disk_tree)
        if "scheduler" in template and "scheduler" not in disk_paths:
            template.pop("scheduler")  # checkpoint predates scheduler state
        if "step_in_epoch" not in disk_paths:
            template.pop("step_in_epoch")  # checkpoint predates preemption saves

        live_scan = _is_scan_layout(_dict_key_paths(template["params"]))
        disk_scan = _is_scan_layout(
            {kp for kp in disk_paths if kp.startswith("params")}
        )
        convert = live_scan != disk_scan
        # request only what this restore mode consumes: the finetune path
        # (resuming=False) loads weights alone, so a missing/mismatched
        # optimizer state on disk cannot block it
        request = {
            "params": _convert_request_template(template["params"], disk_scan)
            if convert
            else template["params"]
        }
        if resuming:
            request["iters"] = template["iters"]
            request["epoch"] = template["epoch"]
            if "step_in_epoch" in template:
                request["step_in_epoch"] = template["step_in_epoch"]
            request["opt_state"] = (
                _convert_request_template(template["opt_state"], disk_scan)
                if convert
                else template["opt_state"]
            )
            if "scheduler" in template:
                request["scheduler"] = template["scheduler"]

        # every requested LEAF must exist on disk — otherwise orbax's
        # partial_restore would silently substitute fresh-init values
        missing = _leaf_paths(request) - _leaf_paths(disk_tree)
        if missing:
            raise ValueError(
                f"checkpoint at {path} is missing requested keys "
                f"{sorted(missing)[:8]}{'...' if len(missing) > 8 else ''} — "
                "refusing a partial restore"
            )
        payload = _restore(ckptr, request)
        if convert:
            payload["params"] = _convert_payload(
                payload["params"], template["params"], live_scan
            )
            if resuming:
                payload["opt_state"] = _convert_payload(
                    payload["opt_state"], template["opt_state"], live_scan
                )

    new_state = state.replace(params=payload["params"])
    out: Dict[str, Any] = {"epoch": 0}
    if resuming:
        new_state = new_state.replace(
            step=jax.numpy.asarray(payload["iters"]), opt_state=payload["opt_state"]
        )
        out["epoch"] = int(payload["epoch"])
        out["step_in_epoch"] = int(payload.get("step_in_epoch", 0))
        if "scheduler" in payload:
            out["scheduler"] = {k: float(v) for k, v in payload["scheduler"].items()}
    out["state"] = new_state
    return out


def latest_checkpoint_exists(path: str) -> bool:
    """A finished orbax checkpoint directory (atomic rename => no tmp suffix)."""
    return os.path.isdir(path) and bool(os.listdir(path))
