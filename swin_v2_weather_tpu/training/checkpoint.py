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


def _save_payload(state, epoch: int, scheduler_state: Optional[dict]) -> dict:
    payload = {
        "iters": state.step,  # device arrays: orbax copies to host itself
        "epoch": np.asarray(epoch),
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

    def save(self, path: str, state, epoch: int, scheduler_state: Optional[dict] = None) -> None:
        self._ckptr.wait_until_finished()
        self._ckptr.save(
            path, args=ocp.args.PyTreeSave(_save_payload(state, epoch, scheduler_state)),
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
        if "pairs" in tree or any(re.fullmatch(r"block\d+", k) for k in tree):
            tree = convert_block_layout(tree, to_scan)
        return {k: _convert_layout_anywhere(v, to_scan) for k, v in tree.items()}
    if isinstance(tree, tuple):
        vals = [_convert_layout_anywhere(v, to_scan) for v in tree]
        return type(tree)(*vals)
    return tree


def _restore_other_layout(ckptr, _restore, template):
    """Restore a checkpoint whose blocks use the opposite scan layout."""
    live_is_scan = any(
        "pairs" in str(jax.tree_util.keystr(k))
        for k, _ in jax.tree_util.tree_leaves_with_path(template["params"])
    )
    t2 = dict(template)
    t2["params"] = _convert_layout_anywhere(template["params"], not live_is_scan)
    t2["opt_state"] = _convert_layout_anywhere(template["opt_state"], not live_is_scan)
    try:
        payload = _restore(ckptr, t2)
    except (KeyError, ValueError):
        t2.pop("scheduler", None)
        payload = _restore(ckptr, t2)
    payload["params"] = _convert_layout_anywhere(payload["params"], live_is_scan)
    payload["opt_state"] = _convert_layout_anywhere(payload["opt_state"], live_is_scan)
    return payload


def restore_checkpoint(
    path: str,
    state,
    resuming: bool,
    scheduler_template: Optional[dict] = None,
) -> Dict[str, Any]:
    """Restore a checkpoint into a state template, sharded onto its mesh.

    Returns {'state': TrainState, 'epoch': int[, 'scheduler': dict]}. With
    ``resuming`` False (the finetune path) only the parameters are loaded;
    the optimizer state and counters keep their freshly-initialized values
    (reference ``train.py:390-393`` gates exactly these fields on
    ``resuming``). The template's arrays keep their live shardings, so
    restore lands directly on the current mesh.
    """
    template = {
        "iters": state.step,
        "epoch": np.asarray(0),
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if scheduler_template:
        template["scheduler"] = {
            k: np.asarray(v) for k, v in scheduler_template.items()
        }
    def _restore(ckptr, item):
        # ArrayRestoreArgs carrying each leaf's live sharding => restore
        # lands sharded on the current mesh, no host gather. partial_restore:
        # ignore on-disk keys absent from the template (e.g. the finetune
        # path never asks for the saved scheduler state).
        restore_args = ocp.checkpoint_utils.construct_restore_args(item)
        return ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(
                item=item, restore_args=restore_args, partial_restore=True
            ),
        )

    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        try:
            payload = _restore(ckptr, template)
        except (KeyError, ValueError):
            try:
                # checkpoint written without scheduler state (older layout)
                t2 = dict(template)
                t2.pop("scheduler", None)
                payload = _restore(ckptr, t2)
            except (KeyError, ValueError):
                # scan_blocks layout mismatch: the checkpoint stores blocks
                # in the other layout (scanned 'pairs' stack vs unrolled
                # 'block{i}'). Restore through a converted template, then
                # convert the payload back to the live layout.
                payload = _restore_other_layout(ckptr, _restore, template)
    new_state = state.replace(params=payload["params"])
    out: Dict[str, Any] = {"epoch": 0}
    if resuming:
        new_state = new_state.replace(
            step=jax.numpy.asarray(payload["iters"]), opt_state=payload["opt_state"]
        )
        out["epoch"] = int(payload["epoch"])
        if "scheduler" in payload:
            out["scheduler"] = {k: float(v) for k, v in payload["scheduler"].items()}
    out["state"] = new_state
    return out


def latest_checkpoint_exists(path: str) -> bool:
    """A finished orbax checkpoint directory (atomic rename => no tmp suffix)."""
    return os.path.isdir(path) and bool(os.listdir(path))
