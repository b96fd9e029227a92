"""Checkpoint save / restore / finetune / resume.

Reference semantics (``train.py:195-206, 374-393``): a single checkpoint
artifact holding ``{iters, epoch, model_state, optimizer_state}``, written
every epoch (plus ``best_ckpt`` on validation improvement); the *finetune*
path restores model weights only, while *resume* also restores the step
counter, epoch and optimizer state.

TPU-native implementation: orbax sharded checkpoints. Each checkpoint is a
directory (atomic rename on completion); restore re-shards arrays onto the
current mesh automatically, so checkpoints written on N chips restore on M.
Saves are async-capable but kept synchronous here for the reference's
blocking-save semantics; multi-host coordination is handled inside orbax.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer() -> ocp.Checkpointer:
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


def save_checkpoint(path: str, state, epoch: int) -> None:
    """Write {iters, epoch, params, opt_state} to ``path`` (a directory)."""
    payload = {
        "iters": np.asarray(state.step),
        "epoch": np.asarray(epoch),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
    }
    with _checkpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def restore_checkpoint(
    path: str,
    state,
    resuming: bool,
) -> Dict[str, Any]:
    """Restore a checkpoint into a state template.

    Returns {'state': TrainState, 'epoch': int}. With ``resuming`` False
    (the finetune path) only the parameters are loaded; the optimizer state
    and counters keep their freshly-initialized values (reference
    ``train.py:390-393`` gates exactly these fields on ``resuming``).
    """
    template = {
        "iters": np.asarray(state.step),
        "epoch": np.asarray(0),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
    }
    with _checkpointer() as ckptr:
        payload = ckptr.restore(path, args=ocp.args.PyTreeRestore(item=template))
    new_state = state.replace(params=payload["params"])
    epoch = 0
    if resuming:
        new_state = new_state.replace(
            step=jax.numpy.asarray(payload["iters"]), opt_state=payload["opt_state"]
        )
        epoch = int(payload["epoch"])
    return {"state": new_state, "epoch": epoch}


def latest_checkpoint_exists(path: str) -> bool:
    """A finished orbax checkpoint directory (atomic rename => no tmp suffix)."""
    return os.path.isdir(path) and bool(os.listdir(path))
