"""Model-registry artifacts: export after training, load for inference.

The reference publishes trained models as a registry directory
(``README.md:32-44``):

    registry/<name>/
      weights.tar          - model weights
      hyperparams.yaml     - the dumped training config
      global_means.npy     - normalization stats
      global_stds.npy
      metadata.json        - channel names, grid info

and rebuilds the model from the dumped config via ``swin_from_yaml``
(``networks/swinv2_global.py:47-54``). This module reproduces that artifact
contract TPU-natively: weights are an orbax checkpoint directory (sharded,
restore-anywhere) named ``weights`` instead of a torch ``weights.tar``.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional, Tuple

import numpy as np
import yaml

import orbax.checkpoint as ocp


class _DictParams(dict):
    """Attribute/dict hybrid over a plain config dict (YParams-compatible)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def get(self, k, default=None):
        return dict.get(self, k, default)

    @property
    def params(self):
        return self


def export_model(
    experiment_dir: str,
    out_dir: str,
    checkpoint: str = "best_ckpt",
) -> str:
    """Export a trained experiment into a registry directory."""
    os.makedirs(out_dir, exist_ok=True)
    hp_path = os.path.join(experiment_dir, "hyperparams.yaml")
    with open(hp_path) as f:
        hp = yaml.safe_load(f)

    # weights: params subtree only
    ckpt_dir = os.path.join(experiment_dir, "training_checkpoints", checkpoint)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as c:
        payload = c.restore(ckpt_dir)
    weights_dir = os.path.join(os.path.abspath(out_dir), "weights")
    if os.path.isdir(weights_dir):
        shutil.rmtree(weights_dir)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as c:
        c.save(weights_dir, {"params": payload["params"]}, force=True)

    shutil.copy(hp_path, os.path.join(out_dir, "hyperparams.yaml"))
    for stats_key in ("global_means_path", "global_stds_path", "time_means_path"):
        src = hp.get(stats_key)
        if src and os.path.exists(str(src)):
            shutil.copy(src, os.path.join(out_dir, os.path.basename(str(src))))

    metadata = {
        "architecture": hp.get("nettype", "swin"),
        "n_history": 0,
        "channel_names": hp.get("channel_names"),
        "in_channels": hp.get("in_channels"),
        "out_channels": hp.get("out_channels"),
        "grid": [hp.get("img_size", [720, 1440])[0], hp.get("img_size", [720, 1440])[1]],
        "dt_hours": 6 * int(hp.get("dt", 1)),
        "add_zenith": bool(hp.get("add_zenith", False)),
        "add_orography": bool(hp.get("add_orography", False)),
        "add_landmask": bool(hp.get("add_landmask", False)),
    }
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2)
    return out_dir


def swin_from_yaml(yaml_path: str, dtype=None):
    """(model, params) from a dumped hyperparams.yaml.

    Reference ``networks/swinv2_global.py:47-54`` — the hook external
    consumers use to rebuild the network from a registry artifact.
    """
    from swin_v2_weather_tpu.data.preprocess import derived_channel_counts
    from swin_v2_weather_tpu.models.wrappers import get_model

    with open(yaml_path) as f:
        hp = yaml.safe_load(f)
    params = _DictParams(hp)
    params["in_channels"] = np.asarray(params["in_channels"])
    params["out_channels"] = np.asarray(params["out_channels"])
    if "n_in_channels" not in params:
        n_in, n_out = derived_channel_counts(params)
        params["n_in_channels"] = n_in
        params["n_out_channels"] = n_out
    # inference rebuilds the single-step core; multi-step wrapping and
    # spatial sharding are training-time constructs (an SP model needs the
    # train step's shard_map; the param tree is identical either way)
    params["n_future"] = 0
    params["spatial_shards"] = 1
    model = get_model(params, dtype=dtype)
    return model, params


def load_model(registry_dir: str, dtype=None) -> Tuple[object, dict, dict]:
    """(model, variables, params) from a registry directory."""
    model, params = swin_from_yaml(os.path.join(registry_dir, "hyperparams.yaml"), dtype=dtype)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as c:
        payload = c.restore(os.path.join(os.path.abspath(registry_dir), "weights"))
    variables = {"params": payload["params"]}
    # point stats paths at the registry copies when present
    for key in ("global_means_path", "global_stds_path", "time_means_path"):
        src = params.get(key)
        if src:
            local = os.path.join(registry_dir, os.path.basename(str(src)))
            if os.path.exists(local):
                params[key] = local
    return model, variables, params


def load_stats(params) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """(means[C_out], stds[C_out], time_means[C_out, H, W] or None)."""
    out_ch = np.asarray(params["out_channels"])
    means = np.load(params["global_means_path"])[0, out_ch, 0, 0]
    stds = np.load(params["global_stds_path"])[0, out_ch, 0, 0]
    tm = None
    tm_path = params.get("time_means_path")
    if tm_path and os.path.exists(str(tm_path)):
        tm = np.load(tm_path)[0, out_ch]
    return means, stds, tm
