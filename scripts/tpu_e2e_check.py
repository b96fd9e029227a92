"""Full user journey on the real chip: train -> export -> rollout -> score.

The pytest suite drives the same path on the virtual CPU mesh
(tests/test_inference_cli.py); this script runs it against the attached
TPU: 1 micro-config epoch from a generated HDF5 archive, registry export,
model reload, a 4-step rollout for two initial conditions and RMSE/ACC
scoring. Run: python scripts/tpu_e2e_check.py [workdir]
"""

from __future__ import annotations

import argparse
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_e2e"
    os.makedirs(f"{root}/data/train", exist_ok=True)
    os.makedirs(f"{root}/data/test", exist_ok=True)
    os.makedirs(f"{root}/stats", exist_ok=True)
    rng = np.random.default_rng(0)
    for split, year in (("train", 2015), ("test", 2016)):
        with h5py.File(f"{root}/data/{split}/{year}.h5", "w") as f:
            f.create_dataset(
                "fields", data=rng.standard_normal((20, 4, 25, 48)).astype(np.float32)
            )
    np.save(f"{root}/stats/global_means.npy", np.zeros((1, 4, 1, 1), np.float32))
    np.save(f"{root}/stats/global_stds.npy", np.ones((1, 4, 1, 1), np.float32))
    np.save(f"{root}/stats/time_diff_stds.npy", np.ones((1, 4, 1, 1), np.float32))
    np.save(f"{root}/stats/time_means.npy", np.zeros((1, 4, 25, 48), np.float32))

    from swin_v2_weather_tpu.config.yparams import YParams, default_config_path
    from swin_v2_weather_tpu.inference.cli import run as cli_run
    from swin_v2_weather_tpu.inference.registry import export_model
    from swin_v2_weather_tpu.training.trainer import Trainer

    p = YParams(default_config_path(), "swin_micro_test")
    p["exp_dir"] = f"{root}/runs"
    p["max_epochs"] = 1
    p["batch_size"] = 4
    p["data_loader_config"] = "threaded"
    p["train_data_path"] = f"{root}/data/train"
    p["valid_data_path"] = f"{root}/data/test"
    for key in ("global_means", "global_stds", "time_diff_stds", "time_means"):
        p[f"{key}_path"] = f"{root}/stats/{key}.npy"
    Trainer(p, "swin_micro_test", run_num="e2e").build_and_launch()
    reg = export_model(p["experiment_dir"], f"{root}/registry")

    out = cli_run(
        argparse.Namespace(
            registry=reg, data=f"{root}/data/test", ics=[0, 4], steps=4,
            output=f"{root}/scores.json",
        )
    )
    import jax

    rmse = np.asarray(out["rmse"])
    acc = np.asarray(out["acc"])
    assert rmse.shape[0] == 4 and np.all(np.isfinite(rmse))
    print(
        f"E2E ON {jax.devices()[0].platform.upper()} OK: "
        f"rmse {rmse.shape}, acc {acc.shape}, leads {list(out['lead_hours'])}"
    )


if __name__ == "__main__":
    main()
