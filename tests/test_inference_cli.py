"""End-to-end inference CLI: train on generated HDF5 data, export a
registry, run the rollout scorer, validate the skill-curve output."""

import argparse
import json
import os

import h5py
import numpy as np
import pytest

from swin_v2_weather_tpu.config.yparams import YParams, default_config_path


@pytest.fixture(scope="module")
def registry_and_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    for split, years in [("train", (2015,)), ("test", (2017,))]:
        os.makedirs(root / "data" / split)
        for y in years:
            with h5py.File(root / "data" / split / f"{y}.h5", "w") as f:
                f.create_dataset(
                    "fields", data=rng.standard_normal((20, 4, 25, 48)).astype(np.float32)
                )
    os.makedirs(root / "stats")
    np.save(root / "stats" / "global_means.npy", np.zeros((1, 4, 1, 1), np.float32))
    np.save(root / "stats" / "global_stds.npy", np.ones((1, 4, 1, 1), np.float32))
    np.save(root / "stats" / "time_diff_stds.npy", np.ones((1, 4, 1, 1), np.float32))
    np.save(root / "stats" / "time_means.npy", np.zeros((1, 4, 25, 48), np.float32))

    from swin_v2_weather_tpu.inference.registry import export_model
    from swin_v2_weather_tpu.training.trainer import Trainer

    p = YParams(default_config_path(), "swin_micro_test")
    p["exp_dir"] = str(root / "runs")
    p["max_epochs"] = 1
    p["batch_size"] = 8
    p["data_loader_config"] = "threaded"
    p["train_data_path"] = str(root / "data" / "train")
    p["valid_data_path"] = str(root / "data" / "test")
    for key in ("global_means", "global_stds", "time_diff_stds", "time_means"):
        p[f"{key}_path"] = str(root / "stats" / f"{key}.npy")
    Trainer(p, "swin_micro_test", run_num="c").build_and_launch()
    reg = export_model(p["experiment_dir"], str(root / "registry"))
    return reg, str(root / "data" / "test"), root


class TestInferenceCli:
    def test_scores_shape_and_trim(self, registry_and_data):
        from swin_v2_weather_tpu.inference.cli import run as cli_run

        reg, data, root = registry_and_data
        args = argparse.Namespace(
            registry=reg, data=data, ics=[2, 15], steps=6, output=str(root / "s.json")
        )
        out = cli_run(args)
        # ic 15 hits the year end -> curves trimmed to the shortest rollout
        assert len(out["lead_hours"]) < 6
        assert out["lead_hours"][0] == 6
        rmse = np.asarray(out["rmse"])
        assert rmse.shape == (len(out["lead_hours"]), 4)
        assert np.isfinite(rmse).all()
        assert "acc" in out  # time_means.npy shipped in the registry
        assert out["n_ics"] == 2

    def test_dt2_start_time_is_frame_cadence(self, registry_and_data, tmp_path):
        """dt strides which frames become samples; the archive stays 6-hourly.

        Regression: the IC timestamp must be 6h * local FRAME index, not
        6h * dt * index (cf. data/era5.py zenith timestamps).
        """
        import shutil

        import yaml

        from swin_v2_weather_tpu.inference.cli import run as cli_run

        reg, data, root = registry_and_data
        reg2 = str(tmp_path / "registry_dt2")
        shutil.copytree(reg, reg2)
        hp = os.path.join(reg2, "hyperparams.yaml")
        with open(hp) as f:
            params = yaml.safe_load(f)
        params["dt"] = 2
        with open(hp, "w") as f:
            yaml.safe_dump(params, f)

        args = argparse.Namespace(
            registry=reg2, data=data, ics=[3], steps=2, output=str(tmp_path / "s.json")
        )
        out = cli_run(args)
        # each frame is a sample (dt strides targets only): sample 3 = frame 3
        # = 18h after Jan 1. The old bug computed 6h*dt*idx = 36h.
        assert out["ics"][0]["start_time"] == "2017-01-01T18:00:00"

    def test_read_output_frame_matches_getitem(self, registry_and_data):
        from swin_v2_weather_tpu.data.era5 import Era5Dataset

        reg, data, root = registry_and_data
        p = YParams(default_config_path(), "swin_micro_test")
        p["in_channels"] = np.asarray(p["in_channels"])
        p["out_channels"] = np.asarray(p["out_channels"])
        p["global_means_path"] = str(root / "stats" / "global_means.npy")
        p["global_stds_path"] = str(root / "stats" / "global_stds.npy")
        p["img_size"] = [24, 48]
        ds = Era5Dataset(p, data, train=False)
        year_idx, local = ds.locate(3)
        _, tar, _, _ = ds[3]
        frame = ds.read_output_frame(year_idx, local + 1)
        np.testing.assert_allclose(frame, tar, rtol=1e-6)

    def test_ensemble_flag_scores_crps_and_spread(self, registry_and_data, tmp_path):
        """--ensemble M runs the probabilistically scored ensemble rollout:
        skill curves carry CRPS/spread next to ensemble-mean RMSE/ACC."""
        from swin_v2_weather_tpu.inference.cli import run as cli_run

        reg, data, root = registry_and_data
        args = argparse.Namespace(
            registry=reg, data=data, ics=[2], steps=3,
            output=str(tmp_path / "e.json"), ensemble=5, perturb="gaussian",
            amplitude=0.05, zonal_truncation=8, seed=0, chunk_steps=2,
        )
        out = cli_run(args)
        assert out["n_members"] == 5
        for key in ("rmse", "acc", "crps", "spread", "rmse_control"):
            arr = np.asarray(out[key])
            assert arr.shape == (3, 4), key
            assert np.isfinite(arr).all(), key
        assert (np.asarray(out["spread"]) > 0).all()

    def test_save_forecast_writes_denormalized_fields(self, registry_and_data, tmp_path):
        """--save-forecast writes [T, C', H, W] physical fields + metadata;
        the saved fields match the scanned rollout denormalized."""
        from swin_v2_weather_tpu.inference.cli import run as cli_run

        reg, data, root = registry_and_data
        out_dir = str(tmp_path / "fields")
        args = argparse.Namespace(
            registry=reg, data=data, ics=[2], steps=3,
            output=str(tmp_path / "s.json"), save_forecast=out_dir,
            save_channels=None, scanned=True, chunk_steps=2,
        )
        cli_run(args)
        fields = np.load(os.path.join(out_dir, "ic000002.npy"))
        assert fields.shape == (3, 4, 24, 48)
        assert np.isfinite(fields).all()
        meta = json.load(open(os.path.join(out_dir, "ic000002.json")))
        assert meta["lead_hours"] == [6, 12, 18]
        assert len(meta["channels"]) == 4
        assert meta["start_time"].startswith("2017-01-01")

    def test_save_forecast_channel_subset_and_unknown(self, registry_and_data, tmp_path):
        from swin_v2_weather_tpu.config.yparams import YParams, default_config_path
        from swin_v2_weather_tpu.inference.registry import load_model, load_stats
        from swin_v2_weather_tpu.inference.rollout import RolloutEngine

        reg, data, root = registry_and_data
        model, variables, params = load_model(reg)
        means, stds, _ = load_stats(params)
        engine = RolloutEngine(params, model, variables)
        names = list(params["channel_names"])
        ic = np.random.default_rng(0).standard_normal((1, 4, 24, 48)).astype(np.float32)
        import datetime

        t0 = datetime.datetime(2018, 1, 1)
        path = engine.write_forecast(
            str(tmp_path / "sub"), ic, t0, 2, means, stds, names,
            keep_names=names[:2], ic_index=7, chunk=8,
        )
        assert np.load(path).shape == (2, 2, 24, 48)
        with pytest.raises(ValueError, match="unknown channels"):
            engine.write_forecast(
                str(tmp_path / "bad"), ic, t0, 1, means, stds, names,
                keep_names=["nope"],
            )

    def test_ensemble_bred_flag(self, registry_and_data, tmp_path):
        from swin_v2_weather_tpu.inference.cli import run as cli_run

        reg, data, root = registry_and_data
        args = argparse.Namespace(
            registry=reg, data=data, ics=[2], steps=2,
            output=str(tmp_path / "b.json"), ensemble=3, perturb="bred",
            amplitude=0.05, breed_cycles=2, zonal_truncation=8, seed=0,
            chunk_steps=4,
        )
        out = cli_run(args)
        assert out["n_members"] == 3
        assert np.isfinite(np.asarray(out["crps"])).all()

    def test_export_stepper_flag(self, registry_and_data, tmp_path, monkeypatch):
        """--export-stepper writes the serving artifact and skips scoring
        (no --data needed)."""
        import sys

        from swin_v2_weather_tpu.inference.cli import main as cli_main

        reg, data, root = registry_and_data
        art = str(tmp_path / "served")
        monkeypatch.setattr(
            sys, "argv",
            ["cli", "--registry", reg, "--export-stepper", art, "--batch", "1"],
        )
        cli_main()
        assert os.path.exists(os.path.join(art, "stepper.bin"))
        manifest = json.load(open(os.path.join(art, "manifest.json")))
        assert manifest["output"]["shape"] == [1, 4, 24, 48]

        from swin_v2_weather_tpu.inference.export import load_stepper

        stepper = load_stepper(art)
        out = stepper(
            np.zeros((1, 4, 24, 48), np.float32), np.zeros((1, 1, 24, 48), np.float32)
        )
        assert out.shape == (1, 4, 24, 48)
