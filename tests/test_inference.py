"""Inference engine tests: rollout stepping, registry export/load roundtrip,
scoring (RMSE/ACC) against analytically-known fields."""

import datetime
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swin_v2_weather_tpu.config.yparams import YParams, default_config_path
from swin_v2_weather_tpu.inference.registry import export_model, load_model, swin_from_yaml
from swin_v2_weather_tpu.inference.rollout import RolloutEngine
from swin_v2_weather_tpu.inference.scoring import acc_against_climatology, score_rollout
from swin_v2_weather_tpu.ops.metrics import latitude_weights_np


def trained_exp(tmp_path):
    """Train the micro config for 1 epoch; return (params, exp_dir)."""
    from swin_v2_weather_tpu.training.trainer import Trainer

    p = YParams(default_config_path(), "swin_micro_test")
    p["exp_dir"] = str(tmp_path)
    p["max_epochs"] = 1
    p["n_synthetic_samples"] = 8
    p["batch_size"] = 8
    t = Trainer(p, "swin_micro_test", run_num="r")
    t.build_and_launch()
    return p, p["experiment_dir"]


class TestRegistryRoundtrip:
    def test_export_load_forward_identical(self, tmp_path):
        p, exp_dir = trained_exp(tmp_path)
        reg = export_model(exp_dir, str(tmp_path / "registry"))
        assert os.path.exists(os.path.join(reg, "metadata.json"))
        assert os.path.exists(os.path.join(reg, "hyperparams.yaml"))

        model, variables, rp = load_model(reg)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (1, int(rp["n_in_channels"]), 24, 48)
            ),
            jnp.float32,
        )
        y = model.apply(variables, x, train=False)
        assert y.shape == (1, 4, 24, 48)
        assert np.isfinite(np.asarray(y)).all()

    def test_swin_from_yaml(self, tmp_path):
        p, exp_dir = trained_exp(tmp_path)
        model, rp = swin_from_yaml(os.path.join(exp_dir, "hyperparams.yaml"))
        assert int(rp["n_in_channels"]) == 4 + 1 + 2 + 1


class TestRolloutEngine:
    def test_steps_and_shapes(self, tmp_path):
        p, exp_dir = trained_exp(tmp_path)
        reg = export_model(exp_dir, str(tmp_path / "registry"))
        model, variables, rp = load_model(reg)
        engine = RolloutEngine(rp, model, variables)

        ic = np.random.default_rng(1).standard_normal((1, 4, 24, 48)).astype(np.float32)
        t0 = datetime.datetime(2018, 1, 1)
        preds = engine.rollout(ic, t0, n_steps=3)
        assert preds.shape == (3, 1, 4, 24, 48)
        assert np.isfinite(preds).all()
        # autoregression: step 2 differs from step 1
        assert not np.allclose(preds[0], preds[1])

    def test_scanned_rollout_matches_host_stepped(self, tmp_path):
        """rollout_scanned (lax.scan, one compiled program, precomputed
        zenith stack) reproduces the host-stepped rollout exactly —
        including the keep_channels slicing."""
        p, exp_dir = trained_exp(tmp_path)
        reg = export_model(exp_dir, str(tmp_path / "registry"))
        model, variables, rp = load_model(reg)
        engine = RolloutEngine(rp, model, variables)

        ic = np.random.default_rng(2).standard_normal((1, 4, 24, 48)).astype(np.float32)
        t0 = datetime.datetime(2018, 3, 15, 6)
        host = engine.rollout(ic, t0, n_steps=4)
        scanned = np.asarray(engine.rollout_scanned(ic, t0, n_steps=4))
        np.testing.assert_allclose(scanned, host, atol=1e-6)

        host_k = engine.rollout(ic, t0, n_steps=4, keep_channels=[0, 2])
        scanned_k = np.asarray(
            engine.rollout_scanned(ic, t0, n_steps=4, keep_channels=[0, 2])
        )
        assert scanned_k.shape == (4, 1, 2, 24, 48)
        np.testing.assert_allclose(scanned_k, host_k, atol=1e-6)

    def test_rollout_matches_manual_feedback(self, tmp_path):
        """One engine step == manually assembling [state, zen, static]."""
        p, exp_dir = trained_exp(tmp_path)
        reg = export_model(exp_dir, str(tmp_path / "registry"))
        model, variables, rp = load_model(reg)
        engine = RolloutEngine(rp, model, variables)
        ic = np.random.default_rng(1).standard_normal((1, 4, 24, 48)).astype(np.float32)
        t0 = datetime.datetime(2018, 6, 1, 12)

        pred = next(engine.steps(jnp.asarray(ic), t0, 1))

        from swin_v2_weather_tpu.data.conditioning import static_features

        zen = engine.zenith_at(t0)
        static = static_features(rp)[None]
        inp = np.concatenate([ic, zen, static], axis=1)
        # compare jitted-vs-jitted: eager bf16 rounding differs harmlessly
        ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.asarray(inp)
        )
        np.testing.assert_allclose(np.asarray(pred), np.asarray(ref), atol=1e-6)


class TestScoring:
    def test_acc_of_identical_anomalies_is_one(self, rng):
        clim = rng.standard_normal((3, 16, 32)).astype(np.float32)
        anom = rng.standard_normal((2, 3, 16, 32)).astype(np.float32)
        field = anom + clim[None]
        acc = acc_against_climatology(field, field, clim[None])
        np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-5)

    def test_acc_of_orthogonal_anomalies_is_zero(self):
        h, w = 16, 32
        clim = np.zeros((1, 1, h, w), np.float32)
        x = np.linspace(0, 2 * np.pi, w, endpoint=False)
        a = np.broadcast_to(np.sin(x), (1, 1, h, w)).astype(np.float32)
        b = np.broadcast_to(np.cos(x), (1, 1, h, w)).astype(np.float32)
        acc = acc_against_climatology(a, b, clim)
        np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-5)

    def test_score_rollout_output(self, tmp_path):
        p, exp_dir = trained_exp(tmp_path)
        reg = export_model(exp_dir, str(tmp_path / "registry"))
        model, variables, rp = load_model(reg)
        engine = RolloutEngine(rp, model, variables)
        rng = np.random.default_rng(2)
        ic = rng.standard_normal((1, 4, 24, 48)).astype(np.float32)
        targets = [rng.standard_normal((1, 4, 24, 48)).astype(np.float32) for _ in range(3)]
        out = score_rollout(
            engine, ic, targets, datetime.datetime(2018, 1, 1),
            means=np.zeros(4), stds=np.ones(4),
            climatology=np.zeros((4, 24, 48), np.float32),
            channel_names=["u10m", "v10m", "t2m", "z500"],
        )
        assert out["rmse"].shape == (3, 4)
        assert out["acc"].shape == (3, 4)
        np.testing.assert_array_equal(out["lead_hours"], [6, 12, 18])
        assert np.isfinite(out["rmse"]).all()


class TestServingExport:
    def test_stablehlo_roundtrip_matches_engine(self, tmp_path):
        """export_stepper -> load_stepper reproduces the live engine step
        bit-for-bit, with weights baked into the artifact (no model code or
        checkpoint needed at serving time)."""
        from swin_v2_weather_tpu.inference.export import export_stepper, load_stepper

        p, exp_dir = trained_exp(tmp_path)
        reg = export_model(exp_dir, str(tmp_path / "registry"))
        model, variables, rp = load_model(reg)
        engine = RolloutEngine(rp, model, variables)

        art = str(tmp_path / "served")
        manifest = export_stepper(engine, art, batch=2)
        assert os.path.exists(os.path.join(art, "stepper.bin"))
        assert manifest["inputs"][0]["shape"] == [2, 4, 24, 48]
        assert manifest["add_zenith"] is True

        stepper = load_stepper(art)
        rng = np.random.default_rng(3)
        state = rng.standard_normal((2, 4, 24, 48)).astype(np.float32)
        t0 = datetime.datetime(2018, 6, 1, 12)
        zen = np.broadcast_to(engine.zenith_at(t0), (2, 1, 24, 48)).astype(np.float32)

        got = np.asarray(stepper(state, zen))
        want = np.asarray(engine._step(variables, jnp.asarray(state), jnp.asarray(zen)))
        np.testing.assert_array_equal(got, want)

    def test_artifact_requires_zenith_when_exported_with_it(self, tmp_path):
        from swin_v2_weather_tpu.inference.export import export_stepper, load_stepper

        p, exp_dir = trained_exp(tmp_path)
        reg = export_model(exp_dir, str(tmp_path / "registry"))
        model, variables, rp = load_model(reg)
        engine = RolloutEngine(rp, model, variables)
        art = str(tmp_path / "served")
        export_stepper(engine, art, batch=1)
        stepper = load_stepper(art)
        with pytest.raises(ValueError, match="zenith"):
            stepper(np.zeros((1, 4, 24, 48), np.float32))


class TestScannedScoring:
    def test_scanned_matches_host_stepped(self, tmp_path):
        """score_rollout(scanned=True) — chunked lax.scan with carried state,
        including a ragged tail chunk — reproduces the host-stepped scores."""
        p, exp_dir = trained_exp(tmp_path)
        reg = export_model(exp_dir, str(tmp_path / "registry"))
        model, variables, rp = load_model(reg)
        engine = RolloutEngine(rp, model, variables)

        rng = np.random.default_rng(5)
        ic = rng.standard_normal((1, 4, 24, 48)).astype(np.float32)
        tars = [rng.standard_normal((1, 4, 24, 48)).astype(np.float32) for _ in range(5)]
        t0 = datetime.datetime(2018, 3, 1)
        means = np.zeros((4, 1, 1), np.float32)
        stds = np.ones((4, 1, 1), np.float32)
        clim = np.zeros((4, 24, 48), np.float32)

        host = score_rollout(engine, ic, tars, t0, means=means, stds=stds, climatology=clim)
        scan = score_rollout(
            engine, ic, tars, t0, means=means, stds=stds, climatology=clim,
            scanned=True, chunk=2,  # 5 steps -> chunks of 2, 2, 1 (ragged tail)
        )
        np.testing.assert_allclose(scan["rmse"], host["rmse"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(scan["acc"], host["acc"], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(scan["lead_hours"], host["lead_hours"])
