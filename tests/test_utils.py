"""Config system (YParams), metrics sink, profiling timer, vis utils."""

import json
import os

import numpy as np
import pytest

from swin_v2_weather_tpu.config.yparams import YParams, default_config_path
from swin_v2_weather_tpu.utils.metrics_sink import MetricsSink
from swin_v2_weather_tpu.utils.profiling import StepTimer
from swin_v2_weather_tpu.utils.img_utils import interpolate


class TestYParams:
    def test_load_flagship(self):
        p = YParams(default_config_path(), "swin_73var_geo_depth12_chweight_invar")
        assert p.embed_dim == 768
        assert p.depth == 12
        assert p["residual"] is True
        assert p.add_zenith is True
        assert len(p.channel_names) == 73
        # anchor inheritance from the base family
        assert p.patch_size == 4

    def test_none_coercion(self, tmp_path):
        f = tmp_path / "c.yaml"
        f.write_text("cfg:\n  a: 'None'\n  b: 5\n")
        p = YParams(str(f), "cfg")
        assert p.a is None
        assert p.b == 5

    def test_missing_config_raises(self):
        with pytest.raises(KeyError):
            YParams(default_config_path(), "no_such_config")

    def test_update_and_sync(self):
        p = YParams(default_config_path(), "swin_micro_test")
        p.update_params({"lr": 0.5, "new_key": "x"})
        assert p.lr == 0.5 and p["lr"] == 0.5
        assert p.new_key == "x"
        p.other = 7
        assert p["other"] == 7

    def test_to_dict_arrays(self):
        p = YParams(default_config_path(), "swin_micro_test")
        p["arr"] = np.arange(3)
        d = p.to_dict()
        assert d["arr"] == [0, 1, 2]

    def test_all_reference_config_families_present(self):
        import yaml

        with open(default_config_path()) as f:
            doc = yaml.safe_load(f)
        for name in [
            "swin_73var",
            "swin_73var_geo",
            "swin_73var_geo_depth12",
            "swin_73var_geo_depth12_chweight",
            "swin_73var_geo_depth12_chweight_invar",
            "swin_73var_geo_depth12_chweight_invar_rel",
            "swin_73var_geo_depth12_chweight_invar_direct",
            "swin_73var_geo_depth12_chweight_invar_2step",
            "swin_73var_geo_depth12_chweight_invar_2step_ep30",
            "swin_73var_geo_depth24_chweight_invar",
            "swin_73var_geo_depth24_e2048_mlp2_chweight_invar",
            "swin_73var_geo_depth12_chweight_invar_4step",
            "swin_73var_geo_depth12_chweight_invar_8step",
            "swin_73var_geo_depth12_chweight_invar_8step_int",
        ]:
            assert name in doc, name


class TestMetricsSink:
    def test_jsonl_roundtrip(self, tmp_path):
        sink = MetricsSink(str(tmp_path), enabled=True, use_wandb=False)
        sink.log({"loss": 1.5, "acc": np.float32(0.7)}, step=3)
        sink.log({"loss": 1.2}, step=4)
        sink.close()
        lines = [json.loads(l) for l in open(tmp_path / "logs.jsonl")]
        assert lines[0] == {"loss": 1.5, "acc": pytest.approx(0.7), "epoch": 3}
        assert lines[1]["epoch"] == 4

    def test_disabled_writes_nothing(self, tmp_path):
        sink = MetricsSink(str(tmp_path / "x"), enabled=False)
        sink.log({"a": 1})
        sink.close()
        assert not os.path.exists(tmp_path / "x" / "logs.jsonl")


class TestStepTimer:
    def test_stats(self):
        t = StepTimer()
        import time

        for _ in range(4):
            t.tick()
            time.sleep(0.01)
        stats = t.reset()
        assert 0.005 < stats["step_time_mean"] < 0.2
        assert stats["step_time_max"] >= stats["step_time_p50"]
        assert t.reset() == {}


class TestStepProfiler:
    def test_trace_window_writes_files(self, tmp_path):
        from swin_v2_weather_tpu.utils.profiling import StepProfiler

        class P(dict):
            __getattr__ = dict.get

        prof = StepProfiler(
            P(profile_num_steps=2, profile_start_step=1, profile_dir=str(tmp_path / "tr")),
            str(tmp_path),
        )
        import jax.numpy as jnp

        for step in range(5):
            prof.step(step)
            _ = jnp.ones((8, 8)) * 2  # some device work inside the window
        prof.close()
        assert prof._done
        files = list((tmp_path / "tr").rglob("*"))
        assert files, "no trace artifacts written"

    def test_disabled_by_default(self, tmp_path):
        from swin_v2_weather_tpu.utils.profiling import StepProfiler

        class P(dict):
            __getattr__ = dict.get

        prof = StepProfiler(P(), str(tmp_path))
        for step in range(3):
            prof.step(step)
        assert not prof.enabled


class TestInterpolate:
    def test_identity_scale(self, rng):
        x = rng.standard_normal((3, 8, 10))
        np.testing.assert_allclose(interpolate(x, 1.0), x, atol=1e-12)

    def test_upsample_constant(self):
        x = np.full((4, 6), 2.5)
        y = interpolate(x, 2.0)
        assert y.shape == (8, 12)
        np.testing.assert_allclose(y, 2.5, atol=1e-12)
