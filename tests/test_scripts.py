"""Model-summary script and with_input_size resolution changes."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from swin_v2_weather_tpu.models.swin import SwinTransformerV2


class TestModelSummary:
    def test_abstract_summary_runs(self):
        out = subprocess.run(
            [sys.executable, "scripts/model_summary.py", "--config", "swin_micro_test",
             "--abstract"],
            capture_output=True, text=True, timeout=300,
            env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/opt/venv/bin"},
        )
        assert out.returncode == 0, out.stderr[-500:]
        assert "TOTAL" in out.stdout
        assert "pos_embed" in out.stdout


class TestWithInputSize:
    def test_resolution_change_reuses_params(self):
        kw = dict(
            img_size=(24, 48), patch_size=2, in_chans=5, out_chans=4, embed_dim=32,
            depth=2, num_heads=2, img_window_ratio=8, full_pos_embed=False,
            rel_pos=False, residual=True, dtype=jnp.float32,
        )
        m = SwinTransformerV2(**kw)
        x = jnp.ones((1, 5, 24, 48))
        params = m.init(jax.random.key(0), x)

        m2 = m.with_input_size((48, 96))
        x2 = jnp.ones((1, 5, 48, 96))
        # without full_pos_embed, all params carry over to the new resolution
        y2 = m2.apply(params, x2)
        assert y2.shape == (1, 4, 48, 96)
        assert np.isfinite(np.asarray(y2)).all()

    def test_window_rederived(self):
        m = SwinTransformerV2(
            img_size=(24, 48), patch_size=2, in_chans=5, out_chans=4, embed_dim=32,
            depth=2, num_heads=2, img_window_ratio=8,
        )
        assert m._window() == (3, 6)
        m2 = m.with_input_size((48, 96))
        assert m2._window() == (6, 12)
        m3 = m.with_input_size((48, 96), window_ratio=16)
        assert m3._window() == (3, 6)


class TestTrainCliOverrides:
    def test_set_flag_parses_yaml_values(self, monkeypatch, tmp_path):
        """--set KEY=VALUE overrides are yaml-parsed onto the config before
        the Trainer is constructed."""
        import train as train_mod

        captured = {}

        class FakeTrainer:
            def __init__(self, params, config, run_num="00", sweep_id=None):
                captured["params"] = params
                self.is_chief = True

            def build_and_launch(self):
                captured["launched"] = True

        monkeypatch.setattr(train_mod, "Trainer", FakeTrainer)
        monkeypatch.setattr(
            sys, "argv",
            ["train.py", "--config=swin_micro_test",
             "--set", "batch_size=16", "--set", "attn_impl=pallas_qkv",
             "--set", "mesh_shape=[4, 2]", "--set", "shard_opt_state=true"],
        )
        train_mod.main()
        p = captured["params"]
        assert captured["launched"]
        assert p["batch_size"] == 16
        assert p["attn_impl"] == "pallas_qkv"
        assert list(p["mesh_shape"]) == [4, 2]
        assert p["shard_opt_state"] is True

    def test_set_flag_rejects_malformed(self, monkeypatch):
        import pytest

        import train as train_mod

        monkeypatch.setattr(sys, "argv", ["train.py", "--set", "novalue"])
        with pytest.raises(SystemExit):
            train_mod.main()

    def test_enable_amp_flag_forces_bf16(self, monkeypatch):
        """--enable_amp (reference train.py:400 compat): forces bf16 compute
        even when a --set override asked for fp32."""
        import train as train_mod

        captured = {}

        class FakeTrainer:
            def __init__(self, params, config, run_num="00", sweep_id=None):
                captured["params"] = params
                self.is_chief = True

            def build_and_launch(self):
                pass

        monkeypatch.setattr(train_mod, "Trainer", FakeTrainer)
        monkeypatch.setattr(
            sys, "argv",
            ["train.py", "--config=swin_micro_test", "--enable_amp",
             "--set", "compute_dtype=float32"],
        )
        train_mod.main()
        assert captured["params"]["compute_dtype"] == "bfloat16"
