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


class TestBenchEmissionContract:
    """bench.py's r5 driver contract (VERDICT r4 next #1): flagship first,
    a complete JSON snapshot line flushed after EVERY family, and a
    wall-clock budget that skips remaining families instead of overrunning
    the driver timeout. Measurement is stubbed; this pins the emission and
    budget logic."""

    def _run_main(self, monkeypatch, capsys, family_seconds, env=None):
        import json as _json

        import bench

        for k, v in (env or {}).items():
            monkeypatch.setenv(k, v)

        clock = {"t": 0.0}

        def fake_perf_counter():
            return clock["t"]

        def fake_measure(params, bs, iters):
            clock["t"] += family_seconds
            return 0.5, 1, 10.0  # 500 ms/step, 1 rollout step, 10 GB peak

        monkeypatch.setattr(bench.time, "perf_counter", fake_perf_counter)
        monkeypatch.setattr(bench, "measure", fake_measure)
        monkeypatch.setattr(bench, "build_params", lambda cfg, ov: {
            "img_shape_x": 720, "img_shape_y": 1440, "patch_size": 4,
            "embed_dim": 768, "depth": 12, "n_in_channels": 77,
            "n_out_channels": 73, "window_ratio": 80, "mlp_ratio": 4.0,
        })
        monkeypatch.setattr(
            bench, "load_committed_rows",
            lambda: {"cpb_rel_pos": {"family": "cpb_rel_pos",
                                     "ms_step": 431.0, "mfu": 0.41}},
        )
        bench.main()
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.strip().startswith("{")]
        return [_json.loads(l) for l in lines]

    def test_every_line_is_complete_and_flagship_first(self, monkeypatch, capsys):
        snaps = self._run_main(monkeypatch, capsys, family_seconds=10.0,
                               env={"BENCH_BUDGET_S": "10000"})
        # one snapshot per family + the final line
        import bench as _b
        n_default = len([f for f in _b.FAMILIES if f[0] not in _b.DEFAULT_SKIP])
        assert len(snaps) == n_default + 1
        for s in snaps:
            assert s["metric"] == "flagship_train_throughput_single_step"
            assert s["value"] > 0  # flagship measured in the FIRST snapshot
            assert s["families"][0]["family"] == "flagship_1step"
            assert s["families"][0]["peak_hbm_gb"] == 10.0
        assert len(snaps[-1]["families"]) == n_default

    def test_budget_skips_remaining_families(self, monkeypatch, capsys):
        # each family "takes" 600 s; budget 900 -> flagship runs, the rest
        # are emitted as skipped — except families with a committed in-round
        # measurement, whose row is attached with an explicit "source"
        snaps = self._run_main(monkeypatch, capsys, family_seconds=600.0,
                               env={"BENCH_BUDGET_S": "900"})
        final = snaps[-1]
        assert final["value"] > 0
        fams = final["families"]
        assert fams[0]["family"] == "flagship_1step" and "ms_step" in fams[0]
        by_name = {f["family"]: f for f in fams[1:]}
        # the committed cpb row substitutes for the skip, provenance-labeled
        assert by_name["cpb_rel_pos"]["ms_step"] == 431.0
        assert "BENCH_FAMILIES_r05" in by_name["cpb_rel_pos"]["source"]
        assert all(f.get("skipped") == "budget"
                   for n, f in by_name.items() if n != "cpb_rel_pos")
        import bench as _b
        assert len(fams) == len([f for f in _b.FAMILIES if f[0] not in _b.DEFAULT_SKIP])

    def test_flagship_always_runs_even_over_budget(self, monkeypatch, capsys):
        snaps = self._run_main(monkeypatch, capsys, family_seconds=600.0,
                               env={"BENCH_BUDGET_S": "1"})
        assert snaps[0]["value"] > 0
        assert snaps[-1]["families"][0]["family"] == "flagship_1step"
        assert "ms_step" in snaps[-1]["families"][0]
