"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device tests run against XLA's host-platform device partitioning
(the TPU-world equivalent of a fake distributed backend, per SURVEY.md §4):
JAX sees 8 CPU devices, so shard_map / pjit paths compile and execute the
same collectives they would over a real pod's ICI.

Must run before jax initializes its backends, hence env vars at import time.
"""

import os
import sys

# the session environment pins JAX_PLATFORMS=axon (the real TPU tunnel) and a
# sitecustomize hook imports jax at interpreter start, so env vars alone are
# too late — override the live jax config as well
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (full-res models, end-to-end trainers, multi-process)",
    )
    config.addinivalue_line(
        "markers",
        "smoke: fast core tier (~5 min on one CPU): config/model/loss/metrics "
        "units + one tiny end-to-end train — run with `pytest -m smoke` for "
        "the quick red/green loop; the full non-slow suite stays the merge "
        "gate (VERDICT r3 next #9)",
    )


# The smoke tier (~4 min on one CPU): every layer once at toy size. Whole
# modules where the module is all sub-second units (config parsing,
# loss/metric/quadrature numerics, loader semantics); named picks from the
# minute-scale modules (each model/trainer test compiles a tiny model, so
# whole-module inclusion would blow the budget).
_SMOKE_MODULES = {
    "test_configs",
    "test_losses",
    "test_metrics",
    "test_quadrature",
    "test_zenith",
    "test_utils",
    "test_stats",
    "test_era5_dataset",
    "test_pipeline",
}
_SMOKE_TESTS = {
    # model: shapes, the lat-only mask law, rollout wrapper, grad health
    "test_forward_shape",
    "test_mask_matches_reference_algorithm",
    "test_multi_step_rollout_shape",
    "test_grads_finite",
    # training: schedule math, optimizer dispatch, one tiny end-to-end run
    "test_cosine_matches_torch_formula",
    "test_build_dispatch",
    "test_loss_decreases_and_artifacts",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1].removesuffix(".py")
        name = item.name.split("[", 1)[0]
        if "slow" in item.keywords:
            continue
        if mod in _SMOKE_MODULES or name in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)


def parity_record(name: str, payload: dict) -> None:
    """Append a parity measurement to $PARITY_REPORT (JSONL), if set.

    Used by the golden-parity tests so `scripts/parity_report.py` can turn a
    passing run into a machine-readable artifact (PARITY_rNN.json) carrying
    the actual deviations, not just pass/fail.
    """
    path = os.environ.get("PARITY_REPORT")
    if not path:
        return
    import json

    def clean(v):
        if isinstance(v, (list, tuple)):
            return [clean(x) for x in v]
        if isinstance(v, np.ndarray):
            return clean(v.tolist())
        if isinstance(v, (np.floating, np.integer)):
            return v.item()
        return v

    with open(path, "a") as f:
        f.write(json.dumps({"name": name, **{k: clean(v) for k, v in payload.items()}}) + "\n")


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture
def mesh8():
    from swin_v2_weather_tpu.parallel.mesh import make_mesh

    return make_mesh(None, devices=jax.devices()[:8])
