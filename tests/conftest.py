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


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture
def mesh8():
    from swin_v2_weather_tpu.parallel.mesh import make_mesh

    return make_mesh(None, devices=jax.devices()[:8])
