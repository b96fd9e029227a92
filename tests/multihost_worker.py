"""Worker for tests/test_multihost.py — one of two jax.distributed processes.

Exercises the real multi-host code paths on a single box (SURVEY.md §4's
"fake backend" strategy): the env-driven coordinator bootstrap in
``parallel.mesh.init_distributed``, the sweep-config broadcast
(``parallel.mesh.broadcast_config``), and the
``jax.make_array_from_process_local_data`` stitch in
``data.pipeline.device_prefetch``.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from swin_v2_weather_tpu.data.pipeline import device_prefetch
    from swin_v2_weather_tpu.parallel.mesh import broadcast_config, init_distributed, make_mesh

    pi, pc = init_distributed()
    assert pc == 2, f"expected 2 processes, got {pc}"
    assert jax.device_count() == 4, jax.device_count()

    # sweep broadcast: only the chief has the agent-mutated params
    cfg = {"lr": 0.01, "mutated": True} if pi == 0 else None
    out = broadcast_config(cfg)
    assert out == {"lr": 0.01, "mutated": True}, out

    # per-process local batch -> one global sharded array over the 4-dev mesh
    mesh = make_mesh(None)
    local = np.full((2, 3), pi, np.float32)
    batches = list(device_prefetch(iter([{"inp": local}]), mesh, depth=1))
    arr = batches[0]["inp"]
    assert arr.shape == (4, 3), arr.shape
    total = float(jax.jit(lambda a: jax.numpy.sum(a))(arr))
    assert total == 6.0, total  # rows of 0s from proc 0, 1s from proc 1

    print(f"WORKER_OK {pi}", flush=True)


if __name__ == "__main__":
    main()
