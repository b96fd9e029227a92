"""Two-process jax.distributed test on one box (CPU backend).

Covers the multi-host branches that single-process tests cannot reach:
``init_distributed``'s coordinator path (parallel/mesh.py),
``broadcast_config`` (the reference's sweep-param ``broadcast_object_list``,
train.py:130-139), and ``device_prefetch``'s
``make_array_from_process_local_data`` stitch (data/pipeline.py).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NPROCS="2",
            PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        # each process must NOT inherit a conflicting device-count flag
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        procs.append(
            subprocess.Popen(
                [sys.executable, _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out (coordinator hang?)")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out, out
