"""Device mesh + sharding layer — the TPU-native replacement for NCCL/DDP.

The reference's entire distributed runtime is a NCCL process group plus
torch DDP gradient hooks (reference ``train.py:65-66,186-190``). On TPU none
of that machinery exists as a separate runtime: parallelism is expressed as
a ``jax.sharding.Mesh`` over the chips plus sharding annotations on the
jitted train step, and XLA inserts the collectives (gradient ``psum`` over
ICI, with latency-hiding overlap — the role DDP's bucketed allreduce plays)
during compilation.

Mesh axes:
  * ``data``  — data parallelism (the reference's only strategy, SURVEY §2c).
  * ``model`` — reserved for tensor/spatial sharding extensions; 1 by
    default so a data-only mesh and a future 2-D mesh share code paths.

Multi-host: call :func:`init_distributed` once per process before touching
devices (the ``jax.distributed.initialize`` analog of the reference's
``init_process_group``, driven by the same kind of launcher-provided env).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def init_distributed(params=None) -> Tuple[int, int]:
    """Initialize multi-process JAX if a coordinator is configured.

    Returns (process_index, process_count). Single-process runs (including
    one host driving a whole TPU slice) need no initialization at all —
    unlike NCCL, single-host multi-chip needs no process group.
    """
    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("NPROCS") or os.environ.get("WORLD_SIZE")
    pid = os.environ.get("PROCESS_ID") or os.environ.get("RANK")
    if coord and nproc and int(nproc) > 1:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=int(nproc), process_id=int(pid or 0)
        )
        logger.info(
            "jax.distributed initialized: process %d/%d", jax.process_index(), jax.process_count()
        )
    return jax.process_index(), jax.process_count()


def broadcast_config(cfg: Optional[dict]) -> dict:
    """Broadcast a plain config dict from process 0 to every process.

    The HPO-sweep analog of the reference's ``broadcast_object_list``
    (``train.py:130-139``): the wandb agent mutates params on the chief
    only, and every other process must train with the same mutated config.
    JSON-serialized and shipped as a uint8 array via
    ``multihost_utils.broadcast_one_to_all`` (length first, then payload,
    since all processes must present identical shapes). Identity on a
    single process.
    """
    import json

    if jax.process_count() == 1:
        return dict(cfg or {})
    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        payload = np.frombuffer(json.dumps(cfg, default=str).encode(), np.uint8)
    else:
        payload = np.zeros((0,), np.uint8)
    n = int(multihost_utils.broadcast_one_to_all(np.int64(payload.size)))
    buf = np.zeros(n, np.uint8)
    if jax.process_index() == 0:
        buf[:] = payload[:n]
    # non-chief contents are ignored by broadcast_one_to_all; only the
    # shape must match (a non-chief passing its own longer cfg must not
    # attempt a mismatched slice assignment)
    out = multihost_utils.broadcast_one_to_all(buf)
    return json.loads(np.asarray(out).tobytes().decode())


def hybrid_device_order(devices) -> np.ndarray:
    """Order devices slice-major for multi-slice (ICI + DCN) topologies.

    On a multi-slice TPU deployment ``jax.devices()`` carries a
    ``slice_index`` per device; chips within a slice share ICI while
    cross-slice traffic rides DCN. Laying the mesh's data axis out
    slice-major (all of slice 0, then all of slice 1, ...) makes every
    collective's innermost phase ICI-local, so XLA's hierarchical
    allreduce does one cheap per-slice reduce-scatter over ICI plus one
    small cross-slice exchange over DCN — the same locality the reference
    gets from NCCL's intra-node NVLink rings + `NCCL_NET_GDR_LEVEL=PHB`
    tuning (reference ``submit_batch.sh:11,21``).

    Single-slice (or CPU/virtual) devices have no ``slice_index`` and this
    is the identity order. Raises if slices are unequally sized (a mesh
    cannot tile a ragged topology).
    """
    devices = list(devices)
    keys = [getattr(d, "slice_index", None) for d in devices]
    if all(k is None for k in keys):
        return np.asarray(devices)
    groups: dict = {}
    for d, k in zip(devices, keys):
        groups.setdefault(0 if k is None else int(k), []).append(d)
    sizes = {len(g) for g in groups.values()}
    if len(sizes) != 1:
        raise ValueError(
            f"unequal slice sizes {sorted((k, len(g)) for k, g in groups.items())}: "
            "a rectangular mesh cannot tile a ragged multi-slice topology"
        )
    ordered = []
    for k in sorted(groups):
        # keep jax's ICI-contiguous order within each slice
        ordered.extend(groups[k])
    return np.asarray(ordered)


def make_mesh(
    params=None,
    devices=None,
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Build the (data, model) mesh.

    ``mesh_shape: 'auto'`` (the default) puts every visible device on the
    data axis. An explicit ``[dp, mp]`` list in the config selects a 2-D
    layout; device order follows ``jax.devices()``, which is already
    ICI-contiguous on TPU slices. Multi-slice deployments are reordered
    slice-major (:func:`hybrid_device_order`) so the model axis — the
    high-traffic one (spatial halos, FSDP gathers) — never straddles DCN
    and gradient allreduces decompose hierarchically (ICI first, then one
    cross-slice DCN hop).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)

    shape = getattr(params, "mesh_shape", "auto") if params is not None else "auto"
    if data_parallel is None:
        if isinstance(shape, (list, tuple)) and len(shape) == 2:
            data_parallel, model_parallel = int(shape[0]), int(shape[1])
        else:
            data_parallel, model_parallel = n, 1
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} does not cover {n} devices"
        )
    ordered = hybrid_device_order(devices)
    if model_parallel > 1 and len({getattr(d, "slice_index", 0) or 0 for d in devices}) > 1:
        # model axis must stay inside one slice: with slice-major order the
        # minor mesh dim is ICI-local iff the slice size divides by mp
        slice_size = n // len({getattr(d, "slice_index", 0) or 0 for d in devices})
        if slice_size % model_parallel != 0:
            raise ValueError(
                f"model_parallel={model_parallel} does not divide the slice size "
                f"{slice_size}; the model axis would straddle DCN"
            )
    dev_array = ordered.reshape(data_parallel, model_parallel)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for [B, ...] arrays: batch split over the data axis.

    ``spatial=True`` additionally splits dim 2 (H of NCHW batches) over the
    model axis — the layout for spatially-sharded training
    (parallel/spatial.py).
    """
    if spatial:
        return NamedSharding(mesh, P("data", None, "model"))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())
