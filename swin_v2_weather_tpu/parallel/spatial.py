"""Spatial (sequence) parallelism: shard the latitude axis over the mesh.

The reference needs only data parallelism for parity (SURVEY §2c); spatial
sharding is the TPU-native headroom story past 1 sample/chip: the H axis of
the [B, H, W, C] activation grid is split over the ``model`` mesh axis, so
per-chip activation memory and window-attention work drop by the shard
count while weights stay replicated.

Why latitude and not longitude: SwinV2's windows are local in both axes,
and the only cross-window mixing inside a block is the cyclic shift roll
(reference ``networks/swinv2_global.py:446-478``). Longitude wraps
periodically (the lat-only mask, ``:403-424``) but the W-roll stays cheap
either way; sharding H keeps every window's [L, L] attention fully local to
one chip and turns the H-component of the shifted roll into a one-hop
``lax.ppermute`` halo exchange of ``shift_h`` rows — a few hundred KB over
ICI per block pair, overlapped by XLA with the window attention itself.

Used by running the model inside ``jax.shard_map`` with
``SwinTransformerV2.spatial_shards > 1`` (see ``spatial_forward``); blocks
then route their H-rolls through :func:`roll_h_sharded` and gate the
pole-boundary attention mask on the shard that owns the last window row.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def roll_h_sharded(x: jnp.ndarray, shift_h: int, axis_name: str) -> jnp.ndarray:
    """Global cyclic roll along the (sharded) H axis of local [B, Hl, W, C].

    Equivalent to ``jnp.roll(x_global, shift_h, axis=1)`` on the gathered
    array: only ``|shift_h|`` rows cross shard boundaries, exchanged with
    one neighbour via ``lax.ppermute``.
    """
    if shift_h == 0:
        return x
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return jnp.roll(x, shift_h, axis=1)
    if abs(shift_h) >= x.shape[1]:
        raise ValueError(f"halo roll supports |shift| < local rows, got {shift_h}")
    if shift_h < 0:
        # roll up: shard i's new rows = local[sh:] ++ (shard i+1)'s first sh
        sh = -shift_h
        halo = x[:, :sh]
        recv = jax.lax.ppermute(
            halo, axis_name, [(i, (i - 1) % n) for i in range(n)]
        )
        return jnp.concatenate([x[:, sh:], recv], axis=1)
    # roll down: shard i's new rows = (shard i-1)'s last sh ++ local[:-sh]
    sh = shift_h
    halo = x[:, -sh:]
    recv = jax.lax.ppermute(
        halo, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    return jnp.concatenate([recv, x[:, :-sh]], axis=1)


def spatial_forward(model, variables, x, mesh, axis_name: str = "model",
                    data_axis: str = "data", train: bool = False):
    """Run a ``spatial_shards>1`` model under shard_map over the mesh.

    ``x`` is the full NCHW batch (host or device); batch shards over
    ``data_axis`` and H over ``axis_name``; parameters are replicated.
    Returns the full NCHW output (same sharding).
    """
    n_sp = mesh.shape[axis_name]
    if int(model.spatial_shards) != n_sp:
        raise ValueError(
            f"model.spatial_shards={model.spatial_shards} != mesh[{axis_name}]={n_sp}"
        )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(data_axis, None, axis_name, None)),
        out_specs=P(data_axis, None, axis_name, None),
        check_vma=False,
    )
    def fwd(v, x_local):
        return model.apply(v, x_local, train=train)

    return fwd(variables, x)
