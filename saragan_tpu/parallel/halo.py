"""Spatial (halo) sharding of volumes across the 'space' mesh axis.

SURVEY §5.7: the reference's answer to >HBM-sized volumes was big-RAM CPU
nodes; the TPU-native answer is sharding a single volume's depth (D) axis
across chips.  Under GSPMD this is a *sharding annotation*, not hand-written
communication: annotating conv inputs/outputs with
``P('data', None, 'space', None, None)`` makes XLA's SPMD partitioner insert
the halo exchanges (neighbor ppermutes of kernel-radius-wide slabs) for
every 3x3x3 conv, in both the forward and the double-backward GP pass —
exactly the ring-neighbor pattern hand-rolled halo exchange would do, but
fused and scheduled by the compiler.

This module provides the annotation helpers plus an explicit
`shard_map`-based halo conv (reference implementation and teaching tool —
also the fallback if a future XLA regression mishandles some layout).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def volume_sharding(mesh: Mesh, ndim: int = 5, depth_axis: int = 2) -> NamedSharding:
    """Batch on 'data', depth on 'space' (and H on 'space2' when the mesh
    carries that axis — the 2D halo decomposition for pod-scale meshes).
    One implementation: delegates to mesh.batch_sharding so the production
    and halo/test paths cannot diverge."""
    from saragan_tpu.parallel.mesh import batch_sharding

    return batch_sharding(mesh, ndim, space_axis=depth_axis)


def with_spatial_sharding(mesh: Optional[Mesh], x: jax.Array, depth_axis: int = 2) -> jax.Array:
    """Constrain an activation to the volume sharding inside jit."""
    if mesh is None or (mesh.shape.get("space", 1) <= 1
                        and mesh.shape.get("space2", 1) <= 1):
        return x
    return lax.with_sharding_constraint(x, volume_sharding(mesh, x.ndim, depth_axis))


# ---------------------------------------------------------------------------
# Explicit halo-exchange conv (shard_map + ppermute), for reference/tests
# ---------------------------------------------------------------------------


def _halo_exchange_depth(x_local: jax.Array, radius: int, axis_name: str) -> jax.Array:
    """Append `radius` slabs from each depth-neighbor shard (edge shards pad
    with zeros, matching SAME conv zero-padding semantics)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    if x_local.shape[2] < radius:
        # a shard must hold at least `radius` slices — otherwise the halo
        # would need SECOND-neighbor exchanges; x[:, :, :radius] would
        # silently clamp and drop contributions
        raise ValueError(
            f"halo radius {radius} exceeds local shard depth "
            f"{x_local.shape[2]}; use fewer 'space' shards (or a smaller "
            f"kernel) so each shard holds >= radius slices"
        )

    # slabs to send: top `radius` to the left neighbor, bottom to the right
    top = x_local[:, :, :radius]
    bottom = x_local[:, :, -radius:]

    # receive bottom of the left neighbor / top of the right neighbor
    from_left = lax.ppermute(bottom, axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_right = lax.ppermute(top, axis_name, [(i, (i - 1) % n) for i in range(n)])

    zeros = jnp.zeros_like(top)
    from_left = jnp.where(idx == 0, zeros, from_left)
    from_right = jnp.where(idx == n - 1, zeros, from_right)
    return jnp.concatenate([from_left, x_local, from_right], axis=2)


def halo_conv3d(
    x: jax.Array,
    w: jax.Array,
    mesh: Mesh,
    *,
    depth_axis_name: str = "space",
) -> jax.Array:
    """SAME NCDHW conv with the D axis sharded over `depth_axis_name`.

    x: (N, C, D, H, W) GLOBAL array (sharded or to-be-sharded on D);
    w: (kd, kh, kw, in, out).  Only stride 1 / SAME, odd kd.
    """
    from jax import shard_map

    kd = w.shape[0]
    radius = kd // 2
    dn = lax.conv_dimension_numbers(
        (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NCDHW", "DHWIO", "NCDHW")
    )

    def local_conv(x_local, w_full):
        if radius > 0:
            x_ext = _halo_exchange_depth(x_local, radius, depth_axis_name)
        else:
            x_ext = x_local
        # depth now has its halo: convolve VALID on depth, SAME on H/W
        pads = [(0, 0), (w_full.shape[1] // 2,) * 2, (w_full.shape[2] // 2,) * 2]
        return lax.conv_general_dilated(
            x_ext, w_full, (1, 1, 1), pads, dimension_numbers=dn
        )

    # batch stays sharded over 'data' (when the mesh has that axis) — leaving
    # it unsharded would all-gather the batch and convolve redundantly on
    # every data shard
    batch_axis = "data" if "data" in mesh.axis_names else None
    spec_x = P(batch_axis, None, depth_axis_name, None, None)
    return shard_map(
        local_conv,
        mesh=mesh,
        in_specs=(spec_x, P()),
        out_specs=spec_x,
    )(x, w)
