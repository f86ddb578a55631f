"""Device mesh + sharded train-step compilation.

TPU-native replacement for the reference's Horovod data parallelism
(SURVEY C29/C31, §5.8):

* `hvd.DistributedOptimizer` ring-allreduce  ->  the train step is jitted
  over a `Mesh(('data', 'space'))` with the batch sharded on 'data' and
  parameters/optimizer state replicated; XLA's SPMD partitioner inserts the
  gradient all-reduce over ICI automatically from those shardings.
* `hvd.broadcast_global_variables(0)`  ->  replicated NamedSharding at
  init/restore time (a device_put, no collective choreography).
* per-rank seeds  ->  one PRNG key traced into the step; per-shard
  randomness comes from XLA partitioning the generation.

The 'space' axis is reserved for spatial halo sharding of very large volumes
(SURVEY §5.7) — see saragan_tpu.parallel.halo.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: Optional[int] = None,
    num_space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_space
    if num_data < 1:
        raise ValueError(
            f"num_space={num_space} exceeds the {len(devices)} available "
            f"devices (would give a 0-wide data axis)"
        )
    used = num_data * num_space
    assert used <= len(devices), (num_data, num_space, len(devices))
    if used < len(devices):
        print(f"make_mesh: using {used} of {len(devices)} devices "
              f"({num_data} data x {num_space} space)")
    arr = np.array(devices[:used]).reshape(num_data, num_space)
    return Mesh(arr, ("data", "space"))


def batch_sharding(mesh: Mesh, ndim: int, space_axis: Optional[int] = None) -> NamedSharding:
    """Batch axis on 'data'; optionally one spatial axis on 'space'."""
    spec = [None] * ndim
    spec[0] = "data"
    if space_axis is not None and mesh.shape["space"] > 1:
        spec[space_axis] = "space"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_global_batch(mesh: Mesh, batch: np.ndarray, space_axis: Optional[int] = None):
    """Place a batch onto the mesh, sharded over 'data'.

    Single-host: `batch` is the global batch, one device_put. Multi-host:
    `batch` is this *process's* shard of the global batch and assembly uses
    `jax.make_array_from_process_local_data` — each host feeds only its own
    chips (SURVEY §5.8: per-host loading replaces the reference's rank-0
    scatter)."""
    sharding = batch_sharding(mesh, batch.ndim, space_axis)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)


def jit_train_step(
    train_step,
    mesh: Optional[Mesh],
    batch_ndim: int,
    donate: bool = True,
    space_axis: Optional[int] = None,
):
    """Compile a train step for the mesh: state replicated, batch sharded on
    'data' (and optionally one spatial axis on 'space' — GSPMD then inserts
    halo exchanges for every conv touching that axis, SURVEY §5.7), scalars
    replicated.  With mesh=None, a plain jit (single chip).

    Buffers for the state are donated so parameter/optimizer memory is
    updated in place across steps (HBM headroom matters at 512^3 phases).
    """
    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(train_step, donate_argnums=donate_argnums)
    repl = replicated_sharding(mesh)
    bshard = batch_sharding(mesh, batch_ndim, space_axis)
    return jax.jit(
        train_step,
        in_shardings=(repl, bshard, repl, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=donate_argnums,
    )
