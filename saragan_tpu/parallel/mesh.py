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
    num_space2: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over ('data', 'space'[, 'space2']).

    'space' shards the volume depth (D) axis, 'space2' — added only when
    num_space2 > 1, so existing 2-axis callers are untouched — shards the
    height (H) axis too: the 2D halo decomposition for pod-scale meshes
    where D alone is too shallow (e.g. 512x512x128 over 32 chips = 8 space
    x 4 space2 leaves 16-deep x 128-tall local slabs).  Both are GSPMD
    sharding annotations; XLA inserts the halo exchanges (SURVEY §5.7)."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // (num_space * num_space2)
    if num_data < 1:
        raise ValueError(
            f"num_space={num_space} x num_space2={num_space2} exceeds the "
            f"{len(devices)} available devices (would give a 0-wide data axis)"
        )
    used = num_data * num_space * num_space2
    assert used <= len(devices), (num_data, num_space, num_space2, len(devices))
    if used < len(devices):
        print(f"make_mesh: using {used} of {len(devices)} devices "
              f"({num_data} data x {num_space} space x {num_space2} space2)")
    if num_space2 > 1:
        arr = np.array(devices[:used]).reshape(num_data, num_space, num_space2)
        return Mesh(arr, ("data", "space", "space2"))
    arr = np.array(devices[:used]).reshape(num_data, num_space)
    return Mesh(arr, ("data", "space"))


def batch_sharding(mesh: Mesh, ndim: int, space_axis: Optional[int] = None) -> NamedSharding:
    """Batch axis on 'data'; optionally the depth axis on 'space' (and, when
    the mesh carries a 'space2' axis, the next axis — H — on 'space2')."""
    spec = [None] * ndim
    spec[0] = "data"
    if space_axis is not None and mesh.shape.get("space", 1) > 1:
        spec[space_axis] = "space"
    if (space_axis is not None and mesh.shape.get("space2", 1) > 1
            and space_axis + 1 < ndim):
        spec[space_axis + 1] = "space2"
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


AUTO_SCOPED_VMEM_KIB = 32768  # measured optimum (BASELINE.md round-3 cont.)


def resolve_compiler_options(scoped_vmem_kib: int) -> Optional[dict]:
    """Config.scoped_vmem_kib -> per-compile compiler_options dict.

    -1 = auto: the measured-optimal 32 MB scoped-VMEM limit on TPU-class
    backends (interleaved A/B: ~+6.5% full-step throughput at both bench
    phases; 40960/49152 measurably worse — scripts/ab_compiler_opts.py),
    nothing on CPU/GPU where the TPU option would be rejected.
    0 = backend default (no options).  >0 = explicit KiB value.

    The option is TPU-only, so on non-TPU backends this returns None for
    every value (explicit values warn) — one gate for all call sites
    (trainer, bench, serving sampler) instead of per-caller platform
    checks."""
    if scoped_vmem_kib == 0:
        return None
    if jax.default_backend() not in ("tpu", "axon"):
        if scoped_vmem_kib > 0:
            print(f"resolve_compiler_options: dropping scoped_vmem_kib="
                  f"{scoped_vmem_kib} — xla_tpu_scoped_vmem_limit_kib is "
                  f"TPU-only and the backend is {jax.default_backend()}")
        return None
    if scoped_vmem_kib < 0:
        scoped_vmem_kib = AUTO_SCOPED_VMEM_KIB
    return {"xla_tpu_scoped_vmem_limit_kib": str(scoped_vmem_kib)}


def aot_with_options(jitted, compiler_options: Optional[dict], static_argnums=(),
                     on_fail: str = "fallback"):
    """Route a jitted function through `.lower(...).compile(compiler_options)`.

    Proto-backed per-compile options are the ONLY way to reach the remote
    XLA:TPU compiler behind the axon relay (env LIBTPU_INIT_ARGS/XLA_FLAGS
    do not forward — the relay terminal's own environment wins; measured,
    BASELINE.md "Phase-8 on one chip").  The single-chip big-volume path
    needs `xla_tpu_scoped_vmem_limit_kib` raised for the Pallas flat-conv
    halo windows at 512^2 planes (16.45 MB > the 16 MB default).

    With compiler_options=None this is the identity.  Otherwise returns a
    wrapper that lowers+compiles on first call per argument signature and
    caches the executable.  Cache keys: static argument positions -> their
    VALUE (statics are baked into the executable at lower time, whatever
    their type — a static float must not share an executable across values);
    dynamic arrays -> (shape, dtype); dynamic python floats -> their type
    (traced, so values don't recompile); other dynamic leaves -> their value.

    `static_argnums` must mirror the jit's: a compiled executable is called
    with the dynamic arguments only (the statics were baked at lower time).

    `on_fail`: what to do when the compile WITH options fails —
    "fallback" (default) retries with backend defaults so a tuning knob
    can't kill a run (the retry itself raises on a genuine program-compile
    failure, just after one wasted compile); "raise" propagates the first
    error — required by A/B sweeps (scripts/ab_compiler_opts.py), where a
    silent fallback would report the backend default's timing under the
    rejected option's name.
    """
    if compiler_options is None:
        return jitted
    static_set = frozenset(static_argnums)

    cache: dict = {}

    def _leaf_key(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return ("arr", tuple(x.shape), str(x.dtype))
        if isinstance(x, float):
            return ("f", type(x).__name__)
        return ("v", x)

    def wrapper(*args):
        key = tuple(
            ("static", a) if i in static_set else
            tuple(_leaf_key(leaf) for leaf in jax.tree_util.tree_leaves(a))
            + (str(jax.tree_util.tree_structure(a)),)
            for i, a in enumerate(args)
        )
        exe = cache.get(key)
        if exe is None:
            lowered = jitted.lower(*args)
            try:
                exe = lowered.compile(compiler_options=compiler_options)
            except Exception as e:  # noqa: BLE001 — option-rejecting compile
                # e.g. a backend that doesn't know the option, or a program
                # whose AOT compile OOMs under a raised scoped-VMEM budget
                # (measured: >=64 MB SIGKILLs the relay's compile helper at
                # the phase-6 program).  Fall back to the backend default
                # rather than failing the run over a tuning knob.
                if on_fail == "raise":
                    raise
                print(f"aot_with_options: compile with {compiler_options} failed "
                      f"({type(e).__name__}: {e}); retrying with backend defaults")
                exe = lowered.compile()
            cache[key] = exe
        dynamic = [a for i, a in enumerate(args) if i not in static_set]
        return exe(*dynamic)

    return wrapper


def jit_train_step(
    train_step,
    mesh: Optional[Mesh],
    batch_ndim: int,
    donate: bool = True,
    space_axis: Optional[int] = None,
    compiler_options: Optional[dict] = None,
):
    """Compile a train step for the mesh: state replicated, batch sharded on
    'data' (and optionally one spatial axis on 'space' — GSPMD then inserts
    halo exchanges for every conv touching that axis, SURVEY §5.7), scalars
    replicated.  With mesh=None, a plain jit (single chip).

    Buffers for the state are donated so parameter/optimizer memory is
    updated in place across steps (HBM headroom matters at 512^3 phases).

    `compiler_options` (e.g. the scoped-VMEM limit for the single-chip
    big-volume path) routes the compile through `aot_with_options`.
    """
    donate_argnums = (0,) if donate else ()
    if mesh is None:
        jitted = jax.jit(train_step, donate_argnums=donate_argnums)
    else:
        repl = replicated_sharding(mesh)
        bshard = batch_sharding(mesh, batch_ndim, space_axis)
        jitted = jax.jit(
            train_step,
            in_shardings=(repl, bshard, repl, repl, repl, repl),
            out_shardings=(repl, repl),
            donate_argnums=donate_argnums,
        )
    return aot_with_options(jitted, compiler_options)
