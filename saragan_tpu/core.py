"""Parameter scopes: named, flat parameter trees with TF-style scope names.

The reference framework organizes variables by TF variable scopes (e.g.
``generator/generator_in/dense/weight`` — see
/root/reference/SURFGAN_3D/networks/pgan/generator.py:79-98).  Progressive
growing relies on *name-intersection* partial restore (reference
utils.py:75-104): when phase N+1 starts, every variable whose name exists in
the phase-N checkpoint is restored and new layers stay randomly initialized.

We keep that property by storing parameters in a **flat dict keyed by
'/'-joined scope paths**.  A flat dict of arrays is a valid JAX pytree, so it
jits/grads/shards like any other param tree, while making partial restore,
per-phase freeze masks and EMA bookkeeping trivial set operations on names.

``Scope`` is a tiny helper that walks the name hierarchy.  In *init* mode,
``scope.get(...)`` creates a parameter with a deterministic per-name RNG key
(root key folded with a stable hash of the full name, so init is independent
of creation order and of which phase the layer first appears in).  In *apply*
mode it reads the parameter from the dict.
"""

from __future__ import annotations

import zlib
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


def _stable_hash(name: str) -> int:
    """Deterministic 32-bit hash of a parameter name (process-independent)."""
    return zlib.crc32(name.encode("utf-8"))


class Scope:
    """Named access to a flat parameter dict, mirroring TF variable scopes."""

    def __init__(
        self,
        params: Params,
        prefix: str = "",
        *,
        init: bool = False,
        rng: Optional[jax.Array] = None,
        dtype: jnp.dtype = jnp.float32,
        spectral: int = 0,
    ):
        self.params = params
        self.prefix = prefix
        self.init = init
        self.rng = rng
        self.dtype = dtype
        # >0: every get_weight under this scope is spectrally normalized with
        # this many power iterations (reference ops.py:111-127 get_weight's
        # use_spectral_norm; set on the discriminator scope via
        # cfg.use_spectral_norm)
        self.spectral = spectral

    def sub(self, name: str) -> "Scope":
        prefix = f"{self.prefix}/{name}" if self.prefix else name
        return Scope(self.params, prefix, init=self.init, rng=self.rng, dtype=self.dtype,
                     spectral=self.spectral)

    def path(self, name: str) -> str:
        return f"{self.prefix}/{name}" if self.prefix else name

    def get(
        self,
        name: str,
        shape: Sequence[int],
        initializer: Callable[[jax.Array, Sequence[int], jnp.dtype], jax.Array],
    ) -> jax.Array:
        """Create (init mode) or read (apply mode) a named parameter."""
        full = self.path(name)
        if self.init:
            if full not in self.params:
                if self.rng is None:
                    raise ValueError(f"Scope in init mode needs an rng (param {full!r})")
                # Parameter creation must stay CONCRETE even when the init
                # forward is traced abstractly (models.common.
                # abstract_init_forward runs it under jax.eval_shape so no
                # full-resolution activation is ever materialized):
                # ensure_compile_time_eval escapes omnistaging for the
                # key-fold + initializer, whose inputs (the scope rng, the
                # shape) are always concrete at init.
                with jax.ensure_compile_time_eval():
                    key = jax.random.fold_in(self.rng, _stable_hash(full))
                    self.params[full] = initializer(key, tuple(shape), self.dtype)
            return self.params[full]
        try:
            return self.params[full]
        except KeyError:
            raise KeyError(
                f"Parameter {full!r} not found; params has {len(self.params)} entries "
                f"(e.g. {list(self.params)[:4]})"
            ) from None


def normal_initializer(stddev: float) -> Callable:
    def init(key, shape, dtype):
        return stddev * jax.random.normal(key, shape, dtype)

    return init


def zeros_initializer() -> Callable:
    def init(key, shape, dtype):
        return jnp.zeros(shape, dtype)

    return init


def ones_initializer() -> Callable:
    def init(key, shape, dtype):
        return jnp.ones(shape, dtype)

    return init


def filter_params(params: Params, prefix: str) -> Params:
    """All parameters whose name starts with `prefix` (a scope path)."""
    pre = prefix if prefix.endswith("/") else prefix + "/"
    return {k: v for k, v in params.items() if k.startswith(pre) or k == prefix}


def param_count(params: Params, prefix: str = "") -> int:
    sub = filter_params(params, prefix) if prefix else params
    return sum(int(v.size) for v in sub.values())


def intersect_restore(current: Params, checkpoint: Params) -> Params:
    """Name-intersection partial restore (reference utils.py:75-104 semantics).

    Every param present in both trees takes the checkpoint value (shapes must
    match); params only in `current` keep their (randomly initialized) value.
    """
    out = dict(current)
    for k, v in checkpoint.items():
        if k in out:
            if tuple(out[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"Shape mismatch restoring {k}: have {out[k].shape}, checkpoint {v.shape}"
                )
            out[k] = jnp.asarray(v, out[k].dtype)
    return out
