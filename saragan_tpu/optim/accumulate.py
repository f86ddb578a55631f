"""Gradient accumulation — SURVEY C25.

The reference's 2D optimizer path supports accumulating gradients over
multiple micro-batches before the (post-accumulation allreduced) update
(SURFGAN_2D/optim.py:95-160).  Functionally: average grads over K
micro-steps, apply the optimizer once.  `accumulating_step` wraps any
(state, batch, ...) -> grads function into a scan over the micro-batch
axis — one XLA program, grads averaged in fp32, single optimizer apply
(and therefore a single gradient all-reduce under a sharded jit, matching
the reference's allreduce-after-accumulation)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def grad_accumulate(grad_fn: Callable, batch: jax.Array, rng: jax.Array, num_micro: int):
    """Micro-batch-averaged (grads, aux) for the train step (SURVEY C25).

    grad_fn(micro_batch, rng) -> (grads_pytree, aux_pytree_of_scalars); both
    are accumulated in fp32 over `num_micro` slices of `batch` under one
    lax.scan (single XLA program: one set of live micro-activations, ONE
    optimizer apply — and therefore one gradient allreduce under a sharded
    jit, the reference's allreduce-after-accumulation,
    SURFGAN_2D/optim.py:95-160)."""
    if num_micro <= 1:
        return grad_fn(batch, rng)
    micro = split_microbatches(batch, num_micro)
    rngs = jax.random.split(rng, num_micro)

    def body(carry, xs):
        mb, k = xs
        out = grad_fn(mb, k)
        carry = jax.tree_util.tree_map(
            lambda c, x: c + x.astype(jnp.float32), carry, out
        )
        return carry, None

    shapes = jax.eval_shape(grad_fn, micro[0], rngs[0])
    zeros = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, jnp.float32), shapes)
    total, _ = jax.lax.scan(body, zeros, (micro, rngs))
    return jax.tree_util.tree_map(lambda x: x / num_micro, total)


def split_microbatches(batch: jax.Array, num_micro: int) -> jax.Array:
    """(N, ...) -> (num_micro, N/num_micro, ...)."""
    n = batch.shape[0]
    if n % num_micro != 0:
        raise ValueError(
            f"gradient_accumulation={num_micro} must divide the per-process "
            f"batch size (got batch {n}); pick a batch size that is a "
            f"multiple of the accumulation factor"
        )
    return batch.reshape((num_micro, n // num_micro) + batch.shape[1:])
