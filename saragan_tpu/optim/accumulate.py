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


def accumulate_grads(grad_fn: Callable, params, micro_batches, *args):
    """Average grad_fn(params, micro_batch, *args) over the leading axis of
    `micro_batches` with lax.scan (activations for only one micro-batch are
    live at a time)."""

    def body(carry, mb):
        grads = grad_fn(params, mb, *args)
        carry = jax.tree_util.tree_map(lambda c, g: c + g.astype(jnp.float32), carry, grads)
        return carry, None

    zero = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params
    )
    total, _ = jax.lax.scan(body, zero, micro_batches)
    k = micro_batches.shape[0]
    return jax.tree_util.tree_map(lambda g: g / k, total)


def split_microbatches(batch: jax.Array, num_micro: int) -> jax.Array:
    """(N, ...) -> (num_micro, N/num_micro, ...)."""
    n = batch.shape[0]
    assert n % num_micro == 0, (n, num_micro)
    return batch.reshape((num_micro, n // num_micro) + batch.shape[1:])
