"""A/B the summary-step host-sync strategy through the axon relay
(VERDICT r2 item 7): per-variable float() fetches vs ONE batched
jax.device_get of the whole metrics tree.

The histogram step variant (grad_histograms=True) carries ~2 scalars + 2
norm trees + 2 x 64-bin histogram trees; through the relay every value
fetch is a real round-trip.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def main():
    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state, make_train_step

    phase, batch = 6, 8
    cfg = Config(
        architecture="pgan",
        start_shape="(1, 1, 4, 4)",
        final_shape="(1, 128, 512, 512)",
        latent_dim=256,
        base_batch_size=batch * (2 ** (phase - 1)),
        network_size="xs",
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
        compute_dtype="bfloat16",
    ).finalize()
    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    step = jax.jit(
        make_train_step(arch, cfg, phase, g_opt, d_opt, grad_histograms=True),
        donate_argnums=(0,),
    )
    real = jax.device_put(
        np.random.default_rng(0).normal(size=(batch, 1, 32, 128, 128)).astype(np.float32)
    )
    rng = jax.random.PRNGKey(1)
    state, metrics = step(state, real, rng, 0.0, 1e-3, 1e-3)
    _ = float(metrics.gen_loss)

    def n_leaves(m):
        return len(jax.tree_util.tree_leaves(m))

    print(f"metrics tree: {n_leaves(metrics)} leaves", flush=True)

    for mode in ("per_value_float", "one_device_get", "per_value_float", "one_device_get"):
        rng, k = jax.random.split(rng)
        state, metrics = step(state, real, k, 0.0, 1e-3, 1e-3)
        _ = float(metrics.gen_loss)  # close the step itself
        t0 = time.perf_counter()
        if mode == "per_value_float":
            vals = [np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(metrics)]
        else:
            vals = jax.tree_util.tree_leaves(jax.device_get(metrics))
        dt = time.perf_counter() - t0
        print(f"{mode}: {dt * 1e3:.1f} ms for {len(vals)} leaves", flush=True)


if __name__ == "__main__":
    main()
