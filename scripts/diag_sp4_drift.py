"""Diagnose the dp2xsp4 dryrun drift (VERDICT r3 weak #2 / next-round #4).

Round-3's MULTICHIP artifact showed the 20-step trajectory max|dloss| for
dp2xsp4 at 2.5e-4 — ~130x the other meshes (dp8 1.9e-6, dp4xsp2 9.5e-7).
Two hypotheses:

  (a) reassociation: at depth 8 / sp=4 each shard holds 2 slices and a
      radius-1 halo imports half its input, so GSPMD's partitioned conv
      reduces in a very different order than the single-device conv; tiny
      per-step differences are then amplified by training chaos; or
  (b) a genuine halo boundary bug (wrong neighbor slice / edge handling)
      that the blanket 5e-3 assert would also pass.

Discriminator: run the SAME 20-step trajectory in float64.  Reassociation
error scales with the machine epsilon (f32 eps 1.2e-7 -> f64 eps 2.2e-16,
a ~5e8x collapse); a boundary bug injects O(1) wrong VALUES whose effect
is precision-independent.  So:

  f64 drift ~ f32 drift * 1e-9  => reassociation, derive tolerances;
  f64 drift ~ f32 drift         => boundary bug, go fix halo.py.

Also measured per mesh: the FIRST-step loss diff (pre-chaos, the pure
per-step reassociation seed) in both precisions, and a depth-16 variant
(sp=4 shards hold 4 slices, halo imports 1/4 instead of 1/2) to show the
drift scales with the halo-to-interior ratio as reassociation predicts.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     PALLAS_AXON_POOL_IPS= python scripts/diag_sp4_drift.py
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import dataclasses

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tiny_cfg(depth: int):
    from saragan_tpu.config import Config

    return Config(
        architecture="pgan",
        start_shape=f"(1, {depth // 2}, 4, 4)",
        final_shape=f"(1, {depth * 2}, 16, 16)",
        latent_dim=16,
        base_batch_size=8,
        kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]]],
        filter_spec=[[8, 8], [8, 8]],
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
        batched_passes=False,  # the reassociation-stable program (dryrun cfg_eq)
    ).finalize()


def run_trajectory(cfg, mesh, space_axis, batches, step_keys, phase, n_steps):
    from saragan_tpu.models import get_architecture
    from saragan_tpu.parallel import (
        jit_train_step,
        replicated_sharding,
        shard_global_batch,
    )
    from saragan_tpu.train import init_train_state, make_train_step

    arch = get_architecture(cfg.architecture)
    state, (g_opt, d_opt) = init_train_state(
        arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    if mesh is not None:
        state = jax.device_put(state, replicated_sharding(mesh))
    step = jit_train_step(
        make_train_step(arch, cfg, phase, g_opt, d_opt), mesh, batch_ndim=5,
        donate=True, space_axis=space_axis,
    )
    traj = []
    alpha = 1.0
    for i in range(n_steps):
        alpha = max(0.0, alpha - 1.0 / n_steps)
        b = batches[i] if mesh is None else shard_global_batch(mesh, batches[i], space_axis)
        state, m = step(state, b, step_keys[i], alpha, 1e-3, 1e-3)
        traj.append([float(m.gen_loss), float(m.disc_loss)])
    return np.asarray(traj)


def probe(depth: int, gp_weight: float, n_steps: int = 20):
    from saragan_tpu.parallel import make_mesh

    cfg = make_tiny_cfg(depth)
    if gp_weight != 10.0:
        cfg = dataclasses.replace(cfg, gp_weight=gp_weight)
    phase = 2
    global_batch = 8
    dt = np.float64 if jax.config.jax_enable_x64 else np.float32
    batches = [
        np.random.default_rng(i)
        .normal(size=(global_batch, 1, depth, 8, 8)).astype(dt)
        for i in range(n_steps)
    ]
    step_keys = [jax.random.PRNGKey(1000 + i) for i in range(n_steps)]

    ref = run_trajectory(cfg, None, None, batches, step_keys, phase, n_steps)
    out = {}
    for num_data, num_space in ((8, 1), (4, 2), (2, 4)):
        if depth % num_space:
            continue
        mesh = make_mesh(num_data=num_data, num_space=num_space,
                         devices=jax.devices()[:8])
        space_axis = 2 if num_space > 1 else None
        traj = run_trajectory(cfg, mesh, space_axis, batches, step_keys,
                              phase, n_steps)
        diff = np.max(np.abs(traj - ref))
        first = np.max(np.abs(traj[0] - ref[0]))
        out[f"dp{num_data}xsp{num_space}"] = {
            "first_step_diff": float(first),
            "trajectory_diff": float(diff),
        }
    return out


def main():
    report = {}
    # f32 (the dryrun's regime)
    report["f32_depth8_gp10"] = probe(8, 10.0)
    report["f32_depth16_gp10"] = probe(16, 10.0)
    report["f32_depth8_gp0"] = probe(8, 0.0)

    # f64: the discriminator between reassociation and a boundary bug
    jax.config.update("jax_enable_x64", True)
    jax.clear_caches()
    report["f64_depth8_gp10"] = probe(8, 10.0)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
