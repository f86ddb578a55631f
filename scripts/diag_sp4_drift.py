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


def make_tiny_cfg(depth: int, production: bool = False):
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
        # production=True keeps the trainer's default formulation
        # (batched_passes vmap-stacked 2N critic pass + fused_grads);
        # False is the reassociation-stable program (dryrun cfg_eq)
        batched_passes=production,
    ).finalize()


def run_trajectory(cfg, mesh, space_axis, batches, step_keys, phase, n_steps, lr=1e-3):
    import jax.numpy as jnp

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
    if jax.config.jax_enable_x64:
        # Params/opt-state init is f32 (core.Scope default) regardless of
        # x64 mode; without this cast the "f64 probe" silently re-rounds
        # every parameter update to f32 and measures f32-seeded chaos.
        # Casting the whole train state makes the trajectory genuinely
        # f64 end to end — the sharp instrument: reassociation seeds
        # collapse to ~1e-16 while a cross-shard BUG stays O(1).
        state = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.float64)
            if hasattr(v, "dtype") and v.dtype == jnp.float32 else v,
            state,
        )
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
        state, m = step(state, b, step_keys[i], alpha, lr, lr)
        traj.append([float(m.gen_loss), float(m.disc_loss)])
    return np.asarray(traj)


def probe(depth: int, gp_weight: float, n_steps: int = 20, production: bool = False,
          lr: float = 1e-3):
    """lr=0 (with x64) is the chaos-free computation sweep: params frozen,
    each step's losses depend only on (init params, batch_i), so 20 batches
    compare the full sharded computation with the Adam sign-boundary
    amplifier removed.  Trajectory equality at ANY precision is NOT a bug
    discriminator for this optimizer (measured round 5: genuinely-f64
    20-step production drift 0.07-0.09, same as f32 — beta1=0 makes the
    drift seed-size-independent)."""
    from saragan_tpu.parallel import make_mesh

    cfg = make_tiny_cfg(depth, production=production)
    if gp_weight != 10.0:
        cfg = dataclasses.replace(cfg, gp_weight=gp_weight)
    if jax.config.jax_enable_x64:
        # genuinely f64 end to end: f64 activations through the step
        # (train/step.py compute_dtype) + the f64 state cast below
        cfg = dataclasses.replace(cfg, compute_dtype="float64")
    phase = 2
    global_batch = 8
    dt = np.float64 if jax.config.jax_enable_x64 else np.float32
    batches = [
        np.random.default_rng(i)
        .normal(size=(global_batch, 1, depth, 8, 8)).astype(dt)
        for i in range(n_steps)
    ]
    step_keys = [jax.random.PRNGKey(1000 + i) for i in range(n_steps)]

    ref = run_trajectory(cfg, None, None, batches, step_keys, phase, n_steps, lr=lr)
    out = {}
    for num_data, num_space in ((8, 1), (4, 2), (2, 4)):
        if depth % num_space:
            continue
        mesh = make_mesh(num_data=num_data, num_space=num_space,
                         devices=jax.devices()[:8])
        space_axis = 2 if num_space > 1 else None
        traj = run_trajectory(cfg, mesh, space_axis, batches, step_keys,
                              phase, n_steps, lr=lr)
        diff = np.max(np.abs(traj - ref))
        first = np.max(np.abs(traj[0] - ref[0]))
        out[f"dp{num_data}xsp{num_space}"] = {
            "first_step_diff": float(first),
            "trajectory_diff": float(diff),
        }
    return out


def main():
    production = "--production" in sys.argv
    report = {}
    # f32 (the dryrun's regime)
    report["f32_depth8_gp10"] = probe(8, 10.0, production=production)
    report["f32_depth16_gp10"] = probe(16, 10.0, production=production)
    report["f32_depth8_gp0"] = probe(8, 0.0, production=production)

    # f64: measured round 5 — trajectory equality at ANY precision is NOT
    # the bug discriminator for this optimizer: with adam_beta1=0 a
    # gradient coordinate crossing a sign boundary (which a 1e-16 seed
    # achieves within a few steps across ~1e5 parameters) jumps the
    # trajectory by O(lr) regardless of seed size; genuinely-f64 20-step
    # production drift measured 0.07-0.09, same as f32.  Kept for the
    # first-step readings (still ulp-scale in f64).
    jax.config.update("jax_enable_x64", True)
    jax.clear_caches()
    report["f64_depth8_gp10"] = probe(8, 10.0, production=production)

    # The SHARP cross-shard-bug instrument (VERDICT r4 item 2): f64 with
    # lr=0 — parameters frozen, chaos amplifier removed, 20 batches of the
    # full production computation compared across shardings.  Envelope
    # feeds dryrun_multichip's PROD_F64_TOL.
    report["f64_lr0_depth8_gp10"] = probe(8, 10.0, production=production, lr=0.0)

    if production:
        report["_formulation"] = "production (batched_passes + fused_grads)"
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
