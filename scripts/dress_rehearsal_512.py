"""512^3-scale dress rehearsal for spatial (halo) sharding — VERDICT r1 item 6.

Three modes:

  --math          HBM accounting per phase (no devices needed): where the
                  single-chip 16 GB budget dies and the 'space' axis becomes
                  mandatory (SURVEY §5.7; the reference's answer was a
                  big-RAM CPU partition, scripts/run_haswell.jb).
  --probe-chip    On the real chip: binary-search the largest (phase, batch,
                  remat) WGAN-GP step that compiles AND executes.
  --virtual-mesh  On a forced-CPU 8-device mesh: run REAL train steps (not
                  a tiny dryrun) at phase-7/8 shapes with dp x sp
                  (space=2/4), proving the sharded program compiles,
                  executes, and the halo'd convs produce finite losses.

Usage: python scripts/dress_rehearsal_512.py --math|--probe-chip|--virtual-mesh
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_BYTES = 16 * 1024**3  # v5e: 16 GB HBM per chip


def lidc_cfg(phase: int, batch: int, remat: bool = False, space: int = 1):
    from saragan_tpu.config import Config

    # the LIDC spec tops out at phase 7 (256^2); phase 8 extends the same
    # doubling one level further (512^2 xy, 128 z)
    final = "(1, 128, 512, 512)" if phase <= 7 else "(1, 256, 1024, 1024)"
    return Config(
        architecture="pgan",
        start_shape="(1, 1, 4, 4)",
        final_shape=final,
        latent_dim=256,
        network_size="xs",
        base_batch_size=batch * (2 ** (phase - 1)),
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        adam_beta1=0.0,
        adam_beta2=0.9,
        g_lr=1e-3,
        d_lr=1e-3,
        compute_dtype="bfloat16",
        fused_transitions=True,
        remat=remat,
        num_space_shards=space,
        grad_histograms=False,
    ).finalize()


def phase_shape(cfg, phase: int):
    s = cfg.start_shape_t
    return tuple(d * 2 ** (phase - 1) for d in s[1:])


# ---------------------------------------------------------------------------
# --math
# ---------------------------------------------------------------------------


def hbm_math():
    """Live-activation accounting of the WGAN-GP step for pgan 'xs'.

    Counts, per phase: parameters+optimizer+EMA (fp32, constant), and the
    dominant live set — G and D activations for the three D passes (real,
    fake, interpolated) that autodiff must keep for the backward, in bf16.
    The GP double-backward roughly doubles D's live activations.
    """
    rows = []
    for phase in range(5, 9):
        cfg = lidc_cfg(phase, 1)
        fs = cfg.resolved_filter_spec()
        vol = phase_shape(cfg, phase)
        vox = int(np.prod(vol))
        # generator activations: per block at resolution r: 2 convs of f maps
        g_act = 0
        d_act = 0
        for i in range(1, phase + 1):
            r_vox = vox // (8 ** (phase - i))
            f = fs[i - 1][1]
            g_act += 2 * f * r_vox  # two conv outputs per block
            d_act += 2 * f * r_vox
        bytes_per = 2  # bf16
        batch1 = (
            g_act * bytes_per  # G forward (kept for G backward)
            + 3 * d_act * bytes_per  # D on real, fake, x_hat
            + 2 * d_act * bytes_per  # GP grad-of-grad re-linearization
        )
        params = 4.75e6 * 4 * 6  # params+grads+2 adam slots+EMA, G+D fp32
        # XLA's real live set is larger (activation cotangents, fusion
        # temporaries, GP triple-path); calibrate with the MEASURED phase-6
        # point: batch 8 fits, batch 16 OOMs without remat (BASELINE.md)
        # -> correction = est(54)/measured(8).
        CALIB = 54 / 8
        fit_batch = int((HBM_BYTES * 0.85 - params) // (batch1 * CALIB))
        rows.append({
            "phase": phase,
            "volume": "x".join(map(str, vol)),
            "live_act_bytes_per_sample": int(batch1),
            "est_max_batch_1chip_calibrated": max(0, fit_batch),
            "space_or_remat_needed": fit_batch < 1,
        })
    print(json.dumps(rows, indent=1))
    print(
        "\nReading: phase 7 (64x256x256, 4.2M vox) still fits a handful of"
        " samples on one chip; phase 8 (128x512x512, 33.5M vox) exceeds one"
        " chip even at batch 1 -> the 'space' mesh axis (depth-halo"
        " sharding, parallel/halo.py) or remat becomes mandatory."
    )
    return rows


# ---------------------------------------------------------------------------
# --probe-chip
# ---------------------------------------------------------------------------


def probe_chip():
    import jax

    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state, make_train_step

    arch = get_architecture("pgan")
    results = []
    for phase, batches, remat in [
        (7, [1, 2, 4, 8], False),
        (7, [4, 8, 16], True),
        (8, [1], False),
        (8, [1, 2], True),
    ]:
        for batch in batches:
            cfg = lidc_cfg(phase, batch, remat=remat)
            tag = f"phase{phase} batch{batch} remat={remat}"
            try:
                state, (g_opt, d_opt) = init_train_state(
                    arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg
                )
                step = jax.jit(
                    make_train_step(arch, cfg, phase, g_opt, d_opt), donate_argnums=(0,)
                )
                vol = phase_shape(cfg, phase)
                real = jax.device_put(
                    np.random.default_rng(0).normal(size=(batch, 1, *vol)).astype(np.float32)
                )
                import time as _t

                t0 = _t.perf_counter()
                state, m = step(state, real, jax.random.PRNGKey(1), 0.0, 1e-3, 1e-3)
                loss = float(m.gen_loss)  # value fetch = the only real barrier
                compile_s = _t.perf_counter() - t0
                t0 = _t.perf_counter()
                for _ in range(3):
                    state, m = step(state, real, jax.random.PRNGKey(2), 0.0, 1e-3, 1e-3)
                loss = float(m.gen_loss)
                dt = (_t.perf_counter() - t0) / 3
                results.append({"cfg": tag, "ok": True, "ms_per_step": round(dt * 1000, 1),
                                "vol_per_s": round(batch / dt, 2), "compile_s": round(compile_s, 1)})
                print(json.dumps(results[-1]), flush=True)
                del state, step, real
            except Exception as e:  # noqa: BLE001 - OOM probing
                results.append({"cfg": tag, "ok": False, "err": type(e).__name__,
                                "msg": str(e)[:200]})
                print(json.dumps(results[-1]), flush=True)
                break  # larger batches will also fail
    print(json.dumps({"probe": results}))
    return results


# ---------------------------------------------------------------------------
# --virtual-mesh
# ---------------------------------------------------------------------------


def virtual_mesh():
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if jax.device_count() < 8:
        from jax._src import xla_bridge

        jax.config.update("jax_platforms", "cpu")
        xla_bridge._clear_backends()
        jax.clear_caches()
        jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp  # noqa: F401

    from saragan_tpu.models import get_architecture
    from saragan_tpu.parallel import jit_train_step, make_mesh, replicated_sharding, shard_global_batch
    from saragan_tpu.train import init_train_state, make_train_step

    arch = get_architecture("pgan")
    results = []
    # phase-7/8 geometry at reduced channel width so 8 virtual CPU devices
    # finish in minutes: the SHARDING (dp x sp halo conv) is what's under
    # test, and it is width-independent.
    # phase-6 geometry: the largest the virtual CPU mesh executes without
    # hitting XLA:CPU thunk-executor crashes at phase-7/8 element counts
    # (real phase-7/8 evidence comes from --probe-chip on hardware)
    for phase, space, batch_per in [(6, 2, 1), (6, 4, 1), (7, 2, 1)]:
        data = 8 // space
        cfg = lidc_cfg(phase, batch_per * data, space=space)
        cfg.filter_spec = [[4, 4]] * cfg.num_phases  # thin net, same geometry
        cfg.latent_dim = 16
        mesh = make_mesh(num_data=data, num_space=space)
        state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
        state = jax.device_put(state, replicated_sharding(mesh))
        step = make_train_step(arch, cfg, phase, g_opt, d_opt)
        jit_step = jit_train_step(step, mesh, 5, donate=True, space_axis=2)
        vol = phase_shape(cfg, phase)
        global_batch = batch_per * data
        real = np.random.default_rng(0).normal(size=(global_batch, 1, *vol)).astype(np.float32)
        batch = shard_global_batch(mesh, real, space_axis=2)
        import time as _t

        t0 = _t.perf_counter()
        state, m = jit_step(state, batch, jax.random.PRNGKey(1), 0.5, 1e-3, 1e-3)
        l1 = float(m.gen_loss)
        compile_s = _t.perf_counter() - t0
        state, m = jit_step(state, batch, jax.random.PRNGKey(2), 0.5, 1e-3, 1e-3)
        l2 = float(m.gen_loss)
        ok = np.isfinite(l1) and np.isfinite(l2) and l1 != l2
        results.append({
            "phase": phase, "mesh": f"data={data} x space={space}",
            "volume": "x".join(map(str, vol)), "global_batch": global_batch,
            "losses": [round(l1, 4), round(l2, 4)], "compile_s": round(compile_s, 1),
            "ok": bool(ok),
        })
        print(json.dumps(results[-1]), flush=True)
        del state, jit_step, batch
    assert all(r["ok"] for r in results)
    print(json.dumps({"virtual_mesh": results}))
    return results


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "--math"
    {"--math": hbm_math, "--probe-chip": probe_chip, "--virtual-mesh": virtual_mesh}[mode]()
