"""Bisect which train-step feature trips the relay AOT compiler under
remat_offload (error: "Tensor which is moved to host ... is returned from
the entry computation but the layout for this output is not set to host
memory").  A minimal jax.checkpoint-offload toy compiles fine on this
relay, so the trigger is structural to the step program.  Builds the
phase-4 (tiny) step with features toggled off one at a time and reports
compile ok/fail per variant.  ONE process (CLAUDE.md relay rules).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def build_cfg(**over):
    from saragan_tpu.config import Config

    kw = dict(
        architecture="pgan",
        start_shape="(1, 1, 4, 4)",
        final_shape="(1, 128, 512, 512)",
        latent_dim=256,
        base_batch_size=1 * (2 ** (4 - 1)),
        network_size="xs",
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        adam_beta1=0.0,
        adam_beta2=0.9,
        g_lr=1e-3,
        d_lr=1e-3,
        compute_dtype="bfloat16",
        fused_transitions=True,
        remat_offload=True,
    )
    kw.update(over)
    return Config(**kw).finalize()


def try_variant(name, cfg, donate=True, apply_gp=True):
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state, make_train_step

    phase = 4
    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    step = make_train_step(arch, cfg, phase, g_opt, d_opt, static_alpha=0.0, apply_gp=apply_gp)
    step = jax.jit(step, donate_argnums=(0,) if donate else ())
    shape = tuple(cfg.current_shape(phase, 1))
    real = jax.device_put(np.random.default_rng(0).normal(size=shape).astype(np.float32))
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    try:
        state, metrics = step(state, real, rng, 0.0, 1e-3, 1e-3)
        gl = float(metrics.gen_loss)
        print(f"[{name}] OK {time.perf_counter()-t0:.1f}s g_loss={gl:.4f}", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"[{name}] FAIL {time.perf_counter()-t0:.1f}s: {msg}", flush=True)
        return False


def main():
    variants = [
        ("full_defaults", build_cfg(), dict()),
        ("no_donate", build_cfg(), dict(donate=False)),
        ("no_gp", build_cfg(), dict(apply_gp=False)),
        ("no_batched_passes", build_cfg(batched_passes=False), dict()),
        ("no_fused_grads", build_cfg(fused_grads=False), dict()),
        ("no_fused_grads_no_batched", build_cfg(fused_grads=False, batched_passes=False), dict()),
        ("no_gp_no_batched", build_cfg(batched_passes=False), dict(apply_gp=False)),
        ("alternate_strategy", build_cfg(optim_strategy="alternate"), dict()),
    ]
    for name, cfg, kw in variants:
        try:
            ok = try_variant(name, cfg, **kw)
        except Exception:
            traceback.print_exc()
            ok = False
        if ok and name != "full_defaults":
            print(f"--> first passing variant: {name}", flush=True)


if __name__ == "__main__":
    main()
