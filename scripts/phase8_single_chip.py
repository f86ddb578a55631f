"""Phase-8 (128x512x512) WGAN-GP training step on ONE chip via offload remat.

BASELINE.md's round-2 dress rehearsal proved phase 8 is infeasible on a
single 16 GB chip with or without plain remat (one conv intermediate alone
is 17.7 GB).  cfg.remat_offload changes where the saved activations live:
every per-resolution-block boundary activation (models tag them with
checkpoint_name) is DMA'd to pinned HOST memory during the forward and
brought back one block at a time in the backward, so peak HBM is roughly a
single block's working set.  The reference handled this scale with big-RAM
CPU nodes (scripts/run_haswell.jb); this is the TPU-native single-chip
equivalent, trading PCIe bandwidth for HBM.

Usage: python scripts/phase8_single_chip.py [phase] [batch] [n_steps] [fused_transitions]

fused_transitions defaults to 1; pass 0 to replace the exact
transposed-conv upscale+conv fusion with repeat-upscale + engine conv
(the fusion's lhs-dilated lax.conv keeps an 8-channel full-res f32
intermediate in a channels-on-lanes layout — 16x pad, 17.7 GB — that no
conv-engine env var reaches).  Combine with SARAGAN_CONV3D=gemm to keep
the finest activations in spatial-minor dot layouts.
"""

from __future__ import annotations

import os
import sys
import time

# big-volume memory knobs, set BEFORE saragan_tpu import (read at import):
# keep pixel_norm/avg_pool statistics in compute dtype — their implicit
# bf16->f32 upcasts materialize full-res 16x-padded converts under remat
os.environ.setdefault("SARAGAN_STATS_DTYPE", "compute")
# window pooling: the reshape-split form's interleaved factor axes draw
# transposed layouts (8x padding measured at phase 8)
os.environ.setdefault("SARAGAN_POOL", "window")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def main():
    phase = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    fused_tr = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True

    # persistent compile cache (round 4): the phase-8 AOT is 520 s cold
    # through the relay; repeat probes/legs reuse the serialized executable
    from saragan_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state, make_train_step

    # the LIDC spec tops out at phase 7 under the reference's final-shape
    # convention; phase 8 (128x512x512 volumes) needs the doubling extended
    # one level (same as scripts/dress_rehearsal_512.lidc_cfg)
    final = "(1, 128, 512, 512)" if phase <= 7 else "(1, 256, 1024, 1024)"
    cfg = Config(
        architecture="pgan",
        start_shape="(1, 1, 4, 4)",
        final_shape=final,
        latent_dim=256,
        base_batch_size=batch * (2 ** (phase - 1)),
        network_size="xs",
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        adam_beta1=0.0,
        adam_beta2=0.9,
        g_lr=1e-3,
        d_lr=1e-3,
        compute_dtype="bfloat16",
        fused_transitions=fused_tr,
        fused_grads=True,
        # separate fake/real critic passes: the vmap-stacked 2N input pair
        # drew a stack-minor layout padded 128x to 16 GiB at phase 8
        batched_passes=False,
        remat_offload=True,
    ).finalize()
    shape = tuple(cfg.current_shape(phase, batch))
    print(
        f"phase {phase}: volume shape {shape}, remat_offload on, "
        f"fused_transitions={fused_tr}, conv={os.environ.get('SARAGAN_CONV3D', 'direct')}",
        flush=True,
    )

    arch = get_architecture("pgan")
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    # stabilizing-half step (static alpha): the leanest hot step; phase-8
    # feasibility is the question, transition blending adds nothing to it
    step_jit = jax.jit(
        make_train_step(arch, cfg, phase, g_opt, d_opt, static_alpha=0.0),
        donate_argnums=(0,),
    )

    real = jax.device_put(np.random.default_rng(0).normal(size=shape).astype(np.float32))
    rng = jax.random.PRNGKey(1)

    # The Pallas flat-conv kernel's halo window at 512^2 planes needs more
    # scoped VMEM than the 16 MB default (16.45 MB measured — v5e has
    # 128 MB); xla_tpu_scoped_vmem_limit_kib is proto-backed, so it forwards
    # per-compile even through the axon relay (whose terminal owns
    # LIBTPU_INIT_ARGS).  SARAGAN_SCOPED_VMEM_KIB overrides; 0 disables.
    vmem_kib = int(os.environ.get("SARAGAN_SCOPED_VMEM_KIB", "65536"))
    if vmem_kib:
        t0 = time.perf_counter()
        step = step_jit.lower(state, real, rng, 0.0, 1e-3, 1e-3).compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": str(vmem_kib)}
        )
        print(f"AOT compile: {time.perf_counter() - t0:.1f}s", flush=True)
    else:
        step = step_jit

    t0 = time.perf_counter()
    state, metrics = step(state, real, rng, 0.0, 1e-3, 1e-3)
    gl = float(metrics.gen_loss)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s, g_loss={gl:.4f}", flush=True)
    assert np.isfinite(gl)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        rng, k = jax.random.split(rng)
        state, metrics = step(state, real, k, 0.0, 1e-3, 1e-3)
    gl = float(metrics.gen_loss)
    dt = (time.perf_counter() - t0) / n_steps
    print(
        f"PHASE8_OK phase={phase} batch={batch}: {dt * 1e3:.0f} ms/step "
        f"({batch / dt:.3f} vol/s), g_loss={gl:.4f} finite={np.isfinite(gl)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
