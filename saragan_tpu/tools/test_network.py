"""Network smoke-test harness — rebuild of reference
SURFGAN_3D/networks/test_network.py:12-125: build G+D+loss+optimizers for a
chosen architecture/phase, run one train step, print output shapes,
per-variable shapes, parameter counts, step timing and device memory.

Usage:
    python -m saragan_tpu.tools.test_network pgan --phase 3 \
        --start_shape '(1, 4, 4, 4)' --latent_dim 64 --network_size xs
"""

from __future__ import annotations

import argparse
import time


def run_smoke_test(architecture: str, phase: int, cfg, batch_size: int = 2,
                   verbose: bool = True) -> dict:
    import jax
    import numpy as np

    from saragan_tpu.core import param_count
    from saragan_tpu.models import get_architecture
    from saragan_tpu.train import init_train_state, make_train_step

    arch = get_architecture(architecture)
    t0 = time.perf_counter()
    state, (g_opt, d_opt) = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    build_s = time.perf_counter() - t0

    params = {**state.g_params, **state.d_params}
    if verbose:
        for name in sorted(params):
            print(f"{int(np.prod(params[name].shape)):>12}  {name}  {tuple(params[name].shape)}")
    n_g = param_count(params, "generator")
    n_d = param_count(params, "discriminator")

    z = jax.random.normal(jax.random.PRNGKey(1), (batch_size, cfg.latent_dim))
    img = arch.generator(state.g_params, z, 0.5, phase=phase, cfg=cfg,
                         rng=jax.random.PRNGKey(2))
    score = arch.discriminator(state.d_params, img, 0.5, phase=phase, cfg=cfg)

    step = jax.jit(make_train_step(arch, cfg, phase, g_opt, d_opt))
    real = jax.random.normal(jax.random.PRNGKey(3), img.shape)
    t0 = time.perf_counter()
    state2, metrics = step(state, real, jax.random.PRNGKey(4), 0.5, 1e-3, 1e-3)
    # value fetch, not block_until_ready — only fetches truly block through
    # the axon relay (CLAUDE.md hardware rules)
    _ = float(metrics.gen_loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state2, metrics = step(state2, real, jax.random.PRNGKey(5), 0.5, 1e-3, 1e-3)
    _ = float(metrics.gen_loss)
    step_s = time.perf_counter() - t0

    mem = None
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            mem = stats.get("bytes_in_use")
    except Exception:
        pass

    report = {
        "architecture": architecture,
        "phase": phase,
        "generator_output_shape": tuple(img.shape),
        "discriminator_output_shape": tuple(score.shape),
        "generator_params": n_g,
        "discriminator_params": n_d,
        "build_seconds": round(build_s, 3),
        "compile_seconds": round(compile_s, 3),
        "step_seconds": round(step_s, 4),
        "gen_loss": float(metrics.gen_loss),
        "disc_loss": float(metrics.disc_loss),
        "device_bytes_in_use": mem,
    }
    if verbose:
        print(f"Generator output shape: {report['generator_output_shape']}")
        print(f"Total generator variables: {n_g}")
        print(f"Total discriminator variables: {n_d}")
        print(f"build {build_s:.2f}s  compile {compile_s:.2f}s  step {step_s * 1000:.1f}ms")
        if mem:
            print(f"device memory in use: {mem / 1e6:.1f} MB")
    return report


def main(argv=None):
    from saragan_tpu.config import Config

    p = argparse.ArgumentParser(prog="saragan_tpu.tools.test_network")
    p.add_argument("architecture")
    p.add_argument("--phase", type=int, default=2)
    p.add_argument("--start_shape", type=str, default="(1, 4, 4, 4)")
    p.add_argument("--final_shape", type=str, default=None)
    p.add_argument("--latent_dim", type=int, default=64)
    p.add_argument("--network_size", type=str, default="xs")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--loss_fn", default="wgan", choices=["wgan", "logistic"])
    args = p.parse_args(argv)

    from saragan_tpu.config import parse_tuple

    start = parse_tuple(args.start_shape)
    final = args.final_shape or str(
        (start[0], *[d * 2 ** max(args.phase, 1) for d in start[1:]])
    )
    cfg = Config(
        architecture=args.architecture,
        start_shape=args.start_shape,
        final_shape=final,
        starting_phase=args.phase,
        ending_phase=args.phase,
        latent_dim=args.latent_dim,
        network_size=args.network_size,
        base_batch_size=args.batch_size,
        loss_fn=args.loss_fn,
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    ).finalize()
    run_smoke_test(args.architecture, args.phase, cfg, args.batch_size)


if __name__ == "__main__":
    main()
