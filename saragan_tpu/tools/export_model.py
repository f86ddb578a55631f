"""Serving export: serialize the trained generator as a StableHLO artifact.

A TPU-native production feature beyond the reference's tooling surface
(closest analog: reference generate_minimal.py:13-64 restores a checkpoint
into a live TF1 session).  `jax.export` captures the jitted generator —
params baked in as constants by default — into one portable, versioned
StableHLO blob that any later JAX (or PJRT runtime) can deserialize and
call without this package, its model code, or the checkpoint file:

    blob = export_generator(cfg, phase, g_params, batch_size=8)
    save_exported("g.stablehlo", blob)
    ...
    gen = load_exported("g.stablehlo")       # -> callable(z) -> volumes
    volumes = gen(np.random.randn(8, latent_dim).astype(np.float32))

With ``bake_params=False`` the artifact takes (params, z) instead, so one
compiled module serves many checkpoints (e.g. EMA vs raw weights).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from saragan_tpu.config import Config
from saragan_tpu.models import get_architecture


def _gen_fn(cfg: Config, phase: int, alpha: float, fast_inference: bool):
    if fast_inference:
        import dataclasses

        cfg = dataclasses.replace(cfg, fused_transitions=True, use_pallas_fusion=False)
        # NB: the Pallas elementwise kernels are deliberately NOT baked into
        # serving artifacts — StableHLO custom-calls tie the blob to one
        # backend; the exact fused transitions are pure HLO and portable.
    arch = get_architecture(cfg.architecture)

    def gen(params, z, rng):
        return arch.generator(params, z, alpha, phase=phase, cfg=cfg, rng=rng, train=False)

    return gen


def export_generator(
    cfg: Config,
    phase: int,
    g_params,
    batch_size: int = 8,
    alpha: float = 0.0,
    seed: int = 0,
    bake_params: bool = True,
    fast_inference: bool = True,
) -> bytes:
    """Serialize G at a fixed phase/batch to a StableHLO artifact (bytes)."""
    import jax
    from jax import export as jexport

    gen = _gen_fn(cfg, phase, alpha, fast_inference)
    rng = jax.random.PRNGKey(seed)  # style-mixing / noise key, fixed at export
    z_spec = jax.ShapeDtypeStruct((batch_size, cfg.latent_dim), np.float32)

    if bake_params:
        fn = jax.jit(lambda z: gen(g_params, z, rng))
        exported = jexport.export(fn)(z_spec)
    else:
        p_spec = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), dict(g_params)
        )
        fn = jax.jit(lambda params, z: gen(params, z, rng))
        exported = jexport.export(fn)(p_spec, z_spec)
    return exported.serialize()


def save_exported(path: str, blob: bytes) -> str:
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_exported(path: str):
    """Deserialize a saved artifact -> python callable (no model code needed)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def main(argv: Optional[list] = None):
    import argparse

    from saragan_tpu.tools.generate import _load_generator_params

    p = argparse.ArgumentParser(description="Export a trained generator to StableHLO")
    p.add_argument("architecture")
    p.add_argument("--model_path", required=True, help="checkpoint .npz (model_{phase})")
    p.add_argument("--out", required=True, help="output .stablehlo path")
    p.add_argument("--phase", type=int, required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--start_shape", default="(1, 1, 4, 4)")
    p.add_argument("--final_shape", default="(1, 128, 512, 512)")
    p.add_argument("--network_size", default="xs")
    p.add_argument("--no_ema", action="store_true")
    p.add_argument("--no_bake_params", action="store_true")
    args = p.parse_args(argv)

    cfg = Config(
        architecture=args.architecture,
        start_shape=args.start_shape,
        final_shape=args.final_shape,
        latent_dim=args.latent_dim,
        network_size=args.network_size,
        starting_phase=args.phase,
        ending_phase=args.phase,
    ).finalize()
    g_params, _ = _load_generator_params(args.model_path, use_ema=not args.no_ema)
    blob = export_generator(
        cfg, args.phase, g_params, batch_size=args.batch_size,
        bake_params=not args.no_bake_params,
    )
    save_exported(args.out, blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
