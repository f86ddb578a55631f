"""Checkpoint inference tools — rebuild of reference generate.py /
generate_minimal.py (SURVEY C24).

`generate_minimal(...)`: restore the generator from a checkpoint, sample N
volumes, invert the input normalization, save .npy files
(generate_minimal.py:13-64).

`generate(...)`: restore G(+D), draw real batches, generate fakes, write PNG
mosaics of the centre z-slices and .npy dumps, compute the full metric
report (FID/SWD/PSNR/SSIM/MSE/NRMSE) and write summary.txt
(generate.py:20-221).  Metric averaging over batches replaces the MPI
allreduce (generate.py:184-189) — single-controller JAX sees all batches.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from saragan_tpu.config import Config
from saragan_tpu.core import filter_params
from saragan_tpu.data import NumpyPathDataset, invert_normalize_numpy, normalize_numpy
from saragan_tpu.models import get_architecture
from saragan_tpu.train import checkpoint as ckpt
from saragan_tpu.train.summaries import image_grid


def _load_generator_params(model_path: str, use_ema: bool = True):
    params, ema, meta = ckpt.load_params(model_path)
    src = ema if (use_ema and ema) else params
    return filter_params(src, "generator"), meta


def make_volume_sampler(cfg: Config, phase: int, batch_size: int = 4, alpha: float = 0.0,
                        fast_inference: bool = True):
    """ONE jitted sampler `gen(g_params, key) -> (batch_size, C, ...)`.

    Build it once per (cfg, phase, batch) and reuse across batches — a fresh
    jax.jit closure per call would re-trace and re-compile the generator
    every time (minutes per compile on the relayed chip)."""
    if fast_inference:
        import dataclasses

        cfg = dataclasses.replace(cfg, fused_transitions=True, use_pallas_fusion=True)
    cfg.apply_runtime_opts(inference=True)  # samplers keep direct (s2d loses forward-only, round-5 bench)
    arch = get_architecture(cfg.architecture)

    @jax.jit
    def gen(params, rng):
        k_z, k_g = jax.random.split(rng)
        z = jax.random.normal(k_z, (batch_size, cfg.latent_dim))
        return arch.generator(params, z, alpha, phase=phase, cfg=cfg, rng=k_g, train=False)

    # same per-compile options as the trainer (auto scoped-VMEM: serving
    # measured 40.3 -> 39.5 ms/batch-8 at phase 6; falls back on rejection)
    from saragan_tpu.parallel.mesh import aot_with_options, resolve_compiler_options

    return aot_with_options(gen, resolve_compiler_options(cfg.scoped_vmem_kib))


def make_keyed_sampler(cfg: Config, phase: int, batch_size: int = 4, alpha: float = 0.0,
                       fast_inference: bool = True, fetch_dtype=None, mesh=None):
    """ONE jitted per-sample-keyed sampler
    `gen(g_params, seeds (B,) int32, idxs (B,) int32) -> (B, C, ...)`.

    Output row j depends ONLY on (seeds[j], idxs[j]) — the whole generator
    (latent draw AND StyleGAN noise layers) is vmapped over a per-sample key
    `fold_in(PRNGKey(seeds[j]), idxs[j])`, so a sample is bit-identical
    whether its request is served alone or micro-batched with other
    requests' samples (tools/serve.py coalescing).  All key math stays on
    device: the host hands over two int32 vectors, one dispatch per batch.

    `fetch_dtype` (e.g. jnp.float16) casts the output ON DEVICE before the
    host fetch — halves the device->host bytes on fetch-bound links (the
    axon relay serving path is dominated by the volume fetch, BASELINE.md).
    Non-exact (~3 decimal digits at the normalized scale); None = exact.

    Applies the config's op-formulation gates before tracing (round 5:
    the s2d conv engine is the TPU default — same program the Trainer and
    bench compile).

    `mesh` (a 1-axis `jax.sharding.Mesh`) data-parallelizes the sampler:
    params replicate, the (seeds, idxs) batch and the output shard over the
    mesh axis — per-sample keying makes every row's computation independent,
    so GSPMD splits the batch with zero collectives and per-row results are
    IDENTICAL to the single-device sampler.  `batch_size` must divide by the
    mesh size.  The serving analog of the trainer's dp axis (SURVEY §5.8:
    the reference had no serving tier at all)."""
    if fast_inference:
        import dataclasses

        cfg = dataclasses.replace(cfg, fused_transitions=True, use_pallas_fusion=True)
    cfg.apply_runtime_opts(inference=True)  # samplers keep direct (s2d loses forward-only, round-5 bench)
    arch = get_architecture(cfg.architecture)

    def gen_fn(params, seeds, idxs):
        def one(s, j):
            k_z, k_g = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(s), j))
            z = jax.random.normal(k_z, (1, cfg.latent_dim))
            return arch.generator(params, z, alpha, phase=phase, cfg=cfg,
                                  rng=k_g, train=False)[0]
        out = jax.vmap(one)(seeds, idxs)
        return out if fetch_dtype is None else out.astype(fetch_dtype)

    if mesh is None:
        gen = jax.jit(gen_fn)
    else:
        from jax.sharding import NamedSharding, PartitionSpec

        if len(mesh.axis_names) != 1:
            raise ValueError(f"serving mesh must have one axis, got {mesh.axis_names}")
        n = mesh.devices.size
        if batch_size % n:
            raise ValueError(f"batch_size {batch_size} must divide by the "
                             f"mesh size {n}")
        repl = NamedSharding(mesh, PartitionSpec())
        row = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        gen = jax.jit(gen_fn, in_shardings=(repl, row, row), out_shardings=row)

    from saragan_tpu.parallel.mesh import aot_with_options, resolve_compiler_options

    return aot_with_options(gen, resolve_compiler_options(cfg.scoped_vmem_kib))


def sample_volumes(cfg: Config, phase: int, g_params, num_samples: int, seed: int = 0,
                   batch_size: int = 4, alpha: float = 0.0,
                   fast_inference: bool = True, _sampler=None) -> np.ndarray:
    """Generate volumes. `fast_inference` enables the exact fused
    transition + Pallas elementwise kernels (measured +29% sampling
    throughput on v5e; bit-identical up to f32 rounding order)."""
    gen = _sampler if _sampler is not None else make_volume_sampler(
        cfg, phase, batch_size, alpha, fast_inference)

    out = []
    rng = jax.random.PRNGKey(seed)
    while sum(b.shape[0] for b in out) < num_samples:
        rng, k = jax.random.split(rng)
        out.append(np.asarray(gen(g_params, k), np.float32))
    return np.concatenate(out)[:num_samples]


def generate_minimal(
    architecture: str,
    model_path: str,
    output_dir: str,
    *,
    cfg: Optional[Config] = None,
    phase: Optional[int] = None,
    num_samples: int = 8,
    seed: int = 0,
    data_mean: Optional[float] = None,
    data_stddev: Optional[float] = None,
    use_ema: bool = True,
) -> list:
    """Restore G, sample, un-normalize, save npy (generate_minimal.py:13-64)."""
    assert cfg is not None, "pass the run Config (shapes/specs are needed to rebuild G)"
    phase = phase or cfg.ending_phase
    g_params, _ = _load_generator_params(model_path, use_ema)
    fakes = sample_volumes(cfg, phase, g_params, num_samples, seed)
    fakes = invert_normalize_numpy(fakes, data_mean, data_stddev)
    os.makedirs(output_dir, exist_ok=True)
    paths = []
    for i, vol in enumerate(fakes):
        path = os.path.join(output_dir, f"fake_{i:04d}.npy")
        np.save(path, vol[0])  # drop channel axis like the reference dumps
        paths.append(path)
    return paths


def _save_png(path: str, grid: np.ndarray):
    import imageio

    from saragan_tpu.train.summaries import grid_to_uint8

    imageio.imwrite(path, grid_to_uint8(grid))


def generate(
    architecture: str,
    dataset_path: str,
    model_path: str,
    output_dir: str,
    *,
    cfg: Config,
    phase: Optional[int] = None,
    num_samples: int = 16,
    batch_size: int = 4,
    seed: int = 0,
    compute_metrics: Optional[Dict[str, bool]] = None,
    use_ema: bool = True,
) -> Dict[str, float]:
    """Full inference report (generate.py:20-221)."""
    from saragan_tpu.metrics import (
        calculate_fid_given_batch_volumes,
        get_mean_squared_error,
        get_normalized_root_mse,
        get_psnr,
        get_ssim,
        get_swd_for_volumes,
    )

    phase = phase or cfg.ending_phase
    g_params, _ = _load_generator_params(model_path, use_ema)
    os.makedirs(output_dir, exist_ok=True)

    from saragan_tpu.data.dataset import get_numpy_dataset

    # canonical resolution-dir inference (dataset.py get_numpy_dataset)
    real_ds = get_numpy_dataset(phase, cfg.starting_phase, cfg.start_shape,
                                dataset_path, None, seed=seed)

    compute_metrics = compute_metrics or dict(
        compute_FID=cfg.compute_FID, compute_swds=cfg.compute_swds,
        compute_ssims=cfg.compute_ssims, compute_psnrs=cfg.compute_psnrs,
        compute_mses=cfg.compute_mses, compute_nrmses=cfg.compute_nrmses,
    )

    sums: Dict[str, list] = {k: [] for k in ("fid", "swd", "psnr", "ssim", "mse", "nrmse")}
    sampler = make_volume_sampler(cfg, phase, batch_size)  # compiled once
    done = 0
    batch_i = 0
    while done < num_samples:
        n = min(batch_size, num_samples - done)
        real = normalize_numpy(real_ds.batch(n), cfg.data_mean, cfg.data_stddev).astype(np.float32)
        fake = sample_volumes(cfg, phase, g_params, n, seed + batch_i,
                              batch_size=batch_size, _sampler=sampler)

        # PNG mosaics + npy dumps (generate.py:137-175)
        _save_png(os.path.join(output_dir, f"real_{batch_i:04d}.png"), image_grid(real))
        _save_png(os.path.join(output_dir, f"fake_{batch_i:04d}.png"), image_grid(fake))
        for j, vol in enumerate(fake):
            np.save(os.path.join(output_dir, f"fake_{batch_i:04d}_{j}.npy"),
                    invert_normalize_numpy(vol[0], cfg.data_mean, cfg.data_stddev))

        if compute_metrics.get("compute_FID"):
            sums["fid"].append(calculate_fid_given_batch_volumes(real, fake, verbose=False))
        if compute_metrics.get("compute_swds") and real.ndim == 5 and real.shape[-1] >= 16:
            swd = get_swd_for_volumes(real, fake)
            if swd is not None:
                sums["swd"].append(swd[-1])
        if compute_metrics.get("compute_psnrs"):
            sums["psnr"].append(get_psnr(real, fake))
        if compute_metrics.get("compute_ssims") and min(real.shape[2:]) >= 16:
            sums["ssim"].append(float(np.mean(get_ssim(real, fake))))
        if compute_metrics.get("compute_mses"):
            sums["mse"].append(get_mean_squared_error(real, fake))
        if compute_metrics.get("compute_nrmses"):
            sums["nrmse"].append(get_normalized_root_mse(real, fake))

        done += n
        batch_i += 1

    report = {k: float(np.mean(v)) for k, v in sums.items() if v}
    with open(os.path.join(output_dir, "summary.txt"), "w") as f:
        for k, v in report.items():
            f.write(f"{k}: {v}\n")
    return report


def main(argv=None):
    """CLI: python -m saragan_tpu.tools.generate <arch> <dataset> <model> <out> ...
    (reference generate.py:223-269 surface, trimmed to the used flags)."""
    import argparse

    from saragan_tpu.cli import build_parser, config_from_args

    p = argparse.ArgumentParser(prog="saragan_tpu.tools.generate")
    p.add_argument("architecture")
    p.add_argument("dataset_path")
    p.add_argument("model_path")
    p.add_argument("output_dir")
    p.add_argument("--config_args", nargs=argparse.REMAINDER, default=[],
                   help="remaining args forwarded to the training CLI parser "
                        "(shapes/specs needed to rebuild the nets)")
    p.add_argument("--phase", type=int, default=None)
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--minimal", action="store_true", help="generate_minimal mode")
    args = p.parse_args(argv)

    train_args = build_parser().parse_args([args.architecture, args.dataset_path] + args.config_args)
    cfg = config_from_args(train_args).finalize()

    if args.minimal:
        paths = generate_minimal(
            args.architecture, args.model_path, args.output_dir, cfg=cfg, phase=args.phase,
            num_samples=args.num_samples, data_mean=cfg.data_mean, data_stddev=cfg.data_stddev,
        )
        print(f"wrote {len(paths)} volumes to {args.output_dir}")
    else:
        report = generate(
            args.architecture, args.dataset_path, args.model_path, args.output_dir,
            cfg=cfg, phase=args.phase, num_samples=args.num_samples, batch_size=args.batch_size,
        )
        print(report)


if __name__ == "__main__":
    main()
