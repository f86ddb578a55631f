"""Metrics orchestrator — rebuild of reference metrics/save_metrics.py:19-312.

Draws real batches from the dataset and fake batches from the provided
sampler until `num_metric_samples` samples are consumed, computes the
enabled metrics per batch, averages, writes summary scalars with the
reference's tag names ('fid', 'PSNR', 'ssim', 'MSE', 'NRMSE',
'swd_<lod>'/'swd_mean', each with the caller's suffix), and returns the
metrics dict (keys 'FID', 'psnr', 'ssim', 'mse', 'nrmse', 'swd').

The reference MPI-Gathers all fakes to rank 0 and computes there
(save_metrics.py:112-127, rationale :148-151 — FID is biased when averaged
over small per-rank batches).  Under the single-controller JAX runtime the
full batch is already host-visible, so the pooled computation is the natural
path and there is no gather step.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import numpy as np

from saragan_tpu.data.normalize import normalize_numpy
from saragan_tpu.metrics.fid import (
    calculate_fid_given_batch_volumes,
    frechet_distance,
    volume_batch_activations,
)
from saragan_tpu.metrics.skim import (
    get_mean_squared_error,
    get_normalized_root_mse,
    get_psnr,
    get_ssim,
)
from saragan_tpu.metrics.swd import get_swd_for_volumes


def save_metrics(
    writer,
    sample_fn: Callable[[jax.Array, int], np.ndarray],
    npy_data,
    batch_size: int,
    global_size: int,
    global_step: int,
    imagesize_xy: int,
    compute_metrics: Dict[str, bool],
    num_metric_samples: int,
    data_mean: Optional[float],
    data_stddev: Optional[float],
    verbose: bool = False,
    suffix: str = "",
    extractor=None,
    rng: Optional[jax.Array] = None,
    fid_mode: str = "pooled",
    allow_uncalibrated_fid: bool = False,
    inception_weights: Optional[str] = None,
) -> Dict[str, float]:
    """sample_fn(rng_key, n) -> (n, C, ...) generated batch (host numpy).

    fid_mode:
      * "pooled" (default): activations of ALL metric batches are pooled into
        one set and a single Frechet distance is computed over the full
        `num_metric_samples` — FID estimates are biased at small sample
        counts, which is why the reference gathers everything to rank 0
        before computing (save_metrics.py:148-151); pooling across the loop
        takes that reasoning to its conclusion.
      * "per_batch": one FID per metric batch, averaged — the reference's
        literal loop structure (save_metrics.py:156-213).
    """
    compute_metrics = dict(compute_metrics)
    # size gates (reference save_metrics.py:77-79)
    compute_metrics["compute_swds"] = imagesize_xy >= 16 and compute_metrics.get("compute_swds", False)
    min_dim = min(npy_data.shape[1:]) if hasattr(npy_data, "shape") else imagesize_xy
    compute_metrics["compute_ssims"] = min_dim >= 16 and compute_metrics.get("compute_ssims", False)

    if rng is None:
        rng = jax.random.PRNGKey(global_step + 1)

    fids_local, swds_local, psnrs_local, mses_local, nrmses_local, ssims_local = (
        [], [], [], [], [], [],
    )
    acts_real_pool, acts_fake_pool = [], []
    metrics: Dict[str, float] = {}

    if compute_metrics.get("compute_FID") and extractor is None:
        # Prefer resolving once via make_metrics_callback; this direct-call
        # fallback honors the same opt-in flags so a cfg with
        # allow_uncalibrated_fid=True behaves identically here.
        from saragan_tpu.metrics.fid import default_extractor

        extractor = default_extractor(
            allow_uncalibrated=allow_uncalibrated_fid, npz_path=inception_weights
        )

    # counter advances by the number of DISTINCT samples actually consumed —
    # under the single-controller runtime every batch is globally visible, so
    # `num_metric_samples` means what it says regardless of global_size (the
    # reference's per-rank draw+gather advances by global_size*batch,
    # save_metrics.py:199-205).
    counter = 0
    while counter < num_metric_samples:
        n = min(batch_size, num_metric_samples - counter)
        n = max(n, 1)
        real_batch = npy_data.batch(n)
        real_batch = normalize_numpy(real_batch, data_mean, data_stddev).astype(np.float32)
        rng, k = jax.random.split(rng)
        fake_batch = np.asarray(sample_fn(k, real_batch.shape[0]), np.float32)

        if compute_metrics.get("compute_FID"):
            if fid_mode == "pooled":
                ar, af = volume_batch_activations(
                    real_batch, fake_batch, extractor=extractor, verbose=verbose
                )
                acts_real_pool.append(ar)
                acts_fake_pool.append(af)
            else:
                fids_local.append(
                    calculate_fid_given_batch_volumes(
                        real_batch, fake_batch, extractor=extractor, verbose=verbose
                    )
                )
        if compute_metrics.get("compute_swds"):
            swds = get_swd_for_volumes(real_batch, fake_batch)
            if swds is not None:
                swds_local.append(swds)
        if compute_metrics.get("compute_psnrs"):
            psnrs_local.append(get_psnr(real_batch, fake_batch))
        if compute_metrics.get("compute_ssims"):
            ssims_local.append(np.mean(get_ssim(real_batch, fake_batch)))
        if compute_metrics.get("compute_mses"):
            mses_local.append(get_mean_squared_error(real_batch, fake_batch))
        if compute_metrics.get("compute_nrmses"):
            nrmses_local.append(get_normalized_root_mse(real_batch, fake_batch))

        counter += real_batch.shape[0]

    scalars: Dict[str, float] = {}
    if compute_metrics.get("compute_FID") and acts_real_pool:
        fids_local = [
            frechet_distance(
                np.concatenate(acts_real_pool, axis=0), np.concatenate(acts_fake_pool, axis=0)
            )
        ]
    if compute_metrics.get("compute_FID") and fids_local:
        fid = float(np.mean(fids_local))
        metrics["FID"] = fid
        scalars["fid" + suffix] = fid
        if verbose:
            print(f"FID: {fid:.4f}")
    if compute_metrics.get("compute_psnrs") and psnrs_local:
        psnr = float(np.mean(psnrs_local))
        metrics["psnr"] = psnr
        scalars["PSNR" + suffix] = psnr
        if verbose:
            print(f"PSNR: {psnr:.4f}")
    if compute_metrics.get("compute_ssims") and ssims_local:
        ssim = float(np.mean(ssims_local))
        metrics["ssim"] = ssim
        scalars["ssim" + suffix] = ssim
        if verbose:
            print(f"SSIM: {ssim}")
    if compute_metrics.get("compute_mses") and mses_local:
        mse = float(np.mean(mses_local))
        metrics["mse"] = mse
        scalars["MSE" + suffix] = mse
        if verbose:
            print(f"MSE: {mse:.4f}")
    if compute_metrics.get("compute_nrmses") and nrmses_local:
        nrmse = float(np.mean(nrmses_local))
        metrics["nrmse"] = nrmse
        scalars["NRMSE" + suffix] = nrmse
        if verbose:
            print(f"Normalized Root MSE: {nrmse:.4f}")
    if compute_metrics.get("compute_swds") and swds_local:
        swds = np.array(swds_local).mean(axis=0)
        metrics["swd"] = swds
        if verbose:
            print(f"SWDS: {swds}")
        for i in range(len(swds) - 1):
            lod = 16 * 2**i
            scalars[f"swd_{lod}" + suffix] = float(swds[i])
        scalars["swd_mean" + suffix] = float(swds[-1])

    if writer is not None and scalars:
        writer.scalars(scalars, global_step)

    return metrics


def make_metrics_callback(cfg, extractor=None):
    """Adapter plugging save_metrics into Trainer.metrics_callback.

    When FID is requested the extractor is resolved HERE, once, at setup —
    so a run missing Inception weights fails at startup (loudly) rather than
    mid-training, unless cfg.allow_uncalibrated_fid opts in.  The callback
    carries ``fid_calibrated`` so the trainer can withhold uncalibrated
    values from the HPO pruner.
    """
    from saragan_tpu.config import parse_tuple

    if extractor is None and cfg.compute_FID:
        from saragan_tpu.metrics.fid import default_extractor

        extractor = default_extractor(
            allow_uncalibrated=getattr(cfg, "allow_uncalibrated_fid", False),
            npz_path=getattr(cfg, "inception_weights", None),
        )

    compute = {
        "compute_FID": cfg.compute_FID,
        "compute_swds": cfg.compute_swds,
        "compute_ssims": cfg.compute_ssims,
        "compute_psnrs": cfg.compute_psnrs,
        "compute_mses": cfg.compute_mses,
        "compute_nrmses": cfg.compute_nrmses,
    }

    def callback(trainer, sampler, dataset, step, suffix):
        phase = trainer.phase
        start = parse_tuple(cfg.start_shape)
        imagesize_xy = start[-1] * 2 ** (phase - 1)
        num = cfg.num_metric_samples
        if not num:
            bs = cfg.batch_size_for_phase(phase, trainer.global_size)
            num = bs * trainer.global_size if bs > 1 else 2 * trainer.global_size

        def sample_fn(rng, n):
            return sampler(rng, n)

        return save_metrics(
            trainer.writer if trainer.verbose else None,
            sample_fn,
            dataset,
            cfg.metrics_batch_size,
            trainer.global_size,
            step,
            imagesize_xy,
            compute,
            num,
            cfg.data_mean,
            cfg.data_stddev,
            verbose=trainer.verbose,
            suffix=suffix,
            extractor=extractor,
        )

    callback.fid_calibrated = getattr(extractor, "calibrated", True)
    return callback
