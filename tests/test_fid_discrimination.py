"""FID/SWD discrimination battery + end-to-end numeric FID cross-validation.

Two evidence gaps closed (VERDICT r2 items 2a and 3):

1. The reference ships a corruption self-test for FID (metrics/fid.py:409-464:
   box-sampled patch corruptions via utils.uniform_box_sampler with expected
   FID orderings — it was exploratory/commented-out there).  Here that intent
   becomes *asserted* tests: volumes corrupted with increasingly many zeroed
   boxes must produce monotonically increasing FID under BOTH feature
   extractors (the hermetic RandomConvFeatures proxy and the full Inception
   architecture with random weights), and monotonically increasing SWD.
   This converts "metrics run" into "metrics discriminate".

2. tests/test_inception.py cross-validates pool3 *features* against an
   independent torch transcription; here the ENTIRE FID pipeline — NCDHW
   volume handling, channel repeat, per-z-slice batching, std-normal -> 8-bit
   mapping (reference dataset.py:15-26), resize/scale preprocessing, pooled
   activations, Frechet distance — is cross-validated as one scalar against
   an independently written torch+numpy pipeline driven by the same random
   Inception weights.  When real pt_inception weights land (see
   scripts/calibrate_fid.py) the identical code path becomes standard FID.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from scipy import linalg  # noqa: E402

from saragan_tpu.metrics.fid import (  # noqa: E402
    RandomConvFeatures,
    calculate_fid_given_batch_volumes,
)
from saragan_tpu.metrics.inception import (  # noqa: E402
    InceptionPool3Features,
    random_inception_params,
)
from saragan_tpu.metrics.swd import get_swd_for_volumes  # noqa: E402
from saragan_tpu.utils import uniform_box_sampler  # noqa: E402

from test_inception import torch_pool3  # noqa: E402  (independent torch net)


# ---------------------------------------------------------------------------
# box corruption (reference metrics/fid.py:425-436 battery shape)
# ---------------------------------------------------------------------------


def _box_corrupt(volumes: np.ndarray, boxes_per_volume: int, seed: int) -> np.ndarray:
    """Zero `boxes_per_volume` random boxes in each volume of an NCDHW batch
    (the reference zeroes 16 boxes per volume, fid.py:425-430)."""
    rng = np.random.default_rng(seed)
    out = volumes.copy()
    n, _, d, h, w = out.shape
    for i in range(n):
        for _ in range(boxes_per_volume):
            slices, _ = uniform_box_sampler(
                out[i, 0],
                min_width=(max(1, d // 4), h // 4, w // 4),
                max_width=(max(2, d // 2), h // 2, w // 2),
                rng=rng,
            )
            out[(i, 0) + slices] = 0.0
    return out


def _extractors():
    yield "random_conv", RandomConvFeatures(out_dim=128)
    yield "inception_randw", InceptionPool3Features(random_inception_params(seed=3))


@pytest.mark.parametrize("name", ["random_conv", "inception_randw"])
def test_fid_monotone_under_box_corruption(name):
    """FID(real, same-distribution) < FID(real, lightly corrupted) <
    FID(real, heavily corrupted) — for the proxy AND the Inception net.

    Sample sizes are per-extractor: the cheap proxy gets enough slices to
    push the FID noise floor below the corruption signal (12 slices left it
    flat at the floor); the full Inception forward stays small for CPU time.
    """
    extractor = dict(_extractors())[name]
    rng = np.random.default_rng(0)
    shape = (6, 1, 8, 32, 32) if name == "random_conv" else (3, 1, 4, 32, 32)
    real = rng.normal(size=shape).astype(np.float32)
    clean = rng.normal(size=shape).astype(np.float32)  # same distribution
    # ~25% / ~37% of voxels zeroed — the reference battery's own corruption
    # level is 16 boxes/volume (fid.py:425-430); the proxy extractor cannot
    # resolve corruption much below its clean-vs-clean FID noise floor
    # (measured: 11% zeroed is invisible to it at this sample count)
    light = _box_corrupt(clean, 8, seed=1)
    heavy = _box_corrupt(clean, 16, seed=2)

    fids = [
        calculate_fid_given_batch_volumes(real, f, extractor, verbose=False)
        for f in (clean, light, heavy)
    ]
    assert np.all(np.isfinite(fids)), fids
    assert fids[0] < fids[1] < fids[2], f"{name}: not monotone: {fids}"


def test_swd_monotone_under_box_corruption():
    rng = np.random.default_rng(0)
    shape = (4, 1, 16, 32, 32)
    real = rng.normal(size=shape).astype(np.float32)
    clean = rng.normal(size=shape).astype(np.float32)
    light = _box_corrupt(clean, 2, seed=1)
    heavy = _box_corrupt(clean, 12, seed=2)

    swd_rng = np.random.default_rng(7)
    means = []
    for f in (clean, light, heavy):
        # fresh-but-identical projection stream per pair: SWD is comparable
        # across pairs only when the random directions match
        vals = get_swd_for_volumes(real, f, rng=np.random.default_rng(7))
        means.append(vals[-1])
    del swd_rng
    assert means[0] < means[1] < means[2], f"SWD not monotone: {means}"


# ---------------------------------------------------------------------------
# end-to-end numeric cross-validation (VERDICT r2 item 2a)
# ---------------------------------------------------------------------------


def _torch_volume_fid(real: np.ndarray, fake: np.ndarray, params) -> float:
    """Independent pipeline: same spec, different code at every stage."""

    def acts(vols_ncdhw):
        v = np.transpose(vols_ncdhw, [0, 2, 3, 4, 1])  # N,D,H,W,C
        v = np.repeat(v, 3, axis=-1)
        feats = []
        for vol in v:
            img8 = np.clip(64.0 * vol + 128.0, 0, 255).astype(int)  # dataset.py:15-26
            t = torch.from_numpy(img8.astype(np.float32)).permute(0, 3, 1, 2) / 255.0
            t = F.interpolate(t, size=(299, 299), mode="bilinear", align_corners=False)
            with torch.no_grad():
                feats.append(torch_pool3(params, t * 2.0 - 1.0).numpy())
        return np.concatenate(feats, axis=0)

    a1, a2 = acts(real), acts(fake)
    mu1, mu2 = a1.mean(axis=0), a2.mean(axis=0)
    s1, s2 = np.cov(a1, rowvar=False), np.cov(a2, rowvar=False)
    covmean = linalg.sqrtm(s1 @ s2)
    if isinstance(covmean, tuple):
        covmean = covmean[0]
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    diff = mu1 - mu2
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))


def test_end_to_end_fid_matches_independent_torch_pipeline():
    """calculate_fid_given_batch_volumes == the torch pipeline, same random
    Inception weights, two synthetic volume batches — one SCALAR equality
    covering every stage of the FID path at once."""
    params = random_inception_params(seed=3)
    rng = np.random.default_rng(0)
    shape = (2, 1, 6, 32, 32)
    real = rng.normal(size=shape).astype(np.float32)
    fake = (rng.normal(size=shape) * 0.8 + 0.3).astype(np.float32)

    repo_fid = calculate_fid_given_batch_volumes(
        real, fake, InceptionPool3Features(params), verbose=False
    )
    torch_fid = _torch_volume_fid(real, fake, params)

    assert np.isfinite(repo_fid) and np.isfinite(torch_fid)
    np.testing.assert_allclose(repo_fid, torch_fid, rtol=1e-3, atol=1e-3)
