"""Frechet Inception Distance machinery.

Port of reference metrics/fid_new.py with a pluggable feature extractor:

* preprocessing preserved exactly (fid_new.py:330-458): NCDHW -> NDHWC,
  grayscale repeated to 3 channels, per-volume per-z-slice evaluation with
  the std-normal -> 8-bit mapping (dataset.py:15-26), activations of all
  slices pooled before one Frechet distance;
* `frechet_distance` is the numpy "stable version" (fid_new.py:115-166):
  scipy sqrtm with eps-diagonal retry and imaginary-part stripping.

Feature extractors:
* `InceptionFeatures(npz_path)` — loads a converted frozen-Inception weight
  file when one is provided (the reference downloads classify_image pb,
  fid_new.py:291-317; this environment has no egress, so the weights must be
  shipped as an .npz of name->array).  Raises with a clear message if absent.
* `RandomConvFeatures` — hermetic default: a fixed-seed random conv network
  evaluated in JAX.  Random-feature FID is scale-comparable within a run
  (monotone in distribution distance) but NOT numerically comparable to
  Inception-based FID; use only when no weights file is available.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from saragan_tpu.data.normalize import stdnormal_to_8bit_numpy

# -----------------------------------------------------------------------------
# Frechet distance (reference fid_new.py:115-166)
# -----------------------------------------------------------------------------


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape
    assert sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    def _sqrtm(a):
        out = linalg.sqrtm(a)  # scipy >= 1.18 drops the (result, errest) tuple
        return out[0] if isinstance(out, tuple) else out

    covmean = _sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        warnings.warn(
            f"fid calculation produces singular product; adding {eps} to diagonal of cov estimates"
        )
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    tr_covmean = np.trace(covmean)
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean)


def frechet_distance(act1: np.ndarray, act2: np.ndarray) -> float:
    """FID from two (N, dim) activation sets."""
    mu1, mu2 = act1.mean(axis=0), act2.mean(axis=0)
    s1 = np.cov(act1, rowvar=False)
    s2 = np.cov(act2, rowvar=False)
    return calculate_frechet_distance(mu1, s1, mu2, s2)


# -----------------------------------------------------------------------------
# Feature extractors
# -----------------------------------------------------------------------------


class RandomConvFeatures:
    """Deterministic random-weight conv embedder (2048-d), jitted.

    Input: (N, H, W, 3) in [0, 255]. He-scaled fixed-seed weights; strided
    convs to /16 resolution, global mean+max pooling, random projection.
    """

    #: random features are run-internally consistent but NOT numerically
    #: comparable to Inception FID — never report them as "FID" externally.
    calibrated = False

    def __init__(self, seed: int = 1234, out_dim: int = 2048):
        self.seed = seed
        self.out_dim = out_dim
        self._params = None
        self._apply = None

    def _build(self):
        key = jax.random.PRNGKey(self.seed)
        dims = [3, 32, 64, 128, 256]
        params = {}
        for i in range(4):
            key, k = jax.random.split(key)
            fan_in = 9 * dims[i]
            params[f"w{i}"] = jax.random.normal(k, (3, 3, dims[i], dims[i + 1])) * np.sqrt(
                2.0 / fan_in
            )
        key, k = jax.random.split(key)
        params["proj"] = jax.random.normal(k, (2 * dims[-1], self.out_dim)) / np.sqrt(
            2 * dims[-1]
        )
        self._params = params

        def apply(params, x):
            x = x.astype(jnp.float32) / 127.5 - 1.0
            dn = jax.lax.conv_dimension_numbers(x.shape, (3, 3, 3, 32), ("NHWC", "HWIO", "NHWC"))
            for i in range(4):
                x = jax.lax.conv_general_dilated(
                    x, params[f"w{i}"], (2, 2), "SAME", dimension_numbers=dn
                )
                x = jnp.where(x >= 0, x, 0.2 * x)
            mean = x.mean(axis=(1, 2))
            mx = x.max(axis=(1, 2))
            feat = jnp.concatenate([mean, mx], axis=-1)
            return feat @ params["proj"]

        self._apply = jax.jit(apply)

    def extract(self, images: np.ndarray) -> np.ndarray:
        if self._apply is None:
            self._build()
        return np.asarray(self._apply(self._params, jnp.asarray(images)), np.float32)


class InceptionFeatures:
    """Frozen-Inception pool_3 features from a converted weights .npz.

    The reference uses Google's classify_image_graph_def.pb
    (fid_new.py:291-317); the full FID-Inception architecture is implemented
    in metrics/inception.py and accepts the standard pytorch-fid
    `pt_inception-2015-12-05` weights after offline conversion
    (`convert_torch_state_dict` + `save_inception_npz`).  Ship the npz at
    `npz_path` (or set SARAGAN_INCEPTION_NPZ); without it this raises —
    there is no network egress in the build environment to download weights.
    """

    calibrated = True

    def __init__(self, npz_path: Optional[str] = None):
        self.npz_path = npz_path or os.environ.get("SARAGAN_INCEPTION_NPZ")
        if not self.npz_path or not os.path.isfile(self.npz_path):
            raise FileNotFoundError(
                "Inception weights npz not found. Provide npz_path or set "
                "SARAGAN_INCEPTION_NPZ; falling back to RandomConvFeatures gives "
                "run-internal (not cross-paper-comparable) FID values."
            )
        from saragan_tpu.metrics.inception import InceptionPool3Features, load_inception_npz

        self._impl = InceptionPool3Features(load_inception_npz(self.npz_path))

    def extract(self, images: np.ndarray) -> np.ndarray:
        return self._impl.extract(images)


class UncalibratedFIDError(RuntimeError):
    """Raised when FID is requested but no Inception weights are available."""


def default_extractor(allow_uncalibrated: bool = False, npz_path: Optional[str] = None):
    """Inception pool_3 extractor, or a HARD error without weights.

    The reference's FID is defined by frozen Inception features
    (fid_new.py:291-317); silently substituting random features would feed
    incomparable numbers to the HPO pruner and to logs labelled "fid".  Only
    with ``allow_uncalibrated=True`` (cfg/CLI --allow_uncalibrated_fid, or
    SARAGAN_ALLOW_UNCALIBRATED_FID=1) does this fall back to
    ``RandomConvFeatures`` — and even then the trainer withholds the value
    from ``trial.report`` (train/trainer.py).
    """
    try:
        return InceptionFeatures(npz_path)
    except (FileNotFoundError, NotImplementedError) as e:
        if allow_uncalibrated or os.environ.get("SARAGAN_ALLOW_UNCALIBRATED_FID"):
            warnings.warn(
                "FID requested without Inception weights: falling back to "
                "RandomConvFeatures. Values are run-internal only and are NOT "
                "comparable to published FID numbers."
            )
            return RandomConvFeatures()
        raise UncalibratedFIDError(
            "compute_FID requires converted Inception weights (set "
            "SARAGAN_INCEPTION_NPZ or --inception_weights; converter: "
            "saragan_tpu.metrics.inception.convert_torch_state_dict). "
            "Pass --allow_uncalibrated_fid to knowingly use random-feature "
            "FID for run-internal comparison only."
        ) from e


# -----------------------------------------------------------------------------
# Volume -> activations -> FID (reference fid_new.py:250-280, 330-458)
# -----------------------------------------------------------------------------


def get_activations_from_volume(volume_dhwc: np.ndarray, extractor, batch_size: int = 64):
    """Per-z-slice activations of one volume (D, H, W, C=3), std-normal input
    mapped to 8-bit (reference fid_new.py:250-280)."""
    n_imgs = len(volume_dhwc)
    batch_size = min(batch_size, n_imgs)
    preds = []
    for start in range(0, n_imgs, batch_size):
        batch = volume_dhwc[start : start + batch_size]
        batch = stdnormal_to_8bit_numpy(batch, False)
        preds.append(extractor.extract(batch.astype(np.float32)))
    return np.concatenate(preds, axis=0)


def volume_batch_activations(
    volumes_batch_real: np.ndarray,
    volumes_batch_fake: np.ndarray,
    extractor=None,
    data_format: str = "NCDHW",
    verbose: bool = True,
):
    """Pooled per-z-slice activations for a (real, fake) volume batch.

    Returns (acts_real, acts_fake), each (num_volumes * depth, feat_dim).
    Exposed separately from `calculate_fid_given_batch_volumes` so the
    orchestrator can pool activations across *all* metric batches into one
    set before a single Frechet distance (the reference gathers all fakes to
    rank 0 for exactly this bias concern, save_metrics.py:148-151)."""
    if volumes_batch_real.shape != volumes_batch_fake.shape:
        raise Exception(
            "ERROR: unequal shape for batches of real images (%s) and fake images (%s)"
            % (volumes_batch_real.shape, volumes_batch_fake.shape)
        )
    if volumes_batch_real.ndim != 5:
        raise Exception(
            "ERROR: volumes_batch_real.ndim (%s) is not equal to 5." % volumes_batch_real.ndim
        )
    if extractor is None:
        extractor = default_extractor()

    if data_format == "NCDHW":
        volumes_batch_real = np.transpose(volumes_batch_real, [0, 2, 3, 4, 1])
        volumes_batch_fake = np.transpose(volumes_batch_fake, [0, 2, 3, 4, 1])
    if volumes_batch_real.shape[-1] == 1:
        volumes_batch_real = np.repeat(volumes_batch_real, 3, axis=-1)
        volumes_batch_fake = np.repeat(volumes_batch_fake, 3, axis=-1)

    batch_size = min(64, volumes_batch_fake.shape[1])

    acts_real, acts_fake = [], []
    for i in range(len(volumes_batch_fake)):
        amax = np.amax(np.abs(volumes_batch_real[i]))
        if (amax > 8 or amax < 0.1) and verbose:
            print(
                "WARNING: it looks like your real input images are unnormalized. This may "
                "result in inaccurate FID calculations: the feature network assumes inputs "
                "in the range [0,255] and this code assumes a standard normalized input in "
                "order to map to this range."
            )
        acts_real.append(get_activations_from_volume(volumes_batch_real[i], extractor, batch_size))
        acts_fake.append(get_activations_from_volume(volumes_batch_fake[i], extractor, batch_size))

    # all z-slices of all volumes pooled into one activation set (fid_new.py:419-427)
    return np.concatenate(acts_real, axis=0), np.concatenate(acts_fake, axis=0)


def calculate_fid_given_batch_volumes(
    volumes_batch_real: np.ndarray,
    volumes_batch_fake: np.ndarray,
    extractor=None,
    data_format: str = "NCDHW",
    verbose: bool = True,
) -> float:
    acts_real, acts_fake = volume_batch_activations(
        volumes_batch_real, volumes_batch_fake, extractor, data_format, verbose
    )
    return frechet_distance(acts_real, acts_fake)
