"""Training summaries / observability.

Equivalent of reference summary.py + utils.py:48-73 (SURVEY C20, §5.5):
scalar families (losses, gp, image min/max, alpha, lrs, grad max-norms,
throughput) with the reference's tag names and `_val` / `_EMA` / `_freeze`
suffixes, image-grid mosaics of z-slices, and the timestamped stdout line.

Backend: torch.utils.tensorboard when available (torch-cpu ships in this
image), else JSONL events (always written — they double as the machine-
readable training log)."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class SummaryWriter:
    def __init__(self, logdir: Optional[str], use_tensorboard: bool = True):
        self.logdir = logdir
        self._tb = None
        self._jsonl = None
        if logdir is None:
            return
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "events.jsonl"), "a", buffering=1)
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter as TBWriter

                self._tb = TBWriter(log_dir=logdir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def scalars(self, values: Dict[str, float], step: int):
        for tag, v in values.items():
            self.scalar(tag, v, step)

    def image(self, tag: str, image_hw_or_hwc: np.ndarray, step: int):
        if self._tb is not None:
            img = image_hw_or_hwc
            if img.ndim == 2:
                img = img[None]  # CHW with C=1
            elif img.ndim == 3 and img.shape[-1] in (1, 3):
                img = np.transpose(img, (2, 0, 1))
            self._tb.add_image(tag, img.astype(np.float32), step)

    def histogram_raw(self, tag: str, counts: np.ndarray, edges: np.ndarray, step: int):
        """Histogram from precomputed on-device bins (the per-variable grad
        histograms of reference summary.py:83-87; bins are reduced inside the
        jitted step so only ~65 floats per variable cross the host boundary)."""
        counts = np.asarray(counts, np.float64)
        edges = np.asarray(edges, np.float64)
        if self._jsonl is not None:
            # full distribution, not just min/max/count — the JSONL doubles
            # as the machine-readable log even without torch's TB writer
            self._jsonl.write(json.dumps({
                "tag": tag, "step": int(step), "hist": True,
                "min": float(edges[0]), "max": float(edges[-1]),
                "count": float(counts.sum()),
                "counts": counts.tolist(), "edges": edges.tolist(),
            }) + "\n")
        if self._tb is not None:
            centers = (edges[:-1] + edges[1:]) / 2.0
            total = float(counts.sum())
            if total <= 0:
                return
            self._tb.add_histogram_raw(
                tag,
                min=float(edges[0]),
                max=float(edges[-1]),
                num=int(total),
                sum=float((counts * centers).sum()),
                sum_squares=float((counts * centers**2).sum()),
                bucket_limits=edges[1:].tolist(),
                bucket_counts=counts.tolist(),
                global_step=step,
            )

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
        if self._jsonl is not None:
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()


def small_summary(d_loss, g_loss, gp_loss, fake, real, suffix: str = "") -> Dict[str, float]:
    """Reference summary.py small family (create_small_summary,
    summary.py:27-57): 'Loss/' scoped losses (gp tag is 'gp', not gp_loss) +
    the Image_properties min/max scalars, reference tag names."""
    return {
        f"Loss/d_loss{suffix}": float(d_loss),
        f"Loss/g_loss{suffix}": float(g_loss),
        f"Loss/gp{suffix}": float(gp_loss),
        **image_range_summary(fake, real, suffix),
    }


def image_range_summary(fake, real, suffix: str = "") -> Dict[str, float]:
    """Image_properties family (reference summary.py:46-52): min/max of the
    generated sample (whole batch) and of the FIRST real sample
    (real_image_input[0], summary.py:51-52).  `fake`/`real` may be arrays or
    precomputed (min, max) scalar pairs."""
    fmin, fmax = fake if isinstance(fake, tuple) else (np.min(fake), np.max(fake))
    rmin, rmax = real if isinstance(real, tuple) else (np.min(real[0]), np.max(real[0]))
    return {
        f"Image_properties/image_min_fake{suffix}": float(fmin),
        f"Image_properties/image_max_fake{suffix}": float(fmax),
        f"Image_properties/image_min_real{suffix}": float(rmin),
        f"Image_properties/image_max_real{suffix}": float(rmax),
    }


def training_props_summary(alpha, g_lr, d_lr) -> Dict[str, float]:
    """Training_properties scope (reference summary.py:7-21)."""
    return {
        "Training_properties/alpha": float(alpha),
        "Training_properties/g_lr": float(g_lr),
        "Training_properties/d_lr": float(d_lr),
    }


def memory_summary() -> Dict[str, float]:
    """Memory telemetry (reference logs psutil RSS%% to TB,
    SURFGAN_2D/main.py:423-425; device HBM stats are the TPU-native upgrade
    SURVEY §5.1 calls for).  Empty dict when a backend exposes no stats."""
    out: Dict[str, float] = {}
    try:
        import psutil

        out["memory/host_rss_percent"] = float(psutil.Process().memory_percent())
    except Exception:
        # not just ImportError: psutil can raise AccessDenied reading /proc
        # in restricted containers — telemetry must never kill the train loop
        pass
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        if "bytes_in_use" in stats:
            out["memory/device_bytes_in_use"] = float(stats["bytes_in_use"])
        if "peak_bytes_in_use" in stats:
            out["memory/device_peak_bytes_in_use"] = float(stats["peak_bytes_in_use"])
    except Exception:
        pass
    return out


def gradients_summary(max_g_norm, max_d_norm, suffix: str = "") -> Dict[str, float]:
    """Gradient norms live under the 'Loss/' scope in the reference
    (summary.py:79-87)."""
    return {
        f"Loss/max_g_grad_norm{suffix}": float(max_g_norm),
        f"Loss/max_d_grad_norm{suffix}": float(max_d_norm),
    }


def image_grid(batch: np.ndarray, grid_cols: int = 4, pad_value: float = 0.0) -> np.ndarray:
    """Mosaic of the centre z-slices of a (N, C, D, H, W) batch — the large
    summary (reference utils.py:348-392 + summary.py image mosaics).
    2D (N, C, H, W) batches are used as-is. Returns (H', W') grayscale."""
    if batch.ndim == 5:
        mid = batch.shape[2] // 2
        imgs = batch[:, 0, mid]  # (N, H, W)
    elif batch.ndim == 4:
        imgs = batch[:, 0]
    else:
        raise ValueError(batch.shape)
    n, h, w = imgs.shape
    if n == 0:
        raise ValueError("image_grid: empty batch (no samples to tile)")
    cols = min(grid_cols, n)
    rows = (n + cols - 1) // cols
    grid = np.full((rows * h, cols * w), pad_value, imgs.dtype)
    for i in range(n):
        r, c = divmod(i, cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = imgs[i]
    return grid


def grid_to_uint8(grid: np.ndarray) -> np.ndarray:
    """Min-max normalize an image_grid mosaic to uint8 for PNG writers
    (shared by tools.generate and tools.serve; flat grids map to zeros)."""
    lo, hi = grid.min(), grid.max()
    img = np.zeros_like(grid, dtype=np.float64) if hi == lo else (grid - lo) / (hi - lo)
    return (img * 255).astype(np.uint8)


def print_summary_to_stdout(
    global_step, in_phase_step, img_s, local_img_s, d_loss, g_loss, d_lr_val, g_lr_val, alpha
):
    """Timestamped stdout line (reference utils.py:48-73, same format)."""
    current_time = time.strftime("%Y-%m-%d_%H:%M:%S", time.gmtime())
    print(
        f"{current_time} \t"
        f"Step {global_step:09} \t"
        f"Step(phase) {in_phase_step:09} \t"
        f"img/s {img_s:.2f} \t "
        f"img/s/worker {local_img_s:.3f} \t"
        f"d_loss {d_loss:.4f} \t "
        f"g_loss {g_loss:.4f} \t "
        f"d_lr {d_lr_val:.5f} \t"
        f"g_lr {g_lr_val:.5f} \t"
        f"alpha {float(alpha):.2f}"
    )
