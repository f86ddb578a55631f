"""HTTP serving endpoint for trained generators.

A TPU-native production-serving surface beyond the reference's tooling
(the reference's closest analog is offline batch inference,
generate_minimal.py:13-64).  One process owns the chip; requests are
serialized through a lock (the hardware rule: one chip program at a time)
and served from a single pre-compiled sampler, so steady-state latency is
one sampler invocation (~34 ms/batch-8 at 128x128x32 on v5e, BASELINE.md
serving A/B).

    python -m saragan_tpu.tools.serve pgan --model_path runs/model_6.npz \
        --phase 6 --latent_dim 256 --start_shape "(1, 1, 4, 4)" \
        --final_shape "(1, 128, 512, 512)" --port 8753

or from a portable StableHLO artifact (no checkpoint / model code needed):

    python -m saragan_tpu.tools.serve --artifact g.stablehlo --port 8753

Endpoints:
  GET  /healthz    -> {"status": "ok"}
  GET  /info       -> model/config JSON (shape, batch size, param count)
  POST /generate   -> JSON body {"num_samples": N, "seed": S,
                      "format": "npy"|"png", "unnormalize": bool}
                      (N capped by --max_samples, default 1024; client
                      errors are 400, server faults 500)
       npy (default): one .npy blob, float32 (N, C, ...) volumes
       png: a mosaic of the centre z-slices (3D) or the images (2D)

`unnormalize` (default true when --data_mean/--data_stddev are given)
inverts the training normalization so clients receive HU-scale volumes
(reference generate_minimal.py:52-55).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from saragan_tpu.config import Config


class GeneratorService:
    """Holds one compiled sampler + its parameters; thread-safe sampling."""

    # cap on num_samples per request: bounds both chip-lock hold time and
    # the host-side volume accumulation (each phase-6 batch-8 f32 batch is
    # ~17 MB; an unbounded request would hold the chip for days and OOM the
    # host).  Overridable via --max_samples.
    DEFAULT_MAX_SAMPLES = 1024

    def __init__(self, sample_batch, batch_size: int, info: dict,
                 data_mean: Optional[float] = None,
                 data_stddev: Optional[float] = None,
                 max_samples: Optional[int] = None):
        # sample_batch(seed:int, batch_index:int) -> (batch, C, ...) np.float32
        self._sample_batch = sample_batch
        self.batch_size = int(batch_size)
        self.info = dict(info)
        self.data_mean = data_mean
        self.data_stddev = data_stddev
        self.max_samples = int(max_samples or self.DEFAULT_MAX_SAMPLES)
        self._lock = threading.Lock()

    # -- constructors ----------------------------------------------------

    @classmethod
    def from_checkpoint(cls, architecture: str, model_path: str, *, cfg: Config,
                        phase: int, batch_size: int = 8, alpha: float = 0.0,
                        use_ema: bool = True, max_samples: Optional[int] = None):
        import jax

        from saragan_tpu.tools.generate import _load_generator_params, make_volume_sampler

        g_params, meta = _load_generator_params(model_path, use_ema=use_ema)
        sampler = make_volume_sampler(cfg, phase, batch_size, alpha)
        params_dev = jax.device_put(g_params)

        def sample_batch(seed: int, i: int) -> np.ndarray:
            # fold_in (not seed+i): batch i of request seed S must not equal
            # batch 0 of request seed S+i — streams of different seeds would
            # otherwise overlap sample-for-sample
            key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
            return np.asarray(sampler(params_dev, key), np.float32)

        info = {
            "source": "checkpoint",
            "architecture": architecture,
            "phase": phase,
            "batch_size": batch_size,
            "latent_dim": cfg.latent_dim,
            "volume_shape": list(cfg.current_shape(phase, 1))[1:],
            "ema": bool(use_ema),
            "num_params": int(sum(int(np.size(v)) for v in g_params.values())),
        }
        return cls(sample_batch, batch_size, info,
                   cfg.data_mean, cfg.data_stddev, max_samples=max_samples)

    @classmethod
    def from_artifact(cls, path: str, latent_dim: Optional[int] = None,
                      data_mean: Optional[float] = None,
                      data_stddev: Optional[float] = None,
                      max_samples: Optional[int] = None):
        """Serve a params-baked StableHLO artifact (tools.export_model)."""
        from jax import export as jexport

        with open(path, "rb") as f:
            exported = jexport.deserialize(f.read())
        gen = exported.call
        # the artifact's input signature fixes (batch, latent_dim)
        (z_aval,) = exported.in_avals
        batch_size, art_latent = int(z_aval.shape[0]), int(z_aval.shape[1])
        if latent_dim is not None and latent_dim != art_latent:
            raise ValueError(f"--latent_dim {latent_dim} != artifact's {art_latent}")

        def sample_batch(seed: int, i: int) -> np.ndarray:
            z = np.random.default_rng([seed, i]).normal(
                size=(batch_size, art_latent)).astype(np.float32)
            return np.asarray(gen(z), np.float32)

        info = {
            "source": "stablehlo_artifact",
            "artifact": path,
            "batch_size": batch_size,
            "latent_dim": art_latent,
        }
        return cls(sample_batch, batch_size, info, data_mean, data_stddev,
                   max_samples=max_samples)

    # -- sampling ---------------------------------------------------------

    def generate(self, num_samples: int, seed: int = 0,
                 unnormalize: Optional[bool] = None) -> np.ndarray:
        if num_samples < 1:
            raise ValueError("num_samples must be >= 1")
        if num_samples > self.max_samples:
            raise ValueError(
                f"num_samples {num_samples} > max_samples {self.max_samples} "
                f"(server cap; raise with --max_samples)")
        out = []
        with self._lock:  # one chip program at a time
            for i in range((num_samples + self.batch_size - 1) // self.batch_size):
                out.append(self._sample_batch(seed, i))
        vols = np.concatenate(out)[:num_samples]
        do_unnorm = (self.data_mean is not None and self.data_stddev is not None
                     if unnormalize is None else bool(unnormalize))
        if do_unnorm:
            if self.data_mean is None or self.data_stddev is None:
                raise ValueError("unnormalize requested but --data_mean/--data_stddev unknown")
            from saragan_tpu.data import invert_normalize_numpy

            vols = invert_normalize_numpy(vols, self.data_mean, self.data_stddev)
        return vols


def _png_bytes(vols: np.ndarray) -> bytes:
    import imageio

    from saragan_tpu.train.summaries import grid_to_uint8, image_grid

    buf = io.BytesIO()
    imageio.imwrite(buf, grid_to_uint8(image_grid(vols)), format="png")
    return buf.getvalue()


def _npy_bytes(vols: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, vols)
    return buf.getvalue()


def make_server(service: GeneratorService, port: int = 8753,
                host: str = "127.0.0.1") -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._send_json(200, {"status": "ok"})
            elif self.path == "/info":
                self._send_json(200, service.info)
            else:
                self._send_json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._send_json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                # request parsing + validation: failures here are the
                # CLIENT's (malformed JSON, bad types, out-of-range values)
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    num = int(req.get("num_samples", service.batch_size))
                    seed = int(req.get("seed", 0))
                    fmt = req.get("format", "npy")
                    if fmt not in ("npy", "png"):
                        raise ValueError(f"unknown format {fmt!r}")
                except (ValueError, TypeError, json.JSONDecodeError) as e:
                    self._send_json(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                try:
                    vols = service.generate(num, seed, req.get("unnormalize"))
                except ValueError as e:  # num_samples/unnormalize validation
                    self._send_json(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                if fmt == "npy":
                    self._send(200, _npy_bytes(vols), "application/octet-stream")
                else:
                    self._send(200, _png_bytes(vols), "image/png")
            except Exception as e:  # server-side fault: 5xx, server stays up
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv: Optional[list] = None):
    import argparse

    p = argparse.ArgumentParser(description="Serve a trained generator over HTTP")
    p.add_argument("architecture", nargs="?", default=None)
    p.add_argument("--model_path", default=None, help="checkpoint .npz (model_{phase})")
    p.add_argument("--artifact", default=None, help="params-baked .stablehlo artifact")
    p.add_argument("--phase", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--latent_dim", type=int, default=256)
    p.add_argument("--start_shape", default="(1, 1, 4, 4)")
    p.add_argument("--final_shape", default="(1, 128, 512, 512)")
    p.add_argument("--network_size", default="xs")
    p.add_argument("--alpha", type=float, default=0.0)
    p.add_argument("--no_ema", action="store_true")
    p.add_argument("--data_mean", type=float, default=None)
    p.add_argument("--data_stddev", type=float, default=None)
    p.add_argument("--port", type=int, default=8753)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--max_samples", type=int, default=None,
                   help="per-request num_samples cap (default "
                        f"{GeneratorService.DEFAULT_MAX_SAMPLES})")
    args = p.parse_args(argv)

    if args.artifact:
        service = GeneratorService.from_artifact(
            args.artifact, data_mean=args.data_mean, data_stddev=args.data_stddev,
            max_samples=args.max_samples)
    else:
        if not (args.architecture and args.model_path and args.phase):
            p.error("either --artifact, or <architecture> --model_path --phase")
        cfg = Config(
            architecture=args.architecture,
            start_shape=args.start_shape,
            final_shape=args.final_shape,
            latent_dim=args.latent_dim,
            network_size=args.network_size,
            starting_phase=args.phase,
            ending_phase=args.phase,
            data_mean=args.data_mean,
            data_stddev=args.data_stddev,
        ).finalize()
        service = GeneratorService.from_checkpoint(
            args.architecture, args.model_path, cfg=cfg, phase=args.phase,
            batch_size=args.batch_size, alpha=args.alpha, use_ema=not args.no_ema,
            max_samples=args.max_samples)

    # compile before accepting traffic so the first request isn't a
    # multi-minute cold compile
    service.generate(1, seed=0, unnormalize=False)
    srv = make_server(service, port=args.port, host=args.host)
    print(f"serving {service.info} on http://{args.host}:{srv.server_address[1]}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
