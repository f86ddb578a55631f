"""HTTP serving endpoint for trained generators.

A TPU-native production-serving surface beyond the reference's tooling
(the reference's closest analog is offline batch inference,
generate_minimal.py:13-64).  One process owns the chip; one pre-compiled
fixed-shape sampler serves every request (no recompiles), so steady-state
latency is one sampler invocation (~34 ms/batch-8 at 128x128x32 on v5e,
BASELINE.md serving A/B).

Concurrent requests are MICRO-BATCHED: a worker thread drains per-sample
slots from all pending requests into one fixed-size device batch —
splitting large requests across dispatches and packing small concurrent
ones together — so a burst of batch-1 clients rides the chip at full
batch occupancy instead of each burning a whole batch.  Sample j of
request seed S is derived from `fold_in(PRNGKey(S), j)` *per sample*
inside the sampler (tools/generate.py::make_keyed_sampler), so responses
are bit-identical whether a request is served alone or coalesced.
GET /stats reports the coalescing/padding counters.

With `--batch_sizes 8,32` the server compiles one sampler per size and
each dispatch picks the bucket that clears the pending queue fastest
under online-measured per-bucket latencies (MicroBatcher cost model) —
solo requests keep batch-8 latency, mid-size queues ship as full batch-8
dispatches instead of a padded batch-32, and deep queues ride the
batch-32 bulk optimum (+54% measured, docs/PERFORMANCE.md batch curve).

    python -m saragan_tpu.tools.serve pgan --model_path runs/model_6.npz \
        --phase 6 --latent_dim 256 --start_shape "(1, 1, 4, 4)" \
        --final_shape "(1, 128, 512, 512)" --port 8753

or from a portable StableHLO artifact (no checkpoint / model code needed):

    python -m saragan_tpu.tools.serve --artifact g.stablehlo --port 8753

Endpoints:
  GET  /healthz    -> {"status": "ok"}
  GET  /info       -> model/config JSON (shape, batch size, param count)
  GET  /stats      -> micro-batching counters (requests, samples, batches,
                      padded_slots, max_requests_coalesced)
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

import collections
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from saragan_tpu.config import Config


class _Ticket:
    """One request's pending samples inside the MicroBatcher."""

    __slots__ = ("seed", "num", "out", "remaining", "event", "error")

    def __init__(self, seed: int, num: int):
        self.seed = int(seed)
        self.num = int(num)
        self.out = [None] * num
        self.remaining = num
        self.event = threading.Event()
        self.error: Optional[BaseException] = None


class MicroBatcher:
    """Coalesce concurrent sample requests into fixed-size device batches.

    Submitters enqueue one slot per sample and block; the worker thread
    drains up to `batch_size` slots per dispatch — across request
    boundaries — and runs them through `run_slots(seeds, idxs)`, which must
    make output row k depend ONLY on (seeds[k], idxs[k]) (the keyed-sampler
    contract, tools/generate.py::make_keyed_sampler).  A short batch is
    padded by repeating slot 0 (padding rows are discarded).  No batching
    timer: the natural coalescing window is the in-flight device dispatch —
    requests arriving while the chip is busy pile up and ship together
    (continuous batching).  One worker thread == the one-chip-program-at-a-
    time hardware rule.

    A dispatch failure fails every request with a sample in that batch and
    any still-queued slots of those requests are skipped; other requests
    and the worker survive (the server maps the error to HTTP 500).

    BUCKETED batching: `run_slots` may be a dict {batch_size: fn} of
    samplers compiled at several batch sizes.  Each dispatch drains up to
    max(sizes) slots and picks the bucket COST-AWARE: clearing L slots with
    bucket b takes ceil(L/b) dispatches of T_b each, where T_b is the
    online EMA of that bucket's measured dispatch wall time (each bucket's
    first call bears the jit compile and is excluded; unmeasured buckets
    are assumed proportional to their size).  The argmin bucket wins; when
    it is smaller than the drained queue, only a full bucket's worth ships
    and the rest is requeued at the front.  This beats round 3's
    "smallest bucket that fits" padding rule between bucket sizes: with the
    measured phase-6 curve (batch 8 = 30 ms, batch 32 = 77.7 ms,
    BASELINE.md) a 9-slot queue ships as two full batch-8 dispatches
    (60 ms) instead of one batch-32 padded with 23 dead slots (77.7 ms),
    while a 24-slot queue still rides the batch-32 bulk optimum.
    """

    LAT_EMA = 0.3  # weight of the newest per-bucket latency sample

    def __init__(self, run_slots, batch_size: Optional[int] = None,
                 start: bool = True):
        # run_slots(seeds (B,) np.int32, idxs (B,) np.int32) -> (B, ...) f32,
        # or {B: run_slots_B} for bucketed dispatch
        if callable(run_slots):
            if batch_size is None:
                raise ValueError("batch_size required with a single run_slots")
            run_slots = {int(batch_size): run_slots}
        self._runs = {int(b): fn for b, fn in run_slots.items()}
        self.batch_sizes = sorted(self._runs)
        self.batch_size = self.batch_sizes[-1]  # drain cap per dispatch
        # per-bucket dispatch-latency EMA (ms) and call counts; the first
        # call per bucket is the compile and never recorded
        self._lat = {b: None for b in self.batch_sizes}
        self._lat_n = {b: 0 for b in self.batch_sizes}
        self._q = collections.deque()  # (_Ticket, sample_index)
        self._cv = threading.Condition()
        self._closed = False
        self.stats = {
            "requests": 0,
            "samples": 0,
            "batches": 0,
            "padded_slots": 0,
            "max_requests_coalesced": 0,
            "dispatch_sizes": {b: 0 for b in self.batch_sizes},
        }
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="serve-microbatcher")
        if start:
            self._thread.start()

    def start(self):
        if not self._thread.is_alive():
            self._thread.start()

    def submit(self, seed: int, num: int) -> "np.ndarray":
        """Block until all `num` samples of request (seed) are generated."""
        if num < 1:  # zero slots would never be dispatched -> eternal wait
            raise ValueError(f"num must be >= 1, got {num}")
        # Validate here, on the submitter's thread: an OverflowError from
        # np.int32 inside the worker would kill the dispatch loop and hang
        # every ticket forever.  int32 is the run_slots wire contract.
        if not (-(2**31) <= int(seed) < 2**31):
            raise ValueError(f"seed must fit int32, got {seed}")
        ticket = _Ticket(seed, num)
        with self._cv:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self.stats["requests"] += 1
            self.stats["samples"] += num
            for j in range(num):
                self._q.append((ticket, j))
            self._cv.notify()
        ticket.event.wait()
        if ticket.error is not None:
            raise ticket.error
        return np.stack(ticket.out)

    def warm(self, rounds: int = 2):
        """Run EVERY bucket directly `rounds` times, bypassing the queue.

        Warmup through submit() is rerouted by the cost-based dispatcher:
        once the smaller buckets are measured, the proportional estimate
        for a still-unmeasured larger bucket systematically overestimates
        it (per-slot cost improves with size), so a queue of its exact
        size ships as smaller dispatches and the large bucket never gets
        compiled OR measured.  Direct per-bucket calls compile each one
        and seed each latency EMA (the compile-bearing first call is
        excluded, matching _dispatch's rule).  Call before serving
        traffic — this runs on the caller's thread outside the queue lock.
        """
        for b in self.batch_sizes:
            seeds = np.zeros(b, np.int32)
            idxs = np.arange(b, dtype=np.int32)
            for _ in range(max(1, rounds)):
                t0 = time.perf_counter()
                out = np.asarray(self._runs[b](seeds, idxs), np.float32)
                if out.shape[0] != b:
                    raise ValueError(
                        f"run_slots returned {out.shape[0]} rows, expected {b}")
                dt_ms = (time.perf_counter() - t0) * 1e3
                with self._cv:
                    self._lat_n[b] += 1
                    if self._lat_n[b] >= 2:
                        prev = self._lat[b]
                        self._lat[b] = (dt_ms if prev is None else
                                        prev + self.LAT_EMA * (dt_ms - prev))

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify()
        if self._thread.is_alive():
            self._thread.join(timeout=30)

    # -- worker -----------------------------------------------------------

    def _loop(self):
        while True:
            with self._cv:
                while not self._q and not self._closed:
                    self._cv.wait()
                entries = []
                while self._q and len(entries) < self.batch_size:
                    t, j = self._q.popleft()
                    if t.error is None:  # skip slots of already-failed requests
                        entries.append((t, j))
                bucket = self._choose_bucket(len(entries)) if entries else 0
                if bucket and bucket < len(entries):
                    # a smaller bucket won the cost race: ship one full
                    # bucket now, requeue the tail at the FRONT (FIFO order
                    # ahead of any arrivals) for the next dispatch
                    self._q.extendleft(reversed(entries[bucket:]))
                    entries = entries[:bucket]
                if self._closed and not entries and not self._q:
                    return
            if entries:
                self._dispatch(entries, bucket)

    def _estimate_ms(self, bucket: int) -> float:
        """T_bucket: the measured EMA, else proportional-to-size scaled by
        the measured buckets' median ms-per-slot (1.0 when none measured —
        only ratios matter for the argmin)."""
        if self._lat[bucket] is not None:
            return self._lat[bucket]
        per_slot = [self._lat[b] / b for b in self.batch_sizes
                    if self._lat[b] is not None]
        scale = float(np.median(per_slot)) if per_slot else 1.0
        return bucket * scale

    def _choose_bucket(self, n_slots: int) -> int:
        """Bucket minimizing the time to clear n_slots: T_b * ceil(n/b).
        Ties prefer the LARGER bucket (fewer dispatches) — with cold
        proportional estimates this reduces to round 3's smallest-fitting-
        bucket rule whenever no full smaller bucket fits."""
        return min(
            self.batch_sizes,
            key=lambda b: (self._estimate_ms(b) * -(-n_slots // b), -b),
        )

    def _dispatch(self, entries, bucket: int):
        pad = bucket - len(entries)
        error = None
        t0 = time.perf_counter()
        try:
            # inside the try: ANY failure here (even an unexpected
            # conversion error) must forward to the submitters, never
            # escape and kill the worker thread
            seeds = np.asarray([t.seed for t, _ in entries]
                               + [entries[0][0].seed] * pad, np.int32)
            idxs = np.asarray([j for _, j in entries]
                              + [entries[0][1]] * pad, np.int32)
            out = np.asarray(self._runs[bucket](seeds, idxs), np.float32)
            if out.shape[0] != bucket:
                raise ValueError(
                    f"run_slots returned {out.shape[0]} rows, expected "
                    f"{bucket}")
        except BaseException as e:  # noqa: BLE001 — forwarded to submitters
            error = e
        dt_ms = (time.perf_counter() - t0) * 1e3
        done = {}
        for k, (t, j) in enumerate(entries):
            if error is not None:
                t.error = error
            else:
                t.out[j] = out[k]
                t.remaining -= 1
            done[id(t)] = t
        with self._cv:
            self.stats["batches"] += 1
            self.stats["padded_slots"] += pad
            self.stats["dispatch_sizes"][bucket] += 1
            self.stats["max_requests_coalesced"] = max(
                self.stats["max_requests_coalesced"], len(done))
            self._lat_n[bucket] += 1
            if error is None and self._lat_n[bucket] >= 2:
                # first call per bucket bore the jit compile — never record
                prev = self._lat[bucket]
                self._lat[bucket] = (dt_ms if prev is None else
                                     prev + self.LAT_EMA * (dt_ms - prev))
        for t in done.values():
            if t.error is not None or t.remaining == 0:
                t.event.set()


class GeneratorService:
    """Holds one compiled keyed sampler + its parameters; concurrent
    requests are micro-batched through one worker thread."""

    # cap on num_samples per request: bounds both chip hold time and the
    # host-side volume accumulation (each phase-6 batch-8 f32 batch is
    # ~17 MB; an unbounded request would hold the chip for days and OOM the
    # host).  Overridable via --max_samples.
    DEFAULT_MAX_SAMPLES = 1024

    def __init__(self, run_slots, batch_size: Optional[int] = None,
                 info: Optional[dict] = None,
                 data_mean: Optional[float] = None,
                 data_stddev: Optional[float] = None,
                 max_samples: Optional[int] = None):
        # run_slots(seeds (B,) i32, idxs (B,) i32) -> (B, C, ...) np.float32;
        # row k must depend only on (seeds[k], idxs[k]).  May be a dict
        # {B: fn} of samplers compiled at several batch sizes (bucketed
        # dispatch, see MicroBatcher).
        self.info = dict(info or {})
        self.data_mean = data_mean
        self.data_stddev = data_stddev
        self.max_samples = int(max_samples or self.DEFAULT_MAX_SAMPLES)
        self._batcher = MicroBatcher(run_slots, batch_size)
        self.batch_size = self._batcher.batch_size

    # -- constructors ----------------------------------------------------

    @classmethod
    def from_checkpoint(cls, architecture: str, model_path: str, *, cfg: Config,
                        phase: int, batch_size: int = 8, alpha: float = 0.0,
                        use_ema: bool = True, max_samples: Optional[int] = None,
                        batch_sizes: Optional[list] = None,
                        fetch_dtype: Optional[str] = None,
                        n_devices: int = 1):
        import jax
        import jax.numpy as jnp

        from saragan_tpu.tools.generate import _load_generator_params, make_keyed_sampler

        mesh = None
        if n_devices > 1:
            # data-parallel serving: one 1-axis mesh, params replicated,
            # batch rows sharded — per-row results identical to one device
            from jax.sharding import Mesh

            devs = jax.devices()
            if n_devices > len(devs):
                raise ValueError(f"--serve_devices {n_devices} > "
                                 f"{len(devs)} available devices")
            mesh = Mesh(np.array(devs[:n_devices]), ("dp",))
        g_params, meta = _load_generator_params(model_path, use_ema=use_ema)
        if mesh is None:
            params_dev = jax.device_put(g_params)
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            params_dev = jax.device_put(
                g_params, NamedSharding(mesh, PartitionSpec()))
        sizes = sorted({int(b) for b in (batch_sizes or [batch_size])})
        if mesh is not None:
            bad = [b for b in sizes if b % n_devices]
            if bad:
                raise ValueError(f"batch sizes {bad} do not divide by "
                                 f"--serve_devices {n_devices}")
        # cast on device before the host fetch (e.g. 'float16' halves the
        # device->host bytes; non-exact — responses stay float32 on the wire)
        fdt = jnp.dtype(fetch_dtype) if fetch_dtype else None

        # per-sample keys (fold_in(PRNGKey(seed), j) on device): sample j of
        # request seed S is the same volume whether served alone or packed
        # into a batch with other requests' samples, whichever bucket it
        # ships in, and streams of different seeds never overlap
        # sample-for-sample
        def make_run(size: int):
            sampler = make_keyed_sampler(cfg, phase, size, alpha,
                                         fetch_dtype=fdt, mesh=mesh)

            def run_slots(seeds: np.ndarray, idxs: np.ndarray) -> np.ndarray:
                return np.asarray(
                    sampler(params_dev, jnp.asarray(seeds), jnp.asarray(idxs)),
                    np.float32)

            return run_slots

        runs = {size: make_run(size) for size in sizes}

        info = {
            "source": "checkpoint",
            "architecture": architecture,
            "phase": phase,
            "batch_size": sizes[-1],
            "batch_sizes": sizes,
            "latent_dim": cfg.latent_dim,
            "volume_shape": list(cfg.current_shape(phase, 1))[1:],
            "ema": bool(use_ema),
            "fetch_dtype": str(fdt) if fdt is not None else "float32",
            "serve_devices": n_devices,
            "num_params": int(sum(int(np.size(v)) for v in g_params.values())),
        }
        return cls(runs, None, info,
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

        def run_slots(seeds: np.ndarray, idxs: np.ndarray) -> np.ndarray:
            # the artifact's input signature is the latent batch, so the
            # per-sample derivation happens host-side: z row k from
            # rng([seeds[k], idxs[k]]) — the same coalescing-invariance
            # contract as the checkpoint path's device-side fold_in.
            # default_rng rejects negative entropy words, but submit()'s wire
            # contract is the FULL int32 range (the checkpoint path's fold_in
            # accepts it) — reinterpret as uint32: bijective, identity for
            # seeds >= 0, and a crash here would fail every coalesced request
            # in the batch, not just the offender.  Masking (not np.uint32())
            # because NumPy >= 2.0 raises OverflowError when converting a
            # negative PYTHON int; the mask is dtype-independent.
            z = np.stack([
                np.random.default_rng(
                    [int(s) & 0xFFFFFFFF, int(j) & 0xFFFFFFFF]
                ).normal(size=art_latent)
                for s, j in zip(seeds, idxs)
            ]).astype(np.float32)
            return np.asarray(gen(z), np.float32)

        info = {
            "source": "stablehlo_artifact",
            "artifact": path,
            "batch_size": batch_size,
            "latent_dim": art_latent,
        }
        return cls(run_slots, batch_size, info, data_mean, data_stddev,
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
        vols = self._batcher.submit(seed, num_samples)
        do_unnorm = (self.data_mean is not None and self.data_stddev is not None
                     if unnormalize is None else bool(unnormalize))
        if do_unnorm:
            if self.data_mean is None or self.data_stddev is None:
                raise ValueError("unnormalize requested but --data_mean/--data_stddev unknown")
            from saragan_tpu.data import invert_normalize_numpy

            vols = invert_normalize_numpy(vols, self.data_mean, self.data_stddev)
        return vols

    def warmup(self, rounds: int = 2):
        """Compile and latency-seed every bucket before accepting traffic."""
        self._batcher.warm(rounds)

    @property
    def stats(self) -> dict:
        """Coalescing counters (GET /stats): batches < ceil-sum of per-request
        batches means cross-request packing happened; padded_slots / samples
        is the occupancy lost to short batches; dispatch_sizes shows the
        bucket mix (deep queues should ride the largest bucket)."""
        return {"batch_size": self.batch_size,
                "batch_sizes": self._batcher.batch_sizes,
                "bucket_ms": {b: (round(v, 2) if v is not None else None)
                              for b, v in self._batcher._lat.items()},
                **self._batcher.stats}

    def close(self):
        self._batcher.close()


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
            elif self.path == "/stats":
                self._send_json(200, service.stats)
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
    p.add_argument("--batch_sizes", default=None,
                   help="comma list of bucket batch sizes to compile, e.g. "
                        "'8,32' — the dispatcher runs the smallest bucket "
                        "that fits the pending queue (8 is the measured "
                        "latency knee, 32 the bulk-throughput optimum at "
                        "phase 6 on v5e: +54%%, docs/PERFORMANCE.md); "
                        "overrides --batch_size (checkpoint serving only)")
    p.add_argument("--fetch_dtype", default=None, choices=[None, "float16", "bfloat16"],
                   help="cast volumes to this dtype ON DEVICE before the "
                        "host fetch — halves device->host bytes on "
                        "fetch-bound links (non-exact: ~3 decimal digits; "
                        "responses are still float32 npy). Default: exact "
                        "float32 fetch (checkpoint serving only)")
    p.add_argument("--serve_devices", type=int, default=1,
                   help="data-parallel serving over N devices (one 1-axis "
                        "mesh: params replicated, batch rows sharded; "
                        "per-row results identical to one device). Batch "
                        "sizes must divide by N (checkpoint serving only)")
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
        sizes = ([int(s) for s in args.batch_sizes.split(",")]
                 if args.batch_sizes else None)
        service = GeneratorService.from_checkpoint(
            args.architecture, args.model_path, cfg=cfg, phase=args.phase,
            batch_size=args.batch_size, batch_sizes=sizes, alpha=args.alpha,
            use_ema=not args.no_ema, max_samples=args.max_samples,
            fetch_dtype=args.fetch_dtype, n_devices=args.serve_devices)

    # compile before accepting traffic so the first request isn't a
    # multi-minute cold compile; warm EVERY bucket directly (generate()
    # would be rerouted by the cost-based dispatcher once the small
    # buckets are measured, leaving the large bucket cold forever) and
    # seed each bucket's latency EMA so bucket choice starts measured.
    service.warmup()
    srv = make_server(service, port=args.port, host=args.host)
    print(f"serving {service.info} on http://{args.host}:{srv.server_address[1]}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
