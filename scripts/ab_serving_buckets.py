"""Bucketed-serving A/B on the real chip: the TRUE service path
(GeneratorService -> MicroBatcher -> keyed sampler -> host fetch of the
volumes), not the device-only dispatch the batch-curve script times.

Three services built from one checkpoint through the production
constructor (GeneratorService.from_checkpoint):

    A  batch_sizes=[8]      - the old single-bucket default
    B  batch_sizes=[32]     - bulk-optimal bucket only
    C  batch_sizes=[8, 32]  - bucketed dispatch (the --batch_sizes 8,32 config)

Workloads (medians over rounds, one process, jit cache shared):

    bulk   one generate(256) call          - deep queue, C should match B
    solo   sequential generate(1) calls    - empty queue, C should match A
    burst  16 threads x generate(4) each   - concurrent clients; C packs
                                             the 64 pending slots into
                                             32-bucket dispatches

    python scripts/ab_serving_buckets.py [phase=6] [rounds=4] [variants]

`variants` is a comma list from {A,B,C,D} (default A,B,C); D adds
batch_sizes=[8,32] with --fetch_dtype float16 (device-side cast before
the host fetch — the relay's fetch path measured bandwidth-bound at
~15 MB/s, so halving bytes should approach 2x on the service path).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median(xs):
    return float(np.median(xs))


def main():
    import jax

    from saragan_tpu.config import Config
    from saragan_tpu.models import get_architecture
    from saragan_tpu.tools.serve import GeneratorService
    from saragan_tpu.train import checkpoint as ckpt
    from saragan_tpu.train import init_train_state

    phase = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    variants = (sys.argv[3].split(",") if len(sys.argv) > 3 else ["A", "B", "C"])

    cfg = Config(
        architecture="pgan",
        start_shape="(1, 1, 4, 4)",
        final_shape="(1, 128, 512, 512)",
        latent_dim=256,
        base_batch_size=8 * (2 ** (phase - 1)),
        network_size="xs",
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
        compute_dtype="bfloat16",
    ).finalize()

    arch = get_architecture("pgan")
    state, _ = init_train_state(arch, jax.random.PRNGKey(0), phase=phase, cfg=cfg)
    path = "/tmp/ab_buckets_model"
    ckpt.save_params(path, {**state.g_params, **state.d_params},
                     ema=state.ema, meta={"phase": phase})

    specs = {
        "A": ("A_8", [8], None),
        "B": ("B_32", [32], None),
        "C": ("C_8_32", [8, 32], None),
        "D": ("D_8_32_f16", [8, 32], "float16"),
    }
    services = {}
    for v in variants:
        name, sizes, fdt = specs[v]
        t0 = time.perf_counter()
        svc = GeneratorService.from_checkpoint(
            "pgan", path + ".npz", cfg=cfg, phase=phase, batch_sizes=sizes,
            fetch_dtype=fdt)
        # two passes like serve.main: compile every bucket, then seed each
        # bucket's latency EMA (cost-aware dispatch starts measured)
        for _ in range(2):
            for b in sizes:
                svc.generate(b, seed=0, unnormalize=False)
        services[name] = svc
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {name: {"bulk_ms": [], "solo_ms": [], "burst_ms": [],
                      "mid_ms": []}
               for name in services}

    for r in range(rounds):
        for name, svc in services.items():
            # bulk: one deep request
            t0 = time.perf_counter()
            svc.generate(256, seed=100 + r, unnormalize=False)
            bulk = (time.perf_counter() - t0) * 1e3
            results[name]["bulk_ms"].append(bulk)

            # mid: a queue BETWEEN bucket sizes (12 slots with buckets
            # {8,32}) — cost-aware dispatch ships 8+8pad4 full-small
            # dispatches (2 x ~30 ms) where the old smallest-fitting rule
            # padded one 32-dispatch (77.7 ms); A/B should show C beating
            # both A (2 x 8-dispatch anyway) and B (padded 32) here
            t0 = time.perf_counter()
            for i in range(6):
                svc.generate(12, seed=7000 * r + i, unnormalize=False)
            mid = (time.perf_counter() - t0) / 6 * 1e3
            results[name]["mid_ms"].append(mid)

            # solo: sequential batch-1 requests (empty queue each time)
            t0 = time.perf_counter()
            for i in range(20):
                svc.generate(1, seed=1000 * r + i, unnormalize=False)
            solo = (time.perf_counter() - t0) / 20 * 1e3
            results[name]["solo_ms"].append(solo)

            # burst: 16 concurrent clients x 4 samples
            threads = [
                threading.Thread(
                    target=svc.generate, args=(4, 5000 * r + i),
                    kwargs={"unnormalize": False})
                for i in range(16)
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            burst = (time.perf_counter() - t0) * 1e3
            results[name]["burst_ms"].append(burst)

            print(f"[round {r}] {name}: bulk {bulk:.0f} ms "
                  f"mid {mid:.1f} ms/req solo {solo:.1f} ms/req "
                  f"burst {burst:.0f} ms", flush=True)

    out = {}
    for name, svc in services.items():
        bulk = median(results[name]["bulk_ms"])
        mid = median(results[name]["mid_ms"])
        solo = median(results[name]["solo_ms"])
        burst = median(results[name]["burst_ms"])
        out[name] = {
            "bulk_256_ms": round(bulk, 1),
            "bulk_vol_per_s": round(256 / (bulk / 1e3), 1),
            "mid_12_ms_per_req": round(mid, 1),
            "solo_ms_per_req": round(solo, 2),
            "burst_16x4_ms": round(burst, 1),
            "burst_vol_per_s": round(64 / (burst / 1e3), 1),
            "dispatch_sizes": svc.stats["dispatch_sizes"],
            "bucket_ms": svc.stats["bucket_ms"],
        }
        svc.close()
    print(json.dumps({"phase": phase, **out}, indent=2))


if __name__ == "__main__":
    main()
