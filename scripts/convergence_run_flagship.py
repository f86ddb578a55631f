"""Flagship-aspect convergence run: the reference's 512x512x128 geometry.

The round-2/3 convergence evidence (scripts/convergence_run.py) is cubic
(4^3 -> 128^3).  The reference's flagship runs train ANISOTROPIC LIDC
volumes up to 512x512x128 (README.md:16-19, example_normal_run.jb:71)
with depth = width/4 at every phase: phase p trains (2^(p-1), 4*2^(p-1),
4*2^(p-1)) from start_shape (1, 1, 4, 4).  This script trains that
schedule on structured synthetic blob volumes through the plain Trainer:

  phases 1..6  (1,4,4) .. (32,128,128)  — one process, full budget
  phase 7      (64,256,256)             — own process, reduced budget (the
               axon relay leaks one batch's bytes per host->device step,
               BASELINE.md; 6144 imgs ~= 52 GB of a 125 GB host)
  phase 8      (128,512,512)            — own process, SHORT training leg
               through cfg.single_chip_big_volume (the one-flag preset for
               the measured phase-8 recipe: offload remat + layout-safe
               ops + Pallas flat conv + scoped-VMEM, BASELINE.md
               "Phase-8 on one chip"); records the loss/metric trajectory
               at the reference's flagship resolution on ONE chip.

Each level of the synthetic pyramid is the SAME analytic blob field
evaluated at that level's grid (per-volume seeds), so resolutions are
mutually consistent the way the reference's Lanczos pyramid is
(data_scripts/process_lidc_idri_data.py:124-137).

Run:  python scripts/convergence_run_flagship.py <outdir> [ending_phase=6]
          [starting_phase=1] [phase8_nimg=512] [continue_from]
e.g.  ... out 6      -> phases 1..6
      ... out 7 7    -> phase 7 leg (chained from model_6)
      ... out 8 8    -> phase-8 training leg (chained from model_7)
      ... out 8 8 512 <logs>/model_8 -> phase-8 CONTINUATION leg
          (mid-phase resume: name-intersection restore of a same-phase
          checkpoint is a full restore, reference optuna_objective.py:340-354)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from saragan_tpu.config import Config
from saragan_tpu.metrics.fid import RandomConvFeatures
from saragan_tpu.metrics.save_metrics import make_metrics_callback
from saragan_tpu.train.trainer import Trainer


def make_blob_volume_aniso(seed: int, hw: int) -> np.ndarray:
    """1-3 gaussian ellipsoids + low-frequency ripple on a (hw/4, hw, hw)
    grid.  All random draws happen before any grid evaluation, so the same
    seed yields the same continuous field at every resolution."""
    d = max(1, hw // 4)
    rng = np.random.default_rng(seed)
    blobs = [
        (rng.uniform(-0.5, 0.5, 3), rng.uniform(0.12, 0.35, 3), rng.uniform(0.8, 1.6))
        for _ in range(rng.integers(1, 4))
    ]
    f = rng.uniform(0.5, 1.5, 3)
    p = rng.uniform(0, 2 * np.pi, 3)
    zz = np.linspace(-1, 1, d, dtype=np.float32).reshape(d, 1, 1)
    yy = np.linspace(-1, 1, hw, dtype=np.float32).reshape(1, hw, 1)
    xx = np.linspace(-1, 1, hw, dtype=np.float32).reshape(1, 1, hw)
    vol = np.zeros((d, hw, hw), np.float32)
    for c, s, a in blobs:
        vol += a * np.exp(
            -(((zz - c[0]) / s[0]) ** 2 + ((yy - c[1]) / s[1]) ** 2 + ((xx - c[2]) / s[2]) ** 2)
        )
    vol += (
        0.2
        * np.sin(f[0] * np.pi * zz + p[0])
        * np.sin(f[1] * np.pi * yy + p[1])
        * np.sin(f[2] * np.pi * xx + p[2])
    )
    return vol


def build_level(root: str, hw: int, n: int, seed_base: int = 31_000_000):
    d = os.path.join(root, f"{hw}x{hw}")
    if os.path.isdir(d) and len(os.listdir(d)) >= n:
        return
    os.makedirs(d, exist_ok=True)
    t0 = time.time()
    for i in range(n):
        np.save(os.path.join(d, f"v{i:04d}.npy"), make_blob_volume_aniso(seed_base + i, hw))
    print(f"  level {hw}: {n} volumes in {time.time() - t0:.0f}s", flush=True)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/convergence_flagship"
    ending_phase = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    starting_phase = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    phase8_nimg = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    continue_from = sys.argv[5] if len(sys.argv) > 5 else None
    dataroot = os.path.join(outdir, "data")
    os.makedirs(outdir, exist_ok=True)
    # FLAGSHIP_SMOKE=1: tiny budgets/dataset for a CPU wiring check
    smoke = bool(int(os.environ.get("FLAGSHIP_SMOKE", "0")))
    # SARAGAN_RUN_SEED: training seed (init + per-step keys) for the
    # seed-variance band runs (VERDICT r4: gate against a measured band,
    # not n-1).  Data stays fixed; only the training randomness varies.
    run_seed = int(os.environ.get("SARAGAN_RUN_SEED", "42"))
    n_vols = 24 if smoke else 256

    print("Building anisotropic blob pyramid ...", flush=True)
    # only the levels this leg trains on (a phase-7/8 leg in its own
    # process must not regenerate the 4..256 levels it never reads)
    for ph in range(starting_phase, min(ending_phase, 7) + 1):
        build_level(dataroot, 4 * 2 ** (ph - 1), n=n_vols)
    if ending_phase >= 8:
        build_level(dataroot, 512, n=12 if smoke else 48)

    # normalization stats from the analytic field at a mid resolution
    sample = np.stack([make_blob_volume_aniso(31_500_000 + i, 64) for i in range(64)])
    mean, std = float(sample.mean()), float(sample.std())
    print(f"data mean {mean:.4f} std {std:.4f}", flush=True)

    phase8_leg = starting_phase >= 8
    big_phase = starting_phase >= 7
    cfg = Config(
        architecture="pgan",
        dataset_path=dataroot,
        start_shape="(1, 1, 4, 4)",
        # phases 1..8 -> HW 4..512 (final shape one doubling past phase 8,
        # reference utils.py:211-217; same extension as phase8_single_chip)
        final_shape="(1, 256, 1024, 1024)",
        starting_phase=starting_phase,
        ending_phase=ending_phase,
        continue_path=continue_from or (
            os.path.join(outdir, "logs", f"model_{starting_phase - 1}")
            if starting_phase > 1 else None),
        latent_dim=64,
        network_size="xs",
        base_batch_size=64,
        max_global_batch_size=64,
        # reduced budgets at the big phases: the relay leaks one batch's
        # bytes per step on the HOST (BASELINE.md) — 12288 imgs at phase 7
        # would cost ~103 GB of host RAM in one process
        mixing_nimg=0 if phase8_leg else (16 if smoke else (2048 if big_phase else 4096)),
        stabilizing_nimg=(phase8_nimg if phase8_leg
                          else (32 if smoke else (4096 if big_phase else 8192))),
        loss_fn="wgan",
        gp_weight=10.0,
        noise_stddev=0.0,
        adam_beta1=0.0,
        adam_beta2=0.9,
        g_lr=7.5e-4,
        d_lr=7.5e-4,
        ema_beta=0.99,
        data_mean=mean,
        data_stddev=std,
        calc_metrics=True,
        compute_FID=True,
        compute_swds=not phase8_leg,
        compute_mses=True,
        num_metric_samples=8 if (phase8_leg or smoke) else (16 if big_phase else 32),
        # phase 7 samples at 64x256x256: a 32-batch sampler program needs
        # 17.2 GB HBM (measured OOM) — keep the metric sampler small there
        metrics_batch_size=2 if phase8_leg else (8 if smoke else (4 if big_phase else 32)),
        metrics_every_nsteps=(10**9 if phase8_leg
                              else (16 if smoke else (2048 if big_phase else 6144))),
        summary_small_every_nsteps=10**9 if big_phase else 2048,
        grad_histograms=False,
        summary_large_every_nsteps=10**9,
        checkpoint_every_nsteps=10**9,
        compute_dtype="bfloat16",
        transfer_dtype="auto",  # -> bf16 under bf16 compute (bit-exact, half bytes)
        # the single_chip_big_volume preset itself forces fused_transitions
        # off in Config.finalize (its lhs-dilated conv keeps a 16x-padded
        # 17.4 GB full-res intermediate — measured when this leg first ran
        # with the fusion on); keep the recipe in ONE place (config.py)
        single_chip_big_volume=phase8_leg,
        seed=run_seed,
        logdir=os.path.join(outdir, "logs"),
    ).finalize()

    trajectory = []
    extractor = RandomConvFeatures(seed=7)  # proxy FID: run-internal trajectory only
    base_cb = make_metrics_callback(cfg, extractor=extractor)

    def recording_cb(trainer, sampler, dataset, step, suffix):
        m = base_cb(trainer, sampler, dataset, step, suffix)
        entry = {"phase": trainer.phase, "step": int(step), "suffix": suffix,
                 "time": time.time()}
        for k, v in (m or {}).items():
            entry[k] = np.asarray(v).tolist() if hasattr(v, "tolist") else float(v)
        trajectory.append(entry)
        print("METRIC", json.dumps(entry), flush=True)
        return m

    recording_cb.fid_calibrated = False

    t0 = time.time()
    trainer = Trainer(cfg, metrics_callback=recording_cb, verbose=True, prefetch=True)
    trainer.run()
    wall = time.time() - t0

    tag = f"p{starting_phase}-{ending_phase}" + ("-cont" if continue_from else "")
    with open(os.path.join(outdir, f"trajectory_{tag}.json"), "w") as f:
        json.dump({"trajectory": trajectory, "wall_s": wall}, f, indent=1)

    per_phase_first, per_phase_last_ema = {}, {}
    for e in trajectory:
        if "FID" not in e:
            continue
        ph = e["phase"]
        if e["suffix"] == "" and ph not in per_phase_first:
            per_phase_first[ph] = e["FID"]
        if e["suffix"] in ("_EMA", "_validation"):
            per_phase_last_ema[ph] = e["FID"]
    print("first FID per phase:", per_phase_first)
    print("last EMA/val FID per phase:", per_phase_last_ema)

    if phase8_leg:
        # a short leg cannot promise metric improvement; it proves the
        # flagship resolution TRAINS end-to-end through the framework on
        # one chip: finite, moving losses + a recorded metric reading
        assert per_phase_last_ema.get(8) is not None and np.isfinite(per_phase_last_ema[8])
        kind = "CONTINUATION " if continue_from else ""
        print(f"PHASE8 {kind}LEG OK: {phase8_nimg} imgs, val proxy-FID "
              f"{per_phase_last_ema[8]:.2f}, wall {wall:.0f}s")
        return

    if big_phase and not smoke:
        # A reduced-budget chained leg measures its first reading at
        # alpha~1 — effectively the UPSCALED previous-phase generator,
        # which the short budget cannot always beat (measured: phase 7
        # starts at 13.5, mixing degrades the blend to 69.4, training
        # recovers to 21.3 validation).  The training claim a short leg
        # can honestly assert is fade RECOVERY: the final validation
        # reading improves on every in-phase reading taken after the
        # fade began (the mid-fade peak AND the post-fade reading).
        ph = starting_phase
        in_phase = [e["FID"] for e in trajectory
                    if e.get("suffix") == "" and e["phase"] == ph and e["step"] > 1]
        final = per_phase_last_ema[ph]
        print(f"big-phase leg: in-phase readings {in_phase} -> final val {final:.2f}")
        assert in_phase and np.isfinite(final)
        assert final < min(in_phase), "no recovery from the mixing fade"
        print(f"BIG-PHASE LEG OK: phase {ph} fade recovery "
              f"{max(in_phase):.2f} -> {in_phase[-1]:.2f} -> {final:.2f} val; "
              f"wall {wall:.0f}s")
        return

    improved = sum(
        1 for ph in per_phase_first
        if ph in per_phase_last_ema and per_phase_last_ema[ph] < per_phase_first[ph]
    )
    n_phases = len(per_phase_first)
    print(f"phases improved: {improved}/{n_phases}; wall {wall:.0f}s")
    if smoke:
        assert per_phase_last_ema and all(np.isfinite(v) for v in per_phase_last_ema.values())
        print("FLAGSHIP SMOKE OK (no convergence assertions on a toy budget)")
        return
    # Gate against the MEASURED seed band (round 4, scripts/seed_band.py:
    # 3 training seeds x phases 1-5, BASELINE.md "Seed-variance band")
    # instead of round-3's `improved >= n-1` which waved through ONE
    # regression of ANY size and would also have wrongly REJECTED seed 2
    # (two ordinary-noise regressions of +3.4% and +4.1%).  Measured:
    #   * small late-phase regressions of a few percent are seed noise
    #     (seed 2: phase 2 +4.1%, phase 4 +3.4%);
    #   * one large mid-schedule regression mode exists — the alpha~1
    #     first reading is the UPSCALED previous-phase generator (strong),
    #     the fade disrupts it, training recovers but not always past the
    #     start (seed 42 phase 5: 42.8 -> 182 mid-fade -> 71.1 final,
    #     +66%; seed 1 the SAME phase improved 45.1 -> 41.8);
    #   * the run as a whole always improves (sum of per-phase relative
    #     changes -0.4 .. -2.0 across seeds).
    # Gate: every regressing phase is either inside the small-noise band
    # (<= +5%) or a bounded fade-disruption WITH recovery evidence
    # (<= +100% and final beats every post-first in-phase reading); a
    # majority of phases improve outright; the aggregate improves.
    NOISE_TOL = 0.05      # covers the observed +3.4% / +4.1% with margin
    REGRESSION_CAP = 1.0  # observed worst fade-disruption +0.66
    total_rel = 0.0
    for ph, first in per_phase_first.items():
        last = per_phase_last_ema.get(ph)
        if last is None:
            continue
        rel = (last - first) / abs(first)
        total_rel += rel
        if last < first:
            continue
        readings = [e["FID"] for e in trajectory
                    if e.get("suffix") == "" and e["phase"] == ph]
        in_phase = readings[1:]  # drop the alpha~1 first reading
        print(f"phase {ph} regressed {first:.2f} -> {last:.2f} "
              f"(rel {rel:+.2f}); in-phase readings {in_phase}")
        if rel <= NOISE_TOL:
            continue
        assert rel <= REGRESSION_CAP, (
            f"phase {ph} regression {rel:+.2f} exceeds the measured seed "
            f"band (cap {REGRESSION_CAP}; worst observed +0.66)")
        assert in_phase and last < min(in_phase), (
            f"phase {ph} regressed with NO fade recovery "
            f"(final {last:.2f} vs in-phase {in_phase})")
    assert improved >= (n_phases + 1) // 2, (
        f"only {improved}/{n_phases} phases improved — not converging")
    assert total_rel < 0, (
        f"aggregate relative change {total_rel:+.2f} — the run as a whole "
        f"did not improve")
    print("CONVERGENCE FLAGSHIP OK")


if __name__ == "__main__":
    main()
