"""Seed-variance band for the convergence gates (VERDICT r3 item 5).

Round 3's gates accepted any n-1 of n phases improving, which quietly
waved through the flagship phase-5 regression (54.1 -> 59.0) and the 2D
phase-2 one (1.99 -> 2.25).  This driver re-runs the convergence recipes
across training seeds (data fixed, cfg.seed varies -> init + per-step
keys) and records the per-phase first->last distribution, so the gates
can assert against a MEASURED band: a phase may regress only within the
observed seed-noise envelope, instead of one free regression of any size.

Runs serially on the one chip (CLAUDE.md: one chip process at a time).

Usage:
  python scripts/seed_band.py flagship <outroot> [seeds...]   # phases 1-5
  python scripts/seed_band.py 2d <outroot> [seeds...]         # phases 1-2
  python scripts/seed_band.py 2d4 <outroot> [seeds...]        # phases 1-4
                                   (round-5: bands for the late 2D phases)

Writes <outroot>/band_<kind>.json and prints a per-seed, per-phase table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(kind: str, outdir: str, seed: int) -> dict:
    env = dict(os.environ)
    env["SARAGAN_RUN_SEED"] = str(seed)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if kind == "flagship":
        cmd = [sys.executable, "-u", "scripts/convergence_run_flagship.py",
               outdir, "5"]
        traj_file = os.path.join(outdir, "trajectory_p1-5.json")
    else:
        ending = "4" if kind == "2d4" else "2"
        cmd = [sys.executable, "-u", "scripts/convergence_run_2d.py",
               outdir, ending]
        traj_file = os.path.join(outdir, "trajectory_2d.json")
    t0 = time.time()
    # the run's own gate may fail on a regressing seed — that is DATA for
    # the band, not an error; the trajectory json is written pre-assert
    p = subprocess.run(cmd, cwd=REPO, env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True)
    tail = "\n".join(p.stdout.splitlines()[-15:])
    wall = time.time() - t0
    with open(traj_file) as f:
        traj = json.load(f)["trajectory"]
    first, last = {}, {}
    for e in traj:
        if "FID" not in e:
            continue
        ph = str(e["phase"])
        if e["suffix"] == "" and ph not in first:
            first[ph] = e["FID"]
        if e["suffix"] in ("_EMA", "_validation", "_test"):
            last[ph] = e["FID"]
    return {"seed": seed, "rc": p.returncode, "wall_s": round(wall, 1),
            "first": first, "last": last, "tail": tail}


def main():
    kind = sys.argv[1]
    outroot = sys.argv[2]
    seeds = [int(s) for s in sys.argv[3:]] or [42, 1, 2]
    os.makedirs(outroot, exist_ok=True)
    results = []
    for seed in seeds:
        outdir = os.path.join(outroot, f"{kind}_seed{seed}")
        print(f"=== {kind} seed {seed} -> {outdir}", flush=True)
        r = run_one(kind, outdir, seed)
        results.append(r)
        print(json.dumps({k: r[k] for k in ("seed", "rc", "wall_s", "first", "last")}),
              flush=True)

    # per-phase relative change band: (last - first) / first, negative =
    # improved
    phases = sorted({ph for r in results for ph in r["first"]}, key=int)
    band = {}
    for ph in phases:
        rels = [
            (r["last"][ph] - r["first"][ph]) / abs(r["first"][ph])
            for r in results if ph in r["first"] and ph in r["last"]
        ]
        band[ph] = {"rel_changes": [round(x, 4) for x in rels],
                    "worst": round(max(rels), 4), "best": round(min(rels), 4)}
    out = {"kind": kind, "seeds": seeds, "runs": results, "band": band}
    path = os.path.join(outroot, f"band_{kind}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("BAND", json.dumps(band))
    print(f"written {path}")


if __name__ == "__main__":
    main()
