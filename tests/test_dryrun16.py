"""16-device dryrun (VERDICT r4 item 5): dp4xsp4 (4-slice shards on a
genuinely wide spatial axis), dp4xsp2xsp2, dp2xsp8 and dp16 have never
executed together — run the FULL dryrun_multichip at n=16 on a forced
16-device CPU backend, in a subprocess so the session's 8-device backend
is untouched.

Slow (~several minutes of tiny-shape compiles); not in the smoke tier.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_16_devices():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # belt-and-braces: an empty pool-IPs skips the axon plugin registration
    # entirely, so this subprocess can NEVER touch the relayed chip (a
    # second relay process wedges concurrent chip jobs — CLAUDE.md)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)  # dryrun forces jax_num_cpu_devices itself
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(16)"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=3000,
    )
    assert p.returncode == 0, p.stdout[-5000:]
    tail = [ln for ln in p.stdout.splitlines() if ln.startswith("DRYRUN_JSON: ")]
    assert tail, p.stdout[-2000:]
    report = json.loads(tail[-1][len("DRYRUN_JSON: "):])
    meshes = report["meshes"]
    # the VERDICT-demanded factorizations all executed
    for want in ("dp16xsp1", "dp8xsp2", "dp4xsp4", "dp2xsp8", "dp4xsp2xsp2_2"):
        assert want in meshes, (want, list(meshes))
    for name, m in meshes.items():
        assert m["first_step_loss_diff_vs_single_device"] < 5e-6, (name, m)
        # n=16 regime band (global batch 16): 2e-2, see __graft_entry__
        # TRAJECTORY_TOL rationale — observed 4.5e-3 on dp4xsp2xsp2 with
        # an f64 lr=0 sweep at 1.9e-6 on the same mesh (chaos, not a bug)
        assert m["max_abs_loss_diff_vs_single_device"] < 2e-2, (name, m)
        assert m["production_trajectory_diff"] < 0.5, (name, m)
    assert report["production_f64_lr0"]["max_abs_loss_diff"] < 5e-6
    assert report["radius2_k5"]["first_step_diff"] < 5e-6
