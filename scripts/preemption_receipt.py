"""Chip receipt for the preemption/auto-resume loop (VERDICT r3 item 7).

One scripted pass, all legs on the REAL chip (serialized — CLAUDE.md):

  1. uninterrupted reference run at the CLI;
  2. same command with a fresh logdir: real SIGTERM mid-phase ->
     exit 75 (EX_TEMPFAIL) + exact-resume _interrupt.pkl;
  3. requeue of the IDENTICAL command line (--auto_resume) -> completes;
  4. assert the requeued run's final model_<P>.npz params + EMA are
     BITWISE EQUAL to the uninterrupted run's.

The equality is exact because full-state resume restores params +
optimizer slots + counters, the per-step keys are fold_in(base,
local_step) (resume-invariant), and the dataset shuffle stream
fast-forwards to the consumed position (trainer.py, data/dataset.py).
The CPU twin is tests/test_graceful_shutdown.py::
test_preempted_resume_end_state_equals_uninterrupted; this script is the
hardware evidence.

Usage:  python scripts/preemption_receipt.py <workdir>
Writes <workdir>/receipt.txt and prints PREEMPTION RECEIPT OK on success.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_data(root: str, n: int = 24, sizes=(4, 8, 16)):
    rng = np.random.default_rng(0)
    for size in sizes:
        d = os.path.join(root, f"{size}x{size}")
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            np.save(os.path.join(d, f"{i:04d}.npy"),
                    rng.normal(size=(size,) * 3).astype(np.float32))


def cli_cmd(data: str, logdir: str, auto_resume: bool):
    cmd = [
        sys.executable, "-u", "-m", "saragan_tpu", "pgan", data,
        "--start_shape", "(1, 4, 4, 4)", "--final_shape", "(1, 16, 16, 16)",
        "--starting_phase", "1", "--ending_phase", "2",
        "--latent_dim", "32", "--network_size", "xs",
        "--base_batch_size", "16", "--mixing_nimg", "512",
        "--stabilizing_nimg", "512", "--noise_stddev", "0.0",
        "--g_lr", "1e-3", "--d_lr", "1e-3",
        "--summary_small_every_nsteps", "64",
        "--checkpoint_every_nsteps", "100000",
        "--logdir", logdir,
    ]
    if auto_resume:
        cmd.append("--auto_resume")
    return cmd


def run_leg(cmd, kill_after_steps: bool, log_path: str):
    """Run one CLI leg; optionally SIGTERM after training visibly started."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    with open(log_path, "w") as logf:
        p = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True, bufsize=1)
        sent = False
        t0 = time.time()
        step_lines = 0
        in_phase2 = False
        for line in p.stdout:
            logf.write(line)
            logf.flush()
            if "phase 2" in line:
                in_phase2 = True
            if in_phase2 and "img/s" in line:
                step_lines += 1
            # a couple of summary lines INSIDE phase 2 -> genuinely
            # mid-phase-2 when we pull the trigger
            if kill_after_steps and not sent and step_lines >= 2:
                time.sleep(5)
                p.send_signal(signal.SIGTERM)
                sent = True
            if time.time() - t0 > 3600:
                p.kill()
                raise TimeoutError(f"leg stuck; see {log_path}")
        rc = p.wait(timeout=600)
    return rc


def load_npz(path):
    out = {}
    with np.load(path) as z:
        for k in z.files:
            out[k] = z[k]
    return out


def main(workdir: str):
    os.makedirs(workdir, exist_ok=True)
    data = os.path.join(workdir, "data")
    make_data(data)
    report = []

    # leg 1: uninterrupted reference
    log_u = os.path.join(workdir, "logs_uninterrupted")
    t0 = time.time()
    rc = run_leg(cli_cmd(data, log_u, auto_resume=False), False,
                 os.path.join(workdir, "leg_uninterrupted.txt"))
    report.append(f"leg1 uninterrupted: rc={rc} wall={time.time()-t0:.0f}s")
    assert rc == 0, rc

    # leg 2: preempted mid-phase-2 by a REAL SIGTERM
    log_i = os.path.join(workdir, "logs_preempted")
    t0 = time.time()
    rc = run_leg(cli_cmd(data, log_i, auto_resume=True), True,
                 os.path.join(workdir, "leg_preempted.txt"))
    report.append(f"leg2 SIGTERM mid-phase: rc={rc} wall={time.time()-t0:.0f}s")
    assert rc == 75, f"expected EX_TEMPFAIL 75, got {rc}"
    pkls = [f for f in os.listdir(log_i) if f.endswith("_interrupt.pkl")]
    assert len(pkls) == 1, os.listdir(log_i)
    report.append(f"leg2 resume point: {pkls[0]}")

    # leg 3: requeue of the SAME command line
    t0 = time.time()
    rc = run_leg(cli_cmd(data, log_i, auto_resume=True), False,
                 os.path.join(workdir, "leg_requeued.txt"))
    report.append(f"leg3 requeue: rc={rc} wall={time.time()-t0:.0f}s")
    assert rc == 0, rc
    leg3 = open(os.path.join(workdir, "leg_requeued.txt")).read()
    assert "auto_resume: continuing from" in leg3

    # bitwise equality of the final phase checkpoints
    u = load_npz(os.path.join(log_u, "model_2.npz"))
    i = load_npz(os.path.join(log_i, "model_2.npz"))
    param_keys = [k for k in u if k.startswith(("params/", "ema/"))]
    assert set(u) == set(i)
    mismatched = [k for k in param_keys if not np.array_equal(u[k], i[k])]
    assert not mismatched, mismatched[:5]
    report.append(
        f"bitwise equality: {len(param_keys)} param/EMA arrays identical "
        f"between uninterrupted and preempted+requeued runs")

    txt = "\n".join(report) + "\nPREEMPTION RECEIPT OK\n"
    with open(os.path.join(workdir, "receipt.txt"), "w") as f:
        f.write(txt)
    print(txt)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/preemption_receipt")
