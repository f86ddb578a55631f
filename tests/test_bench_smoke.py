"""Smoke-test bench.py's measurement helpers at a tiny phase on CPU.

bench.py is the driver-run benchmark (one JSON line, real chip); its
helpers are exercised here at phase 3 so a refactor of the train-step /
sampler APIs cannot silently break the bench between rounds.  The phase-6
config itself is only ever compiled on hardware.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_measure_step_and_sampling_run_at_tiny_phase():
    cfg = bench.make_cfg(3, 2)
    from saragan_tpu.models import get_architecture

    arch = get_architecture("pgan")
    shape = (4, 16, 16)

    ms_static = bench.measure_step(arch, cfg, 3, 2, shape, 0.0, 2)
    ms_traced = bench.measure_step(arch, cfg, 3, 2, shape, None, 2)
    assert np.isfinite(ms_static) and ms_static > 0
    assert np.isfinite(ms_traced) and ms_traced > 0

    ms_gen = bench.measure_sampling(cfg, 3, 2, shape, 2)
    assert np.isfinite(ms_gen) and ms_gen > 0


def test_bench_emits_one_json_line_shape(monkeypatch, capsys):
    """main() prints exactly one parseable JSON line with the driver's
    required keys, without compiling the phase-6/7 programs (helpers are
    monkeypatched to constants)."""
    monkeypatch.setattr(bench, "measure_step", lambda *a, **k: 100.0)
    monkeypatch.setattr(bench, "measure_sampling", lambda *a, **k: 10.0)
    bench.main()
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(out) == 1
    rec = json.loads(out[0])
    assert {"metric", "value", "unit", "vs_baseline", "detail"} <= set(rec)
    assert {"mixing_ms_per_step", "stabilizing_ms_per_step",
            "phase7_64x256x256_b1_ms_per_step", "phase7_volumes_per_sec",
            "serving_ema_sample_ms_per_batch8", "serving_volumes_per_sec"} <= set(rec["detail"])
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
