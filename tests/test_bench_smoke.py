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


def test_bench_emits_headline_then_superseding_line(monkeypatch, capsys):
    """main() prints the flushed HEADLINE line right after the phase-6
    measurements (timeout robustness, VERDICT r3 item 1) and then one
    superseding full line; both parse, share the headline keys, and the
    LAST line (what the driver records) carries the detail sections."""
    monkeypatch.setattr(bench, "measure_step", lambda *a, **k: 100.0)
    monkeypatch.setattr(bench, "measure_sampling", lambda *a, **k: 10.0)
    bench.main()
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(out) == 2
    head, full = json.loads(out[0]), json.loads(out[1])
    for rec in (head, full):
        assert {"metric", "value", "unit", "vs_baseline", "detail"} <= set(rec)
        assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert head["value"] == full["value"] == 80.0  # 8 vols / 100 ms
    assert {"mixing_ms_per_step", "stabilizing_ms_per_step"} <= set(head["detail"])
    assert {"phase7_64x256x256_b1_ms_per_step", "phase7_volumes_per_sec",
            "serving_ema_sample_ms_per_batch8", "serving_volumes_per_sec",
            "mfu", "mfu_model_ceiling"} <= set(full["detail"])


def test_bench_budget_skips_detail_sections(monkeypatch, capsys):
    """With the budget already exceeded, the detail sections are skipped
    (recorded as notes) but BOTH lines still print — an expired driver
    window can never eat the headline again."""
    monkeypatch.setattr(bench, "measure_step", lambda *a, **k: 100.0)
    monkeypatch.setattr(
        bench, "measure_sampling",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("must be skipped")))
    monkeypatch.setattr(bench, "BUDGET_S", -1.0)
    bench.main()
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(out) == 2
    full = json.loads(out[1])
    assert "skipped" in full["detail"]["serving_note"]
    assert "skipped" in full["detail"]["phase7_note"]
    assert full["value"] == 80.0


def test_compute_flops_tiny():
    """The FLOPs-counting machinery (MFU numerator source) runs end-to-end
    on tiny shapes and returns a sane count: at least the analytic conv
    lower bound of one fwd pass."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    import compute_flops

    out = compute_flops.main(tiny=True)
    f = out["tiny_stabilizing"]["flops"]
    assert f > 1e6, f  # a 8^3 two-conv G+D WGAN-GP step is O(1e8) flops
