"""HTTP serving endpoint tests (tools/serve.py): real server on a loopback
socket, npy and PNG payloads, error paths, and the StableHLO-artifact
service."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from saragan_tpu.config import Config
from saragan_tpu.models import get_architecture
from saragan_tpu.tools.serve import GeneratorService, make_server
from saragan_tpu.train import checkpoint as ckpt


def tiny_cfg(**kw):
    base = dict(
        architecture="pgan",
        start_shape="(1, 4, 4, 4)",
        final_shape="(1, 16, 16, 16)",
        starting_phase=2,
        ending_phase=2,
        latent_dim=8,
        base_batch_size=2,
        kernel_spec=[[[], [3, 3, 3]], [[3, 3, 3], [3, 3, 3]]],
        filter_spec=[[8, 8], [8, 8]],
        noise_stddev=0.0,
        g_lr=1e-3,
        d_lr=1e-3,
    )
    base.update(kw)
    return Config(**base).finalize()


@pytest.fixture(scope="module")
def checkpoint_path(tmp_path_factory):
    cfg = tiny_cfg()
    arch = get_architecture("pgan")
    params = arch.init(jax.random.PRNGKey(0), phase=2, cfg=cfg)
    path = str(tmp_path_factory.mktemp("serve") / "model_2")
    ckpt.save_params(path, params, ema=dict(params), meta={"phase": 2})
    return path + ".npz"


@pytest.fixture(scope="module")
def server(checkpoint_path):
    cfg = tiny_cfg(data_mean=10.0, data_stddev=4.0)
    service = GeneratorService.from_checkpoint(
        "pgan", checkpoint_path, cfg=cfg, phase=2, batch_size=2)
    srv = make_server(service, port=0)  # 0 -> OS-assigned free port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, body: dict):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_healthz_and_info(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(server + "/info") as r:
        info = json.loads(r.read())
    assert info["architecture"] == "pgan"
    assert info["phase"] == 2
    assert info["volume_shape"] == [1, 8, 8, 8]
    assert info["num_params"] > 0


def test_generate_npy_shape_and_batching(server):
    # num_samples=3 with batch_size=2 forces a 2-batch loop + truncation
    status, ctype, body = _post(server + "/generate",
                                {"num_samples": 3, "seed": 7, "unnormalize": False})
    assert status == 200 and ctype == "application/octet-stream"
    vols = np.load(io.BytesIO(body))
    assert vols.shape == (3, 1, 8, 8, 8)
    assert vols.dtype == np.float32
    assert np.all(np.isfinite(vols))
    # same seed -> same payload (deterministic serving)
    _, _, body2 = _post(server + "/generate",
                        {"num_samples": 3, "seed": 7, "unnormalize": False})
    assert body2 == body


def test_generate_unnormalizes_by_default(server):
    _, _, raw = _post(server + "/generate",
                      {"num_samples": 2, "seed": 1, "unnormalize": False})
    _, _, un = _post(server + "/generate", {"num_samples": 2, "seed": 1})
    raw_v, un_v = np.load(io.BytesIO(raw)), np.load(io.BytesIO(un))
    np.testing.assert_allclose(un_v, raw_v * 4.0 + 10.0, rtol=1e-5)


def test_generate_png(server):
    status, ctype, body = _post(server + "/generate",
                                {"num_samples": 2, "format": "png"})
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_generate_bad_request(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/generate", {"num_samples": 2, "format": "gif"})
    assert e.value.code == 400
    assert "unknown format" in json.loads(e.value.read())["error"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/generate", {"num_samples": 0})
    assert e.value.code == 400
    # over the per-request cap -> 400 with the remedy in the message
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/generate", {"num_samples": 10**9})
    assert e.value.code == 400
    assert "max_samples" in json.loads(e.value.read())["error"]
    # non-integer num_samples -> 400 (parse error is the client's)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/generate", {"num_samples": "many"})
    assert e.value.code == 400


def test_server_fault_is_500(checkpoint_path):
    """An exception inside the sampler (server's fault) maps to HTTP 500,
    not 400 — monitoring keyed on 5xx must see chip/relay faults."""
    def broken_run_slots(seeds, idxs):
        raise RuntimeError("relay wedged")

    service = GeneratorService(broken_run_slots, 2, {"source": "test"})
    srv = make_server(service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url + "/generate", {"num_samples": 1})
        assert e.value.code == 500
        assert "relay wedged" in json.loads(e.value.read())["error"]
    finally:
        srv.shutdown()


def test_seed_streams_do_not_overlap(server):
    """Batch 1 of request seed=7 must differ from batch 0 of seed=8 —
    per-batch keys are fold_in-derived, not seed+i."""
    _, _, a = _post(server + "/generate",
                    {"num_samples": 4, "seed": 7, "unnormalize": False})
    _, _, b = _post(server + "/generate",
                    {"num_samples": 2, "seed": 8, "unnormalize": False})
    a_v, b_v = np.load(io.BytesIO(a)), np.load(io.BytesIO(b))
    assert not np.allclose(a_v[2:4], b_v)


# ---------------------------------------------------------------------------
# Micro-batching (MicroBatcher + coalescing-invariant responses)
# ---------------------------------------------------------------------------

def _slot_oracle(seeds, idxs):
    """Deterministic per-slot payload: row k depends only on (seeds[k],
    idxs[k]) — the keyed-sampler contract, checkable to the bit."""
    vals = np.asarray(seeds, np.float32) * 1000 + np.asarray(idxs, np.float32)
    return np.tile(vals[:, None, None, None, None], (1, 1, 2, 2, 2))


def _expected(seed, num):
    return _slot_oracle(np.full(num, seed, np.int32),
                        np.arange(num, dtype=np.int32))


def test_microbatcher_coalesces_concurrent_requests():
    """Two pending 2-sample requests with batch_size=4 ship as ONE batch,
    each caller getting its own rows."""
    from saragan_tpu.tools.serve import MicroBatcher

    calls = []

    def run(seeds, idxs):
        calls.append((list(seeds), list(idxs)))
        return _slot_oracle(seeds, idxs)

    mb = MicroBatcher(run, batch_size=4, start=False)
    results = {}

    def client(seed):
        results[seed] = mb.submit(seed, 2)

    threads = [threading.Thread(target=client, args=(s,)) for s in (1, 2)]
    for t in threads:
        t.start()
    # both requests are queued before the worker exists -> one 4-slot batch
    deadline = 100
    while len(mb._q) < 4 and deadline:
        deadline -= 1
        import time
        time.sleep(0.01)
    assert len(mb._q) == 4
    mb.start()
    for t in threads:
        t.join(timeout=10)
    assert len(calls) == 1
    np.testing.assert_array_equal(results[1], _expected(1, 2))
    np.testing.assert_array_equal(results[2], _expected(2, 2))
    assert mb.stats["batches"] == 1
    assert mb.stats["padded_slots"] == 0
    assert mb.stats["max_requests_coalesced"] == 2
    mb.close()


def test_microbatcher_pads_and_splits():
    from saragan_tpu.tools.serve import MicroBatcher

    sizes = []

    def run(seeds, idxs):
        sizes.append(len(seeds))
        return _slot_oracle(seeds, idxs)

    mb = MicroBatcher(run, batch_size=2)
    # 1 sample with B=2 -> 1 padded slot
    np.testing.assert_array_equal(mb.submit(5, 1), _expected(5, 1))
    # 5 samples with B=2 -> 3 batches, 1 more padded slot
    np.testing.assert_array_equal(mb.submit(6, 5), _expected(6, 5))
    assert all(s == 2 for s in sizes)
    assert mb.stats["batches"] == 4
    assert mb.stats["padded_slots"] == 2
    mb.close()


def test_microbatcher_error_fails_batch_but_survives():
    """A dispatch fault fails every request in that batch (and skips their
    queued slots) but the worker keeps serving later requests."""
    from saragan_tpu.tools.serve import MicroBatcher

    state = {"fail": True}

    def run(seeds, idxs):
        if state["fail"]:
            raise RuntimeError("relay wedged")
        return _slot_oracle(seeds, idxs)

    mb = MicroBatcher(run, batch_size=4, start=False)
    errors = {}

    def client(seed, num):
        try:
            mb.submit(seed, num)
        except RuntimeError as e:
            errors[seed] = str(e)

    # seed 1 spans two batches (6 slots, B=4): the first dispatch fails both
    # coalesced requests; seed 1's remaining 2 slots must be skipped, not
    # dispatched as a half-dead batch
    threads = [threading.Thread(target=client, args=(1, 6)),
               threading.Thread(target=client, args=(2, 2))]
    for t in threads:
        t.start()
    import time
    for _ in range(100):
        if len(mb._q) == 8:
            break
        time.sleep(0.01)
    mb.start()
    for t in threads:
        t.join(timeout=10)
    assert errors == {1: "relay wedged", 2: "relay wedged"}
    state["fail"] = False
    np.testing.assert_array_equal(mb.submit(3, 3), _expected(3, 3))
    mb.close()


def test_service_responses_invariant_under_coalescing(server):
    """The same request returns byte-identical payloads served solo vs
    fired concurrently with other seeds — per-sample key derivation makes
    micro-batching invisible to clients."""
    solo = {}
    for seed in (7, 8, 9, 10):
        _, _, solo[seed] = _post(server + "/generate",
                                 {"num_samples": 3, "seed": seed,
                                  "unnormalize": False})
    concurrent = {}

    def client(seed):
        _, _, concurrent[seed] = _post(server + "/generate",
                                       {"num_samples": 3, "seed": seed,
                                        "unnormalize": False})

    threads = [threading.Thread(target=client, args=(s,)) for s in (7, 8, 9, 10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert concurrent == solo


def test_stats_endpoint(server):
    # at least one generate so the counters are non-trivial even when this
    # test runs alone (the server fixture is module-scoped and fresh then)
    _post(server + "/generate", {"num_samples": 1, "seed": 3})
    with urllib.request.urlopen(server + "/stats") as r:
        stats = json.loads(r.read())
    assert stats["batch_size"] == 2
    assert stats["requests"] >= 1
    assert stats["samples"] >= 1
    assert stats["batches"] >= 1
    # padding is bounded by one short batch per dispatch
    assert 0 <= stats["padded_slots"] < stats["batches"] * stats["batch_size"]


def test_microbatcher_rejects_nonpositive_num():
    """num<1 enqueues no slots and would wait forever — must raise."""
    from saragan_tpu.tools.serve import MicroBatcher

    mb = MicroBatcher(_slot_oracle, batch_size=2)
    with pytest.raises(ValueError):
        mb.submit(1, 0)
    with pytest.raises(ValueError):
        mb.submit(1, -3)
    mb.close()


def test_microbatcher_bucketed_dispatch():
    """{2: fn, 4: fn} buckets: a 1-slot queue ships in the 2-bucket, a
    deep queue in the 4-bucket, and a 6-slot request splits 4+2 — each
    dispatch the smallest compiled size that fits."""
    from saragan_tpu.tools.serve import MicroBatcher

    sizes = []

    def make_run(b):
        def run(seeds, idxs):
            assert len(seeds) == b
            sizes.append(b)
            return _slot_oracle(seeds, idxs)
        return run

    mb = MicroBatcher({2: make_run(2), 4: make_run(4)})
    assert mb.batch_size == 4  # drain cap = largest bucket
    np.testing.assert_array_equal(mb.submit(5, 1), _expected(5, 1))
    assert sizes == [2]  # solo slot -> small bucket, 1 padded
    np.testing.assert_array_equal(mb.submit(6, 6), _expected(6, 6))
    assert sizes == [2, 4, 2]  # 6 slots -> 4-bucket + 2-bucket, no padding
    assert mb.stats["padded_slots"] == 1
    assert mb.stats["dispatch_sizes"] == {2: 2, 4: 1}
    mb.close()


def test_microbatcher_cost_aware_bucket_choice():
    """With measured per-bucket latencies the dispatcher minimizes
    T_b * ceil(queue/b): a fast small bucket clears a mid-size queue as
    FULL small dispatches (3 * 20 < 77.7 — the shape of the real phase-6
    win: two full batch-8 at 30 ms beat one padded batch-32 at 77.7 ms for
    a 9-slot queue) instead of round 3's padded large dispatch; when the
    small bucket is slow (3 * 30 > 77.7) the padded large dispatch wins."""
    from saragan_tpu.tools.serve import MicroBatcher

    def make(sizes_log, b):
        def run(seeds, idxs):
            sizes_log.append(b)
            return _slot_oracle(seeds, idxs)
        return run

    # fast small bucket: 6 slots -> three full 2-dispatches, zero padding
    sizes = []
    mb = MicroBatcher({2: make(sizes, 2), 8: make(sizes, 8)}, start=False)
    mb._lat.update({2: 20.0, 8: 77.7})
    mb._lat_n.update({2: 2, 8: 2})
    mb.start()
    np.testing.assert_array_equal(mb.submit(7, 6), _expected(7, 6))
    assert sizes == [2, 2, 2]
    assert mb.stats["padded_slots"] == 0
    mb.close()

    # slow small bucket: the padded 8-dispatch clears 6 slots faster
    sizes = []
    mb = MicroBatcher({2: make(sizes, 2), 8: make(sizes, 8)}, start=False)
    mb._lat.update({2: 30.0, 8: 77.7})  # 3 * 30 > 77.7
    mb._lat_n.update({2: 2, 8: 2})
    mb.start()
    np.testing.assert_array_equal(mb.submit(9, 6), _expected(9, 6))
    assert sizes == [8]
    assert mb.stats["padded_slots"] == 2
    mb.close()


def test_microbatcher_records_bucket_latency_after_compile_call():
    """The first dispatch per bucket (the jit compile in production) never
    enters the latency EMA; later dispatches do."""
    from saragan_tpu.tools.serve import MicroBatcher

    mb = MicroBatcher({2: _slot_oracle})
    mb.submit(1, 2)  # first 2-dispatch: compile-bearing, not recorded
    assert mb._lat[2] is None
    mb.submit(1, 2)
    assert mb._lat[2] is not None and mb._lat[2] >= 0.0
    mb.close()


def test_microbatcher_rejects_out_of_int32_seed():
    """A seed outside int32 fails the SUBMITTER with ValueError instead of
    raising OverflowError inside the worker (which would kill the dispatch
    loop and hang every later request forever); the worker keeps serving."""
    from saragan_tpu.tools.serve import MicroBatcher

    mb = MicroBatcher(_slot_oracle, batch_size=2)
    with pytest.raises(ValueError, match="int32"):
        mb.submit(2**31, 1)
    with pytest.raises(ValueError, match="int32"):
        mb.submit(-(2**31) - 1, 1)
    # boundary values are fine and the worker is still alive
    np.testing.assert_array_equal(mb.submit(2**31 - 1, 1),
                                  _expected(2**31 - 1, 1))
    np.testing.assert_array_equal(mb.submit(3, 1), _expected(3, 1))
    mb.close()


def test_microbatcher_warm_seeds_every_bucket():
    """warm() compiles and latency-seeds EVERY bucket directly.  Warmup via
    submit() is rerouted by the cost model once the small buckets are
    measured (the proportional estimate overestimates unmeasured larger
    buckets), leaving the largest bucket cold forever."""
    from saragan_tpu.tools.serve import MicroBatcher

    sizes = []

    def make_run(b):
        def run(seeds, idxs):
            assert len(seeds) == b
            sizes.append(b)
            return _slot_oracle(seeds, idxs)
        return run

    mb = MicroBatcher({2: make_run(2), 4: make_run(4), 8: make_run(8)})
    mb.warm()
    assert sizes == [2, 2, 4, 4, 8, 8]
    assert all(mb._lat[b] is not None for b in (2, 4, 8)), mb._lat
    # post-warm dispatches enter the EMA immediately (compile call consumed)
    assert all(mb._lat_n[b] == 2 for b in (2, 4, 8))
    # the batcher still serves normally afterwards
    np.testing.assert_array_equal(mb.submit(9, 3), _expected(9, 3))
    mb.close()


def test_service_warmup_seeds_all_buckets(checkpoint_path):
    """GeneratorService.warmup() (what serve.main runs before traffic)
    leaves every bucket measured, so cost-aware choice can ever pick the
    largest bucket."""
    from saragan_tpu.tools.serve import GeneratorService

    service = GeneratorService.from_checkpoint(
        "pgan", checkpoint_path, cfg=tiny_cfg(), phase=2, batch_sizes=[2, 4])
    try:
        service.warmup()
        assert all(v is not None for v in service._batcher._lat.values()), (
            service._batcher._lat)
    finally:
        service.close()


def test_data_parallel_serving_matches_single_device(checkpoint_path):
    """--serve_devices N: the mesh-sharded keyed sampler (params
    replicated, batch rows sharded over a 1-axis mesh) returns the SAME
    volumes as the single-device service — per-sample keying makes every
    row independent, so GSPMD splits the batch without changing any row's
    math."""
    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip("needs >= 2 devices (virtual CPU mesh)")
    cfg = tiny_cfg()
    single = GeneratorService.from_checkpoint(
        "pgan", checkpoint_path, cfg=cfg, phase=2, batch_size=4)
    sharded = GeneratorService.from_checkpoint(
        "pgan", checkpoint_path, cfg=cfg, phase=2, batch_size=4, n_devices=n)
    assert sharded.info["serve_devices"] == n
    a = single.generate(6, seed=17, unnormalize=False)
    b = sharded.generate(6, seed=17, unnormalize=False)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    single.close()
    sharded.close()

    # batch sizes that don't divide by the mesh are rejected up front
    with pytest.raises(ValueError):
        GeneratorService.from_checkpoint(
            "pgan", checkpoint_path, cfg=cfg, phase=2, batch_size=3,
            n_devices=n)


def test_bucketed_service_responses_match_single_bucket(checkpoint_path):
    """A checkpoint service compiled at batch_sizes=[2,4] returns byte-
    identical volumes to the single-bucket batch-2 service — the per-sample
    key contract holds across bucket shapes."""
    cfg = tiny_cfg()
    small = GeneratorService.from_checkpoint(
        "pgan", checkpoint_path, cfg=cfg, phase=2, batch_size=2)
    bucketed = GeneratorService.from_checkpoint(
        "pgan", checkpoint_path, cfg=cfg, phase=2, batch_sizes=[2, 4])
    assert bucketed.batch_size == 4
    assert bucketed.info["batch_sizes"] == [2, 4]
    a = small.generate(5, seed=11, unnormalize=False)
    b = bucketed.generate(5, seed=11, unnormalize=False)  # one 4- + one 2-dispatch
    np.testing.assert_array_equal(a, b)
    assert bucketed.stats["dispatch_sizes"][4] >= 1
    small.close()
    bucketed.close()


def test_fetch_dtype_float16_service(checkpoint_path):
    """--fetch_dtype float16 casts on device before the host fetch; the
    response is still float32 and within f16 rounding of the exact path."""
    cfg = tiny_cfg()
    exact = GeneratorService.from_checkpoint(
        "pgan", checkpoint_path, cfg=cfg, phase=2, batch_size=2)
    f16 = GeneratorService.from_checkpoint(
        "pgan", checkpoint_path, cfg=cfg, phase=2, batch_size=2,
        fetch_dtype="float16")
    assert f16.info["fetch_dtype"] == "float16"
    a = exact.generate(3, seed=5, unnormalize=False)
    b = f16.generate(3, seed=5, unnormalize=False)
    assert b.dtype == np.float32
    # f16 has a 10-bit mantissa: everything agrees to ~1e-3 relative
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)
    assert not np.array_equal(a, b)  # it really did round through f16
    exact.close()
    f16.close()


def test_artifact_service(tmp_path, checkpoint_path):
    from saragan_tpu.core import filter_params
    from saragan_tpu.tools.export_model import export_generator, save_exported

    cfg = tiny_cfg()
    params, ema, _ = ckpt.load_params(checkpoint_path)
    blob = export_generator(cfg, 2, filter_params(ema, "generator"), batch_size=2)
    path = save_exported(str(tmp_path / "g.stablehlo"), blob)

    service = GeneratorService.from_artifact(path)
    assert service.batch_size == 2
    assert service.info["latent_dim"] == 8
    vols = service.generate(2, seed=3, unnormalize=False)
    assert vols.shape == (2, 1, 8, 8, 8)
    assert np.all(np.isfinite(vols))
    # latent_dim mismatch is rejected
    with pytest.raises(ValueError):
        GeneratorService.from_artifact(path, latent_dim=99)

    # negative seeds are inside submit()'s int32 wire contract (the
    # checkpoint path's device-side fold_in accepts them); the host-side
    # default_rng derivation must not crash — with coalescing, a crash in
    # one slot fails EVERY request packed into the dispatch
    neg = service.generate(2, seed=-1, unnormalize=False)
    assert np.all(np.isfinite(neg))
    # uint32 reinterpretation is a bijection: -1 and 2**32-1... both out of
    # int32 range on the positive side, so just pin determinism + distinctness
    np.testing.assert_array_equal(neg, service.generate(2, seed=-1, unnormalize=False))
    assert not np.array_equal(neg, vols)
    service.close()
