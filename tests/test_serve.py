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
    def broken_sample(seed, i):
        raise RuntimeError("relay wedged")

    service = GeneratorService(broken_sample, 2, {"source": "test"})
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
