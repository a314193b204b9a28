"""HTTP inference server: end-to-end over a real socket with a tiny model.

Covers the serving chain request decode -> micro-batcher -> model.infer ->
response codecs (log-PNG depth roundtrip, npz format, fov override), plus
health/stats and error paths. The reference has no serving story (gradio app
only); this is the TPU-native production-serving surface.
"""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from test_eval_e2e import TINY_V2_CONFIG

pytestmark = pytest.mark.slow  # module fixture compiles a model


@pytest.fixture(scope="module")
def server_url():
    import jax.numpy as jnp

    from moge_tpu.models.v2 import MoGeModel
    from moge_tpu.scripts.serve import create_server

    model = MoGeModel(TINY_V2_CONFIG, None, dtype=jnp.float32)
    model.init_random(seed=0, image_hw=(56, 56))
    server, batcher = create_server(
        model, "127.0.0.1", 0, height=56, width=56, num_tokens=100,
        max_batch=4, max_wait_ms=50.0, use_fp16=False,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url
    server.shutdown()
    batcher.stop()


def _jpeg_bytes(rng, h=80, w=100):
    import cv2

    img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
    return cv2.imencode(".jpg", img)[1].tobytes()


def _post(url, body, timeout=300):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_healthz(server_url):
    with urllib.request.urlopen(f"{server_url}/healthz") as r:
        obj = json.loads(r.read())
    assert obj["status"] == "ok"
    assert obj["resolution"] == [56, 56]
    assert "stats" in obj


def test_infer_json_roundtrip(server_url):
    from moge_tpu.utils.io import read_depth

    rng = np.random.default_rng(0)
    status, ctype, body = _post(
        f"{server_url}/v1/infer?maps=depth,intrinsics,mask", _jpeg_bytes(rng))
    assert status == 200 and ctype == "application/json"
    obj = json.loads(body)
    # random-weight models can produce degenerate estimated intrinsics;
    # only require a finite value (the fov_x=60 override test is strict)
    assert np.isfinite(obj["fov_x_deg"])
    assert np.asarray(obj["intrinsics"]).shape == (3, 3)
    depth = read_depth(io.BytesIO(base64.b64decode(obj["depth_png16_log"])))
    assert depth.shape == (56, 56)
    mask_png = base64.b64decode(obj["mask_png"])
    assert mask_png[:4] == b"\x89PNG"


def test_infer_concurrent_batching(server_url):
    rng = np.random.default_rng(1)
    bodies = [_jpeg_bytes(rng) for _ in range(3)]
    results = [None] * 3

    def worker(i):
        results[i] = _post(f"{server_url}/v1/infer", bodies[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results)
    with urllib.request.urlopen(f"{server_url}/healthz") as r:
        stats = json.loads(r.read())["stats"]
    assert stats["requests"] >= 4
    assert stats["batched_images"] >= 4
    assert stats["batches"] >= 1


def test_infer_npz_and_fov_override(server_url):
    rng = np.random.default_rng(2)
    status, ctype, body = _post(
        f"{server_url}/v1/infer?maps=depth,points,intrinsics&format=npz", _jpeg_bytes(rng))
    assert status == 200 and ctype == "application/octet-stream"
    arrays = np.load(io.BytesIO(body))
    assert arrays["depth"].shape == (56, 56)
    assert arrays["points"].shape == (56, 56, 3)

    status, _, body = _post(f"{server_url}/v1/infer?fov_x=60", _jpeg_bytes(rng))
    assert status == 200
    obj = json.loads(body)
    assert abs(obj["fov_x_deg"] - 60.0) < 1.0


def test_infer_bad_requests(server_url):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server_url}/v1/infer", b"not an image")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server_url}/v1/infer?maps=bogus", _jpeg_bytes(np.random.default_rng(3)))
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        with urllib.request.urlopen(f"{server_url}/nope") as r:
            pass
    assert e.value.code == 404


def test_serve_with_sp_model():
    """Composition: the micro-batcher in front of a sequence-parallel model
    (sp mesh over 4 virtual devices) serves requests correctly."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from moge_tpu.models.v2 import MoGeModel
    from moge_tpu.scripts.serve import create_server

    model = MoGeModel(TINY_V2_CONFIG, None, dtype=jnp.float32)
    model.init_random(seed=0, image_hw=(56, 56))
    devices = np.array(jax.devices()[:4]).reshape(4)
    sp_model = MoGeModel(TINY_V2_CONFIG, model.params, dtype=jnp.float32,
                         sp_mesh=Mesh(devices, ("sp",)))
    server, batcher = create_server(
        sp_model, "127.0.0.1", 0, height=56, width=56, num_tokens=100,
        max_batch=2, max_wait_ms=10.0, use_fp16=False,
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        rng = np.random.default_rng(7)
        status, _, body = _post(f"{url}/v1/infer?maps=depth,intrinsics", _jpeg_bytes(rng))
        assert status == 200
        obj = json.loads(body)
        assert "depth_png16_log" in obj and "intrinsics" in obj
    finally:
        server.shutdown()
        batcher.stop()
