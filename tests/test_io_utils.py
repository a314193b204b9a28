"""Tests for IO: codecs round-trips, EXR codec, mesh export, pipeline, webzip."""

import io
import json
import zipfile

import numpy as np
import pytest

from moge_tpu.utils.exr import read_exr, write_exr
from moge_tpu.utils.io import read_depth, read_normal, read_segmentation, write_depth, write_normal, write_segmentation
from moge_tpu.utils.mesh import image_mesh_from_map, save_glb, save_ply
from moge_tpu.utils import pipeline


def test_depth_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.5, 50.0, (40, 50)).astype(np.float32)
    depth[0, :5] = np.nan
    depth[1, :5] = np.inf
    p = tmp_path / "depth.png"
    write_depth(p, depth)
    back = read_depth(p)
    assert np.isnan(back[0, :5]).all()
    assert np.isinf(back[1, :5]).all()
    valid = np.isfinite(depth)
    # log-encoded 16-bit: relative error bounded by the quantization step
    np.testing.assert_allclose(back[valid], depth[valid], rtol=2e-4)


def test_normal_png_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n = rng.standard_normal((30, 32, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n[0, 0] = np.nan
    p = tmp_path / "normal.png"
    write_normal(p, n)
    back = read_normal(p)
    assert np.isnan(back[0, 0]).all()
    valid = ~np.isnan(n).any(-1)
    # 16-bit quantized unit vectors
    dots = np.sum(back[valid] * n[valid], axis=-1)
    assert dots.min() > 0.9999


def test_segmentation_roundtrip(tmp_path):
    seg = np.arange(12, dtype=np.uint8).reshape(3, 4)
    labels = {"wall": 1, "floor": 2}
    p = tmp_path / "seg.png"
    write_segmentation(p, seg, labels)
    back, back_labels = read_segmentation(p)
    np.testing.assert_array_equal(back, seg)
    assert back_labels == labels


def test_exr_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    for shape in [(17, 23), (17, 23, 3)]:
        data = rng.standard_normal(shape).astype(np.float32)
        p = tmp_path / "t.exr"
        write_exr(p, data)
        back, names = read_exr(p)
        want = data[..., None] if data.ndim == 2 else data
        # channels come back alphabetically sorted; remap for RGB
        if want.shape[-1] == 3:
            remap = {"R": 0, "G": 1, "B": 2}
            idx = [remap[n] for n in names]
            np.testing.assert_array_equal(back, want[..., idx])
        else:
            np.testing.assert_array_equal(back[..., 0], want[..., 0])


def test_mesh_export(tmp_path):
    rng = np.random.default_rng(3)
    h, w = 8, 10
    pts = rng.standard_normal((h, w, 3)).astype(np.float32)
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    uv = rng.uniform(0, 1, (h, w, 2)).astype(np.float32)
    mask = np.ones((h, w), bool)
    mask[0, 0] = False
    faces, v, c, vuv = image_mesh_from_map(pts, img, uv, mask=mask, tri=True)
    assert faces.max() < len(v)
    assert len(v) == h * w - 1  # unused masked vertex compacted away

    save_ply(tmp_path / "m.ply", v, faces, c)
    raw = (tmp_path / "m.ply").read_bytes()
    assert raw.startswith(b"ply\nformat binary_little_endian")

    texture = (img * 255).astype(np.uint8)
    save_glb(tmp_path / "m.glb", v, faces, vuv, texture)
    raw = (tmp_path / "m.glb").read_bytes()
    assert raw[:4] == b"glTF"
    import struct

    total = struct.unpack("<I", raw[8:12])[0]
    assert total == len(raw)


def test_pipeline_order_preserved():
    import time

    def gen():
        yield from range(20)

    def slow_sq(x):  # jitter to stress ordering
        time.sleep(0.001 * (x % 3))
        return x * x

    pipe = pipeline.Sequential([
        gen,
        pipeline.Parallel([slow_sq] * 4),
        pipeline.Batch(5),
        pipeline.Buffer(2),
    ])
    with pipe:
        results = list(pipe)
    flat = [x for b in results for x in b]
    assert flat == [x * x for x in range(20)]


def test_webzipfile_range_reads(tmp_path):
    # Build a zip, serve it through a fake range-request session.
    blob = io.BytesIO()
    with zipfile.ZipFile(blob, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("a/meta.json", json.dumps({"x": 1}))
        zf.writestr("a/data.bin", bytes(range(256)) * 100)
        zf.writestr("stored.bin", b"hello world", compress_type=zipfile.ZIP_STORED)
    raw = blob.getvalue()

    class FakeResponse:
        def __init__(self, content, headers):
            self.content, self.headers = content, headers

        def raise_for_status(self):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            pass

    class FakeSession:
        headers: dict = {}
        allow_head = True

        def head(self, url, allow_redirects=False):
            resp = FakeResponse(b"", {"Content-Length": str(len(raw))} if self.allow_head else {})
            resp.ok = self.allow_head
            return resp

        def get(self, url, headers=None, stream=False):
            headers = headers or {}
            if "Range" in headers:
                rng = headers["Range"].split("=")[1]
                lo, hi = rng.split("-")
                lo, hi = int(lo), int(hi)
                hi = min(hi, len(raw) - 1)
                return FakeResponse(
                    raw[lo : hi + 1],
                    {"Content-Length": str(hi + 1 - lo),
                     "Content-Range": f"bytes {lo}-{hi}/{len(raw)}"},
                )
            return FakeResponse(raw, {"Content-Length": str(len(raw))})

    from moge_tpu.utils.webzipfile import WebZipFile

    wz = WebZipFile("http://fake/data.zip", session=FakeSession())
    assert set(wz.namelist()) == {"a/meta.json", "a/data.bin", "stored.bin"}
    assert json.loads(wz.read("a/meta.json")) == {"x": 1}
    assert wz.read("a/data.bin") == bytes(range(256)) * 100
    assert wz.read("stored.bin") == b"hello world"

    # WebFile itself: seek/tell/read semantics and the no-HEAD fallback.
    from moge_tpu.utils.webfile import WebFile

    f = WebFile("http://fake/data.zip", session=FakeSession())
    assert f.size == len(raw)
    assert f.read(10) == raw[:10] and f.tell() == 10
    assert f.seek(-5, io.SEEK_END) == len(raw) - 5
    assert f.read() == raw[-5:]
    assert f.read(4) == b""  # EOF
    assert f.seek(0) == 0 and f.available() == len(raw)

    no_head = FakeSession()
    no_head.allow_head = False
    f2 = WebFile("http://fake/data.zip", session=no_head)
    assert f2.size == len(raw)  # via Content-Range probe
    assert f2.read(3) == raw[:3]
