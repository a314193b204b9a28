"""HTTP inference server with dynamic micro-batching.

The reference ships only an interactive gradio demo (reference
moge/scripts/app.py); production serving is left to the user. This server is
the TPU-native counterpart: XLA compiles one program per static shape, so the
server fixes the serve resolution + token count at startup and quantizes the
batch dimension to power-of-two buckets — every request shape maps onto a
small, pre-compilable program set, and concurrent requests ride the same MXU
dispatch instead of queueing serially.

Design:
  * a single dispatch thread owns the device; HTTP threads enqueue decoded
    images and block on a per-request event (JAX dispatch is serialized
    anyway — one consumer means no lock contention on the device);
  * micro-batching: the dispatcher drains the queue up to --max_batch within
    --max_wait_ms of the first request, groups by fov_x (one program input
    per group), pads the batch to the next power-of-two bucket, and runs one
    ``model.infer`` call;
  * ``--warmup`` pre-compiles every bucket at startup so the first real
    request is never a 30 s compile.

Endpoints:
  GET  /healthz          liveness + model/device info + batching stats
  POST /v1/infer         body: raw image bytes (anything cv2 decodes);
                         query: maps=depth,normal,mask,points,intrinsics
                                fov_x=<degrees>  format=json|npz
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Tuple
from urllib.parse import parse_qs, urlparse

import click
import numpy as np

DEFAULT_MAPS = ("depth", "intrinsics")
VALID_MAPS = ("depth", "normal", "mask", "points", "intrinsics")


@dataclass
class _Request:
    image: np.ndarray  # (H, W, 3) float32 in [0, 1], serve resolution
    fov_x: Optional[float]
    maps: Tuple[str, ...] = DEFAULT_MAPS
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[Dict[str, np.ndarray]] = None
    error: Optional[str] = None


def _next_bucket(n: int, cap: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, cap)


class InferenceBatcher:
    """Single-consumer micro-batcher in front of ``model.infer``."""

    def __init__(self, model, height: int, width: int, num_tokens: int,
                 max_batch: int = 8, max_wait_ms: float = 5.0,
                 use_fp16: bool = True):
        self.model = model
        self.height, self.width = height, width
        self.num_tokens = num_tokens
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.use_fp16 = use_fp16
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "batched_images": 0, "errors": 0}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- client side ---------------------------------------------------------
    def infer(self, image: np.ndarray, fov_x: Optional[float], maps=DEFAULT_MAPS,
              timeout_s: float = 120.0):
        req = _Request(image=image, fov_x=fov_x, maps=tuple(maps))
        self.queue.put(req)
        if not req.event.wait(timeout_s):
            raise TimeoutError("inference timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result

    # -- dispatch side -------------------------------------------------------
    def _collect(self):
        first = self.queue.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self.queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                return batch  # stop marker consumed after this batch
            batch.append(nxt)
        return batch

    def _run_group(self, group):
        import jax.numpy as jnp

        n = len(group)
        bucket = _next_bucket(n, self.max_batch)
        images = np.stack([r.image for r in group])
        if bucket > n:  # pad with repeats of the last image; extras dropped
            images = np.concatenate([images, np.repeat(images[-1:], bucket - n, axis=0)])
        fov = group[0].fov_x
        out = self.model.infer(
            jnp.asarray(images), num_tokens=self.num_tokens,
            fov_x=fov, use_fp16=self.use_fp16,
        )
        # Only the UNION of the group's requested maps crosses device->host:
        # over the tunneled runtime the readback is the serve bottleneck
        # (pulling all five maps measured 2.2 req/s at 16 clients; depth +
        # intrinsics is ~1/8 the bytes). Intrinsics always come along — the
        # JSON body reports fov from them and they are 9 floats. Maps whose
        # RESPONSE encoding is 16-bit anyway (depth/normal: log-png16; mask:
        # binary png) transfer as fp16 — half the bytes, no information loss
        # relative to the wire format; points/intrinsics stay fp32 (their
        # response format is fp32 npz / json).
        needed = set().union(*(set(r.maps) for r in group)) | {"intrinsics"}
        # saturating cast for FINITE values: finite depths beyond the fp16
        # range must stay finite (inf means "invalid" downstream, e.g.
        # write_depth's mask), while genuine inf (masked sky) must stay inf
        f16max = float(np.finfo(np.float16).max)
        sat16 = lambda v: jnp.where(jnp.isfinite(v), jnp.clip(v, -f16max, f16max), v
                                    ).astype(jnp.float16)
        out_t = {k: (sat16(v) if k in ("depth", "normal", "mask") else v)
                 for k, v in out.items() if k in needed}

        def finalize():
            # device->host readback + per-request fan-out; runs on the
            # finalizer thread so the dispatch loop can already collect and
            # dispatch the NEXT batch while this one's bytes stream back
            # (the readback, not the compute, bounds tunneled serve).
            out_np = {k: np.asarray(v).astype(np.float32) for k, v in out_t.items()}
            for i, r in enumerate(group):
                r.result = {k: v[i] for k, v in out_np.items()}
                r.event.set()

        self.stats["batches"] += 1
        self.stats["batched_images"] += n
        return finalize

    def _fail_group(self, group, e):
        self.stats["errors"] += 1
        for r in group:
            if not r.event.is_set():
                r.error = f"{type(e).__name__}: {e}"
                r.event.set()

    def _loop(self):
        import concurrent.futures as cf

        # one-deep pipeline: overlap batch N's device->host readback with
        # batch N+1's collect + dispatch
        pool = cf.ThreadPoolExecutor(max_workers=1)
        pending = None  # (future, group)
        try:
            while not self._stop.is_set():
                batch = self._collect()
                if batch is None:
                    return
                # one program input per fov_x value -> group before dispatch
                groups: Dict[Any, list] = {}
                for r in batch:
                    groups.setdefault(r.fov_x, []).append(r)
                for group in groups.values():
                    try:
                        finalize = self._run_group(group)
                    except Exception as e:  # surface to the waiting requests
                        self._fail_group(group, e)
                        continue
                    if pending is not None:
                        fut, pgroup = pending
                        try:
                            fut.result()
                        except Exception as e:
                            self._fail_group(pgroup, e)
                    pending = (pool.submit(finalize), group)
        finally:
            if pending is not None:
                fut, pgroup = pending
                try:
                    fut.result()
                except Exception as e:
                    self._fail_group(pgroup, e)
            pool.shutdown(wait=True)

    def warmup(self):
        """Pre-compile every batch bucket by driving model.infer directly.

        Sync per bucket is a HOST READBACK, not block_until_ready: over the
        tunneled TPU runtime block_until_ready returns before the program has
        executed (docs/perf_model.md), so without the readback the first real
        request queues behind all still-in-flight bucket compiles and hits
        the 120 s batcher timeout."""
        import jax
        import jax.numpy as jnp

        img = np.full((self.height, self.width, 3), 0.5, np.float32)
        b = 1
        while b <= self.max_batch:
            out = self.model.infer(
                jnp.asarray(np.repeat(img[None], b, axis=0)),
                num_tokens=self.num_tokens, fov_x=None, use_fp16=self.use_fp16,
            )
            for leaf in jax.tree.leaves(out):
                np.asarray(leaf).ravel()[:1]
            b *= 2

    def stop(self):
        self._stop.set()
        self.queue.put(None)
        self._thread.join(timeout=5)


def _encode_png16(arr: np.ndarray) -> bytes:
    import cv2

    ok, data = cv2.imencode(".png", arr)
    if not ok:
        raise RuntimeError("png encode failed")
    return data.tobytes()


def _response_payload(result: Dict[str, np.ndarray], maps, fmt: str):
    from ..utils import io as mio
    from ..utils.geometry_numpy import intrinsics_to_fov_numpy

    if fmt == "npz":
        buf = io.BytesIO()
        arrays = {k: result[k] for k in maps if k in result}
        np.savez_compressed(buf, **{k: np.asarray(v) for k, v in arrays.items()})
        return "application/octet-stream", buf.getvalue()

    body: Dict[str, Any] = {}
    if "intrinsics" in result:
        intr = np.asarray(result["intrinsics"], np.float64)
        fov_x, fov_y = intrinsics_to_fov_numpy(intr)
        body["intrinsics"] = intr.tolist()
        body["fov_x_deg"] = float(np.rad2deg(fov_x))
        body["fov_y_deg"] = float(np.rad2deg(fov_y))
    if "depth" in maps and "depth" in result:
        buf = io.BytesIO()
        mio.write_depth(buf, np.asarray(result["depth"], np.float32))
        body["depth_png16_log"] = base64.b64encode(buf.getvalue()).decode()
    if "normal" in maps and "normal" in result:
        buf = io.BytesIO()
        mio.write_normal(buf, np.asarray(result["normal"], np.float32))
        body["normal_png16"] = base64.b64encode(buf.getvalue()).decode()
    if "mask" in maps and "mask" in result:
        mask = (np.asarray(result["mask"]) > 0).astype(np.uint8) * 255
        body["mask_png"] = base64.b64encode(_encode_png16(mask)).decode()
    if "points" in maps and "points" in result:
        pts = np.asarray(result["points"], np.float32)
        buf = io.BytesIO()
        np.savez_compressed(buf, points=pts)
        body["points_npz"] = base64.b64encode(buf.getvalue()).decode()
    return "application/json", json.dumps(body).encode()


def make_handler(batcher: InferenceBatcher, model_info: Dict[str, Any]):
    import cv2

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, ctype: str, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj):
            self._send(code, "application/json", json.dumps(obj).encode())

        def do_GET(self):
            if urlparse(self.path).path != "/healthz":
                return self._send_json(404, {"error": "not found"})
            stats = dict(batcher.stats)
            stats["mean_batch"] = (
                stats["batched_images"] / stats["batches"] if stats["batches"] else 0.0
            )
            self._send_json(200, {"status": "ok", **model_info, "stats": stats})

        def do_POST(self):
            if urlparse(self.path).path != "/v1/infer":
                return self._send_json(404, {"error": "not found"})
            q = parse_qs(urlparse(self.path).query)
            maps = q.get("maps", [",".join(DEFAULT_MAPS)])[0].split(",")
            bad = [m for m in maps if m not in VALID_MAPS]
            if bad:
                return self._send_json(400, {"error": f"unknown maps: {bad}"})
            fmt = q.get("format", ["json"])[0]
            fov_x = float(q["fov_x"][0]) if "fov_x" in q else None

            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                return self._send_json(400, {"error": "empty body"})
            raw = self.rfile.read(length)
            img = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                return self._send_json(400, {"error": "undecodable image"})
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
            if img.shape[:2] != (batcher.height, batcher.width):
                img = cv2.resize(img, (batcher.width, batcher.height), interpolation=cv2.INTER_AREA)

            batcher.stats["requests"] += 1
            try:
                result = batcher.infer(img, fov_x, maps)
                ctype, body = _response_payload(result, maps, fmt)
            except Exception as e:
                # covers response ENCODING failures too — an uncaught handler
                # exception kills the connection without a status line
                return self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
            self._send(200, ctype, body)

    return Handler


def create_server(model, host: str, port: int, height: int, width: int,
                  num_tokens: int, max_batch: int = 8, max_wait_ms: float = 5.0,
                  use_fp16: bool = True):
    """Build (server, batcher); caller runs server.serve_forever()."""
    import jax

    batcher = InferenceBatcher(model, height, width, num_tokens,
                               max_batch=max_batch, max_wait_ms=max_wait_ms,
                               use_fp16=use_fp16)
    info = {
        "model": type(model).__name__,
        "device": jax.devices()[0].platform,
        "resolution": [height, width],
        "num_tokens": num_tokens,
        "max_batch": max_batch,
    }
    server = ThreadingHTTPServer((host, port), make_handler(batcher, info))
    return server, batcher


@click.command(help="HTTP inference server with dynamic micro-batching.")
@click.option("--pretrained", "pretrained_path", type=str, default=None,
              help="Checkpoint path (reference .pt or native dir); defaults per version.")
@click.option("--version", "model_version", type=click.Choice(["v1", "v2"]), default="v2")
@click.option("--host", default="127.0.0.1", show_default=True)
@click.option("--port", type=int, default=8000, show_default=True)
@click.option("--resolution", type=int, default=518, show_default=True,
              help="Serve resolution (images resized to RES x RES).")
@click.option("--num_tokens", type=int, default=1369, show_default=True)
@click.option("--max_batch", type=int, default=8, show_default=True)
@click.option("--max_wait_ms", type=float, default=5.0, show_default=True,
              help="Micro-batching window after the first queued request.")
@click.option("--fp16/--no_fp16", "use_fp16", default=True,
              help="bf16 compute (the TPU equivalent of fp16).")
@click.option("--int8", "use_int8", is_flag=True,
              help="W8A8 int8 encoder matmuls (2x MXU rate; ~1e-2 output "
                   "drift vs bf16 — serving mode, see ops/quant.py).")
@click.option("--warmup/--no_warmup", default=True,
              help="Pre-compile every batch bucket before accepting traffic.")
def main(pretrained_path, model_version, host, port, resolution, num_tokens,
         max_batch, max_wait_ms, use_fp16, use_int8, warmup):
    import jax.numpy as jnp

    from ..models import import_model_class_by_version

    if pretrained_path is None:
        defaults = {"v1": "Ruicheng/moge-vitl", "v2": "Ruicheng/moge-2-vitl-normal"}
        pretrained_path = defaults[model_version]
    if use_int8 and model_version != "v2":
        raise click.UsageError("--int8 is only supported for v2 models")
    model = import_model_class_by_version(model_version).from_pretrained(
        pretrained_path, dtype=jnp.bfloat16 if use_fp16 else jnp.float32
    )
    if use_int8:
        from ..models.v2 import MoGeModel as _V2

        model = _V2(model.config, model.params, dtype=model.dtype, use_int8=True)
    server, batcher = create_server(
        model, host, port, resolution, resolution, num_tokens,
        max_batch=max_batch, max_wait_ms=max_wait_ms, use_fp16=use_fp16,
    )
    if warmup:
        t0 = time.time()
        batcher.warmup()
        print(f"warmup compile done in {time.time() - t0:.1f}s")
    print(f"serving on http://{host}:{server.server_address[1]}  "
          f"(POST /v1/infer, GET /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.stop()


if __name__ == "__main__":
    main()
