"""Serve-path throughput bench (VERDICT r4 ask-#7): requests/s and p50/p99
client-observed latency of scripts/serve.py under concurrent load.

Runs the REAL server stack in-process — ThreadingHTTPServer + the
micro-batcher + `MoGeModel.infer` — on the real chip at the serve default
(518 px, 1369 tokens, ViT-L random-init weights; weights don't change the
compute), with N concurrent HTTP clients posting a real JPEG and decoding
the JSON response. Client-observed latency therefore includes image decode,
the batch window, inference, and response encode — the number a deployment
actually sees, not the bare infer() latency.

Baseline: the reference's interactive story is 60 ms/image on an A100
(reference README.md:34) = 16.7 images/s with no serving layer at all;
vs_baseline is computed against that rate.

Usage:
  python tools/bench_serve.py                       # 16 clients x 24 reqs
  python tools/bench_serve.py --clients 4 --reqs 8  # quick check
  python tools/bench_serve.py --bench_out           # merge rows into BENCH_FULL.json
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_RPS = 1000.0 / 60.0  # reference 60 ms/image interactive claim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--reqs", type=int, default=24, help="requests per client")
    ap.add_argument("--resolution", type=int, default=518)
    ap.add_argument("--num_tokens", type=int, default=1369)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--bench_out", action="store_true",
                    help="merge serve_* rows into BENCH_FULL.json")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moge_tpu.models.presets import get_preset
    from moge_tpu.models.v2 import MoGeModel
    from moge_tpu.scripts.serve import create_server

    model = MoGeModel(get_preset("moge-2-vitl-normal")["config"], None, dtype=jnp.bfloat16)
    model.init_random(seed=0, image_hw=(args.resolution, args.resolution))
    print(f"model ready (ViT-L, {args.resolution}px, {args.num_tokens} tokens)", flush=True)

    server, batcher = create_server(
        model, "127.0.0.1", 0, args.resolution, args.resolution, args.num_tokens,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms, use_fp16=True,
    )
    port = server.server_address[1]
    t0 = time.time()
    batcher.warmup()
    print(f"warmup compile done in {time.time() - t0:.1f}s; serving on :{port}", flush=True)
    srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
    srv_thread.start()

    # a real JPEG payload at serve resolution (encode once, shared)
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (args.resolution, args.resolution, 3))).astype(np.uint8)
    # smooth it so JPEG size is realistic, not noise-dominated
    img = cv2.GaussianBlur(img, (31, 31), 8)
    ok, payload = cv2.imencode(".jpg", img)
    assert ok
    payload = payload.tobytes()
    url = f"http://127.0.0.1:{port}/v1/infer?maps=depth,intrinsics"

    def post_once():
        req = urllib.request.Request(url, data=payload, method="POST")
        t = time.perf_counter()
        with urllib.request.urlopen(req, timeout=300) as resp:
            body = resp.read()
            assert resp.status == 200, body[:200]
        out = json.loads(body)
        assert "depth_png16_log" in out and "fov_x_deg" in out
        return (time.perf_counter() - t) * 1e3

    # warm the HTTP path itself once per client count
    post_once()

    latencies = []
    lock = threading.Lock()
    start_barrier = threading.Barrier(args.clients + 1)

    def client():
        mine = []
        start_barrier.wait()
        for _ in range(args.reqs):
            mine.append(post_once())
        with lock:
            latencies.extend(mine)

    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    for t in threads:
        t.start()
    start_barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    total = args.clients * args.reqs
    rps = total / wall
    lat = np.asarray(latencies)
    p50, p99 = float(np.percentile(lat, 50)), float(np.percentile(lat, 99))
    stats = dict(batcher.stats)
    mean_batch = stats["batched_images"] / max(stats["batches"], 1)
    print(f"\n{total} requests, {args.clients} clients: {rps:.1f} req/s "
          f"({rps / BASELINE_RPS:.2f}x the 60 ms/image baseline rate)")
    print(f"latency p50={p50:.0f} ms  p99={p99:.0f} ms  mean_batch={mean_batch:.1f}  "
          f"errors={stats['errors']}")
    server.shutdown()
    batcher.stop()

    if args.bench_out:
        bench_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                  "BENCH_FULL.json")
        merged = {}
        if os.path.exists(bench_path):
            with open(bench_path) as f:
                for row in json.load(f):
                    merged[row["metric"]] = row
        c = args.clients
        merged[f"serve_throughput_{args.resolution}px_c{c}"] = {
            "metric": f"serve_throughput_{args.resolution}px_c{c}",
            "value": round(rps, 1), "unit": "requests/sec",
            "vs_baseline": round(rps / BASELINE_RPS, 2)}
        merged[f"serve_latency_{args.resolution}px_c{c}_p50"] = {
            "metric": f"serve_latency_{args.resolution}px_c{c}_p50",
            "value": round(p50, 1), "unit": "ms"}
        merged[f"serve_latency_{args.resolution}px_c{c}_p99"] = {
            "metric": f"serve_latency_{args.resolution}px_c{c}_p99",
            "value": round(p99, 1), "unit": "ms"}
        with open(bench_path, "w") as f:
            json.dump(list(merged.values()), f, indent=1)
        print("merged 3 serve rows into BENCH_FULL.json")


if __name__ == "__main__":
    main()
