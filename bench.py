"""Benchmark: MoGe on one TPU chip, end to end (forward + on-device camera
recovery — the same work ``MoGeModel.infer()`` does for a user).

stdout: ONE JSON line (driver contract) — the headline metric, MoGe-2 ViT-L
p50 ms/image at 518x518 bf16 batch 1, vs the reference's ~60 ms/image for
ViT-L fp16 on A100/RTX3090 (reference README.md:34; see BASELINE.md).

stderr + BENCH_FULL.json: the breadth matrix BASELINE.md's north star asks
for — batched images/sec/chip, MoGe-2 ViT-S/B rows, MoGe-1 ViT-L, and a
num_tokens/aspect sweep.

Env knobs:
  MOGE_BENCH_QUICK=1  headline only (fastest; skips the matrix)
  MOGE_BENCH_FULL=1   adds MoGe-1 + aspect 2:1/1:2 + num_tokens sweep
                      (more XLA compiles; use with a warm compile cache)
  MOGE_PROFILE_DIR    dump a jax.profiler trace of the headline loop

Methodology: on this environment ``block_until_ready`` does not actually wait
(remote tunnel), so each measurement dispatches N back-to-back calls (device
executes serially) and forces ONE scalar readback at the end; per-image time
is total/N with the tunnel round-trip amortized. p50 over repeats.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MS = 60.0  # reference ViT-L fp16 on A100 (README.md:34)


def _bench_fn(fn, args, n, reps=3):
    """Median per-call milliseconds: n serial dispatches + 1 readback."""
    float(fn(*args))  # compile + warm
    per_call = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(*args)
        float(s)  # readback blocks until all n executions complete
        per_call.append((time.perf_counter() - t0) / n * 1e3)
    return float(np.median(per_call))


def _checksum_v2(model, num_tokens, aspect_ratio):
    import jax
    import jax.numpy as jnp

    from moge_tpu.models.v2 import postprocess

    @jax.jit
    def fn(params, image):
        raw = model.module.apply({"params": params}, image, num_tokens)
        out = postprocess(raw, aspect_ratio=aspect_ratio)
        # Scalar checksum over EVERY output head: anything left out of the
        # checksum is dead code to XLA and would silently drop out of the
        # measured program (e.g. the normal head, which nothing downstream
        # of depth consumes).
        s = jnp.sum(jnp.where(jnp.isfinite(out["depth"]), out["depth"], 0.0)) + out["intrinsics"][0, 0, 0]
        for key in ("normal", "mask", "points"):
            if key in out:
                v = out[key]
                s = s + jnp.sum(jnp.where(jnp.isfinite(v), v, 0.0)) * 1e-6
        return s

    return fn


def _checksum_v1(model, num_tokens):
    import jax
    import jax.numpy as jnp

    infer = model._infer_fn((num_tokens, 1.0, False, True, True))

    @jax.jit
    def fn(params, image, fov):
        out = infer(params, image, fov)
        s = jnp.sum(jnp.where(jnp.isfinite(out["depth"]), out["depth"], 0.0)) + out["intrinsics"][0, 0, 0]
        for key in ("mask", "points"):
            if key in out:
                v = out[key]
                s = s + jnp.sum(jnp.where(jnp.isfinite(v), v.astype(jnp.float32), 0.0)) * 1e-6
        return s

    return fn


def main():
    profile_dir = os.environ.get("MOGE_PROFILE_DIR")
    quick = os.environ.get("MOGE_BENCH_QUICK") == "1"
    full = os.environ.get("MOGE_BENCH_FULL") == "1"

    import jax
    import jax.numpy as jnp

    # Persistent compile cache: ViT-L XLA compiles take minutes; cache them
    # across bench invocations.
    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moge_tpu.models.presets import get_preset
    from moge_tpu.models.v2 import MoGeModel as MoGeModelV2

    rng = np.random.default_rng(0)

    def image_batch(b, h, w):
        return jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)), jnp.float32)

    rows = []

    def add_row(metric, value, unit, vs=None):
        row = {"metric": metric, "value": round(value, 3), "unit": unit}
        if vs is not None:
            row["vs_baseline"] = round(vs, 3)
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    # ---- headline: MoGe-2 ViT-L, 518x518 (1369 tokens), bf16, batch 1 ----
    preset = get_preset("moge-2-vitl-normal")
    vitl = MoGeModelV2(preset["config"], None, dtype=jnp.bfloat16)
    vitl.init_random(seed=0, image_hw=(518, 518))
    nt_518 = (518 // 14) ** 2  # 1369: area-preserving token count

    fn_vitl = _checksum_v2(vitl, nt_518, 1.0)
    img1 = image_batch(1, 518, 518)
    headline_ms = _bench_fn(fn_vitl, (vitl.params, img1), n=32)
    add_row("moge2_vitl_infer_latency_518px_bf16_p50", headline_ms, "ms/image",
            BASELINE_MS / headline_ms)

    if profile_dir:
        from moge_tpu.utils.tools import profile_trace

        with profile_trace(profile_dir):
            for _ in range(4):
                s = fn_vitl(vitl.params, img1)
            float(s)

    if not quick:
        # ---- batched throughput: images/sec/chip (BASELINE.md north star) ----
        B = 8
        imgB = image_batch(B, 518, 518)
        ms_b = _bench_fn(fn_vitl, (vitl.params, imgB), n=8)
        add_row("moge2_vitl_throughput_518px_bf16_b8", 1000.0 * B / ms_b, "images/sec/chip",
                (1000.0 * B / ms_b) / (1000.0 / BASELINE_MS))
        del imgB

        # ---- model-size rows: ViT-B / ViT-S (MoGe-2) ----
        for name, key in [("moge2_vitb", "moge-2-vitb-normal"), ("moge2_vits", "moge-2-vits-normal")]:
            m = MoGeModelV2(get_preset(key)["config"], None, dtype=jnp.bfloat16)
            m.init_random(seed=0, image_hw=(518, 518))
            fn = _checksum_v2(m, nt_518, 1.0)
            ms = _bench_fn(fn, (m.params, img1), n=32)
            add_row(f"{name}_infer_latency_518px_bf16_p50", ms, "ms/image", BASELINE_MS / ms)
            del m, fn

    if full and not quick:
        # ---- MoGe-1 ViT-L (token budget capped at 2500, v1.py:158) ----
        from moge_tpu.models.v1 import MoGeModel as MoGeModelV1

        v1 = MoGeModelV1(get_preset("moge-vitl")["config"], None, dtype=jnp.bfloat16)
        v1.init_random(seed=0, image_hw=(518, 518))
        fn1 = _checksum_v1(v1, nt_518)
        ms1 = _bench_fn(fn1, (v1.params, img1, jnp.float32(0)), n=32)
        add_row("moge1_vitl_infer_latency_518px_bf16_p50", ms1, "ms/image", BASELINE_MS / ms1)
        del v1, fn1

        # ---- aspect sweep at ~1369 tokens: 2:1 and 1:2 (driver config #3) ----
        for label, (h, w) in [("2to1", (364, 728)), ("1to2", (728, 364))]:
            base_h = round((nt_518 / (w / h)) ** 0.5)
            base_w = round((nt_518 * (w / h)) ** 0.5)
            fn = _checksum_v2(vitl, base_h * base_w, w / h)
            ms = _bench_fn(fn, (vitl.params, image_batch(1, h, w)), n=16)
            add_row(f"moge2_vitl_infer_latency_aspect_{label}_bf16_p50", ms, "ms/image",
                    BASELINE_MS / ms)
            del fn

        # ---- num_tokens sweep (v2 budget 1200..3600, v2.py:38) ----
        for nt in [1200, 2500, 3600]:
            side = round((nt ** 0.5) * 14)
            fn = _checksum_v2(vitl, nt, 1.0)
            ms = _bench_fn(fn, (vitl.params, image_batch(1, side, side)), n=16)
            add_row(f"moge2_vitl_infer_latency_{nt}tok_bf16_p50", ms, "ms/image",
                    BASELINE_MS / ms)
            del fn

        # ---- batched throughput at the reference-default 3600-token regime
        #      (resolution_level=9, reference v2.py:236-238) — the deployment
        #      number serve.py's micro-batching exploits: batching amortizes
        #      dispatch RTT and the per-image epilogue where the b=1 latency
        #      margin is thinnest. ----
        side36 = round((3600 ** 0.5) * 14)
        fn36 = _checksum_v2(vitl, 3600, 1.0)
        for B in (2, 4):
            imgB = image_batch(B, side36, side36)
            ms_b = _bench_fn(fn36, (vitl.params, imgB), n=6)
            add_row(f"moge2_vitl_throughput_3600tok_bf16_b{B}",
                    1000.0 * B / ms_b, "images/sec/chip",
                    (1000.0 * B / ms_b) / (1000.0 / BASELINE_MS))
            del imgB
        del fn36

        # ---- W8A8 int8 serving mode (NOT the parity path: ~1e-2 output
        #      drift vs bf16; ops/quant.py). Separate, clearly-labeled rows.
        vitl8 = MoGeModelV2(preset["config"], vitl.params, dtype=jnp.bfloat16, use_int8=True)
        for nt, side in [(nt_518, 518), (3600, round((3600 ** 0.5) * 14))]:
            fn = _checksum_v2(vitl8, nt, 1.0)
            ms = _bench_fn(fn, (vitl8.params, image_batch(1, side, side)), n=16)
            label = "518px" if side == 518 else f"{nt}tok"
            add_row(f"moge2_vitl_infer_latency_{label}_int8_p50", ms, "ms/image",
                    BASELINE_MS / ms)
            del fn
        del vitl8

        # ---- panorama pipeline: 12-view icosahedral rig, batched infer,
        #      gradient-domain merge (reference infer_panorama.py:29-158) ----
        import time as _time

        from moge_tpu.panorama import (get_panorama_cameras, merge_panorama_depth,
                                       split_panorama_image)

        pano = np.asarray(rng.uniform(0, 1, (512, 1024, 3)), np.float32)
        extrinsics, intrinsics = get_panorama_cameras()
        views = split_panorama_image(pano, extrinsics, intrinsics, resolution=512)
        views_j = jnp.asarray(np.stack(views), jnp.float32)
        fov_x = 90.0  # the rig uses 90-deg square views (panorama.py:52-61)
        out = vitl.infer(views_j, num_tokens=nt_518, fov_x=fov_x)  # compile
        jax.block_until_ready(out["points"])
        t0 = _time.perf_counter()
        out = vitl.infer(views_j, num_tokens=nt_518, fov_x=fov_x)
        jax.block_until_ready(out["points"])
        infer_s = _time.perf_counter() - t0
        # The merge is timed on a well-posed synthetic scene (smooth positive
        # distances, full masks): random-weight model outputs are degenerate
        # (NaN log-distances) and stall the solvers to their iteration caps,
        # which would time pathology rather than the merge.
        yy, xx = np.mgrid[0:512, 0:512].astype(np.float32) / 512.0
        dist = [2.0 + 0.3 * np.sin(6 * xx + i) + 0.2 * np.cos(5 * yy - i)
                for i in range(len(views))]
        masks = [np.ones((512, 512), bool)] * len(views)
        merge_s = {}
        for solver in ("cg", "lsmr"):
            if solver == "cg":
                # Warm pass: the jit CG solve compiles on first call; the row
                # reports the warm number (the compile is one-time and cached,
                # and lsmr as host scipy has no analogous cost to include).
                merge_panorama_depth(1024, 512, dist, masks, extrinsics, intrinsics,
                                     solver=solver)
            t0 = _time.perf_counter()
            depth, _ = merge_panorama_depth(
                1024, 512, dist, masks, extrinsics, intrinsics, solver=solver)
            merge_s[solver] = _time.perf_counter() - t0
            assert np.isfinite(depth).all()
        add_row("panorama_12view_512_infer_batched", 1000.0 * infer_s, "ms")
        add_row("panorama_merge_1024x512_cg", 1000.0 * merge_s["cg"], "ms")
        add_row("panorama_merge_1024x512_lsmr", 1000.0 * merge_s["lsmr"], "ms")
        add_row("panorama_12view_e2e_cg", 1000.0 * (infer_s + merge_s["cg"]), "ms")

    # Merge-preserve: quick/default runs re-measure only a subset of the
    # matrix; rows NOT re-measured this run (keyed by metric name) are kept
    # from the committed file rather than silently dropped. (Rounds 2 and 3
    # both lost the 16-row matrix to a 4-row quick run overwriting it.)
    bench_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    merged = {}
    if os.path.exists(bench_path):
        try:
            with open(bench_path) as f:
                for row in json.load(f):
                    merged[row["metric"]] = row
        except (json.JSONDecodeError, KeyError, TypeError):
            merged = {}
    for row in rows:
        merged[row["metric"]] = row
    with open(bench_path, "w") as f:
        json.dump(list(merged.values()), f, indent=1)

    # Driver contract: exactly one JSON line on stdout — the headline.
    print(json.dumps({
        "metric": "moge2_vitl_infer_latency_518px_bf16",
        "value": round(headline_ms, 3),
        "unit": "ms/image",
        "vs_baseline": round(BASELINE_MS / headline_ms, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
