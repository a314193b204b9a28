"""Benchmark: MoGe-2 ViT-L full inference (forward + on-device camera recovery).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's ~60 ms/image for ViT-L fp16 on A100/RTX3090
(reference README.md:34; see BASELINE.md).

Measured: wall-clock per image at 518x518 (DINOv2 native resolution), bf16,
batch 1, including depth/intrinsics recovery — the same work
`MoGeModel.infer()` does for a user, end to end on one TPU chip.

Methodology note: on this environment `block_until_ready` does not actually
wait (remote tunnel), so we dispatch N back-to-back calls (device executes
them serially) and force a single scalar readback at the end; per-image time
is total/N with the one-off tunnel round-trip amortized.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    profile_dir = os.environ.get("MOGE_PROFILE_DIR")  # optional jax.profiler trace
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: ViT-L XLA compiles take minutes; cache them
    # across bench invocations.
    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moge_tpu.models.presets import get_preset
    from moge_tpu.models.v2 import MoGeModel, postprocess

    preset = get_preset("moge-2-vitl-normal")
    model = MoGeModel(preset["config"], None, dtype=jnp.bfloat16)
    model.init_random(seed=0, image_hw=(518, 518))
    num_tokens = (518 // 14) * (518 // 14)  # 1369: area-preserving token count

    @jax.jit
    def infer_checksum(params, image):
        raw = model.module.apply({"params": params}, image, num_tokens)
        out = postprocess(raw, aspect_ratio=1.0)
        # Scalar checksum forces full materialization on readback.
        return jnp.sum(jnp.where(jnp.isfinite(out["depth"]), out["depth"], 0.0)) + out["intrinsics"][0, 0, 0]

    rng = np.random.default_rng(0)
    images = [jnp.asarray(rng.uniform(0, 1, (1, 518, 518, 3)), jnp.float32) for _ in range(8)]

    float(infer_checksum(model.params, images[0]))  # compile + warm

    reps = 3
    n = 32
    per_image = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(n):
            s = infer_checksum(model.params, images[i % len(images)])
        float(s)  # readback blocks until all n executions complete
        per_image.append((time.perf_counter() - t0) / n * 1e3)
    value = float(np.median(per_image))

    if profile_dir:
        from moge_tpu.utils.tools import profile_trace

        with profile_trace(profile_dir):
            for i in range(4):
                s = infer_checksum(model.params, images[i])
            float(s)

    baseline_ms = 60.0
    print(json.dumps({
        "metric": "moge2_vitl_infer_latency_518px_bf16",
        "value": round(value, 3),
        "unit": "ms/image",
        "vs_baseline": round(baseline_ms / value, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
