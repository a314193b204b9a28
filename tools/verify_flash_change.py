"""Verify drive: flash-attention MXU-sum change, on the real TPU.

1. Numerics: flash_attention vs sdpa_xla at N=3601/1370 (bf16, ViT-L heads),
   plus a cross-length kv_valid case (sequence-parallel contract).
2. End-to-end: MoGe-2 ViT-L .infer() at 518px — output keys + finite values.
3. Timing: chained per-layer flash at N=3601 and e2e ms/image at 1369/3600
   tokens (same methodology as bench.py).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moge_tpu.ops.attention import flash_attention, sdpa_xla

    rng = np.random.default_rng(0)
    ok = True

    # --- 1. numerics on the real chip ---
    for n, kv_valid in [(3601, None), (1370, None), (1370, 1201)]:
        q = jnp.asarray(rng.standard_normal((1, n, 16, 64)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((1, n, 16, 64)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((1, n, 16, 64)), jnp.bfloat16)
        got = np.asarray(flash_attention(q, k, v, kv_valid=kv_valid), np.float32)
        want = np.asarray(sdpa_xla(q, k, v, kv_valid=kv_valid), np.float32)
        err = float(np.max(np.abs(got - want)))
        print(f"N={n} kv_valid={kv_valid}: max|flash - sdpa| = {err:.2e}")
        ok &= err < 2e-2  # bf16 PV matmul tolerance

    # --- 2. e2e infer on ViT-L ---
    from moge_tpu.models.presets import get_preset
    from moge_tpu.models.v2 import MoGeModel

    model = MoGeModel(get_preset("moge-2-vitl-normal")["config"], None, dtype=jnp.bfloat16)
    model.init_random(seed=0, image_hw=(518, 518))
    img = jnp.asarray(rng.uniform(0, 1, (1, 518, 518, 3)), jnp.float32)
    out = model.infer(img, num_tokens=1369)
    for key in ("points", "depth", "mask", "normal", "intrinsics"):
        assert key in out, f"missing output {key}"
    intr = np.asarray(out["intrinsics"])
    print(f"infer ok: keys={sorted(out)}, intrinsics finite={np.isfinite(intr).all()}")
    ok &= bool(np.isfinite(intr).all())

    # --- 3. timing ---
    def bench(fn, args, n, reps=3):
        float(fn(*args))
        per = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                s = fn(*args)
            float(s)
            per.append((time.perf_counter() - t0) / n * 1e3)
        return float(np.median(per))

    # per-layer chained flash at 3601 (compare against probe numbers)
    q3 = jnp.asarray(rng.standard_normal((1, 3601, 16, 64)) * 0.1, jnp.bfloat16)

    @jax.jit
    def chain24(q, k, v):
        def body(i, x):
            return flash_attention(x, k, v)
        return jnp.sum(jax.lax.fori_loop(0, 24, body, q)[:, :1].astype(jnp.float32))

    ms = bench(chain24, (q3, q3, q3), n=1, reps=5) / 24
    print(f"flash per-layer @3601 (prod kernel): {ms:.3f} ms")

    # e2e at 1369 and 3600 tokens
    sys.path.insert(0, "/root/repo")
    from bench import _checksum_v2
    for nt in (1369, 3600):
        side = 518 if nt == 1369 else round((nt ** 0.5) * 14)
        fn = _checksum_v2(model, nt, 1.0)
        img_n = jnp.asarray(rng.uniform(0, 1, (1, side, side, 3)), jnp.float32)
        ms = bench(fn, (model.params, img_n), n=16)
        print(f"e2e MoGe-2 ViT-L @{nt}tok: {ms:.2f} ms/image (vs 60 baseline: {60.0/ms:.2f}x)")

    print("VERIFY " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
