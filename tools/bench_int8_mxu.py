"""Decide the W8A8 int8 question at the hardware level (round-4 verdict #2).

Three tiers, all interleaved in one process per the repo's timing discipline
(axon tunnel RTT drifts; N back-to-back dispatches + one readback, min over
reps):

  1. raw dot_general: int8xint8->int32 vs bf16xbf16->f32 at the ViT-L fc1
     shape. If the int8 dot is NOT ~2x faster, the MXU int8 path is not being
     emitted by Mosaic/XLA on this chip and the serving mode cannot win --
     retire it.
  2. quant_matmul as shipped (per-call weight quant from fp32) vs a
     pre-quantized variant (int8 kernel + fp32 scale as inputs) vs plain bf16
     matmul -- isolates the per-call weight-quantization overhead from the
     activation-quantization overhead.
  3. (optional, --encoder) end-to-end encoder forward bf16 vs int8 at 3600
     tokens to confirm whichever conclusion tier 1/2 reached.

Usage:
  python tools/bench_int8_mxu.py             # tiers 1+2
  python tools/bench_int8_mxu.py --encoder   # + tier 3
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, n=20, reps=5):
    """All benched fns return a scalar; force a READBACK to sync — over the
    axon tunnel block_until_ready does not actually wait (bench.py note)."""
    float(fn(*args))
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(out)
        per.append((time.perf_counter() - t0) / n)
    return min(per) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=3600)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--n_dim", type=int, default=4096)
    ap.add_argument("--encoder", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")

    rng = np.random.default_rng(0)
    M, K, N = args.m, args.k, args.n_dim
    x_f = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    w_f = jnp.asarray(rng.normal(0, 0.02, (K, N)), jnp.bfloat16)
    x_q = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w_q = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    w_f32 = w_f.astype(jnp.float32)
    w_scale = jnp.max(jnp.abs(w_f32), axis=0) / 127.0
    a_scale = jnp.ones((M, 1), jnp.float32)

    dn = (((1,), (0,)), ((), ()))

    @jax.jit
    def dot_bf16(x, w):
        return jax.lax.dot_general(x, w, dn, preferred_element_type=jnp.float32).sum()

    @jax.jit
    def dot_int8(x, w):
        return jax.lax.dot_general(x, w, dn, preferred_element_type=jnp.int32).sum()

    from moge_tpu.ops.quant import quant_matmul

    @jax.jit
    def shipped(x, w):
        return quant_matmul(x, w, None).sum()

    @jax.jit
    def prequant(x, wq, ws):
        xf = x.astype(jnp.float32)
        a_amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        a_s = jnp.where(a_amax > 0, a_amax / 127.0, 1.0)
        xq = jnp.round(xf / a_s).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, wq, dn, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * a_s * ws).sum()

    @jax.jit
    def bf16_ref(x, w):
        return (jax.lax.dot_general(x, w, dn, preferred_element_type=jnp.float32)).sum()

    flops = 2.0 * M * K * N
    rows = [
        ("raw bf16 dot", bench(dot_bf16, (x_f, w_f))),
        ("raw int8 dot", bench(dot_int8, (x_q, w_q))),
        ("bf16 matmul (ref)", bench(bf16_ref, (x_f, w_f))),
        ("shipped quant_matmul (per-call w-quant, fp32 w)", bench(shipped, (x_f, w_f32))),
        ("prequant W8A8 (int8 w resident)", bench(prequant, (x_f, w_q, w_scale))),
    ]
    print(f"shape ({M},{K})x({K},{N})  {flops/1e9:.1f} GFLOP")
    for name, ms in rows:
        print(f"  {name:48s} {ms:8.3f} ms  {flops/ms/1e9:8.1f} GFLOP/s-eff")
    raw_speedup = rows[0][1] / rows[1][1]
    print(f"raw int8/bf16 MXU speedup: {raw_speedup:.2f}x "
          f"({'int8 path live' if raw_speedup > 1.3 else 'int8 NOT faster -> retire'})")

    if args.encoder:
        from moge_tpu.models.presets import get_preset
        from moge_tpu.models.v2 import MoGeModel as MoGeModelV2

        preset = get_preset("moge-2-vitl-normal")
        base = MoGeModelV2(preset["config"], None, dtype=jnp.bfloat16)
        base.init_random(seed=0, image_hw=(518, 518))
        for mode in ("bf16", "int8"):
            model = MoGeModelV2(preset["config"], base.params, dtype=jnp.bfloat16,
                                use_int8=(mode == "int8"))
            img = jnp.asarray(rng.uniform(0, 1, (1, 840, 840, 3)), jnp.float32)

            @jax.jit
            def enc(params, image):
                out = model.module.apply({"params": params}, image, 3600)
                return out["points"].astype(jnp.float32).sum()

            ms = bench(enc, (model.params, img), n=8, reps=3)
            print(f"  encoder fwd 3600tok {mode}: {ms:.2f} ms")


if __name__ == "__main__":
    main()
