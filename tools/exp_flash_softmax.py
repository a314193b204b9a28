"""Probe the VPU cost structure of the single-pass flash forward at N=3601.

Variants (same MXU work, different softmax elementwise chains), measured
in-jit as a 24-deep chain (out feeds next q) in ONE process, min over reps:

  base    : production kernel (bias add, fp32 max/sub/exp/sum)
  nobias  : zero-padded K/V, no bias add; denominator corrected by
            n_pad_cols * exp(-m) (exact output)
  bf16sm  : softmax elementwise chain in bf16 (numerics probe + perf)
  noexp   : exp replaced by identity  (WRONG numerics — cost probe only)
  nomax   : fixed m = 0               (WRONG numerics — cost probe only)

Usage: python tools/exp_flash_softmax.py [--n 3601] [--qb 128]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_kernel(variant, k_cols_pad, d_model=64):
    import jax
    import jax.numpy as jnp

    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        q = q_ref[:]
        k = k_ref[:]
        v = v_ref[:]
        logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        if variant == "base":
            logits = logits + bias_ref[0]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
        elif variant == "nobias":
            # K/V zero-padded: pad logits are exactly 0, pad V rows are 0.
            # m >= 0 always; pad columns contribute exp(-m) each to l.
            m = jnp.max(logits, axis=-1, keepdims=True)
            m = jnp.maximum(m, 0.0)
            p = jnp.exp(logits - m)
            l = jnp.sum(p, axis=-1, keepdims=True) - k_cols_pad * jnp.exp(-m)
        elif variant == "bf16sm":
            logits = (logits + bias_ref[0]).astype(jnp.bfloat16)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            m = m.astype(jnp.float32)
        elif variant == "noexp":
            logits = logits + bias_ref[0]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.maximum(logits - m, 0.0)  # relu stand-in: no exp
            l = jnp.sum(p, axis=-1, keepdims=True)
        elif variant == "nomax":
            logits = logits + bias_ref[0]
            p = jnp.exp(jnp.minimum(logits, 60.0))
            m = jnp.zeros((q.shape[0], 1), jnp.float32)
            l = jnp.sum(p, axis=-1, keepdims=True)
        elif variant in ("mxusum", "mxusum_nomax"):
            # K zero-padded (pad logits = 0); V carries a 65th column = key
            # validity mask, so p @ V_ext yields the numerator AND the exact
            # denominator over real keys in one MXU pass: no bias add, no VPU
            # sum reduce. m = max(logits) >= max_real keeps exp safe; any
            # m >= max_real is mathematically exact.
            if variant == "mxusum":
                m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), 0.0)
            else:
                m = jnp.zeros((q.shape[0], 1), jnp.float32)
                logits = jnp.minimum(logits, 60.0)
            p = jnp.exp(logits - m)
            acc_ext = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            l = acc_ext[:, d_model:d_model + 1]
            o_ref[:] = (acc_ext[:, :d_model] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
            return
        else:
            raise ValueError(variant)
        acc = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    return kernel


def build(variant, bh, nq_pad, nkv_pad, d, q_block, dtype, n_real):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dv = d + 1 if variant.startswith("mxusum") else d
    kern = make_kernel(variant, float(nkv_pad - n_real), d_model=d)
    call = pl.pallas_call(
        kern,
        grid=(bh, nq_pad // q_block),
        in_specs=[
            pl.BlockSpec((None, q_block, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, nkv_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, nkv_pad, dv), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, nkv_pad), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, q_block, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
    )
    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3601)
    ap.add_argument("--qb", type=int, default=128)
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    bh, d = 16, 64
    q_block = args.qb
    import math
    quantum = q_block * 128 // math.gcd(q_block, 128)  # lcm: divisible by BOTH
    nq_pad = (args.n + quantum - 1) // quantum * quantum
    nkv_pad = nq_pad
    rng = np.random.default_rng(0)
    qp = jnp.asarray(rng.standard_normal((bh, nq_pad, d)) * 0.125, jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((bh, nkv_pad, d)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((bh, nkv_pad, d)), jnp.bfloat16)
    # zero the padding rows (as the production wrapper does)
    pad_mask = (jnp.arange(nkv_pad) < args.n)[None, :, None]
    kp = kp * pad_mask.astype(kp.dtype)
    vp = vp * pad_mask.astype(vp.dtype)
    bias = jnp.where(jnp.arange(nkv_pad) < args.n, 0.0, -jnp.inf).astype(jnp.float32)[None, :]

    # ones-column-augmented V for the MXU-sum variants: col d = key validity
    v_ext = jnp.concatenate([vp, pad_mask[0].astype(vp.dtype)[None].repeat(bh, 0)], axis=-1)

    variants = ["base", "nobias", "bf16sm", "noexp", "nomax", "mxusum", "mxusum_nomax"]
    fns, outs = {}, {}
    for v in variants:
        call = build(v, bh, nq_pad, nkv_pad, d, q_block, qp.dtype, args.n)
        vin = v_ext if v.startswith("mxusum") else vp

        @functools.partial(jax.jit, static_argnums=())
        def chained(qp, kp, vin, bias, call=call):
            def body(i, x):
                return call(x, kp, vin, bias)
            return jax.lax.fori_loop(0, args.depth, body, qp)

        try:
            outs[v] = chained(qp, kp, vin, bias)
            outs[v].block_until_ready()
            fns[v] = (chained, vin)
        except Exception as e:
            print(f"{v}: compile failed: {type(e).__name__}: {e}")

    # numerics check vs base (one call, not chained)
    one = {v: build(v, bh, nq_pad, nkv_pad, d, q_block, qp.dtype, args.n)(qp, kp, fns[v][1], bias)
           for v in fns}
    ref = np.asarray(one["base"][:, :args.n], np.float32)
    for v in fns:
        err = float(np.max(np.abs(np.asarray(one[v][:, :args.n], np.float32) - ref)))
        print(f"{v:8s} max|diff vs base| = {err:.3e}")

    best = {}
    for rep in range(args.reps):
        for v, (fn, vin) in fns.items():
            t0 = time.perf_counter()
            o = fn(qp, kp, vin, bias)
            float(jnp.sum(o[:, :1].astype(jnp.float32)))
            ms = (time.perf_counter() - t0) / args.depth * 1e3
            best[v] = min(best.get(v, 1e9), ms)

    print(f"\n== per-layer flash fwd ms at N={args.n}, qb={q_block} (chain depth {args.depth}, min of {args.reps}) ==")
    for v, ms in sorted(best.items(), key=lambda kv: kv[1]):
        print(f"{v:8s} {ms:7.3f} ms")


if __name__ == "__main__":
    main()
