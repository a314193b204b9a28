"""Sweep flash-attention block configs at the reference-default token count
(N=3601, ViT-L geometry: 16 heads x 64 dim), interleaved in one process
(chip throughput drifts ~2x between runs; see docs/perf.md).

The interesting axis: q_block controls the padded length n_pad =
round_up(N, round_up(N, max(q,128))):
  q=512 -> n_pad 4096 (13.7% pad), q=256 -> 3840 (6.6%), q=128 -> 3712 (3.1%).
Whole-seq k (k=0 sentinel) vs streaming k in {512, 1024}.

Usage: python tools/sweep_flash_3600.py [--n 3601] [--heads 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3601)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--calls", type=int, default=24, help="serial dispatches per measurement (24 = one ViT-L depth)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from moge_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(0)
    b, n, h, d = 1, args.n, args.heads, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)

    configs = [(512, 0), (256, 0), (128, 0), (512, 512), (256, 512), (128, 512),
               (256, 1024), (512, 1024), (384, 0)]
    fns = {}
    for qb, kb in configs:
        try:
            fn = jax.jit(lambda q, k, v, qb=qb, kb=kb: flash_attention(q, k, v, q_block=qb, k_block=kb))
            fn(q, k, v).block_until_ready()
            fns[(qb, kb)] = fn
        except Exception as e:
            print(f"q={qb} k={kb}: compile failed: {type(e).__name__}")

    best = {}
    for rep in range(args.reps):
        for cfg, fn in fns.items():
            t0 = time.perf_counter()
            for _ in range(args.calls):
                out = fn(q, k, v)
            float(jnp.sum(out[:, :1].astype(jnp.float32)))
            ms = (time.perf_counter() - t0) / args.calls * 1e3
            best[cfg] = min(best.get(cfg, 1e9), ms)

    print(f"\n== flash fwd per-call ms at N={n}, {h} heads (min over {args.reps} reps) ==")
    for (qb, kb), ms in sorted(best.items(), key=lambda kv: kv[1]):
        print(f"q={qb:4d} k={kb:5d}: {ms:7.3f} ms")


if __name__ == "__main__":
    main()
