"""Bisect the TPU cost of the exact-L1 align() pipeline op by op.

Context: stage profiling (tools/profile_split_step.py) showed every loss
program of the split train step runs at ~2-3M solver-elements/sec — ~1000x
below VPU speed-of-light — and all four programs process the same total
element volume (rows*n_anchors*3n ~ 31.8M), so the cliff is a constant
factor in the align() pipeline itself. This tool times the pipeline and its
individual ops (sort, argsort, cumsum, searchsorted variants, gathers) at
the real shapes to find which one.

Usage: python tools/bench_align_ops.py [--shape rows len] [--trunc]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, n=4, reps=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    # axon tunnel: force a scalar readback instead of trusting block_until_ready
    first = lambda o: float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    first(out)
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        first(out)
        per.append((time.perf_counter() - t0) / n)
    return min(per) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=606,
                    help="chunk rows (default: the global-loss chunk 606)")
    ap.add_argument("--len", dest="length", type=int, default=6912)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")

    from moge_tpu.ops.alignment import align

    R, L = args.rows, args.length
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.abs(rng.normal(1, 0.3, (R, L))) + 0.1, jnp.float32)
    y = jnp.asarray(rng.normal(2, 1, (R, L)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.1, 1, (R, L)), jnp.float32)
    q = y / x
    q_sorted = jnp.sort(q, axis=-1)

    elems = R * L
    rows = []

    def row(name, ms):
        rows.append((name, ms))
        print(f"  {name:44s} {ms:9.2f} ms   {elems/ms/1e3:9.1f} Melem/s", flush=True)

    print(f"shape ({R}, {L}) = {elems/1e6:.1f}M elements", flush=True)

    row("align untruncated", bench(jax.jit(lambda *a: align(*a)[1]), x, y, w))
    for name, env in (("bitonic", str(3 * L)), ("lax.sort", "0")):
        os.environ["MOGE_BITONIC_MAX"] = env
        row(f"align trunc=1.0 [{name}]",
            bench(jax.jit(lambda *a: align(*a, trunc=1.0)[1]), x, y, w))
    os.environ.pop("MOGE_BITONIC_MAX", None)
    row("sort (1 operand)", bench(jax.jit(lambda v: jnp.sort(v, axis=-1)), q))
    row("argsort", bench(jax.jit(lambda v: jnp.argsort(v, axis=-1)), q))
    row("argsort stable", bench(jax.jit(lambda v: jnp.argsort(v, axis=-1, stable=True)), q))
    row("sort_key_val (2 operands)", bench(
        jax.jit(lambda k, v: jax.lax.sort_key_val(k, v)[1]), q, w))
    row("cumsum", bench(jax.jit(lambda v: jnp.cumsum(v, axis=-1)), w))
    row("take_along_axis (rand perm)", bench(
        jax.jit(lambda v, i: jnp.take_along_axis(v, i, axis=-1)), w,
        jnp.asarray(np.argsort(rng.random((R, L)), axis=-1), jnp.int32)))

    idx32 = jnp.asarray(rng.integers(0, L, (R, L)), jnp.int32).astype(jnp.float32)
    for method in ("scan", "scan_unrolled", "sort", "compare_all"):
        try:
            fn = jax.jit(lambda s, qq, m=method: jax.vmap(
                lambda sv, qv: jnp.searchsorted(sv, qv, side="right", method=m))(s, qq))
            row(f"vmapped searchsorted[{method}]", bench(fn, q_sorted, q))
        except Exception as e:  # pragma: no cover
            print(f"  searchsorted[{method}] failed: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
