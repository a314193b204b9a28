"""Chunk-budget sweep for the dense truncated-align solver at the REAL v2
solver shapes (VERDICT r4 ask-#1 lever: MOGE_ALIGN_DENSE_ELEMS tuning).

The dense align is double-chunked: _flat_anchor_align slices the (row,
anchor) problem axis (MOGE_ALIGN_ANCHOR_ELEMS, default 2^22 elements) and
_align_trunc_dense slices the candidate axis (MOGE_ALIGN_DENSE_ELEMS,
default 2^25 pairs). At the global-loss shape that default produces 8 x 864
sequential lax.map iterations — scan-iteration overhead, not VPU work, may
dominate. This sweeps both budgets interleaved in one process (tunnel
methodology) on the exact shapes the v2 losses build.

Usage:  python tools/sweep_dense_chunks.py [--shape global|patch_4|all]
"""

import argparse
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, rows, n_pixels) for the v2 losses after the align-resolution resize:
# solver problems are rows*(n) anchors of length 3n
SHAPES = {
    "global": (2, 48 * 48),       # B rows, align_resolution 48
    "patch_4": (32, 24 * 24),     # 16 patches x B, align_resolution 24
    "patch_16": (32, 12 * 12),
    "patch_64": (32, 6 * 6),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="all")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    names = list(SHAPES) if args.shape == "all" else [args.shape]
    rng = np.random.default_rng(0)

    anchor_budgets = [1 << 22, 1 << 24, 1 << 26]
    dense_budgets = [1 << 25, 1 << 27, 1 << 29]

    for name in names:
        rows, n = SHAPES[name]
        src = jnp.asarray(rng.normal(0, 1, (rows, n, 3)).astype(np.float32) + np.array([0, 0, 3], np.float32))
        tgt = src * 1.4 + jnp.asarray(np.array([0.1, -0.2, 0.5], np.float32))
        w = jnp.asarray(np.abs(rng.normal(0, 1, (rows, n))).astype(np.float32))
        print(f"\n== {name}: rows={rows} n={n} L={3 * n} "
              f"(pairs={rows * n * (3 * n) ** 2 / 1e9:.1f}G)", flush=True)

        results = {}
        for ae, de in itertools.product(anchor_budgets, dense_budgets):
            os.environ["MOGE_ALIGN_ANCHOR_ELEMS"] = str(ae)
            os.environ["MOGE_ALIGN_DENSE_ELEMS"] = str(de)
            # env vars are baked at trace time -> fresh jit per config
            from moge_tpu.ops.alignment import align_points_scale_xyz_shift

            fn = jax.jit(lambda s, t, ww: align_points_scale_xyz_shift(s, t, ww, trunc=1.0))
            out = fn(src, tgt, w)
            ref = float(jnp.asarray(out[0]).ravel()[0])
            per = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                for _ in range(args.n):
                    out = fn(src, tgt, w)
                _ = float(jnp.asarray(out[0]).ravel()[0])
                per.append((time.perf_counter() - t0) / args.n)
            ms = min(per) * 1e3
            results[(ae, de)] = (ms, ref)
            print(f"  anchor=2^{ae.bit_length() - 1} dense=2^{de.bit_length() - 1}: "
                  f"{ms:8.1f} ms  (scale0={ref:.4f})", flush=True)

        best = min(results, key=lambda k: results[k][0])
        ms0 = results[(1 << 22, 1 << 25)][0]
        print(f"  BEST {name}: anchor=2^{best[0].bit_length() - 1} "
              f"dense=2^{best[1].bit_length() - 1} -> {results[best][0]:.1f} ms "
              f"({ms0 / results[best][0]:.2f}x vs default)")
        # all configs must agree on the solution
        scales = {round(v[1], 4) for v in results.values()}
        assert len(scales) == 1, f"chunk budgets changed the result: {scales}"


if __name__ == "__main__":
    main()
