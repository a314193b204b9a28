"""Head-to-head of the truncated exact-L1 align implementations at the
shipped v2 config's REAL solver shapes (configs/train/v2.json, batch 2):

  global   align_points_scale_z_shift    (2,    2304, 3)   L = 6912
  patch_4  align_points_scale_xyz_shift  (32,    576, 3)   L = 1728
  patch_16 align_points_scale_xyz_shift  (512,   144, 3)   L =  432
  patch_64 align_points_scale_xyz_shift  (8192,   36, 3)   L =  108

Each solve enumerates n anchors per row, so total input elements per loss is
rows * n * 3n ~ 31.9M — identical across the four (the config equalizes
rows*n^2 deliberately). Impls:

  events  one variadic stable sort of 3L breakpoint events (round-4 design)
  dense   O(L^2) dense objective evaluation at every candidate (no sort)

Usage: python tools/bench_align_impls.py [--impls events dense] [--which all]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = {
    "global": (2, 2304, True),
    "patch_4": (32, 576, False),
    "patch_16": (512, 144, False),
    "patch_64": (8192, 36, False),
}


def bench(fn, *args, n=2, reps=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
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
    ap.add_argument("--impls", nargs="+", default=["events", "dense"])
    ap.add_argument("--which", nargs="+", default=list(SHAPES))
    ap.add_argument("--check", action="store_true",
                    help="also compare impl outputs elementwise")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")

    import moge_tpu.ops.alignment as alignment

    rng = np.random.default_rng(0)
    results = {}
    for name in args.which:
        p, n, z_only = SHAPES[name]
        z = 2.0 + rng.random((p, n, 1)).astype(np.float32)
        src = np.concatenate([rng.normal(0, 1, (p, n, 2)).astype(np.float32) * z, z], axis=-1)
        tgt = src * rng.uniform(0.9, 1.1) + 0.01 * rng.standard_normal((p, n, 3)).astype(np.float32)
        w = rng.uniform(0.0, 1.0, (p, n)).astype(np.float32)
        src_j, tgt_j, w_j = jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w)
        solver = (alignment.align_points_scale_z_shift if z_only
                  else alignment.align_points_scale_xyz_shift)
        elems = p * n * 3 * n
        print(f"{name}: rows={p} n={n} L={3*n} total={elems/1e6:.1f}M input elems", flush=True)
        outs = {}
        for impl in args.impls:
            # "dense_xla" / "dense_pallas" pin the dense objective evaluator;
            # bare "dense" uses the auto choice (pallas on TPU since round 5)
            if impl.startswith("dense_"):
                os.environ["MOGE_ALIGN_TRUNC_IMPL"] = "dense"
                os.environ["MOGE_ALIGN_DENSE_KERNEL"] = impl.split("_", 1)[1]
            else:
                os.environ["MOGE_ALIGN_TRUNC_IMPL"] = impl
                os.environ.pop("MOGE_ALIGN_DENSE_KERNEL", None)
            fn = jax.jit(lambda s, t, ww: solver(s, t, ww, trunc=1.0))
            ms = bench(fn, src_j, tgt_j, w_j)
            results[(name, impl)] = ms
            print(f"  {impl:8s} {ms:9.1f} ms   {elems/ms/1e3:9.1f} Melem/s", flush=True)
            if args.check:
                outs[impl] = jax.tree.map(np.asarray, fn(src_j, tgt_j, w_j))
        if args.check and len(outs) > 1:
            keys = list(outs)
            ref = outs[keys[0]]
            for k in keys[1:]:
                ds = np.abs(ref[0] - outs[k][0]).max()
                dh = np.abs(ref[1] - outs[k][1]).max()
                print(f"  check {keys[0]} vs {k}: |dscale|={ds:.3e} |dshift|={dh:.3e}", flush=True)
    os.environ.pop("MOGE_ALIGN_TRUNC_IMPL", None)
    total = {impl: sum(v for (nm, im), v in results.items() if im == impl)
             for impl in args.impls}
    for impl, ms in total.items():
        print(f"TOTAL {impl}: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
