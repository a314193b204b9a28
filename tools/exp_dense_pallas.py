"""Probe: Pallas VMEM-tiled dense truncated-align objective vs the XLA form.

The dense truncated align (`ops/alignment.py:_align_trunc_dense`) evaluates
F[r, j] = sum_i min(trunc, |A[r,j] * wx[r,i] - wy[r,i]|) for every candidate
j — pure VPU work. The XLA formulation runs ~130 Gpair/s (~0.65 Top/s at 5
ops/pair), well under the v5e VPU's ~4 Top/s, and its lax.map candidate
chunking re-reads wx/wy from HBM once per chunk. This probe measures, at the
REAL v2 solver chunk shapes, (a) the shipped XLA dense path, (b) a Pallas
kernel that keeps a (Rb, L) slab of terms VMEM-resident and accumulates all
candidates' objectives against it, and (c) a VMEM-resident ceiling loop (same
arithmetic, no HBM traffic) as the speed-of-light reference.

Interleaved min-of-reps per the repo tunnel methodology.

Usage:  python tools/exp_dense_pallas.py [--shape global|patch_4|all]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (R, L): flat problem rows x candidate/term length, as produced by
# _flat_anchor_align's default 2^22-element chunking at the v2 loss shapes
SHAPES = {
    "global": (606, 6912),     # B=2 rows x 48^2 anchors, chunked
    "patch_4": (2427, 1728),   # 32 patches x 24^2 anchors, chunked
    "patch_16": (4096, 432),
}


def pallas_dense_objective(A, wx, wy, trunc, rb=8, jb=256, ib=512):
    """F[r, j] = sum_i min(trunc, |A[r,j]*wx[r,i] - wy[r,i]|), Pallas."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L = A.shape
    Rp = -(-R // rb) * rb
    Lp = -(-L // max(jb, ib)) * max(jb, ib)
    # pad terms with wx=wy=0 => min(t, 0) = 0 contribution; pad candidates
    # with A=0 (junk F values, sliced off before argmin by the caller)
    A_p = jnp.pad(A, ((0, Rp - R), (0, Lp - L)))
    wx_p = jnp.pad(wx, ((0, Rp - R), (0, Lp - L)))
    wy_p = jnp.pad(wy, ((0, Rp - R), (0, Lp - L)))
    t_p = jnp.pad(jnp.broadcast_to(trunc, (R, L)).astype(jnp.float32),
                  ((0, Rp - R), (0, Lp - L)))

    n_i = Lp // ib

    def kernel(a_ref, x_ref, y_ref, t_ref, o_ref):
        a = a_ref[...]                                    # (rb, jb)

        def body(it, acc):
            x = x_ref[:, pl.dslice(it * ib, ib)]          # (rb, ib)
            y = y_ref[:, pl.dslice(it * ib, ib)]
            t = t_ref[:, pl.dslice(it * ib, ib)]
            v = jnp.minimum(t[:, None, :],
                            jnp.abs(a[:, :, None] * x[:, None, :] - y[:, None, :]))
            return acc + v.sum(axis=-1)

        o_ref[...] = jax.lax.fori_loop(0, n_i, body, jnp.zeros((rb, jb), jnp.float32))

    grid = (Rp // rb, Lp // jb)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, jb), lambda r, j: (r, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Lp), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Lp), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Lp), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, jb), lambda r, j: (r, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, Lp), jnp.float32),
    )(A_p, wx_p, wy_p, t_p)
    return out[:R, :L]


def pallas_dense_objective_unroll(A, wx, wy, trunc, rb=8, jb=256, ib=512):
    """v1 with the term loop statically unrolled (python loop, no fori)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L = A.shape
    Rp = -(-R // rb) * rb
    Lp = -(-L // max(jb, ib)) * max(jb, ib)
    A_p = jnp.pad(A, ((0, Rp - R), (0, Lp - L)))
    wx_p = jnp.pad(wx, ((0, Rp - R), (0, Lp - L)))
    wy_p = jnp.pad(wy, ((0, Rp - R), (0, Lp - L)))
    t_p = jnp.pad(jnp.broadcast_to(trunc, (R, L)).astype(jnp.float32),
                  ((0, Rp - R), (0, Lp - L)))

    n_i = Lp // ib

    def kernel(a_ref, x_ref, y_ref, t_ref, o_ref):
        a = a_ref[...]
        acc = jnp.zeros((rb, jb), jnp.float32)
        for it in range(n_i):
            x = x_ref[:, it * ib:(it + 1) * ib]
            y = y_ref[:, it * ib:(it + 1) * ib]
            t = t_ref[:, it * ib:(it + 1) * ib]
            v = jnp.minimum(t[:, None, :],
                            jnp.abs(a[:, :, None] * x[:, None, :] - y[:, None, :]))
            acc = acc + v.sum(axis=-1)
        o_ref[...] = acc

    grid = (Rp // rb, Lp // jb)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, jb), lambda r, j: (r, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Lp), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Lp), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Lp), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, jb), lambda r, j: (r, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, Lp), jnp.float32),
    )(A_p, wx_p, wy_p, t_p)
    return out[:R, :L]


def pallas_dense_objective_v2(A, wx, wy, trunc, rb=8, jb=256, ib=512):
    """Layout variant: candidates on LANES, terms on SUBLANES, so the
    reduction over terms is a sublane reduce (cheap strided adds) instead of
    v1's cross-lane reduce."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L = A.shape
    Rp = -(-R // rb) * rb
    Lp = -(-L // max(jb, ib)) * max(jb, ib)
    A_p = jnp.pad(A, ((0, Rp - R), (0, Lp - L)))
    wx_p = jnp.pad(wx, ((0, Rp - R), (0, Lp - L)))
    wy_p = jnp.pad(wy, ((0, Rp - R), (0, Lp - L)))
    t_p = jnp.pad(jnp.broadcast_to(trunc, (R, L)).astype(jnp.float32),
                  ((0, Rp - R), (0, Lp - L)))

    n_i = Lp // ib

    def kernel(a_ref, x_ref, y_ref, t_ref, o_ref):
        a = a_ref[...]                                    # (rb, jb) — j on lanes

        def body(it, acc):
            x = x_ref[:, pl.dslice(it * ib, ib)]          # (rb, ib)
            y = y_ref[:, pl.dslice(it * ib, ib)]
            t = t_ref[:, pl.dslice(it * ib, ib)]
            # v[r, i, j]: i on sublanes, j on lanes
            v = jnp.minimum(t[:, :, None],
                            jnp.abs(a[:, None, :] * x[:, :, None] - y[:, :, None]))
            return acc + v.sum(axis=1)

        o_ref[...] = jax.lax.fori_loop(0, n_i, body, jnp.zeros((rb, jb), jnp.float32))

    grid = (Rp // rb, Lp // jb)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, jb), lambda r, j: (r, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Lp), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Lp), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Lp), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, jb), lambda r, j: (r, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, Lp), jnp.float32),
    )(A_p, wx_p, wy_p, t_p)
    return out[:R, :L]


def pallas_dense_objective_bf16(A, wx, wy, trunc, rb=8, jb=256, ib=512):
    """Same objective with the |a*wx - wy| pair math in bf16 (fp32 accumulate).
    Rate probe only: bf16 candidate evaluation can flip argmin ties."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L = A.shape
    Rp = -(-R // rb) * rb
    Lp = -(-L // max(jb, ib)) * max(jb, ib)
    A_p = jnp.pad(A, ((0, Rp - R), (0, Lp - L))).astype(jnp.bfloat16)
    wx_p = jnp.pad(wx, ((0, Rp - R), (0, Lp - L))).astype(jnp.bfloat16)
    wy_p = jnp.pad(wy, ((0, Rp - R), (0, Lp - L))).astype(jnp.bfloat16)
    t_p = jnp.pad(jnp.broadcast_to(trunc, (R, L)).astype(jnp.float32),
                  ((0, Rp - R), (0, Lp - L))).astype(jnp.bfloat16)

    n_i = Lp // ib

    def kernel(a_ref, x_ref, y_ref, t_ref, o_ref):
        a = a_ref[...]

        def body(it, acc):
            x = x_ref[:, pl.dslice(it * ib, ib)]
            y = y_ref[:, pl.dslice(it * ib, ib)]
            t = t_ref[:, pl.dslice(it * ib, ib)]
            v = jnp.minimum(t[:, None, :],
                            jnp.abs(a[:, :, None] * x[:, None, :] - y[:, None, :]))
            return acc + v.astype(jnp.float32).sum(axis=-1)

        o_ref[...] = jax.lax.fori_loop(0, n_i, body, jnp.zeros((rb, jb), jnp.float32))

    grid = (Rp // rb, Lp // jb)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, jb), lambda r, j: (r, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Lp), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Lp), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Lp), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, jb), lambda r, j: (r, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, Lp), jnp.float32),
    )(A_p, wx_p, wy_p, t_p)
    return out[:R, :L]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="all")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--rb", type=int, default=8)
    ap.add_argument("--jb", type=int, default=256)
    ap.add_argument("--ib", type=int, default=512)
    ap.add_argument("--sweep", action="store_true",
                    help="sweep (rb, jb, ib) tile configs + bf16 variant at --shape")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moge_tpu.ops import alignment as AL

    scalar = lambda x: float(jnp.asarray(x).ravel()[0].astype(jnp.float32))

    def timed(fn, n, reps):
        out = fn()
        scalar(out)
        per = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            scalar(out)
            per.append((time.perf_counter() - t0) / n)
        return min(per) * 1e3

    names = list(SHAPES) if args.shape == "all" else [args.shape]
    rng = np.random.default_rng(0)
    trunc = 1.0

    if args.sweep:
        name = names[0]
        R, L = SHAPES[name]
        xs = jnp.asarray(rng.normal(size=(R, L)).astype(np.float32))
        ys = jnp.asarray(rng.normal(size=(R, L)).astype(np.float32))
        ws = jnp.asarray(rng.uniform(0.1, 1.0, size=(R, L)).astype(np.float32))
        wx, wy = ws * xs, ws * ys
        A = ys / jnp.where(jnp.abs(xs) > 1e-7, xs, 1.0)
        pairs = R * L * L
        fns = {
            "v1 lane-red 8/256/512": jax.jit(functools.partial(
                pallas_dense_objective, rb=8, jb=256, ib=512)),
            "v1 lane-red 8/512/512": jax.jit(functools.partial(
                pallas_dense_objective, rb=8, jb=512, ib=512)),
            "v2 sublane-red 8/256/512": jax.jit(functools.partial(
                pallas_dense_objective_v2, rb=8, jb=256, ib=512)),
            "v2 sublane-red 8/512/256": jax.jit(functools.partial(
                pallas_dense_objective_v2, rb=8, jb=512, ib=256)),
            "v1u unrolled 8/256/512": jax.jit(functools.partial(
                pallas_dense_objective_unroll, rb=8, jb=256, ib=512)),
            "v1u unrolled 16/256/512": jax.jit(functools.partial(
                pallas_dense_objective_unroll, rb=16, jb=256, ib=512)),
            # bf16 pair math: Mosaic rejects the (rb, jb) -> (rb, jb, 1) minor-dim
            # insertion for 16-bit types ("only supported for 32-bit types");
            # a bf16 variant would need a different broadcast structure.
        }
        for k, fn in fns.items():
            t0 = time.perf_counter()
            scalar(fn(A, wx, wy, jnp.float32(trunc)))  # compile + warm
            print(f"  compiled {k} in {time.perf_counter()-t0:.0f}s", flush=True)
        results = {k: [] for k in fns}
        for _ in range(args.reps):
            for k, fn in fns.items():
                t0 = time.perf_counter()
                for _ in range(args.n):
                    out = fn(A, wx, wy, jnp.float32(trunc))
                scalar(out)
                results[k].append((time.perf_counter() - t0) / args.n)
        for k in sorted(results, key=lambda k: min(results[k])):
            ms = min(results[k]) * 1e3
            print(f"  {k:24s} {ms:8.1f} ms  ({pairs/ms/1e9:6.2f} Tpair/s)", flush=True)
        return

    for name in names:
        R, L = SHAPES[name]
        xs = jnp.asarray(rng.normal(size=(R, L)).astype(np.float32))
        ys = jnp.asarray(rng.normal(size=(R, L)).astype(np.float32))
        ws = jnp.asarray(rng.uniform(0.1, 1.0, size=(R, L)).astype(np.float32))
        wx, wy = ws * xs, ws * ys
        A = jnp.where(jnp.abs(xs) > 1e-7, ys / jnp.where(jnp.abs(xs) > 1e-7, xs, 1.0), 0.0)

        xla_dense = jax.jit(functools.partial(AL._align_trunc_dense, eps=1e-7))
        pal = jax.jit(functools.partial(
            pallas_dense_objective, rb=args.rb, jb=args.jb, ib=args.ib))

        def run_xla():
            a, loss, idx = xla_dense(xs, ys, wx, wy, A, jnp.float32(trunc))
            return loss

        def run_pal():
            F = pal(A, wx, wy, jnp.float32(trunc))
            return jnp.min(F, axis=-1)

        # parity first
        lx = np.asarray(run_xla())
        lp = np.asarray(run_pal())
        np.testing.assert_allclose(lp, lx, rtol=1e-5, atol=1e-5)

        pairs = R * L * L
        t_x = timed(run_xla, args.n, args.reps)
        t_p = timed(run_pal, args.n, args.reps)
        # interleave a second round to absorb chip drift
        t_x = min(t_x, timed(run_xla, args.n, args.reps))
        t_p = min(t_p, timed(run_pal, args.n, args.reps))
        print(f"{name:10s} R={R} L={L}  xla {t_x:8.1f} ms ({pairs/t_x/1e9:6.2f} Tpair/s)   "
              f"pallas {t_p:8.1f} ms ({pairs/t_p/1e9:6.2f} Tpair/s)   {t_x/t_p:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
