"""Exact weighted-L1 alignment solvers ("optimal training supervision"), pure JAX.

Re-implements the reference's alignment family (moge/utils/alignment.py:52-416)
— the solvers behind MoGe's affine-invariant losses — with fixed shapes and no
data-dependent control flow, so everything jits and vmaps on TPU:

  * `align` (untruncated): exact minimizer of sum_i w_i |a x_i - y_i| via the
    sorted-derivative zero crossing (reference :69-82). searchsorted becomes a
    batched count, fully vectorized.
  * `align` (truncated): minimizer of sum_i min(trunc, w_i |a x_i - y_i|).
    The reference finds extrema via left/right derivatives from three prefix
    sums, then evaluates the residual only at data-dependent extrema
    (reference :84-144). Here the objective is evaluated *in closed form at
    every candidate* a = y_j/x_j with O(n log n) prefix sums — the piecewise
    -linear objective over window indicators [B_i, C_i] reduces to six
    searchsorted lookups per candidate — then a flat argmin. Same minimizer,
    no scatter/where, TPU-friendly.
  * anchor-enumerating solvers (`align_depth_affine`,
    `align_points_scale_z_shift`, `align_points_scale_xyz_shift`): the
    reference enumerates all weight>0 anchors (torch.where) and scatter_min's
    per-batch. Here all rows*anchors problems are evaluated with invalid
    anchors masked to +inf loss, flat-chunked over (row, anchor) pairs to
    bound peak memory while staying fully vectorized (the reference chunks
    per-row instead, :130-134, 284-285 — see _flat_anchor_align).

Gradients flow through the final regathered a = y[idx]/x[idx] exactly like the
reference (solve under stop_gradient, reproduce by indexing).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .bitonic import sort_with_payloads


def _take(x, idx):
    return jnp.take_along_axis(x, idx, axis=-1)


def _dense_objective_pallas(A2, wx2, wy2, t2, interpret=False):
    """F[r, j] = sum_i min(t2[r,i], |A2[r,j]*wx2[r,i] - wy2[r,i]|) via a
    VMEM-resident Pallas kernel — the dense truncated-align objective at VPU
    speed-of-light.

    Why a kernel: the XLA formulation of the same dense evaluation measures
    ~0.33 Tpair/s on the v5e; this kernel measures ~0.71 Tpair/s = ~3.5
    VPU-op/s at the 5 ops/pair (mul, sub, abs, min, acc-add), i.e. ~2.1x
    (tools/exp_dense_pallas.py, interleaved min-of-reps at the real v2
    global-loss chunk shape). Two details matter: (a) the whole (rb, Li)
    term slab stays VMEM-resident across all candidate tiles, and (b) the
    term loop is STATICALLY UNROLLED — under lax.fori_loop Mosaic cannot
    software-pipeline across iterations and the same kernel runs 1.75x
    slower (41 vs 72 ms). A bf16 variant is rejected by Mosaic ("insertion
    of minor dim ... only supported for 32-bit types").

    Tiling: grid over (row tiles, candidate tiles); per step the (rb, jb)
    candidate block evaluates against the full padded term axis Li in
    ib-sized chunks. Term padding uses wx=wy=t=0 so padded terms contribute
    min(0, 0) = 0; candidate padding produces junk F that the caller slices
    off before the argmin.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L = A2.shape
    ceil_to = lambda v, m: -(-v // m) * m
    # Fixed, measured-good tiles. Do NOT grow them: Mosaic software-pipelines
    # the unrolled term loop and keeps several iterations' (rb, jb, ib)
    # intermediates live in scoped VMEM — rb=16 at this shape already fails
    # to compile with "Ran out of memory in memory space vmem" (22.4M > 16M).
    rb, jb, ib = 8, 256, 512
    jb = min(jb, ceil_to(L, 128))
    ib = min(ib, ceil_to(L, 128))
    Rp = ceil_to(R, rb)
    Lj = ceil_to(L, jb)
    Li = ceil_to(L, ib)
    A_p = jnp.pad(A2, ((0, Rp - R), (0, Lj - L)))
    wx_p = jnp.pad(wx2, ((0, Rp - R), (0, Li - L)))
    wy_p = jnp.pad(wy2, ((0, Rp - R), (0, Li - L)))
    t_p = jnp.pad(t2, ((0, Rp - R), (0, Li - L)))
    n_i = Li // ib

    def kernel(a_ref, x_ref, y_ref, t_ref, o_ref):
        a = a_ref[...]                                     # (rb, jb)
        acc = jnp.zeros((rb, jb), jnp.float32)
        for it in range(n_i):                              # static unroll
            x = x_ref[:, it * ib:(it + 1) * ib]            # (rb, ib)
            y = y_ref[:, it * ib:(it + 1) * ib]
            t = t_ref[:, it * ib:(it + 1) * ib]
            v = jnp.minimum(t[:, None, :],
                            jnp.abs(a[:, :, None] * x[:, None, :] - y[:, None, :]))
            acc = acc + v.sum(axis=-1)
        o_ref[...] = acc

    out = pl.pallas_call(
        kernel,
        grid=(Rp // rb, Lj // jb),
        in_specs=[
            pl.BlockSpec((rb, jb), lambda r, j: (r, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Li), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Li), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Li), lambda r, j: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, jb), lambda r, j: (r, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, Lj), jnp.float32),
        interpret=interpret,
    )(A_p, wx_p, wy_p, t_p)
    return out[:R, :L]


def _dense_kernel_mode() -> str:
    """Resolve the dense-objective evaluator: 'pallas' | 'xla' | 'interpret'."""
    mode = os.environ.get("MOGE_ALIGN_DENSE_KERNEL", "auto")
    if mode == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    if mode not in ("pallas", "xla", "interpret"):
        raise ValueError(
            f"MOGE_ALIGN_DENSE_KERNEL={mode!r} — expected 'auto', 'pallas', "
            "'xla' or 'interpret'")
    return mode


def _dense_kernel_min_l() -> int:
    """Candidate-length threshold below which the XLA dense form is used even
    in pallas mode: at the v2 patch shapes (L = 108..1728) the XLA broadcast
    form measures FASTER than the kernel (142 vs 160 ms at L=1728 — small
    per-grid-step compute makes fixed step overhead dominate), while at the
    global shape (L=6912) the kernel wins 2.3x (tools/bench_align_impls.py
    --impls dense_xla dense_pallas)."""
    return int(os.environ.get("MOGE_ALIGN_DENSE_KERNEL_MIN_L", "4096"))


def _dense_kernel_active(trunc, length: int) -> bool:
    """True when a truncated align at candidate length ``length`` would
    evaluate via the Pallas kernel."""
    if trunc is None:
        return False
    impl = os.environ.get("MOGE_ALIGN_TRUNC_IMPL", "auto")
    if impl not in ("auto", "dense"):
        return False
    mode = _dense_kernel_mode()
    if mode == "xla":
        return False
    return mode == "interpret" or length >= _dense_kernel_min_l()


def _align_trunc_dense(xs, ys, wx, wy, A, trunc_arr, eps):
    """Truncated exact-L1 align by DENSE evaluation of the objective at every
    candidate: F_j = sum_i min(trunc, |A_j * wx_i - wy_i|)  (w_i|a x_i - y_i|
    = |a*wx_i - wy_i| for w >= 0), then a flat argmin over j.

    This is the same piecewise-linear objective the prefix-sum and event-sweep
    forms evaluate (reference moge/utils/alignment.py:84-144) — the global
    minimum of F over R lies at a breakpoint a = A_j, and evaluating ALL
    breakpoints finds it — but computed with zero sorts, zero gathers and zero
    scans: only broadcasted multiply/abs/min and a sum reduction.

    Why: on TPU the O(L log L) sorted forms are bound by lax.sort at
    ~21-24 Melem/s (tools/bench_align_impls.py), while this O(L^2) form runs
    at VPU elementwise rate (~130 Gpair/s measured = ~0.7 Top/s, near the v5e
    VPU floor). At the shipped v2 solver shapes (L = 108..6912, ~32M input
    elements each) dense is measured 2.1x (global, L=6912) to 25x (level-64,
    L=108) faster than the event sweep — 5.5x total across the four losses
    (see docs/perf_model.md). The candidate axis is processed in chunks so
    the (rows, chunk, L) broadcast stays within a fixed element budget
    (MOGE_ALIGN_DENSE_ELEMS, default 2^25).
    """
    batch_shape = xs.shape[:-1]
    L = xs.shape[-1]
    r = int(math.prod(batch_shape)) if batch_shape else 1
    # The objective/argmin is non-differentiable by contract (gradients flow
    # through the regathered a = y[idx]/x[idx] only). Stop-grad the INPUTS,
    # not just the output: this guarantees the vjp never records chunk
    # residuals (O(r*L*chunk) select masks) regardless of how the caller's
    # partial-eval DCE fares — the split-program trainer materializes any
    # surviving residuals as program-boundary outputs in HBM.
    A2 = jax.lax.stop_gradient(A).reshape(r, L)
    wx2 = jax.lax.stop_gradient(wx).reshape(r, L)
    wy2 = jax.lax.stop_gradient(wy).reshape(r, L)
    # scalar trunc broadcasts everywhere; per-element trunc (..., n) applies
    # along the TERM axis i (last axis of the (r, cb, L) chunk), never the
    # candidate axis
    t_sg = jax.lax.stop_gradient(trunc_arr)

    # F evaluator: the Pallas kernel on TPU for long candidate rows (2.3x the
    # XLA form at the global shape, see _dense_objective_pallas and
    # _dense_kernel_min_l), the XLA broadcast+lax.map form elsewhere.
    # MOGE_ALIGN_DENSE_KERNEL = pallas | xla | interpret | auto.
    kernel_mode = _dense_kernel_mode()
    use_kernel = kernel_mode == "interpret" or (
        kernel_mode == "pallas" and L >= _dense_kernel_min_l())

    if use_kernel:
        if t_sg.ndim:
            t2 = jnp.broadcast_to(t_sg, xs.shape).reshape(r, L).astype(jnp.float32)
        else:
            t2 = jnp.broadcast_to(t_sg.astype(jnp.float32), (r, L))
        f = _dense_objective_pallas(A2.astype(jnp.float32), wx2.astype(jnp.float32),
                                    wy2.astype(jnp.float32), t2,
                                    interpret=kernel_mode == "interpret")
    else:
        t_b = jnp.broadcast_to(t_sg, xs.shape).reshape(r, 1, L) if t_sg.ndim else t_sg

        target = int(os.environ.get("MOGE_ALIGN_DENSE_ELEMS", str(1 << 25)))
        cb = max(1, min(L, target // max(r * L, 1)))
        nch = -(-L // cb)

        a_pad = jnp.pad(A2, ((0, 0), (0, nch * cb - L)))

        def chunk_f(start):
            a_c = jax.lax.dynamic_slice(a_pad, (0, start), (r, cb))       # (r, cb)
            return jnp.sum(
                jnp.minimum(t_b, jnp.abs(a_c[:, :, None] * wx2[:, None, :] - wy2[:, None, :])),
                axis=-1,
            )

        if nch == 1:
            f = chunk_f(0)
        else:
            f = jax.lax.map(chunk_f, jnp.arange(nch) * cb)                 # (nch, r, cb)
            f = jnp.moveaxis(f, 0, 1).reshape(r, nch * cb)[:, :L]

    f = jax.lax.stop_gradient(f)
    index = jnp.argmin(f, axis=-1)
    loss = jnp.take_along_axis(f, index[:, None], axis=-1)[:, 0]
    a_flat = jnp.take_along_axis(ys.reshape(r, L), index[:, None], axis=-1)[:, 0] / jnp.maximum(
        jnp.take_along_axis(xs.reshape(r, L), index[:, None], axis=-1)[:, 0], eps
    )
    return (
        a_flat.reshape(batch_shape),
        loss.reshape(batch_shape),
        index.reshape(batch_shape),
    )


def _align_trunc_events(xs, ys, w, wx, wy, A, B, C, trunc_arr, eps):
    """Truncated exact-L1 align via one variadic stable sort of breakpoint
    events — the TPU-fast equivalent of the prefix-sum formulation.

    Each term f_i(a) = min(trunc, w_i|a x_i - y_i|) is piecewise linear in a
    with breakpoints B_i <= A_i <= C_i:

        a <= B_i : trunc        B_i..A_i : wy_i - a wx_i
        a >= C_i : trunc        A_i..C_i : a wx_i - wy_i

    so F(a) = sum_i f_i(a) = trunc*K(a) + a*S(a) + T(a) where (K, S, T) are
    prefix sums of per-event deltas over the value-sorted event list
    (K counts terms in their flat regions, K(-inf) = n):

        event B_i: dK=-1 dS=-wx_i dT=+wy_i     (flat -> falling linear)
        event A_i: dK= 0 dS=+2wx_i dT=-2wy_i   (kink)
        event C_i: dK=+1 dS=-wx_i dT=+wy_i     (rising linear -> flat)

    Evaluating the inclusive prefix at candidate a = A_j reproduces the
    reference's side conventions (count_le for B and A, count_lt for C,
    moge/utils/alignment.py:84-144) when ties are broken B < A < C — which
    is exactly what a STABLE sort of concat([B, A, C]) gives for free.
    Equal-valued A events form a contiguous run; every member must read the
    prefix at its run END (side='right' self-count), done with one
    reverse-cummin + one take_along_axis.

    Why this shape: the prefix-sum formulation compiled to 3 vmapped
    searchsorteds + ~12 permutation gathers, which execute at ~1-2 Melem/s
    on TPU (tools/bench_align_ops.py) and made the alignment losses 99.7%
    of the v2 train step. Here the only sorted-order data movement happens
    INSIDE one variadic sort (compare-swaps carry the payloads), then
    cumsums + elementwise math; no searchsorted, one gather.
    """
    n = xs.shape[-1]
    batch_shape = xs.shape[:-1]
    three_n = 3 * n
    f32 = xs.dtype

    vals = jnp.concatenate([B, A, C], axis=-1)
    d_s = jnp.concatenate([-wx, 2 * wx, -wx], axis=-1)
    d_t = jnp.concatenate([wy, -2 * wy, wy], axis=-1)
    one = jnp.ones_like(w)
    d_k = jnp.concatenate([-one, jnp.zeros_like(w), one], axis=-1)
    idx = jnp.broadcast_to(
        jnp.concatenate([jnp.full((n,), n, jnp.int32),
                         jnp.arange(n, dtype=jnp.int32),
                         jnp.full((n,), n, jnp.int32)]),
        vals.shape,
    )
    # per-element trunc (..., n): the flat-region contribution of term i is
    # trunc_i, so the counting prefix K becomes a trunc-weighted prefix
    # (one extra sort payload); scalar trunc keeps the cheaper count form
    per_elem_t = bool(trunc_arr.ndim)
    if per_elem_t:
        t_full = jnp.broadcast_to(trunc_arr, xs.shape)
        d_tr = jnp.concatenate([-t_full, jnp.zeros_like(t_full), t_full], axis=-1)

    # Explicit bitonic network (ops/bitonic.py) — measured SLOWER than the
    # generic sort HLO on v5e even at the shortest real rows (318 vs 167 ms
    # at the level-64 local shape, tools/bench_align_ops.py): XLA
    # materializes every network stage, so the log^2 elementwise passes pay
    # full HBM round-trips. Kept as an opt-in experiment; default off.
    bitonic_max = int(os.environ.get("MOGE_BITONIC_MAX", "0"))
    payloads = [d_s, d_t, d_k, idx] + ([d_tr] if per_elem_t else [])
    if three_n <= bitonic_max:
        vals_s, *payloads_s = sort_with_payloads(vals, payloads)
    else:
        vals_s, *payloads_s = jax.lax.sort(
            (vals, *payloads), dimension=-1, is_stable=True, num_keys=1
        )
    d_s_s, d_t_s, d_k_s, idx_s = payloads_s[:4]

    s_pre = jnp.cumsum(d_s_s, axis=-1)
    t_pre = jnp.cumsum(d_t_s, axis=-1)
    if per_elem_t:
        trunc_term = jnp.sum(t_full, axis=-1, keepdims=True) + jnp.cumsum(payloads_s[4], axis=-1)
    else:
        trunc_term = trunc_arr * (n + jnp.cumsum(d_k_s, axis=-1))
    f_all = trunc_term + vals_s * s_pre + t_pre

    is_a = idx_s < n
    # run end: last A event of an equal-value cluster (C events with the same
    # value sort after every A, so equal-valued A's are contiguous)
    nxt_same = jnp.concatenate(
        [is_a[..., 1:] & (vals_s[..., 1:] == vals_s[..., :-1]),
         jnp.zeros((*batch_shape, 1), bool)], axis=-1)
    run_end = is_a & ~nxt_same
    pos = jnp.arange(three_n, dtype=jnp.int32)
    end_pos = jax.lax.cummin(jnp.where(run_end, pos, three_n - 1),
                             axis=vals_s.ndim - 1, reverse=True)
    f_cand = _take(f_all, end_pos)                      # (.., 3n) valid at is_a

    f_masked = jnp.where(is_a, f_cand, jnp.inf)
    best_pos = jnp.argmin(f_masked, axis=-1)            # first sorted pos = first
    loss = _take(f_masked, best_pos[..., None])[..., 0]  # original idx on in-run ties
    index = _take(idx_s, best_pos[..., None])[..., 0]

    loss = jax.lax.stop_gradient(loss)
    index = jax.lax.stop_gradient(index)
    a = _take(ys, index[..., None])[..., 0] / jnp.maximum(
        _take(xs, index[..., None])[..., 0], eps)
    return a, loss, index


def align(
    x: jax.Array,
    y: jax.Array,
    w: jax.Array,
    trunc: Optional[Union[float, jax.Array]] = None,
    eps: float = 1e-7,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Solve min_a sum_i w_i |a x_i - y_i| (trunc=None) or
    min_a sum_i min(trunc, w_i |a x_i - y_i|).

    ``x, y, w``: (..., n), w >= 0. Returns (a (...), loss (...), index (...)),
    with gradients through a = y[idx]/x[idx] only (loss/index stop-gradient).
    Matches reference moge/utils/alignment.py:52-146.
    """
    x, y, w = jnp.broadcast_arrays(x, y, w)
    n = x.shape[-1]

    sign = jnp.sign(x)
    xs, ys = x * sign, y * sign

    if trunc is None:
        y_div_x = ys / jnp.maximum(xs, eps)
        order = jnp.argsort(y_div_x, axis=-1, stable=True)
        ydx_sorted = _take(y_div_x, order)
        wx_sorted = _take(xs * w, order)
        derivatives = 2 * jnp.cumsum(wx_sorted, axis=-1) - jnp.sum(wx_sorted, axis=-1, keepdims=True)
        # first index where derivative >= 0 (torch searchsorted left for 0)
        search = jnp.minimum(jnp.sum(derivatives < 0, axis=-1), n - 1)
        index = jnp.take_along_axis(order, search[..., None], axis=-1)[..., 0]
        # a = y[idx]/x[idx] with the reference's clamp semantics (ys/max(xs, eps))
        a = _take(ys, index[..., None])[..., 0] / jnp.maximum(_take(xs, index[..., None])[..., 0], eps)
        loss = jax.lax.stop_gradient(jnp.sum(w * jnp.abs(a[..., None] * x - y), axis=-1))
        return a, loss, index

    # ---- truncated variant ----
    trunc_arr = jnp.asarray(trunc, dtype=x.dtype)
    wx, wy = w * xs, w * ys
    A = ys / jnp.maximum(xs, eps)

    impl = os.environ.get("MOGE_ALIGN_TRUNC_IMPL", "auto")
    if impl == "auto":
        # Dense O(L^2) evaluation beats the sorted O(L log L) forms whenever
        # the VPU-rate-vs-sort-rate ratio (~6000x elem-rate, measured
        # tools/bench_align_impls.py) exceeds L: even at the largest solver
        # row MoGe ever builds (L = 3*48^2 = 6912) dense measures 2.1x
        # faster on the chip (718 vs 1507 ms), so dense is the default
        # everywhere. MOGE_ALIGN_TRUNC_IMPL=events|prefix selects the
        # sorted forms.
        impl = "dense"
    if impl == "dense":
        return _align_trunc_dense(xs, ys, wx, wy, A, trunc_arr, eps)
    B = (wy - trunc_arr) / jnp.maximum(wx, eps)
    C = (wy + trunc_arr) / jnp.maximum(wx, eps)
    if impl == "events":
        return _align_trunc_events(xs, ys, w, wx, wy, A, B, C, trunc_arr, eps)
    if impl != "prefix":
        raise ValueError(
            f"MOGE_ALIGN_TRUNC_IMPL={impl!r} — expected 'auto', 'dense', 'events' or 'prefix'"
        )

    def closed_form_losses(A, B, C, wx, wy):
        """F(a_j) for all candidates a_j = A_j, via prefix sums (stop-grad)."""
        A_sorted = jnp.sort(A, axis=-1)
        orderB = jnp.argsort(B, axis=-1)
        B_sorted = _take(B, orderB)
        orderC = jnp.argsort(C, axis=-1)
        C_sorted = _take(C, orderC)

        def prefix(v, order):
            vs = _take(v, order)
            cs = jnp.cumsum(vs, axis=-1)
            return jnp.concatenate([jnp.zeros_like(cs[..., :1]), cs], axis=-1)  # (..., n+1)

        orderA = jnp.argsort(A, axis=-1)
        pwx_A, pwy_A = prefix(wx, orderA), prefix(wy, orderA)
        pwx_B, pwy_B = prefix(wx, orderB), prefix(wy, orderB)
        pwx_C, pwy_C = prefix(wx, orderC), prefix(wy, orderC)

        def _batched_searchsorted(sorted_v, q, side):
            batch_shape = sorted_v.shape[:-1]
            sv = sorted_v.reshape(-1, sorted_v.shape[-1])
            qv = q.reshape(-1, q.shape[-1])
            out = jax.vmap(lambda s, qq: jnp.searchsorted(s, qq, side=side))(sv, qv)
            return out.reshape(*batch_shape, q.shape[-1])

        def count_le(sorted_v, q):  # #elements <= q  (side='right')
            return _batched_searchsorted(sorted_v, q, "right")

        def count_lt(sorted_v, q):  # #elements < q   (side='left')
            return _batched_searchsorted(sorted_v, q, "left")

        nA = count_le(A_sorted, A)
        nB = count_le(B_sorted, A)
        nC = count_lt(C_sorted, A)

        g = lambda p, idx: jnp.take_along_axis(p, idx, axis=-1)
        SwxA, SwyA = g(pwx_A, nA), g(pwy_A, nA)
        SwxB, SwyB = g(pwx_B, nB), g(pwy_B, nB)
        SwxC, SwyC = g(pwx_C, nC), g(pwy_C, nC)

        if trunc_arr.ndim:
            # per-element trunc: the flat-region total is sum_i t_i minus the
            # truncs that have entered their linear window (B_i <= a) plus the
            # ones that already left it (C_i < a)
            t_full = jnp.broadcast_to(trunc_arr, wx.shape)
            pt_B, pt_C = prefix(t_full, orderB), prefix(t_full, orderC)
            trunc_term = jnp.sum(t_full, axis=-1, keepdims=True) - g(pt_B, nB) + g(pt_C, nC)
        else:
            trunc_term = trunc_arr * ((n - nB) + nC)

        F = (
            trunc_term
            + A * (SwxA - SwxC)
            - (SwyA - SwyC)
            + (SwyB - SwyA)
            - A * (SwxB - SwxA)
        )
        return F

    F = jax.lax.stop_gradient(closed_form_losses(A, B, C, wx, wy))
    index = jnp.argmin(F, axis=-1)
    loss = jnp.take_along_axis(F, index[..., None], axis=-1)[..., 0]
    a = _take(ys, index[..., None])[..., 0] / jnp.maximum(_take(xs, index[..., None])[..., 0], eps)
    return a, loss, index


# ---------------------------------------------------------------------------
# Anchor-based affine solvers
# ---------------------------------------------------------------------------

def _flat_anchor_align(n_rows: int, n_anchors: int, length: int, make_chunk, trunc,
                       elems: Optional[int] = None):
    """Solve the n_rows*n_anchors independent align() problems of size
    ``length`` in fixed-size FLAT chunks over (row, anchor) pairs.

    ``make_chunk(row_idx, anchor_idx)`` gathers the (M, length) problem
    tensors (xs, ys, ws) for a chunk of flat indices. Returns per-pair
    ``(loss, index)`` reshaped to (n_rows, n_anchors).

    Flat chunking decouples peak memory (``elems`` elements per tensor) from
    the per-row anchor count: many-row/small-n problems (the level-64 local
    loss: 16k rows of n=36) vectorize across rows instead of scanning
    row-by-row, while few-row/large-n problems (the global loss: B rows of
    n=48*48) still bound memory by splitting a row's anchors across chunks.
    When everything fits in one chunk the program contains NO scan at all —
    the reference instead chunks per-row (alignment.py:130-134, 284-285),
    which on TPU compiled to a sequential lax.map over rows with a nested
    anchor scan (latency-bound, and the nested-scan structure is implicated
    in the fused-program runtime fault, docs/split_loss_tpu_fault.md).
    """
    total = n_rows * n_anchors
    if elems is None:
        if _dense_kernel_active(trunc, length):
            # The Pallas dense evaluator must NOT sit inside a lax.map: XLA
            # stack-allocates a while-body custom-call's full operands in
            # scoped VMEM (16 MB) and the compile fails with "Ran out of
            # memory in memory space vmem" once (m, L) exceeds ~4M elements.
            # One flat chunk keeps the kernel at top level (operands stay in
            # HBM, blocks are DMA'd per tile) and removes the serialized
            # 8-chunk map; peak HBM is ~8 arrays x total*length*4B ~ 1 GB at
            # the v2 loss shapes.
            elems = total * max(length, 1)
        else:
            elems = int(os.environ.get("MOGE_ALIGN_ANCHOR_ELEMS", str(1 << 22)))
    m = int(min(total, max(128, elems // max(length, 1))))

    def solve(start):
        flat = jnp.minimum(start + jnp.arange(m), total - 1)
        r, a_idx = flat // n_anchors, flat % n_anchors
        xs, ys, ws = make_chunk(r, a_idx)
        _, loss, idx = align(xs, ys, ws, trunc=trunc)
        return loss, idx

    if m >= total:
        loss, idx = solve(jnp.asarray(0))
    else:
        num_chunks = -(-total // m)
        loss, idx = jax.lax.map(solve, jnp.arange(num_chunks) * m)
        loss, idx = loss.reshape(-1)[:total], idx.reshape(-1)[:total]
    return loss.reshape(n_rows, n_anchors), idx.reshape(n_rows, n_anchors)


def align_depth_scale(depth_src, depth_tgt, weight, trunc=None):
    """Scale-only alignment (reference alignment.py:149-160)."""
    scale, _, _ = align(depth_src, depth_tgt, weight, trunc)
    return scale


def align_depth_affine(depth_src, depth_tgt, weight, trunc=None):
    """Affine (scale+shift) exact weighted-L1 alignment (reference :163-214).

    ``depth_src/tgt/weight``: (..., N). Returns (scale (...), shift (...)).
    Anchors = every index; weight<=0 anchors masked out of the argmin.
    """
    batch_shape = depth_src.shape[:-1]
    n = depth_src.shape[-1]
    src = depth_src.reshape(-1, n)
    tgt = depth_tgt.reshape(-1, n)
    w = jnp.broadcast_to(weight, depth_src.shape).reshape(-1, n)
    p = src.shape[0]

    def make_chunk(r, a_idx):
        src_r, tgt_r = src[r], tgt[r]                      # (M, n)
        av_s = jnp.take_along_axis(src_r, a_idx[:, None], axis=1)
        av_t = jnp.take_along_axis(tgt_r, a_idx[:, None], axis=1)
        return src_r - av_s, tgt_r - av_t, w[r]

    loss, idx = _flat_anchor_align(p, n, n, make_chunk, trunc)
    loss = jnp.where(w > 0, loss, jnp.inf)                 # anchors only at weight>0
    anchors = jnp.argmin(loss, axis=-1)
    idx2 = jnp.take_along_axis(idx, anchors[:, None], axis=1)[:, 0]
    i1 = anchors
    # Reproduce differentiably by indexing (reference :202-213)
    take = lambda v, i: jnp.take_along_axis(v, i[:, None], axis=1)[:, 0]
    src_1, tgt_1 = take(src, i1), take(tgt, i1)
    src_2, tgt_2 = take(src, idx2), take(tgt, idx2)
    scale = (tgt_2 - tgt_1) / jnp.where(src_2 != src_1, src_2 - src_1, 1e-7)
    shift = tgt_1 - scale * src_1
    return scale.reshape(batch_shape), shift.reshape(batch_shape)


def align_points_scale(points_src, points_tgt, weight, trunc=None):
    """Shared-xyz-scale alignment (reference :233-248)."""
    n3 = points_src.shape[-2] * 3
    scale, _, _ = align(
        points_src.reshape(*points_src.shape[:-2], n3),
        points_tgt.reshape(*points_tgt.shape[:-2], n3),
        jnp.repeat(weight, 3, axis=-1),
        trunc,
    )
    return scale


def _scale_shift_from_indices(points_src, points_tgt, z_only: bool, i1, idx2):
    """Differentiable reproduction of (scale, shift) from winning indices.

    i1: anchor flat index into (N*3) restricted semantics — for z_only the
    anchor's shifted coordinate is the z channel only (reference :289-301).
    """
    bsz, n, _ = points_src.shape
    flat_src = points_src.reshape(bsz, n * 3)
    flat_tgt = points_tgt.reshape(bsz, n * 3)
    zeros = jnp.zeros((bsz, n), dtype=points_src.dtype)
    src_00z = jnp.stack([zeros, zeros, points_src[..., 2]], axis=-1).reshape(bsz, n * 3)
    tgt_00z = jnp.stack([zeros, zeros, points_tgt[..., 2]], axis=-1).reshape(bsz, n * 3)

    take = lambda v, i: jnp.take_along_axis(v, i[:, None], axis=1)[:, 0]
    if z_only:
        src_1, tgt_1 = take(src_00z, i1), take(tgt_00z, i1)
    else:
        src_1, tgt_1 = take(flat_src, i1), take(flat_tgt, i1)
    src_2, tgt_2 = take(flat_src, idx2), take(flat_tgt, idx2)

    scale = (tgt_2 - tgt_1) / jnp.where(src_2 != src_1, src_2 - src_1, 1.0)

    anchor_pix = i1 // 3
    gather_pt = lambda v, i: jnp.take_along_axis(v, i[:, None, None].repeat(3, -1), axis=1)[:, 0]
    if z_only:
        src_a = gather_pt(src_00z.reshape(bsz, n, 3), anchor_pix)
        tgt_a = gather_pt(tgt_00z.reshape(bsz, n, 3), anchor_pix)
    else:
        src_a = gather_pt(points_src, anchor_pix)
        tgt_a = gather_pt(points_tgt, anchor_pix)
    shift = tgt_a - scale[:, None] * src_a
    return scale, shift


def _align_points_scale_shift(points_src, points_tgt, weight, trunc, z_only: bool):
    batch_shape = points_src.shape[:-2]
    n = points_src.shape[-2]
    src = points_src.reshape(-1, n, 3)
    tgt = points_tgt.reshape(-1, n, 3)
    w = weight.reshape(-1, n)
    p = src.shape[0]
    z_mask = jnp.asarray([0.0, 0.0, 1.0], src.dtype) if z_only else None

    def make_chunk(r, a_idx):
        src_r, tgt_r = src[r], tgt[r]                      # (M, n, 3)
        av_s, av_t = src[r, a_idx], tgt[r, a_idx]          # (M, 3)
        if z_mask is not None:                             # anchor vector = (0, 0, z_a)
            av_s, av_t = av_s * z_mask, av_t * z_mask
        m = av_s.shape[0]
        xs = (src_r - av_s[:, None, :]).reshape(m, n * 3)
        ys = (tgt_r - av_t[:, None, :]).reshape(m, n * 3)
        ws = jnp.broadcast_to(w[r][:, :, None], (m, n, 3)).reshape(m, n * 3)
        return xs, ys, ws

    loss, idx = _flat_anchor_align(p, n, n * 3, make_chunk, trunc)
    loss = jnp.where(w > 0, loss, jnp.inf)
    anchor = jnp.argmin(loss, axis=-1)                     # (P,)
    idx2 = jnp.take_along_axis(idx, anchor[:, None], axis=1)[:, 0]
    i1 = anchor * 3 + idx2 % 3  # reference :291: anchor pixel, same coord as idx2
    scale, shift = _scale_shift_from_indices(src, tgt, z_only, i1, idx2)
    return scale.reshape(batch_shape), shift.reshape(*batch_shape, 3)


def align_points_scale_z_shift(points_src, points_tgt, weight, trunc=None):
    """Shared xyz scale + z shift (ROE solver of the global loss, reference :251-302)."""
    return _align_points_scale_shift(points_src, points_tgt, weight, trunc, z_only=True)


def align_points_scale_xyz_shift(points_src, points_tgt, weight, trunc=None):
    """Shared xyz scale + xyz shift (local loss solver, reference :305-355)."""
    return _align_points_scale_shift(points_src, points_tgt, weight, trunc, z_only=False)


def align_points_z_shift(points_src, points_tgt, weight, trunc=None):
    """Z-shift-only alignment (reference :358-376)."""
    shift, _, _ = align(
        jnp.ones_like(points_src[..., 2]), points_tgt[..., 2] - points_src[..., 2], weight, trunc
    )
    return jnp.stack([jnp.zeros_like(shift), jnp.zeros_like(shift), shift], axis=-1)


def align_points_xyz_shift(points_src, points_tgt, weight, trunc=None):
    """Per-axis shift alignment (reference :379-396)."""
    shift, _, _ = align(
        jnp.ones_like(jnp.swapaxes(points_src, -2, -1)),
        jnp.swapaxes(points_tgt - points_src, -2, -1),
        weight[..., None, :],
        trunc,
    )
    return shift


def align_affine_lstsq(x, y, w=None):
    """Weighted least-squares affine fit (reference :399-416)."""
    w_sqrt = jnp.ones_like(x) if w is None else jnp.sqrt(w)
    A = jnp.stack([w_sqrt * x, jnp.ones_like(x)], axis=-1)
    b = (w_sqrt * y)[..., None]
    # normal equations (2x2), fp32-exact accumulation
    hp = jax.lax.Precision.HIGHEST
    AtA = jnp.matmul(jnp.swapaxes(A, -2, -1), A, precision=hp)
    Atb = jnp.matmul(jnp.swapaxes(A, -2, -1), b, precision=hp)
    sol = jnp.linalg.solve(AtA + 1e-12 * jnp.eye(2, dtype=x.dtype), Atb)[..., 0]
    return sol[..., 0], sol[..., 1]
