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
    per-batch. Here all N anchors are evaluated with invalid anchors masked to
    +inf loss, chunked with lax.map to bound peak memory (the reference chunks
    too, :130-134, 284-285).

Gradients flow through the final regathered a = y[idx]/x[idx] exactly like the
reference (solve under stop_gradient, reproduce by indexing).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


def _take(x, idx):
    return jnp.take_along_axis(x, idx, axis=-1)


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
    B = (wy - trunc_arr) / jnp.maximum(wx, eps)
    C = (wy + trunc_arr) / jnp.maximum(wx, eps)

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

        F = (
            trunc_arr * ((n - nB) + nC)
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

def _chunked_anchor_align(xs_anch, ys_anch, w_anch, trunc, chunk: int):
    """align() over the anchor axis in lax.map chunks to bound peak memory.

    inputs: (num_anchors, n). Returns (a, loss, index) per anchor.
    """
    num_anchors = xs_anch.shape[0]
    pad = (-num_anchors) % chunk
    if pad:
        padder = lambda v: jnp.concatenate([v, jnp.zeros((pad, *v.shape[1:]), v.dtype)], axis=0)
        xs_anch, ys_anch, w_anch = padder(xs_anch), padder(ys_anch), padder(w_anch)
    xs_c = xs_anch.reshape(-1, chunk, xs_anch.shape[-1])
    ys_c = ys_anch.reshape(-1, chunk, ys_anch.shape[-1])
    w_c = w_anch.reshape(-1, chunk, w_anch.shape[-1])
    a, loss, idx = jax.lax.map(lambda args: align(*args, trunc=trunc), (xs_c, ys_c, w_c))
    unpad = lambda v: v.reshape(-1, *v.shape[2:])[:num_anchors]
    return unpad(a), unpad(loss), unpad(idx)


def align_depth_scale(depth_src, depth_tgt, weight, trunc=None):
    """Scale-only alignment (reference alignment.py:149-160)."""
    scale, _, _ = align(depth_src, depth_tgt, weight, trunc)
    return scale


def align_depth_affine(depth_src, depth_tgt, weight, trunc=None, anchor_chunk: int = 256):
    """Affine (scale+shift) exact weighted-L1 alignment (reference :163-214).

    ``depth_src/tgt/weight``: (..., N). Returns (scale (...), shift (...)).
    Anchors = every index; weight<=0 anchors masked out of the argmin.
    """
    batch_shape = depth_src.shape[:-1]
    n = depth_src.shape[-1]
    src = depth_src.reshape(-1, n)
    tgt = depth_tgt.reshape(-1, n)
    w = jnp.broadcast_to(weight, depth_src.shape).reshape(-1, n)

    def solve_one(args):
        src_b, tgt_b, w_b = args  # (n,)
        src_anch = src_b[None, :] - src_b[:, None]   # (n anchors, n)
        tgt_anch = tgt_b[None, :] - tgt_b[:, None]
        w_anch = jnp.broadcast_to(w_b[None, :], (n, n))
        a, loss, idx = _chunked_anchor_align(src_anch, tgt_anch, w_anch, trunc, anchor_chunk)
        loss = jnp.where(w_b > 0, loss, jnp.inf)      # anchors only at weight>0
        anchor = jnp.argmin(loss)
        return anchor, idx[anchor]

    anchors, idx2 = jax.lax.map(solve_one, (src, tgt, w))
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


def _align_points_scale_shift(points_src, points_tgt, weight, trunc, z_only: bool, anchor_chunk: int):
    batch_shape = points_src.shape[:-2]
    n = points_src.shape[-2]
    src = points_src.reshape(-1, n, 3)
    tgt = points_tgt.reshape(-1, n, 3)
    w = weight.reshape(-1, n)

    def solve_one(args):
        src_b, tgt_b, w_b = args  # (n, 3), (n,)
        if z_only:
            anchor_src = jnp.concatenate(
                [jnp.zeros((n, 2), src_b.dtype), src_b[:, 2:3]], axis=-1
            )  # (n_anchors, 3)
            anchor_tgt = jnp.concatenate([jnp.zeros((n, 2), tgt_b.dtype), tgt_b[:, 2:3]], axis=-1)
        else:
            anchor_src, anchor_tgt = src_b, tgt_b
        src_anch = (src_b[None, :, :] - anchor_src[:, None, :]).reshape(n, n * 3)
        tgt_anch = (tgt_b[None, :, :] - anchor_tgt[:, None, :]).reshape(n, n * 3)
        w_anch = jnp.broadcast_to(w_b[None, :, None], (n, n, 3)).reshape(n, n * 3)
        a, loss, idx = _chunked_anchor_align(src_anch, tgt_anch, w_anch, trunc, anchor_chunk)
        loss = jnp.where(w_b > 0, loss, jnp.inf)
        anchor = jnp.argmin(loss)
        idx2 = idx[anchor]
        i1 = anchor * 3 + idx2 % 3  # reference :291: anchor pixel, same coord as idx2
        return i1, idx2

    i1, idx2 = jax.lax.map(solve_one, (src, tgt, w))
    scale, shift = _scale_shift_from_indices(src, tgt, z_only, i1, idx2)
    return scale.reshape(batch_shape), shift.reshape(*batch_shape, 3)


def align_points_scale_z_shift(points_src, points_tgt, weight, trunc=None, anchor_chunk: int = 128):
    """Shared xyz scale + z shift (ROE solver of the global loss, reference :251-302)."""
    return _align_points_scale_shift(points_src, points_tgt, weight, trunc, z_only=True, anchor_chunk=anchor_chunk)


def align_points_scale_xyz_shift(points_src, points_tgt, weight, trunc=None, anchor_chunk: int = 128):
    """Shared xyz scale + xyz shift (local loss solver, reference :305-355)."""
    return _align_points_scale_shift(points_src, points_tgt, weight, trunc, z_only=False, anchor_chunk=anchor_chunk)


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
