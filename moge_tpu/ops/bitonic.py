"""Explicit bitonic sorting network for batched small-row sorts, pure XLA.

``jax.lax.sort`` on TPU lowers to a generic sort HLO whose measured
throughput here is ~70 Melem/s — it dominates the alignment-solver losses
(see tools/bench_align_ops.py and docs/perf_model.md). For the local-loss
solves the rows are SHORT (hundreds of events) and the batch is HUGE
(hundreds of thousands of independent problems), which is exactly the
regime where an explicit bitonic network wins: every compare-swap stage is
a reshape + elementwise min/max/select over the whole (batch, L) array —
ops XLA compiles to wide VPU code with no sort machinery at all. Cost is
O(L log^2 L) elementwise passes, so this is for L <= ~1k (the network's
log^2 factor catches the generic sort's constant around there; callers
fall back to lax.sort for longer rows).

Stability: a bitonic network is not stable, so the comparator orders by
(key, pos) lexicographically where ``pos`` is each element's original
index — equivalent to a stable sort, and the alignment event sweep relies
on it for the reference's tie conventions (ops/alignment.py).

Padding: rows are padded to the next power of two with +inf keys (sorted
to the end); callers slice them off or mask them out.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def sort_with_payloads(keys: jax.Array, payloads: Sequence[jax.Array]) -> Tuple[jax.Array, ...]:
    """Sort ``keys`` ascending along the last axis, stably, carrying
    ``payloads`` through the same permutation. Returns (keys, *payloads)
    sorted; pad entries (+inf keys) occupy the tail when L is not a power
    of two — output rows keep the ORIGINAL length by slicing the pad off.

    Equivalent to ``jax.lax.sort((keys, pos, *payloads), num_keys=1,
    is_stable=True)`` for any payload dtypes.
    """
    n = keys.shape[-1]
    lp = _next_pow2(n)
    batch_shape = keys.shape[:-1]

    pos = jnp.broadcast_to(jnp.arange(lp, dtype=jnp.int32), (*batch_shape, lp))
    if lp != n:
        pad = jnp.full((*batch_shape, lp - n), jnp.inf, keys.dtype)
        keys = jnp.concatenate([keys, pad], axis=-1)
        payloads = [
            jnp.concatenate([p, jnp.zeros((*batch_shape, lp - n), p.dtype)], axis=-1)
            for p in payloads
        ]
    else:
        payloads = list(payloads)

    streams = [keys, pos, *payloads]

    m = 2
    while m <= lp:
        d = m // 2
        while d >= 1:
            # pairs (i, i^d): reshape last axis to (lp/2d, 2, d); axis -2
            # separates the lower/upper halves of each 2d group.
            shaped = [s.reshape(*batch_shape, lp // (2 * d), 2, d) for s in streams]
            lo = [s[..., 0, :] for s in shaped]
            hi = [s[..., 1, :] for s in shaped]
            # ascending where the m-bit of the flat position is 0; every
            # 2d-group sits inside one m-block, so direction is per-group.
            g = jnp.arange(lp // (2 * d), dtype=jnp.int32) * (2 * d)
            asc = ((g & m) == 0)[:, None]  # (groups, 1) broadcast over d
            k_lo, p_lo, k_hi, p_hi = lo[0], lo[1], hi[0], hi[1]
            out_of_order = (k_lo > k_hi) | ((k_lo == k_hi) & (p_lo > p_hi))
            swap = jnp.where(asc, out_of_order, ~out_of_order)
            streams = []
            for lo_s, hi_s in zip(lo, hi):
                new_lo = jnp.where(swap, hi_s, lo_s)
                new_hi = jnp.where(swap, lo_s, hi_s)
                streams.append(
                    jnp.stack([new_lo, new_hi], axis=-2).reshape(*batch_shape, lp)
                )
            d //= 2
        m *= 2

    keys_s = streams[0][..., :n]
    payloads_s = tuple(s[..., :n] for s in streams[2:])
    return (keys_s, *payloads_s)
