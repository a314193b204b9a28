"""Pallas TPU flash attention for the MoGe ViT token regime.

The reference runs torch SDPA / xformers memory-efficient attention
(reference moge/model/dinov2/layers/attention.py:70-100). On TPU the naive
XLA path materializes (B, H, N, N) fp32 logits in HBM — at the ViT-L
inference regime (N up to 3601, H=16) that is ~800 MB of logit traffic per
layer. This kernel computes attention block-wise in VMEM with the standard
online-softmax recursion (running max + rescaled accumulator), so HBM sees
only Q, K, V and the output.

Design points for this model family:
  * head_dim 64, heads 6..24, N in [1201, 3601] (+1 cls token): N is padded
    to the K-block multiple. The FORWARD masks padding without any per-logit
    work: invalid K/V rows are zeroed (their logits are exactly 0) and V
    carries an appended key-validity column, so the single PV matmul emits
    the numerator and the exact real-keys softmax denominator together — no
    bias add, no VPU cross-lane sum reduce. The backward keeps the additive
    -inf bias row (it reconstructs P from logits + bias - lse).
  * q is pre-scaled by d**-0.5 once over (N, d) instead of scaling the
    (N, N) logits; for d=64 the scale is an exact power of two, so numerics
    are bit-identical.
  * fp32 accumulation throughout; bf16 in/out.
  * grid (batch*heads, q_blocks); K/V stream block-by-block via a fori loop
    reading VMEM-resident full K/V per (batch, head) — K/V for one head at
    N=3601 is 2 x 3648 x 64 x 2B = 0.9 MB, comfortably in VMEM. When one K
    block covers the whole padded sequence (the default for N<=4096) the
    kernel emits the straight-line single-pass softmax with no running-max
    rescale.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Defaults from in-encoder sweeps on v5e (N=1370 and N=3601, ViT-L): whole-
# padded-sequence K steps (k_block=0 sentinel -> single-pass softmax, no
# online rescale) beat streaming K at every N in the MoGe regime. q_block is
# N-adaptive: measured in-jit chains give q=256 ~ q=512 > q=128 at N=1370
# (grid overhead dominates) but q=128 > q=256 > q=512 at N=3601 (smaller
# padded length and logits tile win) — see tools/sweep_flash_3600.py.
DEFAULT_Q_BLOCK = 0  # 0 -> adaptive: 256 for N <= 2048, 128 above
DEFAULT_K_BLOCK = 0  # 0 -> whole padded sequence


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, k_block: int, d_model: int):
    """Forward that also emits the per-row logsumexp (for the backward).

    MXU inputs stay bf16 (fp32 operands run the MXU in multi-pass mode,
    several times slower); accumulation and softmax are fp32.

    The softmax DENOMINATOR rides the MXU: ``v_ref`` carries an extra
    key-validity column (1 for real keys, 0 for padding, appended by the
    wrapper), so ``p @ v_ext`` yields the numerator and the exact sum of
    probabilities over real keys in one matmul — no per-logit bias add and
    no VPU cross-lane sum reduce, the two measured VPU costs after the max
    reduce (tools/exp_flash_softmax.py: 1.79 -> 1.68 ms/layer at N=3601).
    Requires zero-padded K (pad logits are exactly 0, handled by the
    wrapper), which also bounds the running max at >= 0: exp stays safe and
    the softmax value is mathematically independent of the m shift.
    """
    q = q_ref[:]
    n_padded = k_ref.shape[0]
    num_k_blocks = n_padded // k_block
    q_block = q.shape[0]

    if num_k_blocks == 1:
        # Single-pass softmax: no running max, no rescale.
        k = k_ref[:]
        v = v_ref[:]
        logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), 0.0)
        p = jnp.exp(logits - m)
        acc_ext = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        l = acc_ext[:, d_model:d_model + 1]
        o_ref[:] = (acc_ext[:, :d_model] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        lse_ref[:] = m + jnp.log(jnp.maximum(l, 1e-30))
        return

    def body(i, carry):
        acc_ext, m = carry
        k = k_ref[pl.ds(i * k_block, k_block), :]
        v = v_ref[pl.ds(i * k_block, k_block), :]
        logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        # the validity column of acc_ext IS the running denominator; the
        # rescale applies to numerator and denominator uniformly.
        acc_new = acc_ext * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return acc_new, m_new

    acc0 = jnp.zeros((q_block, d_model + 1), jnp.float32)
    # Pad columns carry logit exactly 0, so the running max m is pinned at
    # >= 0. NUMERICS ASSUMPTION: some real logit per query row must exceed
    # ~-80, else exp(logit - m) underflows for every real key, the
    # denominator hits its 1e-30 floor and the row degrades to ~0 output
    # with a wrong lse. (The old -inf-bias scheme anchored m at the true row
    # max, guaranteeing l >= 1, at the cost of an extra VPU pass.) Safe for
    # the validated regime: post-LayerNorm DINOv2/MoGe QK^T logits stay
    # within +-50 even at the high-norm outlier tokens; an all-real-logits
    # < -80 row would require adversarial ~sqrt(80*2/d)-scale activations.
    m0 = jnp.zeros((q_block, 1), jnp.float32)
    acc_ext, m = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0))
    l = acc_ext[:, d_model:d_model + 1]
    o_ref[:] = (acc_ext[:, :d_model] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[:] = (m + jnp.log(jnp.maximum(l, 1e-30)))


def _flash_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref, dq_ref,
                     *, k_block: int):
    """dQ for one q block: loop over K blocks recomputing P.

    Padded q ROWS need no masking: their cotangent rows are zero, so
    dp = do@v^T = 0 and delta = 0 give ds = p*(0-0) = 0.
    """
    q = q_ref[:]
    do = do_ref[:]
    lse = lse_ref[:]          # (q_block, 1)
    delta = delta_ref[:]      # (q_block, 1)
    n_padded, d = k_ref.shape
    num_k_blocks = n_padded // k_block
    q_block = q.shape[0]

    def body(i, dq):
        k = k_ref[pl.ds(i * k_block, k_block), :]
        v = v_ref[pl.ds(i * k_block, k_block), :]
        logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        # bias = -inf for padded keys -> p = 0 there
        p = jnp.exp(logits + bias_ref[0, pl.ds(i * k_block, k_block)] - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_k_blocks, body, jnp.zeros((q_block, d), jnp.float32))
    dq_ref[:] = dq.astype(dq_ref.dtype)


def _flash_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref, dk_ref, dv_ref,
                      *, q_block: int):
    """dK/dV for one k block: loop over Q blocks recomputing P.

    Padded q rows contribute nothing (zero do rows => ds = 0, p^T @ do = 0),
    so only the key-side -inf bias is applied.
    """
    k = k_ref[:]
    v = v_ref[:]
    kb, d = k.shape
    n_padded = q_ref.shape[0]
    num_q_blocks = n_padded // q_block
    bias = bias_ref[0, pl.ds(pl.program_id(1) * kb, kb)]

    def body(i, carry):
        dk, dv = carry
        q = q_ref[pl.ds(i * q_block, q_block), :]
        do = do_ref[pl.ds(i * q_block, q_block), :]
        lse = lse_ref[pl.ds(i * q_block, q_block), :]
        delta = delta_ref[pl.ds(i * q_block, q_block), :]
        logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        p = jnp.exp(logits + bias - lse)
        pc = p.astype(do.dtype)
        dv = dv + jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((kb, d), jnp.float32)
    dv0 = jnp.zeros((kb, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q_blocks, body, (dk0, dv0))
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_core(qp, kp, vp, bias, q_block: int, k_block: int):
    """Attention over padded (B*H, n_pad, d) inputs; ``qp`` is PRE-SCALED by
    d**-0.5 and ``bias`` is the (1, n_pad) 0/-inf key-validity row."""
    out, _lse = _flash_core_fwd_impl(qp, kp, vp, bias, q_block, k_block)
    return out


def _flash_core_fwd_impl(qp, kp, vp, bias, q_block, k_block):
    bh, nq_pad, d = qp.shape
    nkv_pad = kp.shape[1]
    grid = (bh, nq_pad // q_block)
    # Key-validity column appended to V: p @ v_ext computes the softmax
    # denominator on the MXU (see _flash_fwd_kernel docstring). K rows the
    # bias marks invalid are already zero (wrapper contract), so their
    # logits are exactly 0 and their v_ext row (incl. the validity column)
    # is 0 — they contribute to neither numerator nor denominator.
    valid = (bias[0] == 0.0).astype(vp.dtype)[None, :, None]
    v_ext = jnp.concatenate([vp, jnp.broadcast_to(valid, (bh, nkv_pad, 1))], axis=-1)
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, k_block=k_block, d_model=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, q_block, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, nkv_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, nkv_pad, d + 1), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, q_block, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, q_block, 1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq_pad, d), qp.dtype),
            jax.ShapeDtypeStruct((bh, nq_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
    )(qp, kp, v_ext)
    return out, lse


def _flash_core_fwd(qp, kp, vp, bias, q_block, k_block):
    out, lse = _flash_core_fwd_impl(qp, kp, vp, bias, q_block, k_block)
    return out, (qp, kp, vp, bias, out, lse)


def _flash_core_bwd(q_block, k_block, residuals, do):
    qp, kp, vp, bias, out, lse = residuals
    bh, nq_pad, d = qp.shape
    nkv_pad = kp.shape[1]
    # delta_i = sum_d dO_i O_i (rowwise), fp32
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True)

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, k_block=k_block),
        grid=(bh, nq_pad // q_block),
        in_specs=[
            pl.BlockSpec((None, q_block, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, nkv_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, nkv_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, q_block, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, q_block, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, q_block, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, nkv_pad), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, q_block, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), qp.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
    )(qp, kp, vp, do, lse, delta, bias)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, q_block=q_block),
        grid=(bh, nkv_pad // k_block),
        in_specs=[
            pl.BlockSpec((None, nq_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, k_block, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, k_block, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, nq_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, nq_pad, 1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, nq_pad, 1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, nkv_pad), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, k_block, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, k_block, d), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nkv_pad, d), kp.dtype),
            jax.ShapeDtypeStruct((bh, nkv_pad, d), vp.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
    )(qp, kp, vp, do, lse, delta, bias)
    return dq, dk, dv, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.jit, static_argnames=("q_block", "k_block", "kv_valid"))
def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    q_block: Optional[int] = None, k_block: Optional[int] = None,
    kv_valid: Optional[int] = None,
) -> jax.Array:
    """Multi-head attention, (B, N, H, D) layout, scale = D**-0.5.

    Pallas TPU flash kernel with a flash backward (custom VJP): neither pass
    materializes the (N, N) probability matrix in HBM. Numerics match SDPA
    (fp32 softmax) to bf16 precision. N is padded internally.

    K/V may have a DIFFERENT length than q (cross-length attention — used by
    the sequence-parallel encoder, where q holds this shard's tokens and K/V
    are the all-gathered full sequence). ``kv_valid`` marks how many leading
    K/V positions are real; the rest (e.g. the gather padding) are masked.

    Block sizes default from MOGE_FLASH_BLOCKS="q,k" (k=0 -> whole padded
    sequence per step, i.e. single-pass softmax with no online rescale).
    """
    if q_block is None or k_block is None:
        env = os.environ.get("MOGE_FLASH_BLOCKS")
        if env:
            eq, ek = (int(s) for s in env.split(","))
        else:
            eq, ek = DEFAULT_Q_BLOCK, DEFAULT_K_BLOCK
        q_block = q_block if q_block is not None else eq
        k_block = k_block if k_block is not None else ek
    b, n, h, d = q.shape
    n_kv = k.shape[1]
    if kv_valid is None:
        kv_valid = n_kv
    if q_block <= 0:
        q_block = 256 if n <= 2048 else 128
    if k_block <= 0:
        k_block = _round_up(n_kv, max(q_block, 128))
        # Whole-sequence K blocks hold (q_block, n_pad) fp32 logits + probs in
        # VMEM; beyond ~4k keys that outgrows the 64 MB budget and Mosaic
        # compilation fails. Past the validated MoGe regime (N<=3601), fall
        # back to streaming K blocks with the online-softmax rescale.
        if k_block > 4096:
            k_block = 512
    nq_pad = _round_up(n, q_block)
    nkv_pad = _round_up(n_kv, k_block)

    def pad(x, to):
        return jnp.pad(x, ((0, 0), (0, to - x.shape[1]), (0, 0), (0, 0)))

    # Scale q ONCE over (N, d) instead of scaling the (N, N) logits inside
    # the kernel. For d a power of four the scale is a power of two and this
    # is bit-exact; otherwise it only reorders a bf16 rounding.
    scale = d ** -0.5
    # Forward-kernel contract: INVALID K/V rows are zero, so pad logits are
    # exactly 0 and the validity column of v_ext kills their contribution
    # (no per-logit bias in the forward). jnp.pad zeros rows >= n_kv; rows
    # in [kv_valid, n_kv) (the sequence-parallel all-gather padding) are
    # zeroed here.
    if kv_valid < n_kv:
        row_ok = (jnp.arange(n_kv) < kv_valid)[None, :, None, None]
        k = k * row_ok.astype(k.dtype)
        v = v * row_ok.astype(v.dtype)
    # (B, N, H, D) -> (B*H, N_pad, D)
    qp = pad(q * jnp.asarray(scale, q.dtype), nq_pad).transpose(0, 2, 1, 3).reshape(b * h, nq_pad, d)
    kp = pad(k, nkv_pad).transpose(0, 2, 1, 3).reshape(b * h, nkv_pad, d)
    vp = pad(v, nkv_pad).transpose(0, 2, 1, 3).reshape(b * h, nkv_pad, d)
    bias = jnp.where(jnp.arange(nkv_pad) < kv_valid, 0.0, -jnp.inf).astype(jnp.float32)[None, :]

    out = _flash_core(qp, kp, vp, bias, q_block, k_block)
    out = out.reshape(b, h, nq_pad, d).transpose(0, 2, 1, 3)
    return out[:, :n]


def sdpa_xla(q: jax.Array, k: jax.Array, v: jax.Array,
             kv_valid: Optional[int] = None) -> jax.Array:
    """XLA fallback: fp32-softmax SDPA, (B, N, H, D) layout. K/V may be
    longer/shorter than q; ``kv_valid`` masks trailing K/V padding."""
    d = q.shape[-1]
    scale = d ** -0.5
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * scale
    if kv_valid is not None and kv_valid < k.shape[1]:
        mask = jnp.arange(k.shape[1]) < kv_valid
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", probs.astype(v.dtype), v)


def scaled_dot_product_attention(q, k, v, use_flash: Optional[bool] = None,
                                 kv_valid: Optional[int] = None) -> jax.Array:
    """SDPA with automatic backend choice: pallas flash kernel on TPU,
    XLA everywhere else (pallas TPU kernels don't run on CPU). Supports
    cross-length K/V with ``kv_valid`` trailing-padding masking (the
    sequence-parallel encoder path)."""
    if use_flash is None:
        use_flash = jax.default_backend() not in ("cpu",)
    if use_flash:
        try:
            return flash_attention(q, k, v, kv_valid=kv_valid)
        except Exception:  # pragma: no cover - fallback on unsupported targets
            return sdpa_xla(q, k, v, kv_valid=kv_valid)
    return sdpa_xla(q, k, v, kv_valid=kv_valid)
