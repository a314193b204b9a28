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
    to the K-block multiple and padded keys are masked with -inf before the
    running max.
  * fp32 accumulation throughout; bf16 in/out.
  * grid (batch*heads, q_blocks); K/V stream block-by-block via a fori loop
    reading VMEM-resident full K/V per (batch, head) — K/V for one head at
    N=3601 is 2 x 3648 x 64 x 2B = 0.9 MB, comfortably in VMEM.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_Q_BLOCK = 256
DEFAULT_K_BLOCK = 512


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, k_block: int, n_valid: int, scale: float):
    """One (batch*head, q_block) tile: online softmax over K blocks.

    q_ref: (q_block, d); k_ref/v_ref: (n_padded, d); o_ref: (q_block, d).
    """
    q = q_ref[:].astype(jnp.float32) * scale
    n_padded, d = k_ref.shape
    num_k_blocks = n_padded // k_block
    q_block = q.shape[0]

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[pl.ds(i * k_block, k_block), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * k_block, k_block), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (q_block, k_block)
        # mask out padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, (q_block, k_block), 1) + i * k_block
        logits = jnp.where(col < n_valid, logits, -jnp.inf)

        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((q_block, d), jnp.float32)
    m0 = jnp.full((q_block, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((q_block, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0, l0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("q_block", "k_block"))
def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    q_block: int = DEFAULT_Q_BLOCK, k_block: int = DEFAULT_K_BLOCK,
) -> jax.Array:
    """Multi-head attention, (B, N, H, D) layout, scale = D**-0.5.

    Pallas TPU flash kernel; numerics match SDPA (fp32 softmax) to bf16
    precision. N is padded internally; output has the input N.
    """
    b, n, h, d = q.shape
    scale = d ** -0.5
    n_pad = _round_up(n, max(q_block, k_block))

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))

    # (B, N, H, D) -> (B*H, N_pad, D)
    qp = pad(q).transpose(0, 2, 1, 3).reshape(b * h, n_pad, d)
    kp = pad(k).transpose(0, 2, 1, 3).reshape(b * h, n_pad, d)
    vp = pad(v).transpose(0, 2, 1, 3).reshape(b * h, n_pad, d)

    grid = (b * h, n_pad // q_block)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, k_block=k_block, n_valid=n, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, q_block, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, n_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, n_pad, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, q_block, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
    )(qp, kp, vp)

    out = out.reshape(b, h, n_pad, d).transpose(0, 2, 1, 3)
    return out[:, :n]


def sdpa_xla(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """XLA fallback: fp32-softmax SDPA, (B, N, H, D) layout."""
    d = q.shape[-1]
    scale = d ** -0.5
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", probs.astype(v.dtype), v)


def scaled_dot_product_attention(q, k, v, use_flash: Optional[bool] = None) -> jax.Array:
    """SDPA with automatic backend choice: pallas flash kernel on TPU,
    XLA everywhere else (pallas TPU kernels don't run on CPU)."""
    if use_flash is None:
        use_flash = jax.default_backend() not in ("cpu",)
    if use_flash:
        try:
            return flash_attention(q, k, v)
        except Exception:  # pragma: no cover - fallback on unsupported targets
            return sdpa_xla(q, k, v)
    return sdpa_xla(q, k, v)
