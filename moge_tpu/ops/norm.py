"""Pallas TPU layer norm for the ViT encoder's fp32-statistics LayerNorm.

XLA lowers the fp32-LN pattern (convert -> mean/var reduce -> normalize) on
bf16 activations into convert_reduce fusions that run at ~70 GB/s on v5e
(lane-dim reductions through fp32 temporaries); at ViT-L shapes the 49 LNs
of a forward pass cost ~1.9 ms of the encoder's 12 ms (profiled; reference
semantics: moge/model/dinov2/layers/block.py pre-LN + the shared final norm).
This kernel keeps the whole computation in VMEM: one bf16 read, fp32 stats,
one bf16 write.

Numerics identical to ``layer_norm_fp32`` up to fp32 reduction order.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["layer_norm_fp32"]

_ROW_BLOCK = 256
_INTERPRET = False  # tests flip this to run the kernel on CPU


def _use_pallas() -> bool:
    env = os.environ.get("MOGE_PALLAS_LN")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _ln_kernel(x_ref, s_ref, b_ref, y_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * s_ref[...] + b_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)


def _ln_xla(x, scale, bias, eps):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_fp32(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm over the last axis with fp32 statistics, any leading shape.

    Pallas on TPU (single VMEM pass); XLA elsewhere. The backward runs the
    XLA formulation (cheap relative to the encoder's matmul backward).
    """
    D = x.shape[-1]
    if not (_use_pallas() and D % 128 == 0 and x.ndim >= 2):
        return _ln_xla(x, scale, bias, eps)
    lead = x.shape[:-1]
    xm = x.reshape(-1, D)
    M = xm.shape[0]
    rb = min(_ROW_BLOCK, M)
    y = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(pl.cdiv(M, rb),),
        in_specs=[pl.BlockSpec((rb, D), lambda i: (i, 0)),
                  pl.BlockSpec((1, D), lambda i: (0, 0)),
                  pl.BlockSpec((1, D), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((rb, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        interpret=_INTERPRET,
    )(xm, scale.astype(jnp.float32).reshape(1, D), bias.astype(jnp.float32).reshape(1, D))
    return y.reshape(*lead, D)


def _ln_fwd(x, scale, bias, eps):
    return layer_norm_fp32(x, scale, bias, eps), (x, scale, bias)


def _ln_bwd(eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda xx, ss, bb: _ln_xla(xx, ss, bb, eps), x, scale, bias)
    return vjp(g)


layer_norm_fp32.defvjp(_ln_fwd, _ln_bwd)
