"""W8A8 dynamic int8 quantization for MXU matmuls (opt-in; measured NOT to win).

Round-4 hardware verdict (tools/bench_int8_mxu.py + an in-jit chained
dot_general rate test, docs/perf_model.md): int8xint8->int32 through XLA
dot_general runs at only ~1.24x the bf16 rate on this v5e — not the 2x the
serving-mode design assumed — and the dynamic per-call quantization
overhead erases even that: end-to-end ViT-L inference measures 16.6 vs
16.6 ms at 518 px and 57.5 vs 54.1 ms at 3600 tokens (int8 6% SLOWER;
BENCH_FULL.json int8 rows). The mode is kept as a tested opt-in for
hardware/compilers where the int8 path is real, but on this target it is a
documented loss, not a lever.

The mechanism: a drop-in Dense twin that quantizes symmetric
per-output-channel weights and per-row (per-token) activations on the fly:

    y = (round(x/s_a) @ round(W/s_w)) * s_a * s_w + b      (int32 accumulate)

Parameters keep nn.Dense's exact names and dtypes ("kernel"/"bias", fp32) so
published checkpoints load unchanged — quantization is a pure compute-path
choice (like bf16-vs-fp32), selected per call.

This is NOT the parity path: output drift vs bf16 is ~1e-2 relative on ViT
activations (measured in tests/test_quant.py). It is exposed only behind
explicit opt-ins (MoGeModel(..., use_int8=True), `moge serve --int8`) and
benchmarked as its own clearly-labeled row.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


def quant_matmul(x: jax.Array, kernel: jax.Array, bias: jax.Array | None) -> jax.Array:
    """(..., K) @ (K, N) with dynamic W8A8 quantization, fp32 result.

    Per-row activation scales (dynamic, fp32 max-abs), per-column weight
    scales. Zero rows/columns get scale 1 to avoid 0/0.
    """
    xf = x.astype(jnp.float32)
    kf = kernel.astype(jnp.float32)

    w_amax = jnp.max(jnp.abs(kf), axis=0)                      # (N,)
    w_scale = jnp.where(w_amax > 0, w_amax / 127.0, 1.0)
    w_q = jnp.round(kf / w_scale).astype(jnp.int8)

    a_amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)      # (..., 1)
    a_scale = jnp.where(a_amax > 0, a_amax / 127.0, 1.0)
    x_q = jnp.round(xf / a_scale).astype(jnp.int8)

    acc = jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * a_scale * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


class QuantDense(nn.Module):
    """nn.Dense twin executing the matmul as W8A8 int8 on the MXU.

    Identical parameter tree to nn.Dense (fp32 "kernel" (K, N) and "bias"),
    so modules can switch between nn.Dense and QuantDense per call without
    touching checkpoints.
    """

    features: int
    dtype: Any = jnp.float32  # output dtype (matches nn.Dense(dtype=...))
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
                if self.use_bias else None)
        return quant_matmul(x, kernel, bias).astype(self.dtype)
