"""Tests for the pallas layer norm (moge_tpu/ops/norm.py)."""

import numpy as np
import jax
import jax.numpy as jnp

import moge_tpu.ops.norm as norm_mod
from moge_tpu.ops.norm import layer_norm_fp32


def _ref_ln(x, scale, bias, eps=1e-6):
    x = np.asarray(x, np.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * np.asarray(scale, np.float32) + np.asarray(bias, np.float32)


def test_xla_path_matches_numpy():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 7, 96), jnp.float32)
    s = jnp.asarray(rng.randn(96), jnp.float32)
    b = jnp.asarray(rng.randn(96), jnp.float32)
    np.testing.assert_allclose(np.asarray(layer_norm_fp32(x, s, b)), _ref_ln(x, s, b), rtol=1e-5, atol=1e-5)


def test_pallas_kernel_interpret_matches_ref():
    rng = np.random.RandomState(1)
    # M=37 deliberately not a row-block multiple (edge-block masking).
    x = jnp.asarray(rng.randn(1, 37, 256), jnp.bfloat16)
    s = jnp.asarray(rng.randn(256), jnp.float32)
    b = jnp.asarray(rng.randn(256), jnp.float32)
    old_i, old_rb = norm_mod._INTERPRET, norm_mod._ROW_BLOCK
    norm_mod._INTERPRET, norm_mod._ROW_BLOCK = True, 16
    try:
        import os
        os.environ["MOGE_PALLAS_LN"] = "1"
        got = np.asarray(layer_norm_fp32(x, s, b), np.float32)
    finally:
        norm_mod._INTERPRET, norm_mod._ROW_BLOCK = old_i, old_rb
        os.environ.pop("MOGE_PALLAS_LN", None)
    want = _ref_ln(np.asarray(x, np.float32), s, b)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_grads_match_xla():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 5, 64), jnp.float32)
    s = jnp.asarray(1 + 0.1 * rng.randn(64), jnp.float32)
    b = jnp.asarray(rng.randn(64), jnp.float32)
    g1 = jax.grad(lambda *a: jnp.sum(layer_norm_fp32(*a) ** 2), argnums=(0, 1, 2))(x, s, b)
    g2 = jax.grad(lambda *a: jnp.sum(norm_mod._ln_xla(*a, 1e-6) ** 2), argnums=(0, 1, 2))(x, s, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4)
