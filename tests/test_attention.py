"""Tests: pallas flash attention vs XLA SDPA (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from moge_tpu.ops.attention import flash_attention, sdpa_xla


@pytest.mark.parametrize("b,n,h,d", [(1, 300, 4, 64), (2, 513, 2, 64)])
def test_flash_matches_sdpa_interpreted(b, n, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    ref = np.asarray(sdpa_xla(q, k, v))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v, q_block=128, k_block=128))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_flash_padding_mask_correct():
    """Padded keys must not leak into the softmax: compare N vs N padded."""
    rng = np.random.default_rng(1)
    b, n, h, d = 1, 130, 2, 64  # forces 126 padded key positions at block 256
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    ref = np.asarray(sdpa_xla(q, k, v))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v, q_block=128, k_block=128))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_flash_backward_matches_sdpa_grad():
    """Custom-VJP flash backward vs XLA autodiff gradients (interpreter mode)."""
    rng = np.random.default_rng(2)
    b, n, h, d = 1, 200, 2, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v) * cot)

    gq_ref, gk_ref, gv_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    with pltpu.force_tpu_interpret_mode():
        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, q_block=128, k_block=128) * cot)

        gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)

    for got, ref, name in [(gq, gq_ref, "dq"), (gk, gk_ref, "dk"), (gv, gv_ref, "dv")]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-4, err_msg=name)


def test_flash_fwd_bwd_parity_under_jit_default_blocks():
    """The exact configuration training uses by default (--flash on): the
    whole-sequence k_block=0 single-pass-softmax path, fwd+bwd inside jit."""
    rng = np.random.default_rng(3)
    b, n, h, d = 1, 200, 2, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)

    @jax.jit
    def ref_val_grads(q, k, v):
        def loss(q, k, v):
            return jnp.sum(sdpa_xla(q, k, v) * cot)
        return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

    val_ref, grads_ref = ref_val_grads(q, k, v)

    with pltpu.force_tpu_interpret_mode():
        @jax.jit
        def flash_val_grads(q, k, v):
            def loss(q, k, v):
                # q_block/k_block defaults: 512 / 0 (whole padded sequence)
                return jnp.sum(flash_attention(q, k, v) * cot)
            return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

        val, grads = flash_val_grads(q, k, v)

    np.testing.assert_allclose(float(val), float(val_ref), rtol=2e-3)
    for got, ref, name in zip(grads, grads_ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-4, err_msg=name)
