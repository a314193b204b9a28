"""Tests for the pallas pair-domain 3x3 conv (moge_tpu/ops/conv.py).

The decoder's thin-channel 3x3 convs route through ``conv3x3_replicate``
(reference semantics: moge/model/modules.py:18-68 replicate-pad convs). On
CPU the public op falls back to the XLA formulation; the pallas kernel
itself is exercised here in interpret mode so its index algebra (pair-domain
weight expansion, row-tap shifted adds, edge padding) is covered without TPU
hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import moge_tpu.ops.conv as conv_mod
from moge_tpu.ops.conv import conv3x3_replicate, conv3x3_xla, _supported


def _ref_conv(x, kernel, bias):
    """Replicate-pad 3x3 conv in numpy fp32 (independent oracle)."""
    x = np.asarray(x, np.float32)
    k = np.asarray(kernel, np.float32)
    b = np.asarray(bias, np.float32)
    B, H, W, C = x.shape
    O = k.shape[-1]
    xp = np.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
    y = np.zeros((B, H, W, O), np.float32)
    for di in range(3):
        for dj in range(3):
            y += np.einsum("bhwc,co->bhwo", xp[:, di:di + H, dj:dj + W], k[di, dj])
    return y + b


def test_xla_path_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 7, 6, 5), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 5, 4) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(4), jnp.float32)
    got = np.asarray(conv3x3_replicate(x, k, b))
    want = _ref_conv(x, k, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "shape",
    [(1, 8, 8, 64, 64), (1, 12, 10, 64, 32), (2, 6, 4, 64, 64),
     (1, 8, 8, 32, 32), (1, 10, 12, 32, 64), (2, 6, 8, 32, 32),
     (1, 8, 8, 128, 64), (1, 6, 10, 128, 128), (1, 4, 6, 256, 128)],
)
def test_pallas_kernel_interpret_matches_oracle(shape):
    B, H, W, C, O = shape
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, C, O) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(O), jnp.float32)
    assert _supported(x, k)
    old = conv_mod._INTERPRET
    conv_mod._INTERPRET = True
    try:
        got = np.asarray(conv_mod._conv3x3_pallas(x, k.astype(x.dtype), b), np.float32)
    finally:
        conv_mod._INTERPRET = old
    want = _ref_conv(np.asarray(x, np.float32), k, b)
    # bf16 inputs: tolerance scaled to input rounding.
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05 * np.abs(want).max())


def test_unsupported_geometry_falls_back():
    rng = np.random.RandomState(2)
    # C=48: 128 % 48 != 0 -> group path must decline, XLA fallback is exact.
    x = jnp.asarray(rng.randn(1, 6, 6, 48), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 48, 16) * 0.2, jnp.float32)
    b = jnp.zeros((16,), jnp.float32)
    got = np.asarray(conv3x3_replicate(x, k, b), np.float32)
    want = np.asarray(conv3x3_xla(x, k.astype(x.dtype), b), np.float32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("C,O", [(64, 64), (32, 32), (128, 128)])
def test_pallas_fused_relu_and_residual_interpret(C, O):
    rng = np.random.RandomState(7)
    B, H, W = 1, 8, 8
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, C, O) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(O), jnp.float32)
    r = jnp.asarray(rng.randn(B, H, W, O), jnp.bfloat16)
    want = _ref_conv(np.maximum(np.asarray(x, np.float32), 0), k, b) + np.asarray(r, np.float32)
    old = conv_mod._INTERPRET
    conv_mod._INTERPRET = True
    try:
        got = np.asarray(
            conv_mod._conv3x3_pallas(x, k.astype(x.dtype), b, residual=r, input_relu=True),
            np.float32)
    finally:
        conv_mod._INTERPRET = old
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05 * np.abs(want).max())


def test_bf16_activation_fp32_kernel_grads():
    """Training dtype mix: bf16 activations, fp32 params (regression for the
    backward path not casting the kernel)."""
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(1, 5, 6, 8), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 8, 4) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(4), jnp.float32)
    r = jnp.asarray(rng.randn(1, 5, 6, 4), jnp.bfloat16)
    g = jax.grad(
        lambda k, b: jnp.sum(conv3x3_replicate(x, k, b, residual=r, input_relu=True)
                             .astype(jnp.float32) ** 2),
        argnums=(0, 1))(k, b)
    assert all(np.isfinite(np.asarray(gg)).all() for gg in g)


def test_fused_relu_residual_grads_flow():
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 5, 6, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 4) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(4), jnp.float32)
    r = jnp.asarray(rng.randn(1, 5, 6, 4), jnp.float32)

    def loss_custom(x, k, b, r):
        return jnp.sum(conv3x3_replicate(x, k, b, residual=r, input_relu=True) ** 2)

    def loss_ref(x, k, b, r):
        return jnp.sum((conv3x3_xla(jnp.maximum(x, 0), k, b) + r) ** 2)

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(x, k, b, r)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, k, b, r)
    for a, bgrad in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bgrad), rtol=1e-4, atol=1e-4)


def test_grouped_kernel_interpret_matches_per_group():
    """(G,3,3,C,O) weights: batch b uses weight group b // B0."""
    rng = np.random.RandomState(12)
    G, B0, H, W, C, O = 3, 2, 8, 8, 64, 64
    x = jnp.asarray(rng.randn(G * B0, H, W, C), jnp.bfloat16)
    k = jnp.asarray(rng.randn(G, 3, 3, C, O) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(G, O), jnp.float32)
    want = np.concatenate([
        _ref_conv(np.asarray(x[g * B0:(g + 1) * B0], np.float32), k[g], b[g]) for g in range(G)
    ])
    old = conv_mod._INTERPRET
    conv_mod._INTERPRET = True
    try:
        got = np.asarray(conv_mod._conv3x3_pallas(x, k.astype(x.dtype), b), np.float32)
    finally:
        conv_mod._INTERPRET = old
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05 * np.abs(want).max())
    # XLA grouped form agrees too
    got_xla = np.asarray(conv_mod.conv3x3_xla(x, k.astype(x.dtype), b), np.float32)
    np.testing.assert_allclose(got_xla, want, rtol=0.05, atol=0.05 * np.abs(want).max())


@pytest.mark.parametrize("C,O,H,W", [(8, 4, 5, 6), (64, 32, 6, 8)])
def test_up2_weights_match_resize_then_conv(C, O, H, W):
    """Fused bilinear2x+conv3x3 == resize_2d + replicate-pad conv, exactly
    (fp32), including all edge rows/cols."""
    from moge_tpu.ops.conv import conv3x3_up2_bilinear
    from moge_tpu.ops.resize import resize_2d

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, H, W, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, C, O) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(O), jnp.float32)
    up = resize_2d(x, (2 * H, 2 * W), mode="bilinear", channel_last=True)
    want = np.asarray(conv3x3_xla(up, k, b))
    got = np.asarray(conv3x3_up2_bilinear(x, k, b))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_custom_vjp_matches_xla_grads():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 5, 6, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 4) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(4), jnp.float32)

    def loss_custom(x, k, b):
        return jnp.sum(conv3x3_replicate(x, k, b) ** 2)

    def loss_ref(x, k, b):
        return jnp.sum(conv3x3_xla(x, k, b) ** 2)

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(x, k, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for a, bgrad in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bgrad), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Chained (group-domain) conv path: consecutive decoder convs exchange pallas
# chain tensors with no XLA pad/relayout passes between them.
# ---------------------------------------------------------------------------

def _chain_seq_ref(x, ks, bs):
    """conv -> relu+conv -> relu+conv(+skip from stage-1 out), image domain."""
    y0 = conv3x3_xla(x, ks[0], bs[0])
    y1 = conv3x3_xla(y0, ks[1], bs[1], None, input_relu=True)
    return conv3x3_xla(y1, ks[2], bs[2], y0, input_relu=True), y0


@pytest.mark.parametrize("shape", [(8, 8, 64, 64), (12, 12, 32, 32), (6, 8, 128, 128)])
def test_chain_kernel_interpret_matches_sequence(shape):
    from moge_tpu.ops.conv import chain_geometry
    H, W, C, O = shape
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
    ks = [jnp.asarray(rng.randn(3, 3, C, O) * 0.1, jnp.float32) for _ in range(3)]
    bs = [jnp.asarray(rng.randn(O) * 0.1, jnp.float32) for _ in range(3)]
    want, _ = _chain_seq_ref(x, ks, bs)
    want = np.asarray(want, np.float32)
    g = chain_geometry(H, W, C, O)
    assert g is not None
    old = conv_mod._INTERPRET
    conv_mod._INTERPRET = True
    try:
        y0 = conv_mod._conv3x3_pallas(x, ks[0].astype(x.dtype), bs[0],
                                      chain_in=False, chain_out=True)
        y1 = conv_mod._conv3x3_pallas(y0, ks[1].astype(x.dtype), bs[1], None, True,
                                      chain_in=True, chain_out=True, img_w=W)
        y2 = conv_mod._conv3x3_pallas(y1, ks[2].astype(x.dtype), bs[2], y0, True,
                                      chain_in=True, chain_out=False, img_w=W)
    finally:
        conv_mod._INTERPRET = old
    got = np.asarray(y2, np.float32)
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-2)


def test_chain_kernel_interpret_multitile():
    """Multi-row-tile chain: exercises the clamped halo DMA branches."""
    H, W, C = 24, 16, 64
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
    ks = [jnp.asarray(rng.randn(3, 3, C, C) * 0.1, jnp.float32) for _ in range(3)]
    bs = [jnp.asarray(rng.randn(C) * 0.1, jnp.float32) for _ in range(3)]
    want, _ = _chain_seq_ref(x, ks, bs)
    want = np.asarray(want, np.float32)
    old_b, old_i = conv_mod._VMEM_BUDGET, conv_mod._INTERPRET
    conv_mod._VMEM_BUDGET = 400_000  # force TH < H
    conv_mod._INTERPRET = True
    try:
        g = 128 // C
        Wq = -(-(W // g + 2) // 16) * 16
        assert H // conv_mod._pick_tile(H, Wq, g * C, g * C) > 1
        y0 = conv_mod._conv3x3_pallas(x, ks[0].astype(x.dtype), bs[0],
                                      chain_in=False, chain_out=True)
        y1 = conv_mod._conv3x3_pallas(y0, ks[1].astype(x.dtype), bs[1], None, True,
                                      chain_in=True, chain_out=True, img_w=W)
        y2 = conv_mod._conv3x3_pallas(y1, ks[2].astype(x.dtype), bs[2], y0, True,
                                      chain_in=True, chain_out=False, img_w=W)
    finally:
        conv_mod._VMEM_BUDGET, conv_mod._INTERPRET = old_b, old_i
    got = np.asarray(y2, np.float32)
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-2)


def test_chain_ref_matches_sequence_and_grads():
    """The XLA chain twin (non-TPU fallback + VJP formulation) reproduces the
    image-domain sequence, and gradients flow through conv3x3_chain."""
    from moge_tpu.ops.conv import to_chain, _chain_ref, conv3x3_chain
    H, W, C = 10, 8, 64
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
    ks = [jnp.asarray(rng.randn(3, 3, C, C) * 0.1, jnp.float32) for _ in range(3)]
    bs = [jnp.asarray(rng.randn(C) * 0.1, jnp.float32) for _ in range(3)]
    want, _ = _chain_seq_ref(x, ks, bs)
    want = np.asarray(want, np.float32)
    g = 2
    r0 = _chain_ref(to_chain(x, g), ks[0], bs[0], None, False, g, W, True, True)
    r1 = _chain_ref(r0, ks[1], bs[1], None, True, g, W, True, True)
    r2 = _chain_ref(r1, ks[2], bs[2], r0, True, g, W, True, False)
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(np.asarray(r2, np.float32) / scale, want / scale, atol=2e-2)

    def loss(k):
        y0 = conv3x3_chain(to_chain(x, g), k, bs[0], g=g, img_w=W, chain_in=True,
                           chain_out=True)
        y1 = conv3x3_chain(y0, ks[1], bs[1], y0, True, g=g, img_w=W, chain_out=False)
        return jnp.sum(y1.astype(jnp.float32) ** 2)

    gk = jax.grad(loss)(ks[0])
    assert np.isfinite(np.asarray(gk)).all() and float(jnp.abs(gk).max()) > 0


@pytest.mark.slow
def test_convstack_chain_matches_plain(monkeypatch):
    """ConvStack chain wiring (forced on via MOGE_CHAIN_CONV) reproduces the
    plain image-domain path for a MoGe-2-head-shaped pyramid, and both modes
    build the identical parameter tree."""
    from moge_tpu.models.modules import ConvStack
    monkeypatch.setenv("MOGE_PALLAS_CONV", "0")
    cfg = dict(
        dim_in=[64, 32, 16, 8, 8],
        dim_res_blocks=[64, 64, 64, 32, 32],
        dim_out=[None, None, None, None, 3],
        resamplers=["conv_transpose", "conv_transpose", "conv_transpose", "bilinear"],
        num_res_blocks=[0, 1, 1, 1, 0],
        res_block_in_norm="none",
        res_block_hidden_norm="none",
        dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(1, 8 * 2 ** i, 8 * 2 ** i, cfg["dim_in"][i]) * 0.5,
                         jnp.bfloat16) for i in range(5)]
    stack = ConvStack(**cfg)
    monkeypatch.setenv("MOGE_CHAIN_CONV", "0")
    params = stack.init(jax.random.PRNGKey(0), feats)
    out_plain = stack.apply(params, feats)
    monkeypatch.setenv("MOGE_CHAIN_CONV", "1")
    params_chain = stack.init(jax.random.PRNGKey(0), feats)
    out_chain = stack.apply(params, feats)
    assert jax.tree.structure(params) == jax.tree.structure(params_chain)
    for a, b in zip(out_plain, out_chain):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert a.shape == b.shape
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=3e-2)


def test_conv_bwd_fp32_option():
    """MOGE_CONV_BWD_FP32=1 must track the pure-fp32 gradient much more
    closely than the default bf16-accumulating backward."""
    import os

    rng = np.random.default_rng(5)
    x32 = jnp.asarray(rng.standard_normal((1, 16, 16, 64)), jnp.float32)
    x = x32.astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.1, jnp.float32)
    b = jnp.zeros((64,), jnp.float32)

    def loss(xx, kk):
        return jnp.sum(conv3x3_replicate(xx, kk, b).astype(jnp.float32) ** 2)

    # fp32 reference gradient (fp32 activations end-to-end)
    g_ref = jax.grad(loss, argnums=1)(x32, k)

    prev = os.environ.pop("MOGE_CONV_BWD_FP32", None)
    try:
        g_bf16 = jax.grad(loss, argnums=1)(x, k)
        os.environ["MOGE_CONV_BWD_FP32"] = "1"
        jax.clear_caches()  # the env branch is baked into the traced program
        g_fp32 = jax.grad(loss, argnums=1)(x, k)
    finally:
        jax.clear_caches()
        if prev is None:
            os.environ.pop("MOGE_CONV_BWD_FP32", None)
        else:
            os.environ["MOGE_CONV_BWD_FP32"] = prev

    err_bf16 = float(jnp.linalg.norm(g_bf16 - g_ref) / jnp.linalg.norm(g_ref))
    err_fp32 = float(jnp.linalg.norm(g_fp32 - g_ref) / jnp.linalg.norm(g_ref))
    # the x-cast to bf16 already loses ~1e-3; the fp32 backward must not add
    # accumulation error on top (strictly better than the bf16 backward)
    assert err_fp32 <= err_bf16
    assert np.isfinite(err_fp32)
