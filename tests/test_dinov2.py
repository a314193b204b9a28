"""Golden test: flax DinoViT vs the reference torch DINOv2 (random weights)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_utils import add_reference_to_path

add_reference_to_path()

from moge.model.dinov2.hub import backbones as ref_backbones  # noqa: E402

from moge_tpu.models.dinov2 import VIT_ARCHS, DinoViT  # noqa: E402
from moge_tpu.models.convert import convert_dinov2_backbone  # noqa: E402


pytestmark = pytest.mark.slow  # compile-heavy golden tests; deselect with -m 'not slow'

@pytest.fixture(scope="module")
def ref_vits():
    torch.manual_seed(0)
    model = ref_backbones.dinov2_vits14(pretrained=False)
    model.eval()
    return model


def _run_ref(model, x_nchw, layers):
    with torch.no_grad():
        outs = model.get_intermediate_layers(torch.from_numpy(x_nchw), n=layers, return_class_token=True)
    return [(p.numpy(), c.numpy()) for p, c in outs]


def _run_jax(params, x_nchw, layers, h0, w0):
    cfg = VIT_ARCHS["dinov2_vits14"]
    vit = DinoViT(config=cfg, dtype=jnp.float32)
    x = jnp.asarray(np.moveaxis(x_nchw, 1, -1))
    outs = vit.apply({"params": params}, x, tuple(layers))
    return [(np.asarray(p), np.asarray(c)) for p, c in outs]


@pytest.mark.parametrize("h0,w0", [(37, 37), (30, 41)])
def test_vits_intermediate_layers_match(ref_vits, h0, w0):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, h0 * 14, w0 * 14)).astype(np.float32)
    layers = [2, 5, 8, 11]

    ref_outs = _run_ref(ref_vits, x, layers)
    params = convert_dinov2_backbone(ref_vits.state_dict())
    got_outs = _run_jax(params, x, layers, h0, w0)

    assert len(ref_outs) == len(got_outs) == 4
    for li, ((rp, rc), (gp, gc)) in enumerate(zip(ref_outs, got_outs)):
        assert gp.shape == rp.shape and gc.shape == rc.shape
        np.testing.assert_allclose(gp, rp, rtol=2e-3, atol=2e-4, err_msg=f"patch tokens layer {layers[li]}")
        np.testing.assert_allclose(gc, rc, rtol=2e-3, atol=2e-4, err_msg=f"cls token layer {layers[li]}")


def test_pos_embed_interp_identity_at_native(ref_vits):
    """At 37x37 (native grid) the pos-embed must pass through untouched."""
    params = convert_dinov2_backbone(ref_vits.state_dict())
    cfg = VIT_ARCHS["dinov2_vits14"]
    vit = DinoViT(config=cfg)
    pe = jnp.asarray(params["pos_embed"])
    out = vit.interpolate_pos_encoding(pe, 37, 37)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pe))


def test_swiglu_arch_matches():
    """vit_giant2-style SwiGLUFFNFused blocks (tiny dims for speed)."""
    import torch as _torch

    from moge.model.dinov2.models.vision_transformer import DinoVisionTransformer

    from moge_tpu.models.dinov2 import DinoViT, ViTConfig

    _torch.manual_seed(1)
    ref = DinoVisionTransformer(
        img_size=518, patch_size=14, embed_dim=64, depth=2, num_heads=2,
        init_values=1.0, ffn_layer="swiglufused", block_chunks=0,
        interpolate_offset=0.1,
    )
    ref.eval()
    cfg = ViTConfig(embed_dim=64, depth=2, num_heads=2, ffn="swiglu")
    params = convert_dinov2_backbone(ref.state_dict())
    vit = DinoViT(config=cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 14 * 8, 14 * 9)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.get_intermediate_layers(torch.from_numpy(x), n=[0, 1], return_class_token=True)
    got_out = vit.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)), (0, 1))
    for (rp, rc), (gp, gc) in zip(ref_out, got_out):
        np.testing.assert_allclose(np.asarray(gp), rp.numpy(), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gc), rc.numpy(), rtol=2e-3, atol=2e-4)


def test_scan_blocks_matches_unrolled(ref_vits):
    """The lax.scan block layout must be numerically identical to unrolled."""
    from moge_tpu.models.convert import adapt_block_layout

    params_unrolled = convert_dinov2_backbone(ref_vits.state_dict(), stack_blocks=False)
    params_stacked = convert_dinov2_backbone(ref_vits.state_dict(), stack_blocks=True)

    cfg = VIT_ARCHS["dinov2_vits14"]
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 14 * 9, 14 * 8, 3)), jnp.float32)
    layers = (2, 5, 8, 11)

    out_u = DinoViT(config=cfg, scan_blocks=False).apply({"params": params_unrolled}, x, layers)
    out_s = DinoViT(config=cfg, scan_blocks=True).apply({"params": params_stacked}, x, layers)
    # fp32 fusion-order rounding differs between the two layouts (~2e-6 on
    # magnitude-4 activations); anything beyond that is a real layout bug
    for (pu, cu), (ps, cs) in zip(out_u, out_s):
        np.testing.assert_allclose(np.asarray(ps), np.asarray(pu), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cs), np.asarray(cu), rtol=1e-5, atol=1e-5)

    # adapters roundtrip between layouts
    import copy

    roundtrip = adapt_block_layout(adapt_block_layout(copy.deepcopy(params_unrolled), True), False)
    for a, b in zip(jax.tree.leaves(roundtrip), jax.tree.leaves(params_unrolled)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
