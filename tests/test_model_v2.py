"""Golden tests: MoGe-2 (flax) vs reference torch model — forward + infer parity."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_utils import add_reference_to_path

add_reference_to_path()

from moge.model import v2 as ref_v2  # noqa: E402

from moge_tpu.models.convert import convert_moge2  # noqa: E402
from moge_tpu.models.v2 import MoGeModel  # noqa: E402

# Small config with ViT-S backbone covering all structural features of the
# published v2 configs (conv_transpose/bilinear resamplers, per-level uv
# concat, exp remap, all four heads). configs/train/v2.json is the schema.
pytestmark = pytest.mark.slow  # compile-heavy golden tests; deselect with -m 'not slow'

TEST_CONFIG = {
    "encoder": {"backbone": "dinov2_vits14", "intermediate_layers": [2, 5, 8, 11], "dim_out": 64},
    "neck": {
        "dim_in": [66, 2, 2, 2, 2],
        "dim_out": None,
        "dim_res_blocks": [64, 32, 16, 16, 8],
        "num_res_blocks": [0, 1, 1, 1, 0],
        "res_block_in_norm": "none",
        "res_block_hidden_norm": "none",
        "resamplers": ["conv_transpose", "pixel_shuffle", "nearest", "bilinear"],
    },
    "points_head": {
        "dim_in": [64, 32, 16, 16, 8],
        "dim_out": [None, None, None, None, 3],
        "dim_res_blocks": [64, 32, 16, 16, 8],
        "num_res_blocks": [0, 1, 1, 1, 0],
        "res_block_in_norm": "none",
        "res_block_hidden_norm": "none",
        "resamplers": ["conv_transpose", "conv_transpose", "conv_transpose", "bilinear"],
    },
    "normal_head": {
        "dim_in": [64, 32, 16, 16, 8],
        "dim_out": [None, None, None, None, 3],
        "dim_res_blocks": [64, 32, 16, 16, 8],
        "num_res_blocks": [0, 1, 1, 1, 0],
        "res_block_in_norm": "none",
        "res_block_hidden_norm": "none",
        "resamplers": ["conv_transpose", "conv_transpose", "conv_transpose", "bilinear"],
    },
    "mask_head": {
        "dim_in": [64, 32, 16, 16, 8],
        "dim_out": [None, None, None, None, 1],
        "dim_res_blocks": [64, 32, 16, 16, 8],
        "num_res_blocks": [0, 1, 1, 1, 0],
        "res_block_in_norm": "none",
        "res_block_hidden_norm": "none",
        "resamplers": ["conv_transpose", "conv_transpose", "conv_transpose", "bilinear"],
    },
    "scale_head": {"dims": [384, 64, 1]},
    "remap_output": "exp",
    "num_tokens_range": [1200, 3600],
}


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    ref = ref_v2.MoGeModel(**TEST_CONFIG)
    ref.eval()
    checkpoint = {"model_config": TEST_CONFIG, "model": ref.state_dict()}
    config, params = convert_moge2(checkpoint)
    mine = MoGeModel(config, params, dtype=jnp.float32)
    return ref, mine


def test_forward_parity(models):
    ref, mine = models
    rng = np.random.default_rng(0)
    h, w, num_tokens = 126, 182, 120
    img = rng.uniform(0, 1, (1, 3, h, w)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref.forward(torch.from_numpy(img), num_tokens=num_tokens)
    got_out = mine.forward(jnp.asarray(np.moveaxis(img, 1, -1)), num_tokens=num_tokens)

    # forward additionally exposes the pre-sigmoid mask logit for the
    # logit-space training BCE (reference returns the probability only)
    assert set(ref_out.keys()) == {"points", "normal", "mask", "metric_scale"}
    assert set(got_out.keys()) == {"points", "normal", "mask", "mask_logit", "metric_scale"}
    np.testing.assert_allclose(np.asarray(got_out["points"]), ref_out["points"].numpy(), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_out["normal"]), ref_out["normal"].numpy(), rtol=5e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_out["mask"]), ref_out["mask"].numpy(), rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got_out["metric_scale"]), ref_out["metric_scale"].numpy(), rtol=5e-3
    )


def test_infer_parity(models):
    ref, mine = models
    rng = np.random.default_rng(1)
    h, w, num_tokens = 112, 154, 110
    img = rng.uniform(0, 1, (1, 3, h, w)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref.infer(torch.from_numpy(img), num_tokens=num_tokens, use_fp16=False)
    got_out = mine.infer(jnp.asarray(np.moveaxis(img, 1, -1)), num_tokens=num_tokens)

    assert set(got_out.keys()) == set(ref_out.keys()) == {"points", "depth", "intrinsics", "mask", "normal"}
    ref_mask = ref_out["mask"].numpy()
    got_mask = np.asarray(got_out["mask"])
    assert (got_mask == ref_mask).mean() > 0.995  # mask may flip on threshold-boundary pixels

    both = ref_mask & got_mask
    np.testing.assert_allclose(
        np.asarray(got_out["intrinsics"]), ref_out["intrinsics"].numpy(), rtol=1e-2, atol=1e-3
    )
    ref_depth = ref_out["depth"].numpy()[both]
    got_depth = np.asarray(got_out["depth"])[both]
    np.testing.assert_allclose(got_depth, ref_depth, rtol=1e-2, atol=1e-3)
    ref_pts = ref_out["points"].numpy()[both]
    got_pts = np.asarray(got_out["points"])[both]
    np.testing.assert_allclose(got_pts, ref_pts, rtol=1.5e-2, atol=2e-3)


def test_infer_known_fov(models):
    ref, mine = models
    rng = np.random.default_rng(2)
    h, w, num_tokens = 98, 98, 100
    img = rng.uniform(0, 1, (3, h, w)).astype(np.float32)  # also tests batchless path

    with torch.no_grad():
        ref_out = ref.infer(torch.from_numpy(img), num_tokens=num_tokens, fov_x=60.0, use_fp16=False)
    got_out = mine.infer(jnp.asarray(np.moveaxis(img, 0, -1)), num_tokens=num_tokens, fov_x=60.0)

    assert np.asarray(got_out["depth"]).shape == tuple(ref_out["depth"].shape)
    np.testing.assert_allclose(
        np.asarray(got_out["intrinsics"]), ref_out["intrinsics"].numpy(), rtol=1e-5, atol=1e-6
    )
    both = ref_out["mask"].numpy() & np.asarray(got_out["mask"])
    np.testing.assert_allclose(
        np.asarray(got_out["depth"])[both], ref_out["depth"].numpy()[both], rtol=1e-2, atol=1e-3
    )


def test_use_fp16_false_gives_fp32_compute(models):
    """A bf16-constructed model with use_fp16=False must compute in fp32
    (reference autocast-disabled semantics)."""
    ref, mine = models
    import jax.numpy as jnp2

    from moge_tpu.models.v2 import MoGeModel as M2

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, 84, 84, 3)).astype(np.float32)
    bf16_model = M2(mine.config, mine.params, dtype=jnp2.bfloat16)

    out_fp32_path = bf16_model.infer(jnp2.asarray(img), num_tokens=36, use_fp16=False, apply_mask=False)
    out_ref_fp32 = mine.infer(jnp2.asarray(img), num_tokens=36, apply_mask=False)  # fp32-constructed
    np.testing.assert_allclose(
        np.asarray(out_fp32_path["depth"]), np.asarray(out_ref_fp32["depth"]), rtol=1e-6, atol=1e-7
    )
    out_bf16_path = bf16_model.infer(jnp2.asarray(img), num_tokens=36, use_fp16=True, apply_mask=False)
    # bf16 differs from fp32 but stays within mixed-precision tolerance
    d32, d16 = np.asarray(out_ref_fp32["depth"]), np.asarray(out_bf16_path["depth"])
    assert 0 < np.abs(d32 - d16).max() / np.abs(d32).max() < 5e-2


@pytest.mark.parametrize("h,w", [(168, 84), (84, 168)])
def test_forward_parity_extreme_aspect(models, h, w):
    """Aspect 2:1 and 1:2 — the supported range edges (reference README.md:33):
    stresses pos-embed interpolation and per-level uv conditioning."""
    ref, mine = models
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (1, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.forward(torch.from_numpy(img), num_tokens=72)
    got_out = mine.forward(jnp.asarray(np.moveaxis(img, 1, -1)), num_tokens=72)
    np.testing.assert_allclose(np.asarray(got_out["points"]), ref_out["points"].numpy(), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_out["mask"]), ref_out["mask"].numpy(), rtol=5e-3, atol=1e-3)
