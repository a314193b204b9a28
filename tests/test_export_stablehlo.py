"""Tests: StableHLO deployment artifacts (jax.export) — the ONNX-export analog.

Exports a tiny MoGe-2 on the CPU backend, round-trips through
serialize/deserialize bytes, and checks the artifact's outputs against the
live model (raw forward AND the full infer program with camera recovery).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from moge_tpu.models.export import export_stablehlo, load_stablehlo
from moge_tpu.models.v2 import MoGeModel

TINY_CONFIG = {
    "encoder": {"backbone": "dinov2_vitt14", "intermediate_layers": [0, 1, 2, 3], "dim_out": 32},
    "neck": {
        "dim_in": [34, 2, 2, 2, 2], "dim_out": None,
        "dim_res_blocks": [32, 16, 16, 16, 16], "num_res_blocks": [0, 1, 1, 1, 0],
        "res_block_in_norm": "none", "res_block_hidden_norm": "none",
        "resamplers": ["conv_transpose", "conv_transpose", "conv_transpose", "bilinear"],
    },
    "points_head": {
        "dim_in": [32, 16, 16, 16, 16], "dim_out": [None, None, None, None, 3],
        "dim_res_blocks": [32, 16, 16, 16, 16], "num_res_blocks": [0, 1, 1, 1, 0],
        "res_block_in_norm": "none", "res_block_hidden_norm": "none",
        "resamplers": ["conv_transpose", "conv_transpose", "conv_transpose", "bilinear"],
    },
    "mask_head": {
        "dim_in": [32, 16, 16, 16, 16], "dim_out": [None, None, None, None, 1],
        "dim_res_blocks": [32, 16, 16, 16, 16], "num_res_blocks": [0, 1, 1, 1, 0],
        "res_block_in_norm": "none", "res_block_hidden_norm": "none",
        "resamplers": ["conv_transpose", "conv_transpose", "conv_transpose", "bilinear"],
    },
    "scale_head": {"dims": [96, 32, 1]},
    "remap_output": "exp",
    "num_tokens_range": [1200, 3600],
}


@pytest.fixture(scope="module")
def model():
    m = MoGeModel(TINY_CONFIG, None, dtype=jnp.float32)
    m.init_random(seed=0, image_hw=(56, 56))
    return m


def test_raw_forward_artifact(model):
    h = w = 56
    blob = export_stablehlo(model, h, w, num_tokens=16, batch=1, with_postprocess=False)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    fn = load_stablehlo(blob)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    got = fn(img)
    want = model.forward(img, 16)
    assert set(got) == set(want)
    for k in want:
        if want[k] is None:
            assert got[k] is None
            continue
        # the artifact is compiled standalone, so XLA fusion/reassociation
        # differs from the live jit — fp32-roundoff tolerance, not bitwise
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-3, atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_infer_artifact_matches_live_infer(model):
    h = w = 56
    blob = export_stablehlo(model, h, w, num_tokens=16, batch=2, with_postprocess=True)
    fn = load_stablehlo(blob)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (2, h, w, 3)), jnp.float32)
    got = fn(img)
    want = model.infer(img, num_tokens=16)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-3, atol=1e-5, err_msg=k)
    # camera recovery really is inside the artifact
    assert "intrinsics" in got and np.isfinite(np.asarray(got["intrinsics"])).all()
