"""Golden tests: MoGe-1 (flax) vs reference torch model — forward + infer parity."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_utils import add_reference_to_path

add_reference_to_path()

from moge.model import v1 as ref_v1  # noqa: E402

from moge_tpu.models.convert import convert_moge1  # noqa: E402
from moge_tpu.models.v1 import MoGeModel  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy golden tests; deselect with -m 'not slow'

TEST_CONFIG = {
    "encoder": "dinov2_vits14",
    "intermediate_layers": 4,
    "dim_proj": 96,
    "dim_upsample": [64, 48, 40],
    "dim_times_res_block_hidden": 2,
    "num_res_blocks": 1,
    "remap_output": "exp",
    "res_block_norm": "group_norm",
    "num_tokens_range": [1200, 2500],
    "last_res_blocks": 1,
    "last_conv_channels": 32,
    "last_conv_size": 1,
}


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    ref = ref_v1.MoGeModel(**TEST_CONFIG)
    ref.eval()
    config, params = convert_moge1({"model_config": TEST_CONFIG, "model": ref.state_dict()})
    mine = MoGeModel(config, params, dtype=jnp.float32)
    return ref, mine


def test_forward_parity(models):
    ref, mine = models
    rng = np.random.default_rng(0)
    h, w, num_tokens = 120, 160, 100
    img = rng.uniform(0, 1, (1, 3, h, w)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref.forward(torch.from_numpy(img), num_tokens=num_tokens)
    got_out = mine.forward(jnp.asarray(np.moveaxis(img, 1, -1)), num_tokens=num_tokens)

    assert set(got_out.keys()) == {"points", "mask"}
    np.testing.assert_allclose(np.asarray(got_out["points"]), ref_out["points"].numpy(), rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_out["mask"]), ref_out["mask"].numpy(), rtol=5e-3, atol=1e-3)


def test_infer_parity(models):
    ref, mine = models
    rng = np.random.default_rng(1)
    h, w, num_tokens = 98, 126, 90
    img = rng.uniform(0, 1, (1, 3, h, w)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref.infer(torch.from_numpy(img), num_tokens=num_tokens, use_fp16=False)
    got_out = mine.infer(jnp.asarray(np.moveaxis(img, 1, -1)), num_tokens=num_tokens)

    assert set(got_out.keys()) == set(ref_out.keys()) == {"points", "depth", "intrinsics", "mask"}
    ref_mask = ref_out["mask"].numpy()
    got_mask = np.asarray(got_out["mask"])
    assert (got_mask == ref_mask).mean() > 0.995
    both = ref_mask & got_mask
    np.testing.assert_allclose(
        np.asarray(got_out["intrinsics"]), ref_out["intrinsics"].numpy(), rtol=1e-2, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_out["depth"])[both], ref_out["depth"].numpy()[both], rtol=1e-2, atol=1e-3
    )
