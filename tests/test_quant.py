"""W8A8 int8 serving mode: param-tree identity with the bf16 path, bounded
output drift on the ViT, and exactness of the quantized matmul on
integer-representable inputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moge_tpu.ops.quant import quant_matmul


def test_quant_matmul_exact_on_representable_inputs():
    # inputs already on the int8 grid with max-abs 127 scale -> exact
    rng = np.random.default_rng(0)
    x = np.asarray(rng.integers(-127, 128, (4, 16)), np.float32)
    w = np.asarray(rng.integers(-127, 128, (16, 8)), np.float32)
    # exactness needs scale = 1/127 of the row/col max: pin max-abs to 127
    x[:, 0] = 127.0
    w[0, :] = 127.0
    x, w = jnp.asarray(x), jnp.asarray(w)
    got = np.asarray(quant_matmul(x * 0.5, w * 0.25, None))
    want = np.asarray((x * 0.5) @ (w * 0.25))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_quant_matmul_relative_error():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.05, jnp.float32)
    got = np.asarray(quant_matmul(x, w, None))
    want = np.asarray(x @ w)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel  # per-row/per-col 8-bit: ~0.5-1% on gaussians


@pytest.mark.slow
def test_int8_vit_param_tree_and_drift():
    """use_int8 must reuse the exact same parameter tree (checkpoints load
    unchanged) and produce bounded activation drift vs the fp32 path."""
    from moge_tpu.models.dinov2 import VIT_ARCHS, DinoViT

    cfg = VIT_ARCHS["dinov2_vitt14"]
    rng = np.random.default_rng(2)
    image = jnp.asarray(rng.uniform(0, 1, (1, 4 * 14, 5 * 14, 3)), jnp.float32)

    vit = DinoViT(cfg, dtype=jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), image, (3,))["params"]

    vit8 = DinoViT(cfg, dtype=jnp.float32, use_int8=True)
    params8 = vit8.init(jax.random.PRNGKey(0), image, (3,))["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params8)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params8)):
        assert a.shape == b.shape and a.dtype == b.dtype

    (p_ref, c_ref), = vit.apply({"params": params}, image, (3,))
    (p_q, c_q), = vit8.apply({"params": params}, image, (3,))
    num = float(jnp.linalg.norm(p_q - p_ref))
    den = float(jnp.linalg.norm(p_ref))
    assert num / den < 0.05, num / den  # serving-mode drift bound


@pytest.mark.slow
def test_int8_model_infer_runs():
    from test_eval_e2e import TINY_V2_CONFIG

    from moge_tpu.models.v2 import MoGeModel

    model = MoGeModel(TINY_V2_CONFIG, None, dtype=jnp.float32)
    model.init_random(seed=0, image_hw=(56, 56))
    model8 = MoGeModel(TINY_V2_CONFIG, model.params, dtype=jnp.float32, use_int8=True)

    rng = np.random.default_rng(3)
    image = jnp.asarray(rng.uniform(0, 1, (56, 56, 3)), jnp.float32)
    # apply_mask=False: a random model's mask logits sit at the threshold, so
    # masked outputs differ wherever the mask flips — compare raw maps instead
    ref = model.infer(image, num_tokens=120, use_fp16=False, apply_mask=False)
    out = model8.infer(image, num_tokens=120, use_fp16=False, apply_mask=False)
    assert set(out) == set(ref)
    d_ref = np.asarray(ref["depth"], np.float32)
    d_q = np.asarray(out["depth"], np.float32)
    fin = np.isfinite(d_ref) & np.isfinite(d_q)
    assert fin.mean() > 0.9
    rel = np.abs(d_q[fin] - d_ref[fin]) / np.maximum(d_ref[fin], 1e-3)
    assert np.median(rel) < 0.05, np.median(rel)
