"""Tests for training losses: golden vs reference where deterministic,
behavioral sanity where sampling differs (RNG streams can't match torch)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_utils import add_reference_to_path

add_reference_to_path()

from moge.train import losses as ref_losses  # noqa: E402

from moge_tpu.train import losses as jlosses  # noqa: E402
from moge_tpu.ops.geometry import depth_map_to_point_map, intrinsics_from_focal_center  # noqa: E402


def _scene(rng, b=2, h=32, w=40, invalid_frac=0.2):
    """Consistent GT point maps + imperfect predictions."""
    depth = rng.uniform(1, 5, (b, h, w)).astype(np.float32)
    K = np.broadcast_to(np.asarray(intrinsics_from_focal_center(1.0, 1.2, 0.5, 0.5)), (b, 3, 3))
    gt = np.asarray(depth_map_to_point_map(jnp.asarray(depth), jnp.asarray(K))).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w)) > invalid_frac
    gt = np.where(mask[..., None], gt, np.inf).astype(np.float32)
    pred = (gt * 0.5 + 0.1 + rng.normal(0, 0.05, gt.shape)).astype(np.float32)
    pred = np.where(np.isfinite(pred), pred, 0.0).astype(np.float32)
    return pred, gt, mask


def test_global_loss_matches_reference():
    rng = np.random.default_rng(0)
    pred, gt, _ = _scene(rng)
    ref_loss, ref_misc, ref_scale = ref_losses.affine_invariant_global_loss(
        torch.from_numpy(pred), torch.from_numpy(gt), align_resolution=16
    )
    got_loss, got_misc, got_scale = jlosses.affine_invariant_global_loss(
        jnp.asarray(pred), jnp.asarray(gt), align_resolution=16
    )
    np.testing.assert_allclose(np.asarray(got_scale), ref_scale.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_loss), ref_loss.numpy(), rtol=1e-4, atol=1e-5)
    for k in ref_misc:
        np.testing.assert_allclose(float(got_misc[k]), ref_misc[k], rtol=1e-3, atol=1e-4, err_msg=k)


def test_global_loss_sparsity_aware():
    rng = np.random.default_rng(1)
    pred, gt, _ = _scene(rng, invalid_frac=0.7)
    ref_loss, _, _ = ref_losses.affine_invariant_global_loss(
        torch.from_numpy(pred), torch.from_numpy(gt), align_resolution=16, sparsity_aware=True
    )
    got_loss, _, _ = jlosses.affine_invariant_global_loss(
        jnp.asarray(pred), jnp.asarray(gt), align_resolution=16, sparsity_aware=True
    )
    np.testing.assert_allclose(np.asarray(got_loss), ref_loss.numpy(), rtol=1e-4, atol=1e-5)


def test_normal_and_edge_losses_match():
    rng = np.random.default_rng(2)
    pred, gt, _ = _scene(rng)
    for name in ["normal_loss", "edge_loss"]:
        ref_l, _ = getattr(ref_losses, name)(torch.from_numpy(pred), torch.from_numpy(gt))
        got_l, _ = getattr(jlosses, name)(jnp.asarray(pred), jnp.asarray(gt))
        np.testing.assert_allclose(np.asarray(got_l), ref_l.numpy(), rtol=1e-3, atol=1e-5, err_msg=name)


def test_mask_losses_match():
    rng = np.random.default_rng(3)
    prob = rng.uniform(0.01, 0.99, (2, 16, 20)).astype(np.float32)
    pos = rng.uniform(0, 1, (2, 16, 20)) > 0.5
    neg = ~pos & (rng.uniform(0, 1, (2, 16, 20)) > 0.3)
    for name in ["mask_l2_loss", "mask_bce_loss"]:
        ref_l, _ = getattr(ref_losses, name)(
            torch.from_numpy(prob), torch.from_numpy(pos), torch.from_numpy(neg)
        )
        got_l, _ = getattr(jlosses, name)(jnp.asarray(prob), jnp.asarray(pos), jnp.asarray(neg))
        np.testing.assert_allclose(np.asarray(got_l), ref_l.numpy(), rtol=1e-4, atol=1e-5, err_msg=name)


def test_metric_scale_and_normal_map_losses_match():
    rng = np.random.default_rng(4)
    sp = rng.uniform(0.5, 2, (4,)).astype(np.float32)
    sg = np.array([1.0, 0.0, 2.0, 0.5], np.float32)  # includes invalid (0)
    ref_l, _ = ref_losses.metric_scale_loss(torch.from_numpy(sp), torch.from_numpy(sg))
    got_l, _ = jlosses.metric_scale_loss(jnp.asarray(sp), jnp.asarray(sg))
    np.testing.assert_allclose(np.asarray(got_l), ref_l.numpy(), rtol=1e-5, atol=1e-6)

    n1 = rng.standard_normal((2, 10, 12, 3)).astype(np.float32)
    n1 /= np.linalg.norm(n1, axis=-1, keepdims=True)
    n2 = rng.standard_normal((2, 10, 12, 3)).astype(np.float32)
    n2 /= np.linalg.norm(n2, axis=-1, keepdims=True)
    n2[0, :3] = np.inf  # invalid rows
    ref_l, _ = ref_losses.normal_map_loss(torch.from_numpy(n1), torch.from_numpy(n2))
    got_l, _ = jlosses.normal_map_loss(jnp.asarray(n1), jnp.asarray(n2))
    np.testing.assert_allclose(np.asarray(got_l), ref_l.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_local_loss_behaviour():
    """Sampling RNG differs from torch; check structural/behavioral properties."""
    rng = np.random.default_rng(5)
    # Patch extent must exceed MINIMUM_POINTS_PER_PATCH=32 valid pixels: at
    # level 4 the 3D radius covers ~h/11 pixels, so use a training-like size.
    pred, gt, mask = _scene(rng, b=2, h=128, w=128, invalid_frac=0.1)
    focal = jnp.asarray(np.array([1.0, 1.1], np.float32))
    gscale = jnp.asarray(np.array([2.0, 2.0], np.float32))
    key = jax.random.PRNGKey(0)

    loss_bad, misc = jlosses.affine_invariant_local_loss(
        key, jnp.asarray(pred), jnp.asarray(gt), focal, gscale, level=4, align_resolution=12, num_patches=8
    )
    assert loss_bad.shape == (2,)
    assert np.isfinite(np.asarray(loss_bad)).all()
    assert float(misc["delta"]) >= 0

    # near-perfect prediction (same affine transform as global gt->pred scale 2)
    pred_good = np.where(np.isfinite(gt), gt * 0.5, 0.0).astype(np.float32)
    loss_good, _ = jlosses.affine_invariant_local_loss(
        key, jnp.asarray(pred_good), jnp.asarray(gt), focal, gscale, level=4, align_resolution=12, num_patches=8
    )  # noqa: E501
    assert np.asarray(loss_good).sum() < np.asarray(loss_bad).sum()
    assert np.asarray(loss_good).sum() < 1e-2

    # gradient flows
    g = jax.grad(
        lambda p: jlosses.affine_invariant_local_loss(
            key, p, jnp.asarray(gt), focal, gscale, level=4, align_resolution=12, num_patches=8
        )[0].sum()
    )(jnp.asarray(pred))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_global_loss_gradient():
    rng = np.random.default_rng(6)
    pred, gt, _ = _scene(rng)
    g = jax.grad(
        lambda p: jlosses.affine_invariant_global_loss(p, jnp.asarray(gt), align_resolution=16)[0].sum()
    )(jnp.asarray(pred))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
