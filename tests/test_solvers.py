"""Golden tests: JAX batched focal/shift recovery vs the reference scipy-LM solver."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_utils import add_reference_to_path

add_reference_to_path()

from moge.utils import geometry_torch as ref_geo  # noqa: E402

from moge_tpu.ops import geometry as geo  # noqa: E402
from moge_tpu.ops.solvers import recover_focal_shift  # noqa: E402


def _synthetic_points(rng, batch, h, w, focal_true, shift_true, noise=0.0):
    """Affine point maps whose ground-truth (focal, shift) is known."""
    uv = np.asarray(geo.normalized_view_plane_uv(w, h))  # (h, w, 2)
    depth = rng.uniform(1.0, 6.0, (batch, h, w)).astype(np.float32)
    xy = uv[None] * depth[..., None] / np.asarray(focal_true)[:, None, None, None]
    z = depth - np.asarray(shift_true)[:, None, None]
    pts = np.concatenate([xy, z[..., None]], axis=-1).astype(np.float32)
    if noise:
        pts = pts + rng.normal(0, noise, pts.shape).astype(np.float32)
    return pts


def test_recover_focal_shift_matches_reference_unmasked():
    rng = np.random.default_rng(0)
    focal_true = np.array([0.8, 1.4, 0.5], dtype=np.float32)
    shift_true = np.array([0.3, -0.2, 0.9], dtype=np.float32)
    pts = _synthetic_points(rng, 3, 48, 64, focal_true, shift_true, noise=0.01)

    ref_f, ref_s = ref_geo.recover_focal_shift(torch.from_numpy(pts))
    got_f, got_s = recover_focal_shift(jnp.asarray(pts))

    np.testing.assert_allclose(np.asarray(got_f), ref_f.numpy(), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_s), ref_s.numpy(), rtol=5e-3, atol=5e-3)
    # also close to the ground truth
    np.testing.assert_allclose(np.asarray(got_f), focal_true, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(got_s), shift_true, rtol=5e-2, atol=3e-2)


def test_recover_focal_shift_masked():
    rng = np.random.default_rng(1)
    focal_true = np.array([1.1, 0.7], dtype=np.float32)
    shift_true = np.array([0.1, 0.5], dtype=np.float32)
    pts = _synthetic_points(rng, 2, 64, 64, focal_true, shift_true, noise=0.005)
    mask = rng.uniform(0, 1, (2, 64, 64)) > 0.4

    ref_f, ref_s = ref_geo.recover_focal_shift(torch.from_numpy(pts), torch.from_numpy(mask))
    got_f, got_s = recover_focal_shift(jnp.asarray(pts), jnp.asarray(mask))

    np.testing.assert_allclose(np.asarray(got_f), ref_f.numpy(), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got_s), ref_s.numpy(), rtol=1e-2, atol=1e-2)


def test_recover_shift_with_known_focal():
    rng = np.random.default_rng(2)
    focal_true = np.array([0.9, 1.2], dtype=np.float32)
    shift_true = np.array([-0.1, 0.6], dtype=np.float32)
    pts = _synthetic_points(rng, 2, 40, 56, focal_true, shift_true)

    ref_f, ref_s = ref_geo.recover_focal_shift(torch.from_numpy(pts), focal=torch.from_numpy(focal_true))
    got_f, got_s = recover_focal_shift(jnp.asarray(pts), focal=jnp.asarray(focal_true))

    np.testing.assert_allclose(np.asarray(got_f), focal_true, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_s), ref_s.numpy(), rtol=5e-3, atol=5e-3)


def test_recover_focal_shift_degenerate_mask():
    rng = np.random.default_rng(3)
    pts = _synthetic_points(rng, 1, 32, 32, np.array([1.0], np.float32), np.array([0.0], np.float32))
    mask = np.zeros((1, 32, 32), dtype=bool)
    got_f, got_s = recover_focal_shift(jnp.asarray(pts), jnp.asarray(mask))
    assert np.asarray(got_f)[0] == 1.0
    assert np.asarray(got_s)[0] == 0.0
    assert np.isfinite(np.asarray(got_f)).all() and np.isfinite(np.asarray(got_s)).all()
