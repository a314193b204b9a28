"""Tests for host-side helpers: data augmentation (homography sampling,
warping, photometric), dict tools, and visualization colorizers."""

import warnings

import numpy as np
import pytest

from moge_tpu.utils.data_augmentation import (
    image_color_augmentation,
    sample_perspective,
    warp_perspective,
)
from moge_tpu.utils.geometry_numpy import (
    intrinsics_from_focal_center_numpy,
    intrinsics_to_fov_numpy,
)
from moge_tpu.utils.tools import (
    catch_exception,
    flatten_nested_dict,
    key_average,
    unflatten_nested_dict,
)
from moge_tpu.utils.vis import colorize_depth, colorize_error_map


def test_sample_perspective_produces_valid_crop():
    src_K = intrinsics_from_focal_center_numpy(0.8, 1.0, 0.5, 0.5).astype(np.float32)
    raw_fov_x, raw_fov_y = intrinsics_to_fov_numpy(src_K)
    rng = np.random.default_rng(0)
    for _ in range(20):
        tgt_K, R = sample_perspective(
            src_K, tgt_aspect=4 / 3, center_augmentation=0.5,
            fov_range_absolute=(20, 110), fov_range_relative=(0.5, 1.0), rng=rng,
        )
        # R is a proper rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)
        # target view is a sub-frustum: fov never exceeds the source's
        tgt_fov_x, tgt_fov_y = intrinsics_to_fov_numpy(tgt_K)
        assert tgt_fov_x <= raw_fov_x + 1e-6
        assert tgt_fov_y <= raw_fov_y + 1e-6
        assert tgt_K[0, 2] == pytest.approx(0.5) and tgt_K[1, 2] == pytest.approx(0.5)


def test_warp_perspective_identity_and_sparse_downscale():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (32, 48, 3)).astype(np.uint8)
    out = warp_perspective(img, np.eye(3, dtype=np.float32), (32, 48), "bilinear")
    np.testing.assert_array_equal(out, img)

    # sparse nearest warp with downscale takes the masked_nearest_resize path
    depth = rng.uniform(1, 5, (64, 96)).astype(np.float32)
    mask = rng.uniform(0, 1, (64, 96)) > 0.5
    depth = np.where(mask, depth, np.nan)
    out = warp_perspective(depth, np.eye(3, dtype=np.float32), (16, 24), "nearest", sparse_mask=mask)
    assert out.shape == (16, 24)
    finite = out[np.isfinite(out)]
    assert finite.size > 0 and (finite >= 1).all() and (finite <= 5).all()


def test_image_color_augmentation_paths():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (24, 32, 3)).astype(np.uint8)
    depth = rng.uniform(1, 5, (24, 32)).astype(np.float32)

    out = image_color_augmentation(img, ["jittering"], rng=np.random.default_rng(3))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)  # jitter changed something

    for aug in (["shot_noise"], ["dof"], ["blurring"]):
        out = image_color_augmentation(
            img, aug, rng=np.random.default_rng(4), depth=depth if aug == ["dof"] else None
        )
        assert out.shape == img.shape and out.dtype == np.uint8


def test_key_average_nested_missing_and_nan():
    dicts = [
        {"a": 1.0, "b": {"c": 2.0}, "d": float("nan")},
        {"a": 3.0, "b": {"c": 4.0}},
        {"b": {"c": float("inf")}, "d": 5.0},
    ]
    avg = key_average(dicts)
    assert avg["a"] == pytest.approx(2.0)
    assert avg["b"]["c"] == pytest.approx(3.0)  # inf ignored
    assert avg["d"] == pytest.approx(5.0)  # nan ignored


def test_flatten_unflatten_roundtrip():
    d = {"x": {"y": {"z": 1}, "w": 2}, "v": 3}
    flat = flatten_nested_dict(d)
    assert flat == {("x", "y", "z"): 1, ("x", "w"): 2, ("v",): 3}
    assert unflatten_nested_dict(flat) == d


def test_catch_exception_returns_none():
    @catch_exception
    def boom():
        raise RuntimeError("x")

    assert boom() is None


def test_colorizers_quiet_on_degenerate_maps():
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        black = colorize_depth(np.ones((8, 8), np.float32), mask=np.zeros((8, 8), bool))
        assert (black == 0).all()
        flat = colorize_depth(np.full((8, 8), 2.0, np.float32))
        assert len(np.unique(flat.reshape(-1, 3), axis=0)) == 1 and flat.max() > 0
        allnan = colorize_error_map(np.full((4, 4), np.nan, np.float32))
        assert (allnan == 0).all()
