"""Golden tests for moge_tpu.ops.geometry vs the torch reference."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_utils import add_reference_to_path

add_reference_to_path()

from moge.utils import geometry_torch as ref_geo  # noqa: E402
from moge.utils import geometry_numpy as ref_geo_np  # noqa: E402

from moge_tpu.ops import geometry as geo  # noqa: E402


@pytest.mark.parametrize("w,h,ar", [(64, 48, None), (37, 37, None), (100, 50, 1.7)])
def test_normalized_view_plane_uv(w, h, ar):
    ref = ref_geo.normalized_view_plane_uv(w, h, aspect_ratio=ar, dtype=torch.float32).numpy()
    got = np.asarray(geo.normalized_view_plane_uv(w, h, aspect_ratio=ar))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_focal_fov_roundtrip():
    f = np.linspace(0.3, 3.0, 10).astype(np.float32)
    ref_fov = ref_geo.focal_to_fov(torch.from_numpy(f)).numpy()
    got_fov = np.asarray(geo.focal_to_fov(jnp.asarray(f)))
    np.testing.assert_allclose(got_fov, ref_fov, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(geo.fov_to_focal(jnp.asarray(got_fov))), f, rtol=1e-5)


def test_point_map_to_depth_legacy():
    rng = np.random.default_rng(0)
    # Build a consistent point map: z positive, xy = uv * z / f
    h, w, f_true = 24, 32, 0.9
    uv = np.asarray(geo.normalized_view_plane_uv(w, h))
    z = (rng.uniform(1.0, 5.0, (2, h, w))).astype(np.float32)
    pts = np.concatenate([uv[None] * z[..., None] / f_true, z[..., None]], axis=-1).astype(np.float32)
    ref = ref_geo.point_map_to_depth_legacy(torch.from_numpy(pts))
    got = geo.point_map_to_depth_legacy(jnp.asarray(pts))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), r.numpy(), rtol=1e-3, atol=1e-4)


def test_depth_map_to_point_map_roundtrip():
    rng = np.random.default_rng(1)
    depth = rng.uniform(0.5, 4.0, (2, 16, 20)).astype(np.float32)
    intr = np.asarray(geo.intrinsics_from_focal_center(1.2, 1.5, 0.5, 0.5))
    intr = np.broadcast_to(intr, (2, 3, 3))
    pts = geo.depth_map_to_point_map(jnp.asarray(depth), jnp.asarray(intr))
    np.testing.assert_allclose(np.asarray(pts[..., 2]), depth, rtol=1e-6)
    uv, z = geo.project_cv(pts.reshape(2, -1, 3), jnp.asarray(intr))
    grid = np.asarray(geo.uv_map(16, 20)).reshape(-1, 2)
    np.testing.assert_allclose(np.asarray(uv), np.broadcast_to(grid, (2, 320, 2)), rtol=1e-5, atol=1e-6)


def test_weighted_means_match_reference():
    rng = np.random.default_rng(2)
    x = rng.uniform(0.1, 2.0, (3, 50)).astype(np.float32)
    w = (rng.uniform(0, 1, (3, 50)) > 0.3).astype(np.float32)
    for name in ["weighted_mean", "harmonic_mean", "geometric_mean"]:
        ref = getattr(ref_geo, name)(torch.from_numpy(x), torch.from_numpy(w), dim=-1).numpy()
        got = np.asarray(getattr(geo, name)(jnp.asarray(x), jnp.asarray(w), axis=-1))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6, err_msg=name)


def test_angle_diff_vec3():
    rng = np.random.default_rng(3)
    v1 = rng.standard_normal((10, 3)).astype(np.float32)
    v2 = rng.standard_normal((10, 3)).astype(np.float32)
    ref = ref_geo.angle_diff_vec3(torch.from_numpy(v1), torch.from_numpy(v2)).numpy()
    got = np.asarray(geo.angle_diff_vec3(jnp.asarray(v1), jnp.asarray(v2)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_threshold_depth_change():
    rng = np.random.default_rng(4)
    depth = rng.uniform(1, 5, (2, 12, 14)).astype(np.float32)
    mask = rng.uniform(0, 1, (2, 12, 14)) > 0.2
    for pooler in ["max", "min"]:
        ref = ref_geo.theshold_depth_change(torch.from_numpy(depth), torch.from_numpy(mask), pooler).numpy()
        got = np.asarray(geo.threshold_depth_change(jnp.asarray(depth), jnp.asarray(mask), pooler))
        np.testing.assert_array_equal(got, ref, err_msg=pooler)


def test_gaussian_blur_2d():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 1, 16, 18)).astype(np.float32)
    ref = ref_geo.gaussian_blur_2d(torch.from_numpy(x), 5, 1.2).numpy()
    got = np.asarray(geo.gaussian_blur_2d(jnp.asarray(x), 5, 1.2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_masked_nearest_resize_against_numpy_stub():
    rng = np.random.default_rng(6)
    pts = rng.standard_normal((30, 40, 3)).astype(np.float32)
    mask = rng.uniform(0, 1, (30, 40)) > 0.5
    ref_pts, ref_mask = ref_geo_np.utils3d.np.masked_nearest_resize(pts, mask=mask, size=(12, 16))
    got_pts, got_mask = geo.masked_nearest_resize(jnp.asarray(pts), mask=jnp.asarray(mask), size=(12, 16))
    np.testing.assert_array_equal(np.asarray(got_mask), ref_mask)
    np.testing.assert_allclose(np.asarray(got_pts)[ref_mask], ref_pts[ref_mask], rtol=1e-6)


def test_sliding_window_2d():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 10, 12)).astype(np.float32)
    ref = ref_geo.utils3d.pt.sliding_window_2d(torch.from_numpy(x), window_size=3, stride=1, dim=(-2, -1)).numpy()
    got = np.asarray(geo.sliding_window_2d(jnp.asarray(x), 3))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("filt", ["mean", "median"])
def test_dilate_with_mask(filt):
    rng = np.random.default_rng(8)
    x = rng.uniform(1, 5, (12, 14)).astype(np.float32)
    mask = rng.uniform(0, 1, (12, 14)) > 0.4
    ref_out, ref_mask = ref_geo.dilate_with_mask(
        torch.from_numpy(x), torch.from_numpy(mask), filter=filt, iterations=2
    )
    got_out, got_mask = geo.dilate_with_mask(jnp.asarray(x), jnp.asarray(mask), filter=filt, iterations=2)
    np.testing.assert_array_equal(np.asarray(got_mask), ref_mask.numpy())
    both = np.asarray(got_mask) & mask
    valid = np.asarray(got_mask)
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(got_out))[valid], np.nan_to_num(ref_out.numpy())[valid], rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_refine_depth_with_normal():
    rng = np.random.default_rng(9)
    h, w = 20, 24
    depth = rng.uniform(1, 4, (h, w)).astype(np.float32)
    normal = rng.standard_normal((h, w, 3)).astype(np.float32)
    normal[..., 2] -= 2.0  # face the camera
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    K = np.asarray(geo.intrinsics_from_focal_center(1.0, 1.2, 0.5, 0.5), np.float32)

    ref = ref_geo.refine_depth_with_normal(
        torch.from_numpy(depth.copy()), torch.from_numpy(normal), torch.from_numpy(K)
    ).numpy()
    got = np.asarray(geo.refine_depth_with_normal(jnp.asarray(depth), jnp.asarray(normal), jnp.asarray(K)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
