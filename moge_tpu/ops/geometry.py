"""Core camera/geometry ops (pure JAX, fully batched, jit-friendly).

Covers the numerical surface of the reference's moge/utils/geometry_torch.py
and the subset of the external `utils3d` package that MoGe actually uses
(reference SURVEY §2.8): uv maps, intrinsics/FoV conversions, depth<->point
unprojection (OpenCV convention: x right, y down, z forward, normalized
image coordinates in [0, 1]), masked nearest resize, edge masks.

Everything is shape-static and vmappable; no host transfers.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# UV grids
# ---------------------------------------------------------------------------

def normalized_view_plane_uv(
    width: int,
    height: int,
    aspect_ratio: Optional[float] = None,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """UV grid spanning +-(w/diag, h/diag) at pixel centers, shape (H, W, 2).

    Matches reference moge/utils/geometry_torch.py:40-52 exactly (linspace over
    pixel centers, 'xy' meshgrid indexing).
    """
    if aspect_ratio is None:
        aspect_ratio = width / height
    span_x = aspect_ratio / (1 + aspect_ratio ** 2) ** 0.5
    span_y = 1 / (1 + aspect_ratio ** 2) ** 0.5
    u = np.linspace(-span_x * (width - 1) / width, span_x * (width - 1) / width, width, dtype=np.float64)
    v = np.linspace(-span_y * (height - 1) / height, span_y * (height - 1) / height, height, dtype=np.float64)
    uu, vv = np.meshgrid(u, v, indexing="xy")
    return jnp.asarray(np.stack([uu, vv], axis=-1), dtype=dtype)


def uv_map(height: int, width: int, dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """Pixel-center UV in [0,1]^2, shape (H, W, 2). (utils3d `uv_map`.)"""
    u = (np.arange(width, dtype=np.float64) + 0.5) / width
    v = (np.arange(height, dtype=np.float64) + 0.5) / height
    uu, vv = np.meshgrid(u, v, indexing="xy")
    return jnp.asarray(np.stack([uu, vv], axis=-1), dtype=dtype)


# ---------------------------------------------------------------------------
# Intrinsics / FoV
# ---------------------------------------------------------------------------

def focal_to_fov(focal: jax.Array) -> jax.Array:
    return 2 * jnp.arctan(0.5 / focal)


def fov_to_focal(fov: jax.Array) -> jax.Array:
    return 0.5 / jnp.tan(fov / 2)


def intrinsics_from_focal_center(fx, fy, cx, cy) -> jax.Array:
    """Normalized pinhole intrinsics (..., 3, 3). (utils3d `intrinsics_from_focal_center`.)"""
    fx, fy, cx, cy = jnp.broadcast_arrays(
        jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(cx), jnp.asarray(cy)
    )
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    rows = [
        jnp.stack([fx, zeros, cx], axis=-1),
        jnp.stack([zeros, fy, cy], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def intrinsics_from_fov(fov_x=None, fov_y=None, cx=0.5, cy=0.5) -> jax.Array:
    if fov_x is not None and fov_y is not None:
        fx, fy = fov_to_focal(jnp.asarray(fov_x)), fov_to_focal(jnp.asarray(fov_y))
    elif fov_x is not None:
        fx = fy = fov_to_focal(jnp.asarray(fov_x))
    else:
        fx = fy = fov_to_focal(jnp.asarray(fov_y))
    return intrinsics_from_focal_center(fx, fy, cx, cy)


def intrinsics_to_fov(intrinsics: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(fov_x, fov_y) in radians from normalized intrinsics (..., 3, 3)."""
    return focal_to_fov(intrinsics[..., 0, 0]), focal_to_fov(intrinsics[..., 1, 1])


# ---------------------------------------------------------------------------
# Projection / unprojection (OpenCV convention, normalized image coords)
# ---------------------------------------------------------------------------

def depth_map_to_point_map(depth: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Unproject (..., H, W) depth with normalized intrinsics (..., 3, 3) -> (..., H, W, 3).

    Matches utils3d `depth_map_to_point_map` / `unproject_cv` with pixel-center
    uv in [0,1]: x = (u - cx)/fx * z, y = (v - cy)/fy * z, z = depth.
    """
    height, width = depth.shape[-2:]
    uv = uv_map(height, width, dtype=depth.dtype)  # (H, W, 2)
    fx = intrinsics[..., 0, 0][..., None, None]
    fy = intrinsics[..., 1, 1][..., None, None]
    cx = intrinsics[..., 0, 2][..., None, None]
    cy = intrinsics[..., 1, 2][..., None, None]
    x = (uv[..., 0] - cx) / fx * depth
    y = (uv[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def unproject_cv(uv: jax.Array, depth: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Unproject normalized uv (..., N, 2) + depth (..., N) -> points (..., N, 3)."""
    fx, fy = intrinsics[..., 0, 0][..., None], intrinsics[..., 1, 1][..., None]
    cx, cy = intrinsics[..., 0, 2][..., None], intrinsics[..., 1, 2][..., None]
    x = (uv[..., 0] - cx) / fx * depth
    y = (uv[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def project_cv(points: jax.Array, intrinsics: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Project points (..., N, 3) -> (uv (..., N, 2), depth (..., N))."""
    z = points[..., 2]
    fx, fy = intrinsics[..., 0, 0][..., None], intrinsics[..., 1, 1][..., None]
    cx, cy = intrinsics[..., 0, 2][..., None], intrinsics[..., 1, 2][..., None]
    u = points[..., 0] / z * fx + cx
    v = points[..., 1] / z * fy + cy
    return jnp.stack([u, v], axis=-1), z


def point_map_to_depth_legacy(points: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Closed-form linear LS recovery (reference geometry_torch.py:90-106)."""
    height, width = points.shape[-3], points.shape[-2]
    diagonal = (height ** 2 + width ** 2) ** 0.5
    uv = normalized_view_plane_uv(width, height, dtype=points.dtype)  # (H, W, 2)

    b = (uv * points[..., 2:]).reshape(*points.shape[:-3], -1)
    uv_b = jnp.broadcast_to(uv, points[..., :2].shape)
    A = jnp.stack([points[..., :2], -uv_b], axis=-1).reshape(*points.shape[:-3], -1, 2)

    hp = jax.lax.Precision.HIGHEST  # fp32 accumulations (TPU default truncates)
    M = jnp.matmul(jnp.swapaxes(A, -2, -1), A, precision=hp)
    eye = jnp.eye(2, dtype=points.dtype)
    Atb = jnp.matmul(jnp.swapaxes(A, -2, -1), b[..., None], precision=hp)
    solution = jnp.matmul(jnp.linalg.inv(M + 1e-6 * eye), Atb, precision=hp)[..., 0]
    focal, shift = solution[..., 0], solution[..., 1]

    depth = points[..., 2] + shift[..., None, None]
    fov_x = jnp.arctan(width / diagonal / focal) * 2
    fov_y = jnp.arctan(height / diagonal / focal) * 2
    return depth, fov_x, fov_y, shift


# ---------------------------------------------------------------------------
# Weighted means (reference geometry_torch.py:16-37)
# ---------------------------------------------------------------------------

def weighted_mean(x, w=None, axis=None, keepdims=False, eps: float = 1e-7):
    if w is None:
        return jnp.mean(x, axis=axis, keepdims=keepdims)
    w = w.astype(x.dtype)
    return jnp.mean(x * w, axis=axis, keepdims=keepdims) / (
        jnp.mean(w, axis=axis, keepdims=keepdims) + eps
    )


def harmonic_mean(x, w=None, axis=None, keepdims=False, eps: float = 1e-7):
    if w is None:
        return 1.0 / jnp.mean(1.0 / (x + eps), axis=axis, keepdims=keepdims)
    return 1.0 / (weighted_mean(1.0 / (x + eps), w, axis=axis, keepdims=keepdims, eps=eps) + eps)


def geometric_mean(x, w=None, axis=None, keepdims=False, eps: float = 1e-7):
    if w is None:
        return jnp.exp(jnp.mean(jnp.log(x + eps), axis=axis, keepdims=keepdims))
    return jnp.exp(weighted_mean(jnp.log(x + eps), w, axis=axis, keepdims=keepdims, eps=eps))


def safe_norm(x: jax.Array, axis: int = -1, keepdims: bool = False, eps: float = 1e-20) -> jax.Array:
    """L2 norm with a finite gradient at 0 (torch's norm has subgradient 0
    there; jnp.linalg.norm produces NaN — this matters for loss gradients)."""
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims) + eps)


def angle_diff_vec3(v1: jax.Array, v2: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Angle between 3-vectors via atan2 (reference geometry_torch.py:72-73)."""
    cross = jnp.cross(v1, v2)
    return jnp.arctan2(safe_norm(cross, axis=-1) + eps, jnp.sum(v1 * v2, axis=-1))


def angle_between(v1: jax.Array, v2: jax.Array, eps: float = 1e-12) -> jax.Array:
    """utils3d `angle_between` equivalent (stable atan2 formulation)."""
    return angle_diff_vec3(v1, v2, eps=eps)


# ---------------------------------------------------------------------------
# Masked nearest resize
# ---------------------------------------------------------------------------

def masked_nearest_resize(
    *images: jax.Array,
    mask: jax.Array,
    size: Tuple[int, int],
    return_index: bool = False,
) -> Tuple[jax.Array, ...]:
    """Nearest-resize that snaps each output pixel to the nearest *valid* input pixel.

    Functional equivalent of utils3d `masked_nearest_resize` as used by the
    reference losses/metrics: each target cell searches a window of source
    pixels around its nearest-neighbour location and picks the closest valid
    one (by pixel distance); the output mask marks cells whose window had any
    valid pixel.

    ``images``: one or more (..., H, W, C) or (..., H, W) arrays sharing mask.
    ``mask``: (..., H, W) boolean.
    Returns resized images + resized mask, all with spatial dims ``size``.
    """
    height, width = mask.shape[-2], mask.shape[-1]
    out_h, out_w = size
    filter_h = math.ceil(height / out_h) if out_h < height else 1
    filter_w = math.ceil(width / out_w) if out_w < width else 1
    # Window of candidate source offsets (static).
    filter_size = (filter_h + (1 - filter_h % 2), filter_w + (1 - filter_w % 2))
    pad_h, pad_w = filter_size[0] // 2, filter_size[1] // 2

    # Nearest source center per target pixel (torch/utils3d uv-center convention).
    ti = (np.arange(out_h) + 0.5) * (height / out_h) - 0.5
    tj = (np.arange(out_w) + 0.5) * (width / out_w) - 0.5
    ci = np.clip(np.round(ti).astype(np.int32), 0, height - 1)
    cj = np.clip(np.round(tj).astype(np.int32), 0, width - 1)

    offs_i = np.arange(-pad_h, pad_h + 1)
    offs_j = np.arange(-pad_w, pad_w + 1)
    # Candidate absolute indices: (out, k)
    cand_i = ci[:, None] + offs_i[None, :]           # (out_h, kh)
    cand_j = cj[:, None] + offs_j[None, :]           # (out_w, kw)
    valid_i = (cand_i >= 0) & (cand_i < height)
    valid_j = (cand_j >= 0) & (cand_j < width)
    cand_i = np.clip(cand_i, 0, height - 1)
    cand_j = np.clip(cand_j, 0, width - 1)

    # Distance from target (float) position to each candidate.
    dist_i = (cand_i - ti[:, None]) ** 2             # (out_h, kh)
    dist_j = (cand_j - tj[:, None]) ** 2             # (out_w, kw)

    cand_i_j = jnp.asarray(cand_i)
    cand_j_j = jnp.asarray(cand_j)

    # Gather mask at all candidates: (..., out_h, kh, out_w, kw)
    m = jnp.take(mask, cand_i_j.reshape(-1), axis=-2).reshape(*mask.shape[:-2], out_h, len(offs_i), width)
    m = jnp.take(m, cand_j_j.reshape(-1), axis=-1).reshape(*mask.shape[:-2], out_h, len(offs_i), out_w, len(offs_j))
    inb = jnp.asarray(valid_i)[:, :, None, None] & jnp.asarray(valid_j)[None, None, :, :]
    m = m & inb

    dist = jnp.asarray(dist_i)[:, :, None, None] + jnp.asarray(dist_j)[None, None, :, :]
    dist = jnp.where(m, dist, jnp.inf)               # (..., out_h, kh, out_w, kw)
    dist_flat = jnp.moveaxis(dist, -3, -2)           # (..., out_h, out_w, kh, kw)
    dist_flat = dist_flat.reshape(*dist_flat.shape[:-2], -1)
    best = jnp.argmin(dist_flat, axis=-1)            # (..., out_h, out_w)
    out_mask = jnp.isfinite(jnp.min(dist_flat, axis=-1))

    kh, kw = len(offs_i), len(offs_j)
    best_ki, best_kj = best // kw, best % kw                # (..., out_h, out_w)
    batch_shape = mask.shape[:-2]
    cand_i_full = jnp.broadcast_to(cand_i_j[:, None, :], (*batch_shape, out_h, out_w, kh))
    cand_j_full = jnp.broadcast_to(cand_j_j[None, :, :], (*batch_shape, out_h, out_w, kw))
    src_i = jnp.take_along_axis(cand_i_full, best_ki[..., None].astype(jnp.int32), axis=-1)[..., 0]
    src_j = jnp.take_along_axis(cand_j_full, best_kj[..., None].astype(jnp.int32), axis=-1)[..., 0]

    flat_idx = (src_i * width + src_j).astype(jnp.int32)    # (..., out_h, out_w)

    outputs = []
    for img in images:
        has_channels = img.ndim == mask.ndim + 1
        spatial_flat = img.reshape(*img.shape[: mask.ndim - 2], height * width, -1 if has_channels else 1)
        if not has_channels:
            spatial_flat = img.reshape(*img.shape[: mask.ndim - 2], height * width)
            gathered = jnp.take_along_axis(spatial_flat, flat_idx.reshape(*flat_idx.shape[: mask.ndim - 2], -1), axis=-1)
            outputs.append(gathered.reshape(*img.shape[: mask.ndim - 2], out_h, out_w))
        else:
            c = img.shape[-1]
            spatial_flat = img.reshape(*img.shape[: mask.ndim - 2], height * width, c)
            idx = flat_idx.reshape(*flat_idx.shape[: mask.ndim - 2], -1)[..., None]
            gathered = jnp.take_along_axis(spatial_flat, jnp.broadcast_to(idx, (*idx.shape[:-1], c)), axis=-2)
            outputs.append(gathered.reshape(*img.shape[: mask.ndim - 2], out_h, out_w, c))
    if return_index:
        # index maps usable as arr[..., src_i, src_j] on full-res arrays
        return (*outputs, out_mask, (src_i, src_j))
    return (*outputs, out_mask)


# ---------------------------------------------------------------------------
# Depth-edge / pooling masks (reference geometry_torch.py:173-203)
# ---------------------------------------------------------------------------

def _pool2d(x: jax.Array, kernel_size: int, mode: str) -> jax.Array:
    """Same-padded max/min pool over the last two axes."""
    pad = kernel_size // 2
    init = -jnp.inf if mode == "max" else jnp.inf
    op = jax.lax.max if mode == "max" else jax.lax.min
    window = (1,) * (x.ndim - 2) + (kernel_size, kernel_size)
    strides = (1,) * x.ndim
    padding = [(0, 0)] * (x.ndim - 2) + [(pad, pad), (pad, pad)]
    return jax.lax.reduce_window(x, init, op, window, strides, padding)


def threshold_depth_change(
    depth: jax.Array, mask: jax.Array, pooler: str, rtol: float = 0.2, kernel_size: int = 3
) -> jax.Array:
    """Edge mask via local max/min pooling ratio (reference geometry_torch.py:173-186)."""
    if pooler == "max":
        pooled = _pool2d(jnp.where(mask, depth, -jnp.inf), kernel_size, "max")
        return pooled > depth * (1 + rtol)
    elif pooler == "min":
        pooled = _pool2d(jnp.where(mask, depth, jnp.inf), kernel_size, "min")
        return pooled < depth * (1 - rtol)
    raise ValueError(f"Unsupported pooler: {pooler}")


def depth_map_edge(depth: jax.Array, rtol: float = 0.04, kernel_size: int = 3, mask: Optional[jax.Array] = None) -> jax.Array:
    """Occlusion-edge mask: pixels whose local depth ratio max/min exceeds 1+rtol.

    utils3d `depth_map_edge` equivalent (used by mesh export edge removal,
    reference moge/scripts/infer.py:126).
    """
    if mask is None:
        mask = jnp.isfinite(depth)
    d = jnp.where(mask, depth, jnp.nan)
    dmax = _pool2d(jnp.where(mask, d, -jnp.inf), kernel_size, "max")
    dmin = _pool2d(jnp.where(mask, d, jnp.inf), kernel_size, "min")
    edge = (dmax / jnp.maximum(dmin, 1e-12)) > (1 + rtol)
    return edge & mask


def normal_map_edge(normals: jax.Array, tol_deg: float = 15.0, kernel_size: int = 3, mask: Optional[jax.Array] = None) -> jax.Array:
    """Edge where local normal direction varies beyond tolerance (utils3d equivalent)."""
    if mask is None:
        mask = jnp.isfinite(normals).all(axis=-1)
    n = jnp.where(mask[..., None], normals, 0.0)
    # cos angle to each neighbor via min-pool of dot products with center
    pad = kernel_size // 2
    dots = jnp.full(mask.shape, jnp.inf, dtype=normals.dtype)
    for di in range(-pad, pad + 1):
        for dj in range(-pad, pad + 1):
            if di == 0 and dj == 0:
                continue
            shifted = jnp.roll(n, (di, dj), axis=(-3, -2))
            smask = jnp.roll(mask, (di, dj), axis=(-2, -1))
            d = jnp.sum(n * shifted, axis=-1)
            d = jnp.where(smask, d, jnp.inf)
            dots = jnp.minimum(dots, d)
    edge = dots < math.cos(math.radians(tol_deg))
    return edge & mask


# ---------------------------------------------------------------------------
# Normals from points / depth
# ---------------------------------------------------------------------------

def point_map_to_normal_map(points: jax.Array, mask: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel normals from a point map via cross products of the 4 adjacent quads.

    Returns (normal (..., H, W, 3) unit, valid mask). OpenCV convention: normals
    point toward the camera (negative z hemisphere for front-facing surfaces).
    """
    if mask is None:
        mask = jnp.isfinite(points).all(axis=-1)
    pts = jnp.where(mask[..., None], points, 0.0)
    # forward differences padded at borders
    up = jnp.pad(pts[..., :-1, :, :] - pts[..., 1:, :, :], [(0, 0)] * (pts.ndim - 3) + [(1, 0), (0, 0), (0, 0)])
    down = -jnp.pad(up[..., 1:, :, :], [(0, 0)] * (pts.ndim - 3) + [(0, 1), (0, 0), (0, 0)])
    left = jnp.pad(pts[..., :, :-1, :] - pts[..., :, 1:, :], [(0, 0)] * (pts.ndim - 3) + [(0, 0), (1, 0), (0, 0)])
    right = -jnp.pad(left[..., :, 1:, :], [(0, 0)] * (pts.ndim - 3) + [(0, 0), (0, 1), (0, 0)])

    m = mask
    m_up = jnp.pad(m[..., 1:, :], [(0, 0)] * (m.ndim - 2) + [(1, 0), (0, 0)])
    m_down = jnp.pad(m[..., :-1, :], [(0, 0)] * (m.ndim - 2) + [(0, 1), (0, 0)])
    m_left = jnp.pad(m[..., :, 1:], [(0, 0)] * (m.ndim - 2) + [(0, 0), (1, 0)])
    m_right = jnp.pad(m[..., :, :-1], [(0, 0)] * (m.ndim - 2) + [(0, 0), (0, 1)])

    normal = jnp.zeros_like(pts)
    count = jnp.zeros(mask.shape, dtype=points.dtype)
    for (a, b, va, vb) in [
        (up, left, m_up, m_left),
        (left, down, m_left, m_down),
        (down, right, m_down, m_right),
        (right, up, m_right, m_up),
    ]:
        v = (va & vb & m).astype(points.dtype)
        n = jnp.cross(a, b)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        normal = normal + v[..., None] * n
        count = count + v
    valid = count > 0
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
    return jnp.where(valid[..., None], normal, 0.0), valid


def depth_map_to_normal_map(depth: jax.Array, intrinsics: jax.Array, mask: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
    points = depth_map_to_point_map(depth, intrinsics)
    return point_map_to_normal_map(points, mask=mask)


def sliding_window_2d(x: jax.Array, window_size: int, stride: int = 1) -> jax.Array:
    """(..., H, W) -> (..., H', W', k, k) sliding windows (utils3d equivalent).

    Built from static shifts (gather-free, fuses well under jit).
    """
    k = window_size
    h, w = x.shape[-2], x.shape[-1]
    rows = []
    for i in range(k):
        cols = []
        for j in range(k):
            cols.append(
                jax.lax.slice_in_dim(
                    jax.lax.slice_in_dim(x, i, i + h - k + 1, stride=stride, axis=x.ndim - 2),
                    j, j + w - k + 1, stride=stride, axis=x.ndim - 1,
                )
            )
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def dilate_with_mask(
    input: jax.Array, mask: jax.Array, filter: str = "mean", iterations: int = 1
) -> Tuple[jax.Array, jax.Array]:
    """Masked morphological dilation: fill invalid pixels from valid 4-neighbors
    by min/max/mean/median (reference geometry_torch.py:189-203). The mask
    grows by the cross kernel each iteration."""
    kernel = jnp.asarray(
        [[False, True, False], [True, True, True], [False, True, False]], dtype=bool
    )
    for _ in range(iterations):
        pad = [(0, 0)] * (input.ndim - 2) + [(1, 1), (1, 1)]
        input_window = sliding_window_2d(jnp.pad(input, pad, constant_values=0), 3)
        mask_window = kernel & sliding_window_2d(jnp.pad(mask, pad, constant_values=False), 3)
        if filter == "min":
            filled = jnp.min(jnp.where(mask_window, input_window, jnp.inf), axis=(-2, -1))
        elif filter == "max":
            filled = jnp.max(jnp.where(mask_window, input_window, -jnp.inf), axis=(-2, -1))
        elif filter == "mean":
            s = jnp.sum(jnp.where(mask_window, input_window, 0.0), axis=(-2, -1))
            c = jnp.sum(mask_window, axis=(-2, -1))
            filled = s / jnp.maximum(c, 1)
        elif filter == "median":
            # torch nanmedian picks the LOWER middle element (not the mean of two)
            vals = jnp.where(mask_window, input_window, jnp.inf).reshape(*input.shape, 9)
            vals = jnp.sort(vals, axis=-1)
            count = jnp.sum(mask_window, axis=(-2, -1))
            idx = jnp.maximum((count - 1) // 2, 0)
            filled = jnp.take_along_axis(vals, idx[..., None], axis=-1)[..., 0]
        else:
            raise ValueError(f"Unsupported filter: {filter}")
        input = jnp.where(mask, input, filled)
        mask = jnp.any(mask_window, axis=(-2, -1))
    return input, mask


def refine_depth_with_normal(
    depth: jax.Array,
    normal: jax.Array,
    intrinsics: jax.Array,
    iterations: int = 10,
    damp: float = 1e-3,
    eps: float = 1e-12,
    kernel_size: int = 5,
) -> jax.Array:
    """Normal-guided log-depth Jacobi refinement (reference geometry_torch.py:206-233).

    Sharpens a depth map so its finite-difference gradients agree with the
    predicted normal map; runs as a fixed-iteration fori_loop.
    """
    height, width = depth.shape[-2:]
    radius = kernel_size // 2
    dtype = depth.dtype

    du = np.linspace(-radius / width, radius / width, kernel_size)
    dv = np.linspace(-radius / height, radius / height, kernel_size)
    duu, dvv = np.meshgrid(du, dv, indexing="xy")
    duv = jnp.asarray(np.stack([duu, dvv], axis=-1), dtype=dtype)  # (k, k, 2)

    log_depth = jnp.log(jnp.maximum(depth, eps))
    log_depth_diff = sliding_window_2d(log_depth, kernel_size) - log_depth[
        ..., radius:-radius, radius:-radius, None, None
    ]
    duv_norm = jnp.maximum(safe_norm(duv, axis=-1), eps)  # (k, k)
    weight = jnp.exp(-jnp.square(log_depth_diff / duv_norm / 10))
    tot_weight = jnp.maximum(weight.sum(axis=(-2, -1)), eps)

    uv = uv_map(height, width, dtype=dtype)
    K_inv = jnp.linalg.inv(intrinsics)

    # per-pixel log-depth gradient implied by the normal (reference :222-223)
    n_xy = normal[..., None, :2]  # (..., H, W, 1, 2)
    A = K_inv[..., None, None, :2, :2]
    num = -(n_xy @ A)[..., 0, :]  # (..., H, W, 2)
    den = (normal[..., None, 2:] + n_xy @ (A @ uv[..., :, None] + K_inv[..., None, None, :2, 2:]))[..., 0, 0]
    grad = num / den[..., None]

    grad_windows = jnp.stack(
        [sliding_window_2d(grad[..., 0], kernel_size), sliding_window_2d(grad[..., 1], kernel_size)],
        axis=-3,
    )  # (..., H', W', 2, k, k)
    grad_center = grad[..., radius:-radius, radius:-radius, :, None, None]
    duv_t = jnp.moveaxis(duv, -1, 0)  # (2, k, k)
    laplacian = (weight * ((grad_windows + grad_center) * (duv_t / 2)).sum(axis=-3)).sum(axis=(-2, -1))
    laplacian = jnp.clip(laplacian, -0.1, 0.1)

    inner = (slice(None),) * (depth.ndim - 2) + (slice(radius, -radius), slice(radius, -radius))

    def body(_, log_refine):
        neighborhood = (weight * sliding_window_2d(log_refine, kernel_size)).sum(axis=(-2, -1))
        update = 0.1 * log_refine[inner] + 0.9 * (
            damp * log_depth[inner] - laplacian + neighborhood
        ) / (tot_weight + damp)
        return log_refine.at[inner].set(update)

    log_depth_refine = jax.lax.fori_loop(0, iterations, body, log_depth)
    return jnp.exp(log_depth_refine)


def gaussian_blur_2d(x: jax.Array, kernel_size: int, sigma: float) -> jax.Array:
    """Replicate-padded gaussian blur over (..., H, W) (reference geometry_torch.py:55-61)."""
    half = kernel_size // 2
    coords = np.arange(-kernel_size // 2 + 1, kernel_size // 2 + 1, dtype=np.float64)
    k1 = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    k1 = k1 / k1.sum()
    k2 = jnp.asarray(np.outer(k1, k1), dtype=x.dtype)
    pad = [(0, 0)] * (x.ndim - 2) + [(half, half), (half, half)]
    xp = jnp.pad(x, pad, mode="edge")
    # depthwise conv via reduce: small kernel, do it as explicit sum of shifts
    out = jnp.zeros_like(x)
    for i in range(kernel_size):
        for j in range(kernel_size):
            out = out + k2[i, j] * jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(xp, i, i + x.shape[-2], axis=x.ndim - 2),
                j, j + x.shape[-1], axis=x.ndim - 1,
            )
    return out
