"""Helpers to import the read-only torch reference (at /root/reference) for
golden-value testing.

The reference depends on the external `utils3d` package (not installed in this
image); a minimal stub with the handful of functions the reference actually
calls is injected into sys.modules. Stub semantics mirror moge_tpu's own
implementations so that reference-vs-moge_tpu comparisons exercise the JAX
translation of shared math.
"""

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _np_masked_nearest_resize(*images, mask, size):
    """Window-search nearest-valid resize (numpy), matching moge_tpu semantics."""
    import math

    height, width = mask.shape[-2:]
    out_h, out_w = size
    filter_h = math.ceil(height / out_h) if out_h < height else 1
    filter_w = math.ceil(width / out_w) if out_w < width else 1
    filter_size = (filter_h + (1 - filter_h % 2), filter_w + (1 - filter_w % 2))
    pad_h, pad_w = filter_size[0] // 2, filter_size[1] // 2

    ti = (np.arange(out_h) + 0.5) * (height / out_h) - 0.5
    tj = (np.arange(out_w) + 0.5) * (width / out_w) - 0.5
    ci = np.clip(np.round(ti).astype(np.int64), 0, height - 1)
    cj = np.clip(np.round(tj).astype(np.int64), 0, width - 1)

    offs_i = np.arange(-pad_h, pad_h + 1)
    offs_j = np.arange(-pad_w, pad_w + 1)
    cand_i = ci[:, None] + offs_i[None, :]
    cand_j = cj[:, None] + offs_j[None, :]
    valid_i = (cand_i >= 0) & (cand_i < height)
    valid_j = (cand_j >= 0) & (cand_j < width)
    cand_i = np.clip(cand_i, 0, height - 1)
    cand_j = np.clip(cand_j, 0, width - 1)
    dist_i = (cand_i - ti[:, None]) ** 2
    dist_j = (cand_j - tj[:, None]) ** 2

    batch_shape = mask.shape[:-2]
    m = mask[..., cand_i[:, :, None, None], cand_j[None, None, :, :]]
    m = m & (valid_i[:, :, None, None] & valid_j[None, None, :, :])
    dist = np.where(m, dist_i[:, :, None, None] + dist_j[None, None, :, :], np.inf)
    dist = np.moveaxis(dist, -3, -2).reshape(*batch_shape, out_h, out_w, -1)
    best = dist.argmin(axis=-1)
    out_mask = np.isfinite(dist.min(axis=-1))
    kw = len(offs_j)
    best_ki, best_kj = best // kw, best % kw
    src_i = cand_i[np.arange(out_h)[:, None], best_ki]
    src_j = cand_j[np.arange(out_w)[None, :], best_kj]

    outputs = []
    for img in images:
        if img.ndim == mask.ndim:
            out = img[..., src_i, src_j] if mask.ndim == 2 else np.take_along_axis(
                img.reshape(*batch_shape, -1), (src_i * width + src_j).reshape(*batch_shape, -1), axis=-1
            ).reshape(*batch_shape, out_h, out_w)
        else:
            c = img.shape[-1]
            flat = img.reshape(*batch_shape, height * width, c)
            idx = (src_i * width + src_j).reshape(*batch_shape, -1)
            out = np.take_along_axis(flat, idx[..., None].repeat(c, axis=-1), axis=-2)
            out = out.reshape(*batch_shape, out_h, out_w, c)
        outputs.append(out)
    return (*outputs, out_mask)


def _np_masked_nearest_index(mask, size):
    """(src_i, src_j) index maps for a 2D mask — computed here in numpy (NOT
    routed through moge_tpu, so reference-vs-repo comparisons stay
    non-circular; see tests/test_oracles.py for the brute-force oracle both
    sides are checked against)."""
    i_grid = np.broadcast_to(np.arange(mask.shape[-2])[:, None], mask.shape[-2:])
    j_grid = np.broadcast_to(np.arange(mask.shape[-1])[None, :], mask.shape[-2:])
    src_i, src_j, _ = _np_masked_nearest_resize(i_grid, j_grid, mask=mask, size=size)
    return src_i.astype(np.int64), src_j.astype(np.int64)


def install_utils3d_stub():
    if "utils3d" in sys.modules:
        return sys.modules["utils3d"]
    import torch

    mod = types.ModuleType("utils3d")

    def pt_intrinsics_from_focal_center(fx, fy, cx, cy):
        fx, fy, cx, cy = torch.broadcast_tensors(
            torch.as_tensor(fx), torch.as_tensor(fy), torch.as_tensor(cx), torch.as_tensor(cy)
        )
        zeros, ones = torch.zeros_like(fx), torch.ones_like(fx)
        return torch.stack([
            torch.stack([fx, zeros, cx], dim=-1),
            torch.stack([zeros, fy, cy], dim=-1),
            torch.stack([zeros, zeros, ones], dim=-1),
        ], dim=-2)

    def pt_depth_map_to_point_map(depth, intrinsics=None):
        height, width = depth.shape[-2:]
        u = (torch.arange(width, dtype=depth.dtype) + 0.5) / width
        v = (torch.arange(height, dtype=depth.dtype) + 0.5) / height
        uu, vv = torch.meshgrid(u, v, indexing="xy")
        fx = intrinsics[..., 0, 0][..., None, None]
        fy = intrinsics[..., 1, 1][..., None, None]
        cx = intrinsics[..., 0, 2][..., None, None]
        cy = intrinsics[..., 1, 2][..., None, None]
        x = (uu - cx) / fx * depth
        y = (vv - cy) / fy * depth
        return torch.stack([x, y, depth], dim=-1)

    def pt_masked_nearest_resize(*images, mask, size, return_index=False):
        np_images = [img.numpy() for img in images]
        results = _np_masked_nearest_resize(*np_images, mask=mask.numpy(), size=size)
        out = tuple(torch.from_numpy(np.ascontiguousarray(r)) for r in results)
        if return_index:
            idx = _np_masked_nearest_index(mask.numpy(), size)
            return (*out, tuple(torch.from_numpy(i) for i in idx))
        return out

    def pt_sliding_window(x, window_size, stride=1, dim=(-2, -1)):
        # windows over `dim`, window dims appended at the end (utils3d semantics)
        from numpy.lib.stride_tricks import sliding_window_view

        assert stride == 1
        axes = tuple(d % x.ndim for d in dim)
        k = window_size if isinstance(window_size, tuple) else (window_size,) * len(axes)
        return torch.from_numpy(np.ascontiguousarray(sliding_window_view(x.numpy(), k, axis=axes)))

    def pt_sliding_window_2d(x, window_size, stride=1, dim=(-2, -1)):
        return pt_sliding_window(x, window_size, stride, dim)

    def pt_uv_map(size, device=None, dtype=None):
        h, w = size if isinstance(size, (tuple, list)) else (size, size)
        u = (torch.arange(w, dtype=dtype or torch.float32) + 0.5) / w
        v = (torch.arange(h, dtype=dtype or torch.float32) + 0.5) / h
        uu, vv = torch.meshgrid(u, v, indexing="xy")
        return torch.stack([uu, vv], dim=-1)

    def pt_angle_between(v1, v2, eps: float = 1e-12):
        cross = torch.cross(v1, v2, dim=-1)
        return torch.atan2(cross.norm(dim=-1) + eps, (v1 * v2).sum(dim=-1))

    mod.pt = types.SimpleNamespace(
        intrinsics_from_focal_center=pt_intrinsics_from_focal_center,
        depth_map_to_point_map=pt_depth_map_to_point_map,
        masked_nearest_resize=pt_masked_nearest_resize,
        angle_between=pt_angle_between,
        sliding_window=pt_sliding_window,
        sliding_window_2d=pt_sliding_window_2d,
        uv_map=pt_uv_map,
    )
    mod.np = types.SimpleNamespace(
        masked_nearest_resize=_np_masked_nearest_resize,
    )
    sys.modules["utils3d"] = mod
    return mod


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    install_utils3d_stub()
