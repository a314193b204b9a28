"""Panorama pipeline: icosahedral view split + gradient-domain depth merge.

Mirrors reference moge/utils/panorama.py: 20 icosahedron-vertex cameras with
90-deg FoV, equirectangular<->perspective resampling (host cv2.remap — a data
op), and multigrid-initialized log-distance merge solving the overdetermined
gradient+Poisson system with sparse LSMR (offline, host scipy).
"""

from __future__ import annotations

from typing import List, Tuple

import cv2
import numpy as np
from numpy import ndarray
from scipy.ndimage import convolve
from scipy.sparse import csr_array, vstack
from scipy.sparse.linalg import lsmr

from .utils.geometry_numpy import intrinsics_from_fov_numpy, uv_map_numpy


def create_icosahedron_vertices() -> np.ndarray:
    """12 unit icosahedron vertices (utils3d `create_icosahedron_mesh`)."""
    phi = (1 + 5 ** 0.5) / 2
    verts = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            verts += [(0, a, b), (a, b, 0), (b, 0, a)]
    verts = np.asarray(verts, np.float32)
    return verts / np.linalg.norm(verts, axis=-1, keepdims=True)


def extrinsics_look_at(eye, target, up) -> np.ndarray:
    """OpenCV-convention world->camera extrinsics, batched over targets."""
    eye = np.asarray(eye, np.float32)
    target = np.atleast_2d(np.asarray(target, np.float32))
    up = np.asarray(up, np.float32)
    z = target - eye
    z = z / np.linalg.norm(z, axis=-1, keepdims=True)
    x = np.cross(z, np.broadcast_to(up, z.shape))
    x = x / np.linalg.norm(x, axis=-1, keepdims=True)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=-2)  # rows: camera axes in world coords
    t = -(R @ eye.reshape(1, 3, 1) if eye.ndim == 1 else R @ eye[..., None])
    ext = np.concatenate([R, np.broadcast_to(t, (*R.shape[:-1], 1))], axis=-1)
    bottom = np.zeros((*ext.shape[:-2], 1, 4), np.float32)
    bottom[..., 0, 3] = 1
    return np.concatenate([ext, bottom], axis=-2).astype(np.float32)


def get_panorama_cameras() -> Tuple[np.ndarray, List[np.ndarray]]:
    """20 icosahedron-vertex cameras... (reference panorama.py:20-24).

    NOTE: the reference uses the 12 icosahedron *vertices* as view directions
    (`create_icosahedron_mesh` vertices), 90-deg FoV each.
    """
    vertices = create_icosahedron_vertices()
    intrinsics = intrinsics_from_fov_numpy(fov_x=np.deg2rad(90), fov_y=np.deg2rad(90))
    extrinsics = extrinsics_look_at([0, 0, 0], vertices, [0, 0, 1]).astype(np.float32)
    return extrinsics, [intrinsics] * len(vertices)


def spherical_uv_to_directions(uv: np.ndarray) -> np.ndarray:
    theta, phi = (1 - uv[..., 0]) * (2 * np.pi), uv[..., 1] * np.pi
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], axis=-1
    )


def directions_to_spherical_uv(directions: np.ndarray) -> np.ndarray:
    directions = directions / np.linalg.norm(directions, axis=-1, keepdims=True)
    u = 1 - np.arctan2(directions[..., 1], directions[..., 0]) / (2 * np.pi) % 1.0
    v = np.arccos(np.clip(directions[..., 2], -1, 1)) / np.pi
    return np.stack([u, v], axis=-1)


def uv_to_pixel(uv: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    h, w = hw[:2]
    return np.stack([uv[..., 0] * w - 0.5, uv[..., 1] * h - 0.5], axis=-1)


def _unproject(uv: np.ndarray, extrinsics: np.ndarray, intrinsics: np.ndarray) -> np.ndarray:
    """uv (H,W,2) at depth 1 -> world directions."""
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    cam = np.stack([x, y, np.ones_like(x)], axis=-1)
    R = extrinsics[:3, :3]
    return cam @ R  # R^T @ cam, batched


def _project(directions: np.ndarray, extrinsics: np.ndarray, intrinsics: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    R = extrinsics[:3, :3]
    cam = directions @ R.T
    z = cam[..., 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = cam[..., 0] / z * intrinsics[0, 0] + intrinsics[0, 2]
        v = cam[..., 1] / z * intrinsics[1, 1] + intrinsics[1, 2]
    return np.stack([u, v], axis=-1), z


def split_panorama_image(
    image: np.ndarray, extrinsics: np.ndarray, intrinsics: List[np.ndarray], resolution: int
) -> List[np.ndarray]:
    """Resample an equirectangular image into perspective views (reference :40-50).

    Unlike the reference, views straddling the u=0/1 seam interpolate across
    the horizontal wrap (the reference's bare cv2.remap reads a constant
    border there, darkening a one-pixel column in seam-crossing views).
    """
    height, width = image.shape[:2]
    wrapped = np.pad(image, ((0, 0), (1, 1)) + ((0, 0),) * (image.ndim - 2), mode="wrap")
    uv = uv_map_numpy(resolution, resolution)
    out = []
    for i in range(len(extrinsics)):
        directions = _unproject(uv, extrinsics[i], intrinsics[i])
        spherical_uv = directions_to_spherical_uv(directions)
        pixels = uv_to_pixel(spherical_uv, (height, width)).astype(np.float32)
        out.append(
            cv2.remap(wrapped, pixels[..., 0] + 1.0, pixels[..., 1],
                      interpolation=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE)
        )
    return out


def poisson_equation(width: int, height: int, wrap_x: bool = False, wrap_y: bool = False) -> csr_array:
    """5-point Laplacian rows (reference panorama.py:53-69)."""
    grid_index = np.arange(height * width).reshape(height, width)
    grid_index = np.pad(grid_index, ((0, 0), (1, 1)), mode="wrap" if wrap_x else "edge")
    grid_index = np.pad(grid_index, ((1, 1), (0, 0)), mode="wrap" if wrap_y else "edge")

    data = np.array([[-4, 1, 1, 1, 1]], dtype=np.float32).repeat(height * width, axis=0).reshape(-1)
    indices = np.stack([
        grid_index[1:-1, 1:-1],
        grid_index[:-2, 1:-1],
        grid_index[2:, 1:-1],
        grid_index[1:-1, :-2],
        grid_index[1:-1, 2:],
    ], axis=-1).reshape(-1)
    indptr = np.arange(0, height * width * 5 + 1, 5)
    return csr_array((data, indices, indptr), shape=(height * width, height * width))


def grad_equation(width: int, height: int, wrap_x: bool = False, wrap_y: bool = False) -> csr_array:
    """Finite-difference gradient rows (reference panorama.py:72-101)."""
    grid_index = np.arange(width * height).reshape(height, width)
    if wrap_x:
        grid_index = np.pad(grid_index, ((0, 0), (0, 1)), mode="wrap")
    if wrap_y:
        grid_index = np.pad(grid_index, ((0, 1), (0, 0)), mode="wrap")

    data = np.concatenate([
        np.stack([
            np.ones((grid_index.shape[0], grid_index.shape[1] - 1), np.float32).reshape(-1),
            -np.ones((grid_index.shape[0], grid_index.shape[1] - 1), np.float32).reshape(-1),
        ], axis=1).reshape(-1),
        np.stack([
            np.ones((grid_index.shape[0] - 1, grid_index.shape[1]), np.float32).reshape(-1),
            -np.ones((grid_index.shape[0] - 1, grid_index.shape[1]), np.float32).reshape(-1),
        ], axis=1).reshape(-1),
    ])
    indices = np.concatenate([
        np.stack([grid_index[:, :-1].reshape(-1), grid_index[:, 1:].reshape(-1)], axis=1).reshape(-1),
        np.stack([grid_index[:-1, :].reshape(-1), grid_index[1:, :].reshape(-1)], axis=1).reshape(-1),
    ])
    n_rows = grid_index.shape[0] * (grid_index.shape[1] - 1) + (grid_index.shape[0] - 1) * grid_index.shape[1]
    indptr = np.arange(0, n_rows * 2 + 1, 2)
    return csr_array((data, indices, indptr), shape=(n_rows, height * width))


def _solve_merge_cg(gx, gy, lap, mgx, mgy, ml, x0, maxiter: int = 300):
    """Jit-compiled conjugate-gradient solve of the merge normal equations.

    The lsmr system rows are (masked) x/y log-distance gradients plus (masked)
    5-point Laplacians on the equirectangular grid (wrap in x, edge-clamp in
    y). Instead of materializing the sparse matrix, CG runs on matrix-free
    stencil matvecs — jnp.roll for the x-wrap, concat-clamp for y — so the
    whole solve is one XLA program on device. The system's nullspace (global
    additive log constant = scale gauge) is never entered by CG, matching
    lsmr's stay-near-x0 behavior.
    """
    import jax
    import jax.numpy as jnp

    def Gx(u):
        return u - jnp.roll(u, -1, axis=1)

    def GxT(r):
        return r - jnp.roll(r, 1, axis=1)

    def Gy(u):
        return u[:-1, :] - u[1:, :]

    def GyT(r):
        z = jnp.zeros((1, r.shape[1]), r.dtype)
        return jnp.concatenate([r, z], 0) - jnp.concatenate([z, r], 0)

    def Lap(u):
        up = jnp.concatenate([u[:1], u[:-1]], 0)
        dn = jnp.concatenate([u[1:], u[-1:]], 0)
        return -4 * u + up + dn + jnp.roll(u, 1, axis=1) + jnp.roll(u, -1, axis=1)

    def LapT(r):
        up_t = jnp.concatenate([r[1:], jnp.zeros((1, r.shape[1]), r.dtype)], 0).at[0].add(r[0])
        dn_t = jnp.concatenate([jnp.zeros((1, r.shape[1]), r.dtype), r[:-1]], 0).at[-1].add(r[-1])
        return -4 * r + up_t + dn_t + jnp.roll(r, -1, axis=1) + jnp.roll(r, 1, axis=1)

    @jax.jit
    def solve(gx, gy, lap, mgx, mgy, ml, x0):
        def ata(u):
            return GxT(mgx * Gx(u)) + GyT(mgy * Gy(u)) + LapT(ml * Lap(u))

        atb = GxT(mgx * gx) + GyT(mgy * gy) + LapT(ml * lap)
        x, _ = jax.scipy.sparse.linalg.cg(ata, atb, x0=x0, maxiter=maxiter, tol=1e-7)
        return x

    f32 = jnp.float32
    return np.asarray(solve(
        jnp.asarray(gx, f32), jnp.asarray(gy, f32), jnp.asarray(lap, f32),
        jnp.asarray(mgx, f32), jnp.asarray(mgy, f32), jnp.asarray(ml, f32),
        jnp.asarray(x0, f32),
    ))


def merge_panorama_depth(
    width: int,
    height: int,
    distance_maps: List[np.ndarray],
    pred_masks: List[np.ndarray],
    extrinsics: List[np.ndarray],
    intrinsics: List[np.ndarray],
    solver: str = "lsmr",
) -> Tuple[np.ndarray, np.ndarray]:
    """Gradient-domain merge of per-view log distances (reference :105-190).

    ``solver``: "lsmr" = host scipy sparse LSMR (bit-comparable to the
    reference); "cg" = on-device jit CG on the normal equations (same system,
    matrix-free stencils; faster at large merge resolutions).
    """
    if max(width, height) > 256:
        panorama_depth_init, _ = merge_panorama_depth(
            width // 2, height // 2, distance_maps, pred_masks, extrinsics, intrinsics,
            solver=solver,
        )
        panorama_depth_init = cv2.resize(panorama_depth_init, (width, height), interpolation=cv2.INTER_LINEAR)
    else:
        panorama_depth_init = None

    uv = uv_map_numpy(height, width)
    spherical_directions = spherical_uv_to_directions(uv)

    grad_maps, grad_masks = [], []
    laplacian_maps, laplacian_masks = [], []
    panorama_pred_masks = []
    for i in range(len(distance_maps)):
        projected_uv, projected_depth = _project(spherical_directions, extrinsics[i], intrinsics[i])
        valid = (projected_depth > 0) & (projected_uv > 0).all(axis=-1) & (projected_uv < 1).all(axis=-1)

        pixels = uv_to_pixel(np.clip(projected_uv, 0, 1), distance_maps[i].shape).astype(np.float32)
        log_distance = np.log(np.maximum(distance_maps[i], 1e-12))
        pano_log = np.where(valid, cv2.remap(log_distance, pixels[..., 0], pixels[..., 1], cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE), 0)
        pano_mask = valid & (cv2.remap(pred_masks[i].astype(np.uint8), pixels[..., 0], pixels[..., 1], cv2.INTER_NEAREST, borderMode=cv2.BORDER_REPLICATE) > 0)

        padded = np.pad(pano_log, ((0, 0), (0, 1)), mode="wrap")
        grad_x, grad_y = padded[:, :-1] - padded[:, 1:], padded[:-1, :] - padded[1:, :]
        padded = np.pad(pano_mask, ((0, 0), (0, 1)), mode="wrap")
        mask_x, mask_y = padded[:, :-1] & padded[:, 1:], padded[:-1, :] & padded[1:, :]
        grad_maps.append((grad_x, grad_y))
        grad_masks.append((mask_x, mask_y))

        padded = np.pad(pano_log, ((1, 1), (0, 0)), mode="edge")
        padded = np.pad(padded, ((0, 0), (1, 1)), mode="wrap")
        laplacian = convolve(padded, np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32))[1:-1, 1:-1]
        padded = np.pad(pano_mask, ((1, 1), (0, 0)), mode="edge")
        padded = np.pad(padded, ((0, 0), (1, 1)), mode="wrap")
        lmask = convolve(padded.astype(np.uint8), np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.uint8))[1:-1, 1:-1] == 5
        laplacian_maps.append(laplacian)
        laplacian_masks.append(lmask)
        panorama_pred_masks.append(pano_mask)

    gx = np.stack([g[0] for g in grad_maps])
    gy = np.stack([g[1] for g in grad_maps])
    mx = np.stack([m[0] for m in grad_masks])
    my = np.stack([m[1] for m in grad_masks])
    gx = np.sum(gx * mx, axis=0) / np.clip(np.sum(mx, axis=0), 1e-3, None)
    gy = np.sum(gy * my, axis=0) / np.clip(np.sum(my, axis=0), 1e-3, None)

    lap = np.stack(laplacian_maps)
    lmasks = np.stack(laplacian_masks)
    lap = np.sum(lap * lmasks, axis=0) / np.clip(np.sum(lmasks, axis=0), 1e-3, None)

    grad_x_mask = np.any(mx, axis=0).reshape(-1)
    grad_y_mask = np.any(my, axis=0).reshape(-1)
    laplacian_mask = np.any(lmasks, axis=0).reshape(-1)

    if solver == "cg":
        x0 = np.log(panorama_depth_init) if panorama_depth_init is not None else np.zeros((height, width), np.float32)
        # The y-gradient rows were formed on the x-wrap-padded grid (width+1
        # columns, column `width` == column 0), so in the normal equations a
        # masked duplicate row is exactly a doubled weight on column 0.
        wy = grad_y_mask.reshape(height - 1, width + 1).astype(np.float32)
        wy_eff = wy[:, :width].copy()
        wy_eff[:, 0] += wy[:, width]
        x = _solve_merge_cg(
            gx, gy[:, :width], lap,
            grad_x_mask.reshape(height, width).astype(np.float32),
            wy_eff,
            laplacian_mask.reshape(height, width).astype(np.float32),
            x0,
        ).reshape(-1)
    else:
        grad_mask = np.concatenate([grad_x_mask, grad_y_mask])
        A = vstack([
            grad_equation(width, height, wrap_x=True, wrap_y=False)[grad_mask],
            poisson_equation(width, height, wrap_x=True, wrap_y=False)[laplacian_mask],
        ])
        b = np.concatenate([
            gx.reshape(-1)[grad_x_mask],
            gy.reshape(-1)[grad_y_mask],
            lap.reshape(-1)[laplacian_mask],
        ])
        x, *_ = lsmr(
            A, b, atol=1e-5, btol=1e-5,
            x0=np.log(panorama_depth_init).reshape(-1) if panorama_depth_init is not None else None,
            show=False,
        )
    panorama_depth = np.exp(x).reshape(height, width).astype(np.float32)
    panorama_mask = np.any(panorama_pred_masks, axis=0)
    return panorama_depth, panorama_mask
