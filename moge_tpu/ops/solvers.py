"""Batched camera recovery solvers, fully on-device.

The reference recovers focal & z-shift from the predicted affine point map by
downsampling to 64x64, copying to host, and running per-image scipy
Levenberg-Marquardt (reference moge/utils/geometry_torch.py:115-170 and
moge/utils/geometry_numpy.py:79-112) — a device->host sync on *every*
inference call. Here the same 1-D robust least-squares problem

    min_s  sum_i w_i * | f(s) * xy_i / (z_i + s) - uv_i |^2,
    f(s) = sum_i w_i <proj_i, uv_i> / sum_i w_i |proj_i|^2   (closed form)

is solved with a fixed-iteration Levenberg-Marquardt loop in pure JAX,
vmapped over the batch, so it fuses into the jitted inference program and
never leaves the TPU. scipy's ftol=1e-3 / x0=0 behaviour is reproduced to
well within the reference's own convergence tolerance.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .geometry import normalized_view_plane_uv
from .resize import resize_2d


def _optimal_focal(proj: jax.Array, uv: jax.Array, w: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Closed-form focal for given projected xy/(z+s): f = <proj, uv>_w / |proj|^2_w."""
    num = jnp.sum(w[..., None] * proj * uv, axis=(-2, -1))
    den = jnp.sum(w[..., None] * jnp.square(proj), axis=(-2, -1))
    return num / jnp.maximum(den, eps)


def _lm_minimize_shift(
    residual_fn, s0: jax.Array, iters: int = 30, lam0: float = 1e-3
) -> jax.Array:
    """Scalar Levenberg-Marquardt: residual_fn(s) -> weighted residual vector."""

    def objective_and_step(s, lam):
        r, dr = jax.jvp(residual_fn, (s,), (jnp.ones_like(s),))
        F = jnp.sum(jnp.square(r))
        g = jnp.sum(r * dr)
        H = jnp.sum(jnp.square(dr))
        step = -g / (H * (1.0 + lam) + 1e-12)
        return F, step

    def body(_, carry):
        s, lam = carry
        F, step = objective_and_step(s, lam)
        s_new = s + step
        r_new = residual_fn(s_new)
        F_new = jnp.sum(jnp.square(r_new))
        accept = (F_new < F) & jnp.isfinite(F_new)
        s = jnp.where(accept, s_new, s)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-9), jnp.minimum(lam * 10.0, 1e8))
        return (s, lam)

    s, _ = jax.lax.fori_loop(0, iters, body, (s0, jnp.full_like(s0, lam0)))
    return s


def solve_optimal_focal_shift(
    uv: jax.Array, points: jax.Array, weight: Optional[jax.Array] = None, iters: int = 30
) -> Tuple[jax.Array, jax.Array]:
    """Solve min |f * xy/(z+s) - uv| over (s, f), f in closed form per iterate.

    ``uv``: (N, 2), ``points``: (N, 3), ``weight``: (N,) nonneg (mask weights).
    Returns (shift, focal) scalars. Mirrors reference geometry_numpy.py:79-96.
    """
    xy, z = points[..., :2], points[..., 2]
    w = jnp.ones_like(z) if weight is None else weight.astype(points.dtype)
    sw = jnp.sqrt(w)

    def residual(s):
        proj = xy / (z + s)[..., None]
        f = _optimal_focal(proj, uv, w)
        return (sw[..., None] * (f * proj - uv)).reshape(-1)

    shift = _lm_minimize_shift(residual, jnp.zeros((), dtype=points.dtype), iters=iters)
    proj = xy / (z + shift)[..., None]
    focal = _optimal_focal(proj, uv, w)
    return shift, focal


def solve_optimal_shift(
    uv: jax.Array, points: jax.Array, focal: jax.Array, weight: Optional[jax.Array] = None, iters: int = 30
) -> jax.Array:
    """Solve min |focal * xy/(z+s) - uv| over s (focal known).

    Mirrors reference geometry_numpy.py:99-112.
    """
    xy, z = points[..., :2], points[..., 2]
    w = jnp.ones_like(z) if weight is None else weight.astype(points.dtype)
    sw = jnp.sqrt(w)

    def residual(s):
        proj = xy / (z + s)[..., None]
        return (sw[..., None] * (focal * proj - uv)).reshape(-1)

    return _lm_minimize_shift(residual, jnp.zeros((), dtype=points.dtype), iters=iters)


@partial(jax.jit, static_argnames=("downsample_size", "iters"))
def recover_focal_shift(
    points: jax.Array,
    mask: Optional[jax.Array] = None,
    focal: Optional[jax.Array] = None,
    downsample_size: Tuple[int, int] = (64, 64),
    iters: int = 30,
) -> Tuple[jax.Array, jax.Array]:
    """Recover (focal, shift) from an affine-invariant point map, batched on device.

    ``points``: (..., H, W, 3); ``mask``: optional (..., H, W) bool;
    ``focal``: optional (...) known focal (then only shift is solved).
    Returns (focal, shift) of shape (...). Focal is relative to half the
    image diagonal (reference convention, geometry_torch.py:115-170).
    Degenerate inputs (<2 valid pixels) return (1, 0) like the reference.
    """
    shape = points.shape
    height, width = shape[-3], shape[-2]
    batch_shape = shape[:-3]

    pts = points.reshape((-1, height, width, 3)).astype(jnp.float32)
    uv = normalized_view_plane_uv(width, height, dtype=jnp.float32)

    # Legacy-nearest downsample (matches F.interpolate(mode='nearest')).
    pts_lr = resize_2d(pts, downsample_size, mode="nearest", channel_last=True)
    uv_lr = resize_2d(uv, downsample_size, mode="nearest", channel_last=True)
    if mask is None:
        w_lr = jnp.ones(pts_lr.shape[:-1], dtype=jnp.float32)
    else:
        m = mask.reshape((-1, height, width))
        w_lr = resize_2d(m.astype(jnp.float32), downsample_size, mode="nearest", channel_last=False)
        w_lr = (w_lr > 0).astype(jnp.float32)

    n_valid = jnp.sum(w_lr, axis=(-2, -1))
    # Keep the solve NaN-free for degenerate items: weight-0 points get z=1.
    safe_pts = jnp.where(w_lr[..., None] > 0, pts_lr, jnp.array([0.0, 0.0, 1.0]))

    flat_uv = jnp.broadcast_to(uv_lr.reshape(1, -1, 2), (pts_lr.shape[0], downsample_size[0] * downsample_size[1], 2))
    flat_pts = safe_pts.reshape(pts_lr.shape[0], -1, 3)
    flat_w = w_lr.reshape(pts_lr.shape[0], -1)

    if focal is None:
        shift, est_focal = jax.vmap(lambda u, p, w: solve_optimal_focal_shift(u, p, w, iters=iters))(
            flat_uv, flat_pts, flat_w
        )
    else:
        f = jnp.broadcast_to(jnp.asarray(focal, dtype=jnp.float32).reshape(-1), (pts_lr.shape[0],))
        shift = jax.vmap(lambda u, p, fi, w: solve_optimal_shift(u, p, fi, w, iters=iters))(
            flat_uv, flat_pts, f, flat_w
        )
        est_focal = f

    degenerate = n_valid < 2
    est_focal = jnp.where(degenerate, 1.0, est_focal)
    shift = jnp.where(degenerate, 0.0, shift)

    return est_focal.reshape(batch_shape), shift.reshape(batch_shape)
