"""Torch-exact image resampling as MXU-friendly matrix multiplies.

The reference model (microsoft/MoGe) resizes with ``torch.nn.functional.interpolate``
in four distinct flavours that all matter numerically (see reference
moge/model/modules.py:121, moge/model/v1.py:275,279,291, moge/model/v2.py:170,
moge/model/dinov2/models/vision_transformer.py:212, moge/utils/geometry_torch.py:141):

  * bilinear, align_corners=False, antialias True/False
  * bicubic  (A = -0.75), align_corners=False, antialias True/False
  * bicubic with a user-provided ``scale_factor`` (the DINOv2 pos-embed
    "interpolate_offset" kludge) where torch samples with ``1/scale_factor``
    rather than ``in/out``
  * nearest (legacy rounding: ``src = floor(dst * in/out)``)

Instead of translating gather-based CPU/CUDA kernels, each 1-D resampling is
expressed as a dense (out, in) weight matrix computed once on the host in
float64 and cached; the 2-D resize is then two matmuls that XLA maps straight
onto the TPU MXU:  ``out = W_h @ img @ W_w^T``.

Weight construction reproduces ATen's sampling rules bit-for-bit in float64:
  - align_corners=False source index: ``src = scale * (dst + 0.5) - 0.5`` with
    ``scale = 1/scale_factor`` if a scale_factor was given, else ``in/out``.
  - linear path clamps src to >= 0; cubic path does not (it clamps indices).
  - antialias path follows the PIL-style separable kernel with support
    scaling and weight normalisation.
"""

from __future__ import annotations

import functools
from typing import Literal, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Mode = Literal["nearest", "bilinear", "bicubic"]

_CUBIC_A = -0.75


def _cubic_weight(x: np.ndarray, a: float = _CUBIC_A) -> np.ndarray:
    x = np.abs(x)
    w = np.where(
        x < 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )
    return w


def _linear_weight(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.where(x < 1.0, 1.0 - x, 0.0)


def _compute_scale(in_size: int, out_size: int, scale_factor: Optional[float]) -> float:
    # ATen area_pixel_compute_scale (align_corners=False): user scale wins.
    if scale_factor is not None and scale_factor > 0:
        return 1.0 / scale_factor
    return in_size / out_size


@functools.lru_cache(maxsize=None)
def _bilinear_taps(in_size: int, out_size: int, scale_factor: Optional[float]):
    """Per-output (i0, i1, lam) for non-antialiased bilinear — the same ATen
    sampling math as resize_matrix's bilinear branch (src computed in fp32,
    clamped at 0, indices clamped to the input range)."""
    scale = _compute_scale(in_size, out_size, scale_factor)
    dst = np.arange(out_size, dtype=np.float64)
    src = (np.float32(scale) * (dst.astype(np.float32) + np.float32(0.5)) - np.float32(0.5)).astype(np.float64)
    src = np.maximum(src, 0.0)
    x0 = np.floor(src).astype(np.int64)
    lam = np.clip(src - x0, 0.0, 1.0)
    x0 = np.clip(x0, 0, in_size - 1)
    x1 = np.minimum(x0 + 1, in_size - 1)
    return x0.astype(np.int32), x1.astype(np.int32), lam.astype(np.float32)


@functools.lru_cache(maxsize=None)
def resize_matrix(
    in_size: int,
    out_size: int,
    mode: Mode = "bilinear",
    antialias: bool = False,
    scale_factor: Optional[float] = None,
) -> np.ndarray:
    """(out_size, in_size) float32 resampling matrix matching torch F.interpolate."""
    if mode == "nearest":
        scale = _compute_scale(in_size, out_size, scale_factor)
        idx = np.minimum(np.floor(np.arange(out_size) * scale).astype(np.int64), in_size - 1)
        mat = np.zeros((out_size, in_size), dtype=np.float64)
        mat[np.arange(out_size), idx] = 1.0
        return mat.astype(np.float32)

    scale = _compute_scale(in_size, out_size, scale_factor)
    dst = np.arange(out_size, dtype=np.float64)
    mat = np.zeros((out_size, in_size), dtype=np.float64)

    if antialias:
        # PIL-style separable antialiasing (torch _upsample_*2d_aa).
        interp_size = 2 if mode == "bilinear" else 4
        # torch's antialiased bicubic follows PIL and uses A=-0.5 (the
        # non-antialiased kernel uses A=-0.75).
        filt = _linear_weight if mode == "bilinear" else functools.partial(_cubic_weight, a=-0.5)
        support = (interp_size / 2) * scale if scale >= 1.0 else (interp_size / 2)
        invscale = 1.0 / scale if scale >= 1.0 else 1.0
        center = scale * (dst + 0.5)
        xmin = np.maximum(center - support + 0.5, 0.0).astype(np.int64)
        xmax = np.minimum(center + support + 0.5, float(in_size)).astype(np.int64)
        for i in range(out_size):
            j = np.arange(xmin[i], xmax[i])
            w = filt((j + 0.5 - center[i]) * invscale)
            total = w.sum()
            if total != 0.0:
                w = w / total
            mat[i, j] = w
        return mat.astype(np.float32)

    # torch's non-antialiased CPU/CUDA kernels compute source indices in the
    # input's scalar type (fp32 here); emulate that rounding for bit-closeness.
    src = (np.float32(scale) * (dst.astype(np.float32) + np.float32(0.5)) - np.float32(0.5)).astype(np.float64)
    if mode == "bilinear":
        src = np.maximum(src, 0.0)  # linear path clamps source index
        x0 = np.floor(src).astype(np.int64)
        lam = np.clip(src - x0, 0.0, 1.0)
        x0 = np.clip(x0, 0, in_size - 1)
        x1 = np.minimum(x0 + 1, in_size - 1)
        for i in range(out_size):
            mat[i, x0[i]] += 1.0 - lam[i]
            mat[i, x1[i]] += lam[i]
    elif mode == "bicubic":
        x0 = np.floor(src).astype(np.int64)
        t = src - x0
        for k, off in enumerate((-1, 0, 1, 2)):
            w = _cubic_weight(off - t)
            j = np.clip(x0 + off, 0, in_size - 1)
            for i in range(out_size):
                mat[i, j[i]] += w[i]
    else:
        raise ValueError(f"Unsupported mode: {mode}")
    return mat.astype(np.float32)


def resize_2d(
    x: jax.Array,
    size: Tuple[int, int],
    mode: Mode = "bilinear",
    antialias: bool = False,
    scale_factor: Optional[Tuple[float, float]] = None,
    channel_last: bool = True,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Resize the two spatial dims of ``x``.

    ``x``: (..., H, W, C) if channel_last else (..., H, W).
    Computation runs in the dtype of ``x`` (use float32 inputs to match the
    reference's fp32 post-processing; bf16 works for in-network resizes).
    """
    if channel_last:
        h_axis, w_axis = x.ndim - 3, x.ndim - 2
    else:
        h_axis, w_axis = x.ndim - 2, x.ndim - 1
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = size
    sf_h, sf_w = (scale_factor if scale_factor is not None else (None, None))

    if (in_h, in_w) == (out_h, out_w) and scale_factor is None:
        return x

    dtype = x.dtype
    if mode == "bilinear" and not antialias:
        # Non-antialiased bilinear has exactly two taps per output index: a
        # gather + lerp computes the identical two-term expression as the
        # dense (out, in) matmul but without the in_size-long dot of zeros
        # (~40x less arithmetic; the lerp runs in fp32 regardless of input
        # dtype, so this path is also never LESS exact than the matmul).
        def axis_lerp(x, in_size, out_size, sf, axis):
            i0, i1, lam = _bilinear_taps(in_size, out_size, sf)
            a = jnp.take(x, jnp.asarray(i0), axis=axis)
            bv = jnp.take(x, jnp.asarray(i1), axis=axis)
            shape = [1] * x.ndim
            shape[axis] = out_size
            lam = jnp.asarray(lam, jnp.float32).reshape(shape)
            return (a.astype(jnp.float32) * (1.0 - lam) + bv.astype(jnp.float32) * lam).astype(dtype)

        if in_h != out_h or sf_h is not None:
            x = axis_lerp(x, in_h, out_h, sf_h, h_axis)
        if in_w != out_w or sf_w is not None:
            x = axis_lerp(x, in_w, out_w, sf_w, w_axis)
        return x

    if mode == "nearest":
        # Nearest is a gather — cheaper than a matmul and exact in any dtype.
        scale_h = _compute_scale(in_h, out_h, sf_h)
        scale_w = _compute_scale(in_w, out_w, sf_w)
        idx_h = np.minimum(np.floor(np.arange(out_h) * scale_h).astype(np.int32), in_h - 1)
        idx_w = np.minimum(np.floor(np.arange(out_w) * scale_w).astype(np.int32), in_w - 1)
        x = jnp.take(x, jnp.asarray(idx_h), axis=h_axis)
        x = jnp.take(x, jnp.asarray(idx_w), axis=w_axis)
        return x

    wh = jnp.asarray(resize_matrix(in_h, out_h, mode, antialias, sf_h), dtype=dtype)
    ww = jnp.asarray(resize_matrix(in_w, out_w, mode, antialias, sf_w), dtype=dtype)
    x = jnp.moveaxis(x, (h_axis, w_axis), (x.ndim - 2, x.ndim - 1))  # (..., H, W)
    x = jnp.einsum("oh,...hw->...ow", wh, x, precision=precision)
    x = jnp.einsum("pw,...ow->...op", ww, x, precision=precision)
    x = jnp.moveaxis(x, (x.ndim - 2, x.ndim - 1), (h_axis, w_axis))
    return x


def resize_image(
    image: jax.Array,
    size: Tuple[int, int],
    mode: Mode = "bilinear",
    antialias: bool = False,
) -> jax.Array:
    """Resize (..., H, W, C) image (NHWC convention used throughout moge_tpu)."""
    return resize_2d(image, size, mode=mode, antialias=antialias, channel_last=True)
