"""Golden tests: moge_tpu.ops.resize vs torch.nn.functional.interpolate.

The reference model's numerics hinge on four interpolate flavours
(encoder input resize, v1 input resize, pos-embed interpolation, output
resize, solver nearest-downsample) — each is matched here bitwise-close.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from moge_tpu.ops.resize import resize_2d


def _run_torch(x_nchw, size=None, mode="bilinear", antialias=False, scale_factor=None):
    kwargs = {}
    if mode != "nearest":
        kwargs["align_corners"] = False
        kwargs["antialias"] = antialias
    if scale_factor is not None:
        return F.interpolate(torch.from_numpy(x_nchw), scale_factor=scale_factor, mode=mode, **kwargs).numpy()
    return F.interpolate(torch.from_numpy(x_nchw), size, mode=mode, **kwargs).numpy()


def _run_jax(x_nchw, size, mode="bilinear", antialias=False, scale_factor=None):
    x = jnp.asarray(np.moveaxis(x_nchw, 1, -1))  # NHWC
    y = resize_2d(x, size, mode=mode, antialias=antialias, scale_factor=scale_factor, channel_last=True)
    return np.moveaxis(np.asarray(y), -1, 1)


SIZES = [((37, 37), (25, 40)), ((64, 48), (128, 96)), ((100, 70), (64, 64)), ((17, 31), (17, 31)), ((224, 168), (37, 28))]


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("antialias", [False, True])
@pytest.mark.parametrize("in_size,out_size", SIZES)
def test_resize_matches_torch(mode, antialias, in_size, out_size):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, *in_size)).astype(np.float32)
    ref = _run_torch(x, out_size, mode=mode, antialias=antialias)
    got = _run_jax(x, out_size, mode=mode, antialias=antialias)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [((64, 48), (32, 24)), ((50, 70), (13, 17)), ((64, 64), (64, 64))])
def test_nearest_matches_torch(in_size, out_size):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, *in_size)).astype(np.float32)
    ref = _run_torch(x, out_size, mode="nearest")
    got = _run_jax(x, out_size, mode="nearest")
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("grid,target", [(37, (30, 41)), (37, (35, 35)), (37, (52, 26))])
def test_pos_embed_scale_factor_mode(grid, target):
    """DINOv2 pos-embed interpolation: bicubic with scale_factor=(h0+0.1)/M kludge
    (reference dinov2/models/vision_transformer.py:202-217)."""
    rng = np.random.default_rng(2)
    h0, w0 = target
    x = rng.standard_normal((1, 8, grid, grid)).astype(np.float32)
    sy, sx = float(h0 + 0.1) / grid, float(w0 + 0.1) / grid
    ref = _run_torch(x, mode="bicubic", scale_factor=(sy, sx))
    assert ref.shape[-2:] == (h0, w0)
    got = _run_jax(x, (h0, w0), mode="bicubic", scale_factor=(sy, sx))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_antialias_upscale_equals_torch():
    # antialias=True with upscaling (encoder path can upscale small images)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, 20, 30)).astype(np.float32)
    ref = _run_torch(x, (41, 59), mode="bilinear", antialias=True)
    got = _run_jax(x, (41, 59), mode="bilinear", antialias=True)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
