"""Independent oracles for the utils3d-stubbed functions (VERDICT weak #4).

The golden tests import the torch reference with a builder-written `utils3d`
stub (tests/ref_utils.py). For functions whose stub semantics were written to
mirror moge_tpu, reference-vs-repo comparisons would be circular — so this
module certifies BOTH the stub and moge_tpu against:

  1. a brute-force per-pixel loop oracle written from the documented
     semantics (structurally unrelated to either vectorized implementation),
  2. hand-computed literal expectations on tiny inputs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ref_utils import _np_masked_nearest_index, _np_masked_nearest_resize

from moge_tpu.ops.geometry import masked_nearest_resize


def brute_force_masked_nearest(img, mask, size):
    """Per-output-pixel exhaustive search, plain Python loops.

    Semantics: each output cell maps to float source coords
    t = (o + 0.5) * (in/out) - 0.5; candidates are the window of source pixels
    around round(t) (window = ceil(in/out) rounded up to odd, or 1 when
    upsizing); the closest VALID candidate by squared pixel distance wins
    (ties: first in row-major window order); output mask marks cells with any
    valid candidate.
    """
    import math

    h, w = mask.shape
    out_h, out_w = size
    fh = math.ceil(h / out_h) if out_h < h else 1
    fw = math.ceil(w / out_w) if out_w < w else 1
    fh, fw = fh + (1 - fh % 2), fw + (1 - fw % 2)
    ph, pw = fh // 2, fw // 2

    out = np.zeros((out_h, out_w) + img.shape[2:], img.dtype)
    out_mask = np.zeros((out_h, out_w), bool)
    src_idx = np.zeros((out_h, out_w, 2), np.int64)
    for oi in range(out_h):
        for oj in range(out_w):
            ti = (oi + 0.5) * (h / out_h) - 0.5
            tj = (oj + 0.5) * (w / out_w) - 0.5
            ci = min(max(int(round(ti)), 0), h - 1)
            cj = min(max(int(round(tj)), 0), w - 1)
            best, best_d = None, np.inf
            for di in range(-ph, ph + 1):
                for dj in range(-pw, pw + 1):
                    si, sj = ci + di, cj + dj
                    if not (0 <= si < h and 0 <= sj < w) or not mask[si, sj]:
                        continue
                    d = (si - ti) ** 2 + (sj - tj) ** 2
                    if d < best_d - 1e-12:
                        best, best_d = (si, sj), d
            if best is not None:
                out[oi, oj] = img[best]
                out_mask[oi, oj] = True
                src_idx[oi, oj] = best
    return out, out_mask, src_idx


def test_hand_computed_5x5_case():
    """Literal 5x5 -> 2x2: downsample window is 5(ceil 5/2=3 -> odd 3? no:
    ceil(5/2)=3, odd already) around centers t=(0.75, 3.25)."""
    mask = np.array([
        [0, 0, 0, 0, 0],
        [0, 1, 0, 0, 0],
        [0, 0, 0, 0, 1],
        [0, 0, 0, 0, 0],
        [1, 0, 0, 1, 0],
    ], bool)
    img = np.arange(25, dtype=np.float64).reshape(5, 5)
    # Hand computation: out 2x2, t-coords {0.75, 3.25} each axis, centers
    # round to {1, 3}, window 3x3.
    #  (0,0): candidates rows 0-2 cols 0-2, valid = (1,1): value 6.
    #  (0,1): rows 0-2 cols 2-4, valid = (2,4): value 14.
    #  (1,0): rows 2-4 cols 0-2, valid = (4,0): value 20.
    #  (1,1): rows 2-4 cols 2-4, valid = {(2,4) d=(2-3.25)^2+(4-3.25)^2=2.125,
    #          (4,3) d=(4-3.25)^2+(3-3.25)^2=0.625} -> (4,3): value 23.
    expected = np.array([[6.0, 14.0], [20.0, 23.0]])

    got, got_mask = _np_masked_nearest_resize(img, mask=mask, size=(2, 2))
    np.testing.assert_array_equal(got, expected)
    assert got_mask.all()

    jout, jmask = masked_nearest_resize(jnp.asarray(img), mask=jnp.asarray(mask), size=(2, 2))
    np.testing.assert_array_equal(np.asarray(jout), expected)

    bout, bmask, _ = brute_force_masked_nearest(img, mask, (2, 2))
    np.testing.assert_array_equal(bout, expected)


def test_hand_computed_all_invalid_region():
    """A fully-invalid window must yield out_mask=False there."""
    mask = np.zeros((6, 6), bool)
    mask[0, 0] = True  # only the top-left corner is valid
    img = np.ones((6, 6))
    got, got_mask = _np_masked_nearest_resize(img, mask=mask, size=(2, 2))
    assert got_mask[0, 0] and not got_mask[0, 1] and not got_mask[1, 0] and not got_mask[1, 1]
    jout, jmask = masked_nearest_resize(jnp.asarray(img), mask=jnp.asarray(mask), size=(2, 2))
    np.testing.assert_array_equal(np.asarray(jmask), got_mask)


@pytest.mark.parametrize("shape,size", [
    ((13, 17), (5, 5)),
    ((8, 8), (3, 7)),
    ((9, 5), (16, 12)),   # upsizing
    ((32, 24), (6, 6)),
])
def test_brute_force_agreement(shape, size):
    """Both the numpy stub and the jax op must match the loop oracle on random
    masks — values, masks, AND chosen source indices."""
    rng = np.random.default_rng(hash(shape + size) % 2**32)
    mask = rng.uniform(0, 1, shape) > 0.6
    # float32 so the jax op (x64 disabled) gathers bit-identical values
    img = rng.normal(0, 1, shape + (3,)).astype(np.float32)

    ref_img, ref_mask, ref_idx = brute_force_masked_nearest(img, mask, size)

    np_img, np_mask = _np_masked_nearest_resize(img, mask=mask, size=size)
    np.testing.assert_array_equal(np_mask, ref_mask)
    np.testing.assert_array_equal(np.where(ref_mask[..., None], np_img, 0),
                                  np.where(ref_mask[..., None], ref_img, 0))

    j_img, j_mask = masked_nearest_resize(jnp.asarray(img), mask=jnp.asarray(mask), size=size)
    np.testing.assert_array_equal(np.asarray(j_mask), ref_mask)
    np.testing.assert_array_equal(
        np.where(ref_mask[..., None], np.asarray(j_img), 0),
        np.where(ref_mask[..., None], ref_img, 0))

    src_i, src_j = _np_masked_nearest_index(mask, size)
    np.testing.assert_array_equal(np.where(ref_mask, src_i, 0), np.where(ref_mask, ref_idx[..., 0], 0))
    np.testing.assert_array_equal(np.where(ref_mask, src_j, 0), np.where(ref_mask, ref_idx[..., 1], 0))


def test_stub_uv_map_literal():
    """uv_map: pixel-center UV in [0,1] — literal 2x4 expectation."""
    from ref_utils import install_utils3d_stub

    u3d = install_utils3d_stub()
    uv = u3d.pt.uv_map((2, 4)).numpy()
    np.testing.assert_allclose(uv[..., 0], np.broadcast_to(np.array([1, 3, 5, 7]) / 8.0, (2, 4)))
    np.testing.assert_allclose(uv[..., 1], np.broadcast_to((np.array([1, 3]) / 4.0)[:, None], (2, 4)))


def test_stub_depth_to_points_literal():
    """depth_map_to_point_map: unproject with K=[[2,0,.5],[0,4,.5]] at the
    center pixel of a 1x1 depth=3 map -> uv=(0.5,0.5) -> x=y=0, z=3; and an
    off-center hand case."""
    import torch

    from ref_utils import install_utils3d_stub

    u3d = install_utils3d_stub()
    K = torch.tensor([[2.0, 0, 0.5], [0, 4.0, 0.5], [0, 0, 1.0]])
    pts = u3d.pt.depth_map_to_point_map(torch.full((1, 1), 3.0), intrinsics=K).numpy()
    np.testing.assert_allclose(pts[0, 0], [0.0, 0.0, 3.0])

    # 1x2 map: u = {0.25, 0.75}; x = (u-0.5)/2*depth
    pts = u3d.pt.depth_map_to_point_map(torch.full((1, 2), 2.0), intrinsics=K).numpy()
    np.testing.assert_allclose(pts[0, :, 0], [(0.25 - 0.5) / 2 * 2, (0.75 - 0.5) / 2 * 2])
    np.testing.assert_allclose(pts[0, :, 1], [0.0, 0.0], atol=1e-7)


def test_stub_angle_between_literal():
    import math

    import torch

    from ref_utils import install_utils3d_stub

    u3d = install_utils3d_stub()
    a = torch.tensor([1.0, 0.0, 0.0])
    b = torch.tensor([1.0, 1.0, 0.0])
    assert abs(float(u3d.pt.angle_between(a, b)) - math.pi / 4) < 1e-6
    assert abs(float(u3d.pt.angle_between(a, -a)) - math.pi) < 1e-5


def test_stub_sliding_window_literal():
    import torch

    from ref_utils import install_utils3d_stub

    u3d = install_utils3d_stub()
    x = torch.arange(16.0).reshape(4, 4)
    win = u3d.pt.sliding_window_2d(x, (2, 2), 1, dim=(-2, -1)).numpy()
    assert win.shape == (3, 3, 2, 2)
    np.testing.assert_array_equal(win[0, 0], [[0, 1], [4, 5]])
    np.testing.assert_array_equal(win[2, 1], [[9, 10], [13, 14]])
