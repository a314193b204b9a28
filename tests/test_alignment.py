"""Golden tests: JAX alignment solvers vs the reference torch implementations."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_utils import add_reference_to_path

add_reference_to_path()

from moge.utils import alignment as ref_align  # noqa: E402

from moge_tpu.ops import alignment as jal  # noqa: E402


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_align_untruncated(seed):
    rng = np.random.default_rng(seed)
    x, y = _rand(rng, 4, 50) + 2.0, _rand(rng, 4, 50) * 3 + 1.0
    w = np.abs(_rand(rng, 4, 50)) * (rng.uniform(0, 1, (4, 50)) > 0.2)
    w = w.astype(np.float32)

    ra, rl, ri = ref_align.align(torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(w))
    ga, gl, gi = jal.align(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))

    np.testing.assert_allclose(np.asarray(ga), ra.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gl), rl.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(gi), ri.numpy())


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("trunc", [0.5, 1.0])
def test_align_truncated(seed, trunc):
    rng = np.random.default_rng(seed + 10)
    x = _rand(rng, 3, 40) + 2.0
    y = x * rng.uniform(0.5, 2.0, (3, 1)).astype(np.float32) + _rand(rng, 3, 40) * 0.3
    w = np.abs(_rand(rng, 3, 40)).astype(np.float32)

    ra, rl, ri = ref_align.align(torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(w), trunc=trunc)
    ga, gl, gi = jal.align(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), trunc=trunc)

    np.testing.assert_allclose(np.asarray(gl), rl.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), ra.numpy(), rtol=1e-5, atol=1e-6)


def test_align_truncated_negative_x():
    rng = np.random.default_rng(42)
    x = _rand(rng, 2, 30)  # mixed signs
    y = x * 1.7 + _rand(rng, 2, 30) * 0.2
    w = np.abs(_rand(rng, 2, 30)).astype(np.float32)
    ra, rl, _ = ref_align.align(torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(w), trunc=0.8)
    ga, gl, _ = jal.align(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), trunc=0.8)
    np.testing.assert_allclose(np.asarray(gl), rl.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), ra.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("trunc", [None, 1.0])
def test_align_points_scale_z_shift(trunc):
    rng = np.random.default_rng(3)
    n = 64
    src = _rand(rng, 2, n, 3) + np.array([0, 0, 3.0], np.float32)
    scale_true = np.array([1.7, 0.6], np.float32)
    shift_true = np.array([0.4, -0.2], np.float32)
    tgt = src * scale_true[:, None, None] + np.stack(
        [np.zeros(2), np.zeros(2), shift_true], -1
    ).astype(np.float32)[:, None, :]
    tgt += _rand(rng, 2, n, 3) * 0.02
    w = np.abs(_rand(rng, 2, n)).astype(np.float32) * (rng.uniform(0, 1, (2, n)) > 0.1)
    w = w.astype(np.float32)

    rs, rsh = ref_align.align_points_scale_z_shift(
        torch.from_numpy(src), torch.from_numpy(tgt), torch.from_numpy(w), trunc=trunc
    )
    gs, gsh = jal.align_points_scale_z_shift(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w), trunc=trunc)

    np.testing.assert_allclose(np.asarray(gs), rs.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gsh), rsh.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("trunc", [None, 1.0])
def test_align_points_scale_xyz_shift(trunc):
    rng = np.random.default_rng(4)
    n = 48
    src = _rand(rng, 2, n, 3) + np.array([0, 0, 2.0], np.float32)
    tgt = src * 1.3 + np.array([0.1, -0.3, 0.5], np.float32) + _rand(rng, 2, n, 3) * 0.02
    w = np.abs(_rand(rng, 2, n)).astype(np.float32) * (rng.uniform(0, 1, (2, n)) > 0.1)
    w = w.astype(np.float32)

    rs, rsh = ref_align.align_points_scale_xyz_shift(
        torch.from_numpy(src), torch.from_numpy(tgt), torch.from_numpy(w), trunc=trunc
    )
    gs, gsh = jal.align_points_scale_xyz_shift(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w), trunc=trunc)

    np.testing.assert_allclose(np.asarray(gs), rs.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gsh), rsh.numpy(), rtol=1e-4, atol=1e-4)


def test_align_depth_affine():
    rng = np.random.default_rng(5)
    n = 80
    src = (np.abs(_rand(rng, 2, n)) + 0.5).astype(np.float32)
    tgt = src * 2.1 + 0.7 + _rand(rng, 2, n) * 0.05
    w = np.abs(_rand(rng, 2, n)).astype(np.float32) * (rng.uniform(0, 1, (2, n)) > 0.15)
    w = w.astype(np.float32)

    rs, rsh = ref_align.align_depth_affine(
        torch.from_numpy(src), torch.from_numpy(tgt), torch.from_numpy(w), trunc=None
    )
    gs, gsh = jal.align_depth_affine(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w), trunc=None)
    np.testing.assert_allclose(np.asarray(gs), rs.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gsh), rsh.numpy(), rtol=1e-4, atol=1e-4)


def test_align_z_and_xyz_shift():
    rng = np.random.default_rng(6)
    n = 60
    src = _rand(rng, 2, n, 3)
    tgt = src + np.array([0.2, -0.1, 0.9], np.float32) + _rand(rng, 2, n, 3) * 0.03
    w = np.abs(_rand(rng, 2, n)).astype(np.float32)

    rz = ref_align.align_points_z_shift(torch.from_numpy(src), torch.from_numpy(tgt), torch.from_numpy(w))
    gz = jal.align_points_z_shift(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gz), rz.numpy(), rtol=1e-4, atol=1e-5)

    rxyz = ref_align.align_points_xyz_shift(torch.from_numpy(src), torch.from_numpy(tgt), torch.from_numpy(w))
    gxyz = jal.align_points_xyz_shift(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gxyz), rxyz.numpy(), rtol=1e-4, atol=1e-5)


def test_align_affine_lstsq():
    rng = np.random.default_rng(7)
    x = _rand(rng, 3, 40)
    y = x * 1.4 - 0.3 + _rand(rng, 3, 40) * 0.01
    w = np.abs(_rand(rng, 3, 40)).astype(np.float32)
    ra, rb = ref_align.align_affine_lstsq(torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(w))
    ga, gb = jal.align_affine_lstsq(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(ga), ra.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), rb.numpy(), rtol=1e-3, atol=1e-4)
