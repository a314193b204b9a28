"""MoGe training losses, pure JAX (fixed shapes, vmap/jit-friendly).

Mirrors reference moge/train/losses.py: affine-invariant global/local point
losses supervised through the exact L1 alignment solvers, quad-normal and
edge direction losses, mask/metric-scale/normal-map losses. Differences are
purely mechanical (TPU-first):

  * data-dependent sets (torch.where anchor lists, nonempty-patch filters,
    multinomial over ragged valid pixels) become fixed-size masked forms;
  * every loss returns (per-batch loss, misc dict of jnp scalars) — the
    reference's .item() host syncs become device scalars aggregated by the
    train loop.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.alignment import align_points_scale_xyz_shift, align_points_scale_z_shift
from ..ops.geometry import angle_diff_vec3, harmonic_mean, masked_nearest_resize, weighted_mean


def _smooth(err: jax.Array, beta: float = 0.0) -> jax.Array:
    if beta == 0:
        return err
    return jnp.where(err < beta, 0.5 * jnp.square(err) / beta, err - 0.5 * beta)


def affine_invariant_global_loss(
    pred_points: jax.Array,
    gt_points: jax.Array,
    align_resolution: int = 64,
    beta: float = 0.0,
    trunc: float = 1.0,
    sparsity_aware: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array], jax.Array]:
    """Reference losses.py:30-69. Returns (loss (B,), misc, detached scale (B,))."""
    mask = jnp.isfinite(gt_points).all(axis=-1)
    gt_points = jnp.where(mask[..., None], gt_points, 1.0)

    pred_lr, gt_lr, lr_mask = masked_nearest_resize(
        pred_points, gt_points, mask=mask, size=(align_resolution, align_resolution)
    )
    b = pred_lr.shape[0]
    w = lr_mask.reshape(b, -1) / jnp.maximum(gt_lr[..., 2].reshape(b, -1), 1e-2)
    scale, shift = align_points_scale_z_shift(
        pred_lr.reshape(b, -1, 3), gt_lr.reshape(b, -1, 3), w, trunc=trunc
    )
    valid = scale > 0
    scale = jnp.where(valid, scale, 0.0)
    shift = jnp.where(valid[..., None], shift, 0.0)

    pred_aligned = scale[..., None, None, None] * pred_points + shift[..., None, None, :]

    weight = (valid[..., None, None] & mask).astype(pred_points.dtype) / jnp.maximum(gt_points[..., 2], 1e-5)
    weight = jnp.minimum(weight, 10.0 * weighted_mean(weight, mask, axis=(-2, -1), keepdims=True))
    loss = _smooth(jnp.abs(pred_aligned - gt_points) * weight[..., None], beta=beta).mean(axis=(-3, -2, -1))

    if sparsity_aware:
        sparsity = mask.astype(jnp.float32).mean(axis=(-2, -1)) / jnp.maximum(
            lr_mask.astype(jnp.float32).mean(axis=(-2, -1)), 1e-7
        )
        loss = loss / (sparsity + 1e-7)

    err = jnp.linalg.norm(jax.lax.stop_gradient(pred_aligned) - gt_points, axis=-1) / gt_points[..., 2]
    misc = {
        "truncated_error": weighted_mean(jnp.minimum(err, 1.0), mask),
        "delta": weighted_mean((err < 1).astype(jnp.float32), mask),
    }
    return loss, misc, jax.lax.stop_gradient(scale)


def compute_anchor_sampling_weight(
    key: jax.Array,
    points: jax.Array,
    mask: jax.Array,
    radius_2d: int,
    radius_3d: jax.Array,
    num_test: int = 64,
) -> jax.Array:
    """Importance weights balancing fine structures (reference losses.py:78-109).

    Monte-Carlo estimate of each pixel's local 3D-neighbor density: sample
    ``num_test`` uniform offsets in the ``radius_2d`` box, count how many land
    on valid pixels within ``radius_3d`` in 3D, weight = 1/count.

    TPU formulation (round 5): the reference draws an INDEPENDENT offset per
    (pixel, test), which on TPU compiles to 64 random gathers over the full
    point map — measured 378 ms per loss = 46% of the whole v2 grad step
    across the three local losses (tools/budget_train_step.py). Here each of
    the ``num_test`` offsets is instead drawn ONCE and applied to every pixel
    simultaneously, so a test becomes one static-size ``dynamic_slice`` of a
    padded copy (contiguous, VPU-rate) rather than a gather. Every pixel's
    marginal sample distribution is IDENTICAL to the reference's (uniform
    over the box, same count statistics); only cross-pixel correlation of the
    Monte-Carlo noise changes, and the anchor sampling these weights feed is
    already RNG-divergent from torch by design (tests/test_losses.py
    behavioral contract). ``MOGE_ANCHOR_WEIGHT_IMPL=gather`` restores the
    per-pixel-offset form (kept below for parity testing).
    """
    import os as _os

    if _os.environ.get("MOGE_ANCHOR_WEIGHT_IMPL", "shift") == "gather":
        return _anchor_sampling_weight_gather(key, points, mask, radius_2d, radius_3d, num_test)

    height, width = points.shape[-3:-1]
    batch_shape = points.shape[:-3]
    pts = points.reshape((-1, height, width, 3))
    msk = mask.reshape((-1, height, width))
    b = pts.shape[0]

    k1, k2 = jax.random.split(key)
    di = jax.random.randint(k1, (num_test,), -radius_2d, radius_2d + 1)
    dj = jax.random.randint(k2, (num_test,), -radius_2d, radius_2d + 1)

    r = radius_2d
    # pad mask with False: covers both out-of-bounds tests and invalid pixels
    pts_p = jnp.pad(pts, ((0, 0), (r, r), (r, r), (0, 0)))
    msk_p = jnp.pad(msk, ((0, 0), (r, r), (r, r)))
    r3 = radius_3d.reshape((-1, height, width))

    def body(count, d):
        di_, dj_ = d
        tp = jax.lax.dynamic_slice(pts_p, (0, r + di_, r + dj_, 0), (b, height, width, 3))
        tm = jax.lax.dynamic_slice(msk_p, (0, r + di_, r + dj_), (b, height, width))
        dist = jnp.linalg.norm(tp - pts, axis=-1)
        near = (dist <= r3) & tm
        return count + near.astype(jnp.float32), None

    count, _ = jax.lax.scan(body, jnp.zeros((b, height, width), jnp.float32), (di, dj))
    weight = 1.0 / jnp.maximum(count, 1.0)
    weight = jnp.where(msk, weight, 0.0)
    weight = weight / (weight.sum(axis=(-2, -1), keepdims=True) + 1e-7)
    return weight.reshape((*batch_shape, height, width))


def _anchor_sampling_weight_gather(
    key: jax.Array,
    points: jax.Array,
    mask: jax.Array,
    radius_2d: int,
    radius_3d: jax.Array,
    num_test: int = 64,
) -> jax.Array:
    """The reference-literal per-(pixel, test) offset form — 64 gathers over
    the full point map; identical marginal statistics to the shift form but
    ~10x slower on TPU. Kept as the parity oracle."""
    height, width = points.shape[-3:-1]
    pixel_i = jnp.arange(height)[:, None]
    pixel_j = jnp.arange(width)[None, :]

    k1, k2 = jax.random.split(key)
    test_di = jax.random.randint(k1, (height, width, num_test), -radius_2d, radius_2d + 1)
    test_dj = jax.random.randint(k2, (height, width, num_test), -radius_2d, radius_2d + 1)
    ti, tj = pixel_i[..., None] + test_di, pixel_j[..., None] + test_dj
    in_bounds = (ti >= 0) & (ti < height) & (tj >= 0) & (tj < width)
    ti, tj = jnp.clip(ti, 0, height - 1), jnp.clip(tj, 0, width - 1)

    test_mask = in_bounds & mask[..., ti, tj]
    test_points = points[..., ti, tj, :]
    test_dist = jnp.linalg.norm(test_points - points[..., None, :], axis=-1)

    near = (test_dist <= radius_3d[..., None]) & test_mask
    weight = 1.0 / jnp.maximum(near.astype(jnp.float32).sum(axis=-1), 1.0)
    weight = jnp.where(mask, weight, 0.0)
    weight = weight / (weight.sum(axis=(-2, -1), keepdims=True) + 1e-7)
    return weight


def local_loss_prepare(
    key: jax.Array,
    pred_points: jax.Array,
    gt_points: jax.Array,
    focal: jax.Array,
    level: int,
    align_resolution: int = 32,
    num_patches: int = 16,
):
    """Patch sampling + extraction + low-res solver inputs for the local loss.

    Returns ``(solver_inputs, ctx)`` where ``solver_inputs`` is the
    fixed-shape triple ``(src (P, R*R, 3), tgt (P, R*R, 3), w (P, R*R))``
    fed to :func:`align_points_scale_xyz_shift`, and ``ctx`` carries the
    full-resolution patches for :func:`local_loss_finish`. Splitting here
    lets several local-loss entries (different ``level``) share ONE batched
    solver call: after the ``align_resolution`` resize the solver inputs are
    shape-uniform across levels, so their rows can be concatenated.
    """
    height, width = pred_points.shape[-3], pred_points.shape[-2]
    batch_size = pred_points.shape[0]

    gt_mask = jnp.isfinite(gt_points).all(axis=-1)
    gt_points = jnp.where(gt_mask[..., None], gt_points, 1.0)

    radius_2d = math.ceil(0.5 / level * (height ** 2 + width ** 2) ** 0.5)
    radius_3d = 0.5 / level / focal[..., None, None] * gt_points[..., 2]

    k_w, k_sel = jax.random.split(key)
    anchor_weights = compute_anchor_sampling_weight(k_w, gt_points, gt_mask, radius_2d, radius_3d, num_test=64)

    # Per-instance anchor sampling: the reference invokes this loss once per
    # instance (train.py:305), so every instance draws exactly num_patches
    # anchors from its OWN weight distribution — not num_patches*B from the
    # joint batch distribution (which would give high-valid-mass instances
    # more patches and possibly starve others).
    hw = height * width
    p = (anchor_weights * gt_mask).reshape(batch_size, hw)
    p_sum = p.sum(axis=-1, keepdims=True)
    p = jnp.where(p_sum > 0, p / jnp.maximum(p_sum, 1e-12), jnp.full((1, hw), 1.0 / hw))
    sel_keys = jax.random.split(k_sel, batch_size)
    rem = jax.vmap(
        lambda k, pb: jax.random.choice(k, hw, (num_patches,), replace=True, p=pb)
    )(sel_keys, p).reshape(-1)                                                           # (B*num_patches,)
    patch_batch_idx = jnp.repeat(jnp.arange(batch_size), num_patches)
    patch_anchor_i, patch_anchor_j = rem // width, rem % width

    di = jnp.arange(-radius_2d, radius_2d + 1)[:, None]
    dj = jnp.arange(-radius_2d, radius_2d + 1)[None, :]
    patch_i = di[None] + patch_anchor_i[:, None, None]
    patch_j = dj[None] + patch_anchor_j[:, None, None]
    patch_in_bounds = (patch_i >= 0) & (patch_i < height) & (patch_j >= 0) & (patch_j < width)
    patch_i = jnp.clip(patch_i, 0, height - 1)
    patch_j = jnp.clip(patch_j, 0, width - 1)

    gt_anchor_pts = gt_points[patch_batch_idx, patch_anchor_i, patch_anchor_j]          # (P, 3)
    gt_patch_radius_3d = 0.5 / level / focal[patch_batch_idx] * gt_anchor_pts[:, 2]     # (P,)
    b_idx = patch_batch_idx[:, None, None]
    gt_patch_points = gt_points[b_idx, patch_i, patch_j]                                # (P, k, k, 3)
    gt_patch_dist = jnp.linalg.norm(gt_patch_points - gt_anchor_pts[:, None, None, :], axis=-1)
    patch_mask = patch_in_bounds & gt_mask[b_idx, patch_i, patch_j]
    patch_mask = patch_mask & (gt_patch_dist <= gt_patch_radius_3d[:, None, None])

    MINIMUM_POINTS_PER_PATCH = 32
    patch_nonempty = patch_mask.sum(axis=(-2, -1)) >= MINIMUM_POINTS_PER_PATCH          # (P,)

    pred_patch_points = pred_points[b_idx, patch_i, patch_j]

    pred_lr, gt_lr, lr_mask = masked_nearest_resize(
        pred_patch_points, gt_patch_points, mask=patch_mask, size=(align_resolution, align_resolution)
    )
    p_cnt = pred_lr.shape[0]
    w_lr = lr_mask.reshape(p_cnt, -1) / (gt_patch_radius_3d[:, None] + 1e-7)

    gt_mean = harmonic_mean(gt_points[..., 2], gt_mask, axis=(-2, -1))                  # (B,)
    ctx = dict(
        pred_patch_points=pred_patch_points,
        gt_patch_points=gt_patch_points,
        patch_mask=patch_mask,
        patch_nonempty=patch_nonempty,
        gt_patch_radius_3d=gt_patch_radius_3d,
        patch_batch_idx=patch_batch_idx,
        lr_mask=lr_mask,
        gt_mean=gt_mean,
        batch_size=batch_size,
        num_patches=num_patches,
    )
    return (pred_lr.reshape(p_cnt, -1, 3), gt_lr.reshape(p_cnt, -1, 3), w_lr), ctx


def local_loss_finish(
    ctx: Dict,
    local_scale: jax.Array,
    local_shift: jax.Array,
    global_scale: Optional[jax.Array],
    beta: float = 0.0,
    sparsity_aware: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Patch validation + alignment application + loss reduction (the part of
    the local loss after the scale/shift solve)."""
    pred_patch_points = ctx["pred_patch_points"]
    gt_patch_points = ctx["gt_patch_points"]
    patch_mask = ctx["patch_mask"]
    patch_nonempty = ctx["patch_nonempty"]
    gt_patch_radius_3d = ctx["gt_patch_radius_3d"]
    patch_batch_idx = ctx["patch_batch_idx"]
    lr_mask = ctx["lr_mask"]
    gt_mean = ctx["gt_mean"]
    batch_size = ctx["batch_size"]
    num_patches = ctx["num_patches"]

    if global_scale is not None:
        scale_differ = local_scale / jnp.maximum(global_scale[patch_batch_idx], 1e-12)
        patch_valid = (scale_differ > 0.1) & (scale_differ < 10.0) & (global_scale[patch_batch_idx] > 0)
    else:
        patch_valid = local_scale > 0
    patch_valid = patch_valid & patch_nonempty
    local_scale = jnp.where(patch_valid, local_scale, 0.0)
    local_shift = jnp.where(patch_valid[:, None], local_shift, 0.0)
    patch_mask = patch_mask & patch_valid[:, None, None]

    pred_aligned = local_scale[:, None, None, None] * pred_patch_points + local_shift[:, None, None, :]

    patch_weight = patch_mask.astype(jnp.float32) / jnp.maximum(
        gt_patch_points[..., 2], 0.1 * gt_mean[patch_batch_idx, None, None]
    )
    per_patch = _smooth(jnp.abs(pred_aligned - gt_patch_points) * patch_weight[..., None], beta=beta).mean(
        axis=(-3, -2, -1)
    )
    if sparsity_aware:
        sparsity = patch_mask.astype(jnp.float32).mean(axis=(-2, -1)) / jnp.maximum(
            lr_mask.astype(jnp.float32).mean(axis=(-2, -1)), 1e-7
        )
        per_patch = per_patch / (sparsity + 1e-7)
    per_patch = jnp.where(patch_valid, per_patch, 0.0)

    loss = jax.ops.segment_sum(per_patch, patch_batch_idx, num_segments=batch_size) / num_patches

    err = jnp.linalg.norm(jax.lax.stop_gradient(pred_aligned) - gt_patch_points, axis=-1) / (
        gt_patch_radius_3d[..., None, None] + 1e-12
    )
    misc = {
        "truncated_error": weighted_mean(jnp.minimum(err, 1.0), patch_mask),
        "delta": weighted_mean((err < 1).astype(jnp.float32), patch_mask),
    }
    return loss, misc


def affine_invariant_local_loss(
    key: jax.Array,
    pred_points: jax.Array,
    gt_points: jax.Array,
    focal: jax.Array,
    global_scale: Optional[jax.Array],
    level: int,
    align_resolution: int = 32,
    num_patches: int = 16,
    beta: float = 0.0,
    trunc: float = 1.0,
    sparsity_aware: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Reference losses.py:112-206 with fixed-size masked patches.

    ``key``: PRNG key (replaces torch.multinomial). Returns (loss (B,), misc).
    Composed as prepare -> scale/shift solve -> finish; multi-entry callers
    (train/step.py compute_losses) batch several levels' solves into one call
    via :func:`local_loss_prepare` / :func:`local_loss_finish`.
    """
    (src, tgt, w_lr), ctx = local_loss_prepare(
        key, pred_points, gt_points, focal, level,
        align_resolution=align_resolution, num_patches=num_patches,
    )
    local_scale, local_shift = align_points_scale_xyz_shift(src, tgt, w_lr, trunc=trunc)
    return local_loss_finish(
        ctx, local_scale, local_shift, global_scale,
        beta=beta, sparsity_aware=sparsity_aware,
    )


def normal_loss(points: jax.Array, gt_points: jax.Array) -> Tuple[jax.Array, Dict]:
    """Quad cross-product normal agreement (reference losses.py:209-243)."""
    mask = jnp.isfinite(gt_points).all(axis=-1)
    gt_points = jnp.where(mask[..., None], gt_points, 1.0)

    def quads(p):
        lu, ru, ld, rd = p[..., :-1, :-1, :], p[..., :-1, 1:, :], p[..., 1:, :-1, :], p[..., 1:, 1:, :]
        upxleft = jnp.cross(ru - rd, ld - rd)
        leftxdown = jnp.cross(lu - ru, rd - ru)
        downxright = jnp.cross(ld - lu, ru - lu)
        rightxup = jnp.cross(rd - ld, lu - ld)
        return upxleft, leftxdown, downxright, rightxup

    pn = quads(points)
    gn = quads(gt_points)
    m_lu, m_ru, m_ld, m_rd = mask[..., :-1, :-1], mask[..., :-1, 1:], mask[..., 1:, :-1], mask[..., 1:, 1:]
    masks = (m_ru & m_ld & m_rd, m_lu & m_rd & m_ru, m_ld & m_ru & m_lu, m_rd & m_lu & m_ld)

    MIN_ANGLE, MAX_ANGLE, BETA_RAD = math.radians(1), math.radians(90), math.radians(3)
    loss = 0.0
    for p, g, m in zip(pn, gn, masks):
        loss = loss + m * _smooth(jnp.clip(angle_diff_vec3(p, g), MIN_ANGLE, MAX_ANGLE), beta=BETA_RAD)
    # Per-instance (B,) reduction: the reference computes this loss per
    # instance (train.py:296-325 calls normal_loss(points[i], gt_points[i])
    # whose .mean() is over that instance's quads only), so the batched form
    # must reduce over spatial dims only — the per-instance label_type weights
    # are applied by the caller.
    loss = loss.mean(axis=(-2, -1)) / (4 * max(points.shape[-3:-1]))
    return loss, {}


def edge_loss(points: jax.Array, gt_points: jax.Array) -> Tuple[jax.Array, Dict]:
    """dx/dy direction agreement (reference losses.py:246-268)."""
    mask = jnp.isfinite(gt_points).all(axis=-1)
    gt_points = jnp.where(mask[..., None], gt_points, 1.0)

    dx = points[..., :-1, :, :] - points[..., 1:, :, :]
    dy = points[..., :, :-1, :] - points[..., :, 1:, :]
    gt_dx = gt_points[..., :-1, :, :] - gt_points[..., 1:, :, :]
    gt_dy = gt_points[..., :, :-1, :] - gt_points[..., :, 1:, :]
    mask_dx = mask[..., :-1, :] & mask[..., 1:, :]
    mask_dy = mask[..., :, :-1] & mask[..., :, 1:]

    MIN_ANGLE, MAX_ANGLE, BETA_RAD = math.radians(0.1), math.radians(90), math.radians(3)
    loss_dx = mask_dx * _smooth(jnp.clip(angle_diff_vec3(dx, gt_dx), MIN_ANGLE, MAX_ANGLE), beta=BETA_RAD)
    loss_dy = mask_dy * _smooth(jnp.clip(angle_diff_vec3(dy, gt_dy), MIN_ANGLE, MAX_ANGLE), beta=BETA_RAD)
    loss = (loss_dx.mean(axis=(-2, -1)) + loss_dy.mean(axis=(-2, -1))) / (2 * max(points.shape[-3:-1]))
    return loss, {}


def mask_l2_loss(pred_mask: jax.Array, gt_mask_pos: jax.Array, gt_mask_neg: jax.Array):
    """Reference losses.py:271-274."""
    loss = gt_mask_neg * jnp.square(pred_mask) + gt_mask_pos * jnp.square(1 - pred_mask)
    return loss.mean(axis=(-2, -1)), {}


def mask_bce_loss(pred_mask_prob: jax.Array, gt_mask_pos: jax.Array, gt_mask_neg: jax.Array):
    """Reference losses.py:277-280 (torch BCE semantics: log clamped at -100).

    The clamp must be GRADIENT-safe, not just value-safe: with a bare
    ``maximum(log(p), -100)``, the VJP at p == 0 is ``0 * (1/0) = NaN`` (the
    masked branch still differentiates log). The bf16 sigmoid saturates to
    exactly 0/1 once the mask head trains for even one step, which NaN'd
    every gradient of the first real-TPU training run (round 4,
    tools/debug_nan_grads.py bisected it to this loss's cotangent); the
    fluke torch avoids because its fused BCE backward never materializes
    log(0). where()-guard the log INPUT so the dead branch is differentiated
    at a safe point.
    """
    p = pred_mask_prob
    log_p = jnp.where(p > 0, jnp.maximum(jnp.log(jnp.where(p > 0, p, 1.0)), -100.0), -100.0)
    q = 1.0 - p
    log_1p = jnp.where(q > 0, jnp.maximum(jnp.log(jnp.where(q > 0, q, 1.0)), -100.0), -100.0)
    bce = -(gt_mask_pos * log_p + (1.0 - gt_mask_pos.astype(log_p.dtype)) * log_1p)
    loss = (gt_mask_pos | gt_mask_neg) * bce
    return loss.mean(axis=(-2, -1)), {}


def mask_bce_logit_loss(mask_logit: jax.Array, gt_mask_pos: jax.Array, gt_mask_neg: jax.Array):
    """BCE computed in logit space (numerically preferred form of
    :func:`mask_bce_loss`; same reference semantics, losses.py:277-280).

    The prob-space form above is value-safe but its gradient is zero wherever
    the bf16 sigmoid saturates to exactly 0/1 (|logit| >~ 6 in bf16), so
    confidently-WRONG pixels stop learning through this loss. The reference's
    fused torch BCE backward keeps the analytic chain gradient p - y there.
    Computing ``-log sigmoid(+/- z)`` in fp32 reproduces that: the gradient
    w.r.t. the logit is exactly ``sigmoid(z) - y`` at every finite logit.
    The -100 clamp matches torch's BCE log clamp (only reachable at
    |z| > 100 in fp32, where torch's clamped log is also gradient-dead).
    """
    z = mask_logit.astype(jnp.float32)
    log_p = jnp.maximum(jax.nn.log_sigmoid(z), -100.0)
    log_1p = jnp.maximum(jax.nn.log_sigmoid(-z), -100.0)
    bce = -(gt_mask_pos * log_p + (1.0 - gt_mask_pos.astype(log_p.dtype)) * log_1p)
    loss = (gt_mask_pos | gt_mask_neg) * bce
    return loss.mean(axis=(-2, -1)), {}


def metric_scale_loss(scale_pred: jax.Array, scale_gt: jax.Array):
    """Log-MSE on the metric scale (reference losses.py:283-285)."""
    valid = scale_gt > 0
    sq = jnp.square(jnp.log(jnp.maximum(scale_pred, 1e-12)) - jnp.where(valid, jnp.log(jnp.maximum(scale_gt, 1e-12)), 0.0))
    return jnp.where(valid, sq, 0.0), {}


def normal_map_loss(pred_normal: jax.Array, gt_normal: jax.Array):
    """Squared angle loss on normal maps (reference losses.py:288-293)."""
    mask = jnp.isfinite(gt_normal).all(axis=-1)
    gt_normal = jnp.where(mask[..., None], gt_normal, 1.0)
    loss = (mask * jnp.square(angle_diff_vec3(pred_normal, gt_normal))).mean(axis=(-2, -1))
    return loss, {}


def monitoring(points: jax.Array) -> Dict[str, jax.Array]:
    return {"std": points.std()}


LOSS_FUNCTIONS = {
    "affine_invariant_global_loss": affine_invariant_global_loss,
    "affine_invariant_local_loss": affine_invariant_local_loss,
    "normal_loss": normal_loss,
    "edge_loss": edge_loss,
    "mask_l2_loss": mask_l2_loss,
    "mask_bce_loss": mask_bce_loss,
    "metric_scale_loss": metric_scale_loss,
    "normal_map_loss": normal_map_loss,
}
