"""Line-item budget of the split v2 training grad step (VERDICT r4 weak-#1).

profile_split_step.py times the step's five XLA programs; this tool opens the
loss programs up and accounts for WHERE inside them the time goes, producing
a table whose rows sum to the measured step — the training analogue of the
inference budget in docs/perf_model.md.

Per patch-local loss program (p2_local:<name>) the stages are timed as
separately-jitted truncations of the same computation at the same shapes:

  prepare.anchor_w   compute_anchor_sampling_weight (64 test gathers/pixel
                     at FULL resolution + 3D norms — reference losses.py:78-109)
  prepare.rest       patch sampling/extraction/masked resize minus anchor_w
  solve              align_points_scale_xyz_shift on the prepared inputs
  finish             validation + alignment application + reduction
  backward           full value_and_grad minus full forward (the VJP of the
                     patch gathers is a scatter-add over the point map)

For p2_other: the global loss (resize / solve / apply) and the cheap dense
losses. Plus the program-boundary costs: p1 vjp-residual emission
(p1_forward_vjp - p1_forward), p3 replay, and per-dispatch RTT (an empty
jit program).

Timing per the repo methodology: scalar readback (block_until_ready is a
no-op over the axon tunnel), min over reps, one process.

Usage:
  python tools/budget_train_step.py --batch 2 --num_tokens 1369
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_train_step import make_batch  # noqa: E402


def timed(fn, readback, n=3, reps=3):
    out = fn()
    readback(out)
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        readback(out)
        per.append((time.perf_counter() - t0) / n)
    return min(per) * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/train/v2.json")
    ap.add_argument("--num_tokens", type=int, default=1369)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moge_tpu.models import import_model_class_by_version
    from moge_tpu.ops.alignment import (align_points_scale_xyz_shift,
                                        align_points_scale_z_shift)
    from moge_tpu.ops.geometry import depth_map_to_point_map, masked_nearest_resize
    from moge_tpu.train import losses as L
    from moge_tpu.train.step import make_split_grad_step

    config = json.loads(open(args.config).read())
    label_types = sorted(config["loss"].keys())
    loss_config = config["loss"]
    ModelCls = import_model_class_by_version(config.get("model_version", "v2"))
    model = ModelCls(config["model"], None, dtype=jnp.bfloat16)
    side = int(round(args.num_tokens ** 0.5)) * 14
    model.init_random(seed=0, image_hw=(side, side))
    print(f"model ready: {side}x{side} batch={args.batch}", flush=True)

    rng = np.random.default_rng(0)
    batch = make_batch(rng, args.batch, side)
    key = jax.random.PRNGKey(0)
    params = model.params

    step = make_split_grad_step(model.module, loss_config, label_types, args.num_tokens)
    progs = step.programs

    scalar = lambda x: float(jnp.asarray(x).ravel()[0].astype(jnp.float32))
    leaf = lambda tree: scalar([l for l in jax.tree.leaves(tree)
                                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact)][0])

    # local-loss entry specs from any label_type that defines them (they are
    # shared across label types in the v2 config)
    local_specs = {}
    global_spec = None
    for spec in loss_config.values():
        for name, s in spec.items():
            if s.get("function") == "affine_invariant_local_loss":
                local_specs.setdefault(name, s.get("params", {}))
            elif s.get("function") == "affine_invariant_global_loss":
                global_spec = s.get("params", {})

    # ---- shared preamble pieces (replicates compute_losses' plumbing) ----
    def gt_from_batch(batch):
        gtp = depth_map_to_point_map(batch["depth"], batch["intrinsics"])
        gtp = jnp.where(batch["depth_mask_fin"][..., None], gtp, jnp.inf)
        fx, fy = batch["intrinsics"][..., 0, 0], batch["intrinsics"][..., 1, 1]
        focal = 1.0 / jnp.sqrt(1.0 / fx ** 2 + 1.0 / fy ** 2)
        return gtp, focal

    rows = []  # (label, ms)

    def add(label, ms):
        rows.append((label, ms))
        print(f"  {label:42s} {ms:10.1f} ms", flush=True)

    # dispatch RTT floor
    triv = jax.jit(lambda x: x + 1.0)
    rtt, _ = timed(lambda: triv(jnp.float32(1.0)), scalar, n=8)
    print(f"dispatch RTT (empty jit): {rtt:.2f} ms", flush=True)

    # ---- P1 ----
    ms_p1, output = timed(lambda: progs["p1_forward"](params, batch["image"]), leaf, n=args.n)
    ms_p1v, (output_v, _) = timed(lambda: progs["p1_forward_vjp"](params, batch["image"]),
                                  lambda o: leaf(o[0]), n=args.n)
    add("P1 model forward", ms_p1)
    add("P1 vjp-residual emission (extra over fwd)", ms_p1v - ms_p1)

    # ---- P2 other (global + cheap losses), full program ----
    ms_p2o, (total, metrics, scale, cot) = timed(
        lambda: progs["p2_other"](key, output, batch), lambda o: scalar(o[0]), n=args.n)

    # global-loss internals at the same shapes
    g_res = int(global_spec.get("align_resolution", 64))
    g_trunc = global_spec.get("trunc", 1.0)

    @jax.jit
    def global_resize(output, batch):
        gtp, _ = gt_from_batch(batch)
        mask = jnp.isfinite(gtp).all(axis=-1)
        gtp = jnp.where(mask[..., None], gtp, 1.0)
        pred_lr, gt_lr, lr_mask = masked_nearest_resize(
            output["points"].astype(jnp.float32), gtp, mask=mask, size=(g_res, g_res))
        b = pred_lr.shape[0]
        w = lr_mask.reshape(b, -1) / jnp.maximum(gt_lr[..., 2].reshape(b, -1), 1e-2)
        return pred_lr.reshape(b, -1, 3), gt_lr.reshape(b, -1, 3), w

    ms_gres, (g_src, g_tgt, g_w) = timed(lambda: global_resize(output, batch),
                                         lambda o: scalar(o[0]), n=args.n)

    solve_g = jax.jit(lambda s, t, w: align_points_scale_z_shift(s, t, w, trunc=g_trunc))
    ms_gsolve, _ = timed(lambda: solve_g(g_src, g_tgt, g_w), lambda o: scalar(o[0]), n=args.n)

    @jax.jit
    def global_full(key, output, batch):
        gtp, _ = gt_from_batch(batch)
        loss, misc, sc = L.affine_invariant_global_loss(
            output["points"].astype(jnp.float32), gtp, **(global_spec or {}))
        return loss.sum()

    ms_gfull, _ = timed(lambda: global_full(key, output, batch), scalar, n=args.n)

    add("P2g global: preamble (gt pts + masked resize)", ms_gres)
    add("P2g global: z-shift solve", ms_gsolve)
    add("P2g global: apply+reduce (fwd remainder)", max(ms_gfull - ms_gres - ms_gsolve, 0.0))
    add("P2g other losses + backward (program rest)", max(ms_p2o - ms_gfull, 0.0))

    # ---- per local-loss program ----
    carry = key
    cot_total = cot
    for name in step.local_names:
        pk = local_specs[name]
        level = pk["level"]
        ares = pk.get("align_resolution", 32)
        npatch = pk.get("num_patches", 16)
        trunc = pk.get("trunc", 1.0)
        fn = progs[f"p2_local:{name}"]
        k = carry
        ms_full, (t_l, m_l, cot_l) = timed(lambda: fn(k, output, batch, scale),
                                           lambda o: scalar(o[0]), n=args.n)
        cot_total = jax.tree.map(jnp.add, cot_total, cot_l)

        @jax.jit
        def anchor_w_only(key, output, batch):
            import math as _m
            gtp, focal = gt_from_batch(batch)
            gt_mask = jnp.isfinite(gtp).all(axis=-1)
            gtp_s = jnp.where(gt_mask[..., None], gtp, 1.0)
            h, w_ = gtp.shape[-3], gtp.shape[-2]
            radius_2d = _m.ceil(0.5 / level * (h ** 2 + w_ ** 2) ** 0.5)
            radius_3d = 0.5 / level / focal[..., None, None] * gtp_s[..., 2]
            k_w, _ = jax.random.split(key)
            aw = L.compute_anchor_sampling_weight(k_w, gtp_s, gt_mask, radius_2d, radius_3d, 64)
            return aw.sum()

        ms_aw, _ = timed(lambda: anchor_w_only(k, output, batch), scalar, n=args.n)

        @jax.jit
        def prepare_only(key, output, batch):
            gtp, focal = gt_from_batch(batch)
            (src, tgt, w_lr), ctx = L.local_loss_prepare(
                key, output["points"].astype(jnp.float32), gtp, focal, level,
                align_resolution=ares, num_patches=npatch)
            return src, tgt, w_lr

        ms_prep, (src, tgt, w_lr) = timed(lambda: prepare_only(k, output, batch),
                                          lambda o: scalar(o[0]), n=args.n)

        solve_l = jax.jit(lambda s, t, w: align_points_scale_xyz_shift(s, t, w, trunc=trunc))
        ms_solve, _ = timed(lambda: solve_l(src, tgt, w_lr), lambda o: scalar(o[0]), n=args.n)

        @jax.jit
        def full_fwd(key, output, batch, scale):
            gtp, focal = gt_from_batch(batch)
            loss, misc = L.affine_invariant_local_loss(
                key, output["points"].astype(jnp.float32), gtp, focal, scale, **pk)
            return loss.sum()

        ms_fwd, _ = timed(lambda: full_fwd(k, output, batch, scale), scalar, n=args.n)

        add(f"{name}: anchor-sampling weight (fwd)", ms_aw)
        add(f"{name}: patch extract + resize (fwd rest)", max(ms_prep - ms_aw, 0.0))
        add(f"{name}: xyz-shift solve", ms_solve)
        add(f"{name}: finish (fwd remainder)", max(ms_fwd - ms_prep - ms_solve, 0.0))
        add(f"{name}: backward (grad - fwd)", max(ms_full - ms_fwd, 0.0))
        carry, _ = jax.random.split(carry)

    # ---- P3 ----
    ms_p3r, _ = timed(lambda: progs["p3_vjp"](params, batch["image"], cot_total), leaf, n=args.n)
    add("P3 model backward (recompute-vjp)", ms_p3r)
    n_progs = 3 + len(step.local_names)
    add(f"dispatch RTT x {n_progs} programs", rtt * n_progs)

    total_ms = sum(ms for _, ms in rows)
    print(f"\n  {'BUDGET TOTAL':42s} {total_ms:10.1f} ms", flush=True)

    # cross-check vs the real end-to-end step
    def run_step():
        return step(params, batch, key)

    ms_step, _ = timed(run_step, lambda o: leaf(o[0]), n=args.n)
    print(f"  {'measured end-to-end grad step':42s} {ms_step:10.1f} ms"
          f"   (budget covers {100 * total_ms / ms_step:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
