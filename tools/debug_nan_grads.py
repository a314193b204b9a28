"""Bisect which loss program produces NaN gradients in a real training step.

Round-4 finding: the first real-TPU `moge train` run (synthetic reference-
layout data, shipped v2 losses, ViT-L, 1200 tokens) showed finite losses but
grads_ok=0 on every step after the first parameter update. This tool
reproduces one step from a trained-one-step state and reports, per loss
program, whether its output-cotangent contains NaN/Inf, and per top-level
parameter bucket, whether the VJP'd grads do.

Usage:
  python tools/debug_nan_grads.py [--config configs/train/v2_tpu_proof.json]
      [--checkpoint /tmp/moge_proof/checkpoints/29] [--num_tokens 1200]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tree_nan_report(tree, label):
    import jax
    import jax.numpy as jnp

    bad = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype, jnp.inexact):
            continue
        n = int(jnp.sum(~jnp.isfinite(leaf)))
        if n:
            key = jax.tree_util.keystr(path)
            bad[key] = (n, int(leaf.size))
    if bad:
        print(f"  {label}: NON-FINITE in {len(bad)} leaves:")
        for k, (n, size) in sorted(bad.items())[:12]:
            print(f"    {k}: {n}/{size}")
    else:
        print(f"  {label}: all finite")
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/train/v2_tpu_proof.json")
    ap.add_argument("--checkpoint", default="/tmp/moge_proof/checkpoints/29")
    ap.add_argument("--num_tokens", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moge_tpu.models import import_model_class_by_version
    from moge_tpu.train.dataloader import TrainDataLoaderPipeline
    from moge_tpu.train.step import make_split_grad_step

    config = json.loads(open(args.config).read())
    label_types = sorted(config["loss"].keys())
    ModelCls = import_model_class_by_version(config.get("model_version", "v2"))
    model = ModelCls(config["model"], None, dtype=jnp.bfloat16)
    side = 512
    model.init_random(seed=0, image_hw=(side, side))
    params = model.params

    if args.checkpoint and os.path.exists(args.checkpoint):
        from moge_tpu.models.io import load_native_checkpoint

        _, params = load_native_checkpoint(args.checkpoint)
        print(f"restored params from {args.checkpoint}")
        tree_nan_report(params, "params")

    # one real pipeline batch (same data path / conversion as scripts/train.py)
    pipe = TrainDataLoaderPipeline(config["data"], batch_size=args.batch)
    with pipe:
        while True:
            batch_np = pipe.get()
            if not all(lt == "invalid" for lt in batch_np["label_type"]):
                break
    batch = {
        "image": jnp.asarray(batch_np["image"]),
        "depth": jnp.asarray(batch_np["depth"]),
        "normal": jnp.asarray(batch_np["normal"]),
        "normal_mask": jnp.asarray(batch_np["normal_mask"]),
        "depth_mask_fin": jnp.asarray(batch_np["depth_mask_fin"]),
        "depth_mask_inf": jnp.asarray(batch_np["depth_mask_inf"]),
        "intrinsics": jnp.asarray(batch_np["intrinsics"]),
        "label_type_idx": jnp.asarray(
            [label_types.index(lt) if lt in label_types else label_types.index("invalid")
             for lt in batch_np["label_type"]], jnp.int32),
        "is_metric": jnp.asarray(batch_np["is_metric"]),
    }
    print("label types in batch:", batch_np["label_type"])
    tree_nan_report({k: v for k, v in batch.items() if v.dtype != bool}, "batch")

    step = make_split_grad_step(model.module, config["loss"], label_types, args.num_tokens)
    progs = step.programs
    key = jax.random.PRNGKey(42)

    output = progs["p1_forward"](params, batch["image"])
    tree_nan_report(output, "p1 output")

    total, metrics, scale, cot = progs["p2_other"](key, output, batch)
    print(f"  p2_other total={float(total):.4f} scale={np.asarray(scale)}")
    tree_nan_report(cot, "p2_other cotangent")

    cots = {"other": cot}
    carry = key
    for name in step.local_names:
        t_l, m_l, cot_l = progs[f"p2_local:{name}"](carry, output, batch, scale)
        carry, _ = jax.random.split(carry)
        print(f"  p2_local:{name} total={float(t_l):.4f}")
        tree_nan_report(cot_l, f"p2_local:{name} cotangent")
        cots[name] = cot_l

    for name, c in cots.items():
        grads = progs["p3_vjp"](params, batch["image"], c)
        bad = tree_nan_report(grads, f"grads from {name} cotangent alone")
        del grads


if __name__ == "__main__":
    main()
