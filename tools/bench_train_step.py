"""Time the training gradient step: fused single-program vs --split_loss_programs.

Queue context (docs/split_loss_tpu_fault.md): the fused program with >1
NON-batchable patch-local losses crashes the single-chip TPU runtime — and a
crash wedges the chip for hours, so this tool never runs a configuration the
auto-split heuristic considers unsafe unless --force_unsafe_fused is given.
The real v2 config's three local losses consolidate into ONE batched
alignment solve (train/step.py:local_solves_batchable), which is the
mitigation this tool validates on hardware: if the fused+batched program
executes, the mitigation stands and the split path's extra-forward overhead
is the number printed at the end.

Usage:
  python tools/bench_train_step.py                       # both paths, v2 ViT-L
  python tools/bench_train_step.py --modes split         # split only
  python tools/bench_train_step.py --modes split,split_recompute   # residual-reuse win
  python tools/bench_train_step.py --num_tokens 3600 --batch 2

Timing methodology of bench.py: N back-to-back dispatches + one readback,
min over reps, all variants interleaved in one process (the axon tunnel's
RTT drifts; cross-process comparisons are meaningless).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_batch(rng, b, side):
    import jax.numpy as jnp

    depth = rng.uniform(1.0, 5.0, (b, side, side)).astype(np.float32)
    normal = rng.normal(0, 1, (b, side, side, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True) + 1e-6
    return {
        "image": jnp.asarray(rng.uniform(0, 1, (b, side, side, 3)), jnp.float32),
        "depth": jnp.asarray(depth),
        "normal": jnp.asarray(normal),
        "normal_mask": jnp.ones((b, side, side), bool),
        "depth_mask_fin": jnp.asarray(rng.uniform(0, 1, (b, side, side)) > 0.05),
        "depth_mask_inf": jnp.zeros((b, side, side), bool),
        "intrinsics": jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], jnp.float32), (b, 3, 3)
        ),
        "label_type_idx": jnp.asarray(rng.integers(0, 2, (b,)), jnp.int32),
        "is_metric": jnp.asarray(rng.integers(0, 2, (b,)), bool),
    }


def time_step(fn, params, batch, key, n, reps, block_each=False):
    """block_each: sync after every call instead of once per rep. Required for
    the split modes — their VJP residuals live between the P1 and P3 programs,
    so queueing n un-synced steps holds n residual sets alive at once and OOMs
    the chip at ViT-L scale. Sync = a scalar READBACK, not block_until_ready:
    over the axon tunnel block_until_ready does not actually wait (bench.py
    methodology note). Costs one tunnel RTT per step (~1-29 ms drift);
    min-over-reps absorbs it."""
    import jax

    def sync(g):
        # force device completion: tiny scalar readback of one grad leaf
        return float(jax.tree.leaves(g)[0].ravel()[0].astype("float32"))

    grads, metrics = fn(params, batch, key)  # warmup / compile
    sync(grads)
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            grads, metrics = fn(params, batch, key)
            if block_each:
                sync(grads)
        sync(grads)
        per.append((time.perf_counter() - t0) / n)
    leaf = float(jax.tree.leaves(grads)[0].astype("float32").sum())
    return min(per) * 1e3, float(metrics["total"]), leaf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/train/v2.json")
    ap.add_argument("--num_tokens", type=int, default=1369)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n", type=int, default=4, help="dispatches per timing rep")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--modes", default="split,fused",
                    help="comma list: split (residual-reuse P3), split_recompute, fused")
    ap.add_argument("--no_flash", action="store_true")
    ap.add_argument(
        "--force_unsafe_fused",
        action="store_true",
        help="run the fused program even when the local losses do not consolidate "
        "into one batched solve (KNOWN to crash the TPU worker and wedge the chip)",
    )
    ap.add_argument("--bench_out", default=None, metavar="PREFIX",
                    help="merge a '<PREFIX>_<mode>' row per mode into BENCH_FULL.json "
                         "(ms/grad-step; merge-preserves unrelated rows)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moge_tpu.models import import_model_class_by_version
    from moge_tpu.train.step import (local_solves_batchable, make_grad_step,
                                     make_split_grad_step)

    config = json.loads(open(args.config).read())
    label_types = sorted(config["loss"].keys())
    loss_config = config["loss"]
    n_local = len({
        name
        for spec in loss_config.values()
        for name, s in spec.items()
        if s.get("function") == "affine_invariant_local_loss"
    })
    batchable = local_solves_batchable(loss_config, label_types)
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()} local_losses={n_local} batchable={batchable}")

    ModelCls = import_model_class_by_version(config.get("model_version", "v2"))
    model = ModelCls(config["model"], None, dtype=jnp.bfloat16, use_flash=not args.no_flash)
    side = int(round(args.num_tokens ** 0.5)) * 14
    model.init_random(seed=0, image_hw=(side, side))
    print(f"model ready: {side}x{side} batch={args.batch} num_tokens={args.num_tokens}")

    rng = np.random.default_rng(0)
    batch = make_batch(rng, args.batch, side)
    key = jax.random.PRNGKey(0)

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    results = {}
    for mode in modes:
        if mode == "fused":
            if on_tpu and n_local > 1 and not batchable and not args.force_unsafe_fused:
                print("fused: SKIPPED — non-batchable multi-local config on TPU "
                      "(known worker crash; --force_unsafe_fused to override)")
                continue
            fn = jax.jit(make_grad_step(model.module, loss_config, label_types, args.num_tokens))
        elif mode == "split":
            fn = make_split_grad_step(model.module, loss_config, label_types, args.num_tokens)
        elif mode == "split_recompute":
            fn = make_split_grad_step(model.module, loss_config, label_types,
                                      args.num_tokens, reuse_residuals=False)
        else:
            raise SystemExit(f"unknown mode {mode}")
        t0 = time.perf_counter()
        ms, total, leaf = time_step(fn, model.params, batch, key, args.n, args.reps,
                                    block_each=mode.startswith("split"))
        print(f"{mode}: {ms:.1f} ms/grad-step  loss_total={total:.4f} "
              f"grad_checksum={leaf:.6g}  (incl. compile: {time.perf_counter()-t0:.0f}s)")
        results[mode] = (ms, total, leaf)

    if args.bench_out and results:
        bench_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                  "BENCH_FULL.json")
        merged = {}
        if os.path.exists(bench_path):
            with open(bench_path) as f:
                for row in json.load(f):
                    merged[row["metric"]] = row
        for mode, (ms, _, _) in results.items():
            metric = f"{args.bench_out}_{mode}"
            merged[metric] = {"metric": metric, "value": round(ms, 1), "unit": "ms/grad-step"}
        with open(bench_path, "w") as f:
            json.dump(list(merged.values()), f, indent=1)
        print(f"merged {len(results)} row(s) into BENCH_FULL.json")

    for a, b, label in (("fused", "split", "split overhead"),
                        ("split", "split_recompute", "recompute overhead"),
                        ("fused", "split_recompute", "split_recompute overhead")):
        if a in results and b in results:
            ra, rb = results[a], results[b]
            print(f"{label}: {rb[0] - ra[0]:+.1f} ms ({rb[0] / ra[0]:.3f}x vs {a})  "
                  f"loss agreement: |d|={abs(rb[1] - ra[1]):.2e}  "
                  f"grad checksum agreement: |d|={abs(rb[2] - ra[2]):.3e}")


if __name__ == "__main__":
    main()
