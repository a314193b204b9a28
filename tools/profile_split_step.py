"""Stage-level timing of the split training step's individual XLA programs.

The split step (train/step.py:make_split_grad_step) runs P1 forward(+vjp),
P2 per-loss output-gradient programs, and P3 backward as separate dispatches.
This tool times each program alone — the way to see WHICH one dominates a
slow grad step (bench_train_step.py only reports the total).

Timing per the repo's methodology: the axon tunnel's block_until_ready is a
no-op, so each measurement dispatches n back-to-back calls and forces one
scalar readback; min over reps.

Usage:
  python tools/profile_split_step.py --batch 2 --num_tokens 1369
  python tools/profile_split_step.py --trace /tmp/trace   # + jax.profiler dump
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_train_step import make_batch  # noqa: E402  (same synthetic batch)


def timed(callable_, readback, n=3, reps=3):
    out = callable_()
    readback(out)
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = callable_()
        readback(out)
        per.append((time.perf_counter() - t0) / n)
    return min(per) * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/train/v2.json")
    ap.add_argument("--num_tokens", type=int, default=1369)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="jax.profiler trace of one pass over all programs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moge_tpu.models import import_model_class_by_version
    from moge_tpu.train.step import make_split_grad_step

    config = json.loads(open(args.config).read())
    label_types = sorted(config["loss"].keys())
    ModelCls = import_model_class_by_version(config.get("model_version", "v2"))
    model = ModelCls(config["model"], None, dtype=jnp.bfloat16)
    side = int(round(args.num_tokens ** 0.5)) * 14
    model.init_random(seed=0, image_hw=(side, side))
    print(f"model ready: {side}x{side} batch={args.batch}", flush=True)

    rng = np.random.default_rng(0)
    batch = make_batch(rng, args.batch, side)
    key = jax.random.PRNGKey(0)
    params = model.params

    step = make_split_grad_step(model.module, config["loss"], label_types, args.num_tokens)
    progs = step.programs

    scalar = lambda x: float(jnp.asarray(x).ravel()[0].astype(jnp.float32))
    leaf = lambda tree: scalar(jax.tree.leaves(
        [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")and jnp.issubdtype(l.dtype, jnp.inexact)])[0])

    results = {}
    # P1 forward (no vjp) — the model-only cost
    ms, output = timed(lambda: progs["p1_forward"](params, batch["image"]),
                       lambda o: leaf(o), n=args.n)
    results["p1_forward"] = ms
    print(f"p1_forward            {ms:10.1f} ms", flush=True)

    # P2 other (global + normal/edge/mask/scale losses)
    ms, (total, metrics, scale, cot) = timed(
        lambda: progs["p2_other"](key, output, batch), lambda o: scalar(o[0]), n=args.n)
    results["p2_other"] = ms
    print(f"p2_other              {ms:10.1f} ms", flush=True)

    # each local-loss program
    carry = key
    for name in step.local_names:
        fn = progs[f"p2_local:{name}"]
        k = carry
        ms, _ = timed(lambda: fn(k, output, batch, scale), lambda o: scalar(o[0]), n=args.n)
        carry, _ = jax.random.split(carry)
        results[f"p2_local:{name}"] = ms
        print(f"p2_local:{name:12s} {ms:10.1f} ms", flush=True)

    # P3 via recompute-vjp (timeable standalone; the replay variant consumes
    # its residuals so it cannot be called twice on the same vjp)
    ms, _ = timed(lambda: progs["p3_vjp"](params, batch["image"], cot),
                  lambda o: leaf(o), n=args.n)
    results["p3_vjp"] = ms
    print(f"p3_vjp (recompute)    {ms:10.1f} ms", flush=True)

    print(f"TOTAL (sum)           {sum(results.values()):10.1f} ms", flush=True)

    if args.trace:
        with jax.profiler.trace(args.trace):
            out = progs["p1_forward"](params, batch["image"])
            t, m, s, cot = progs["p2_other"](key, out, batch)
            carry = key
            for name in step.local_names:
                t2, m2, c2 = progs[f"p2_local:{name}"](carry, out, batch, s)
                carry, _ = jax.random.split(carry)
            scalar(t2)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
