"""Stage-level latency breakdown for MoGe-2 ViT-L inference on one TPU chip.

Times, at a given num_tokens: input resize, encoder (ViT), neck, the 3 conv
heads, epilogue (output resize+remap), and fp32 postprocess (camera
recovery) — each as its own jit program with the serial-dispatch timing
methodology of bench.py (block_until_ready is unreliable over the axon
tunnel; N back-to-back dispatches + one readback).

Usage: python tools/bench_breakdown.py [--num_tokens 3600] [--arch vitl]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, n=16, reps=3):
    import jax.numpy as jnp

    out = fn(*args)
    s = float(sum(jnp.sum(jnp.asarray(x, jnp.float32)) for x in __import__("jax").tree.leaves(out)))
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        leaves = __import__("jax").tree.leaves(out)
        float(jnp.sum(leaves[0].astype(jnp.float32)))
        per.append((time.perf_counter() - t0) / n * 1e3)
    return float(np.median(per))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_tokens", type=int, default=3600)
    ap.add_argument("--arch", default="vitl", choices=["vits", "vitb", "vitl"])
    ap.add_argument("--n", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/moge_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moge_tpu.models.modules import make_level_uv
    from moge_tpu.models.presets import get_preset
    from moge_tpu.models.v2 import MoGeModel, MoGeV2, apply_epilogue, postprocess
    from moge_tpu.ops.resize import resize_2d

    preset = get_preset(f"moge-2-{args.arch}-normal")
    model = MoGeModel(preset["config"], None, dtype=jnp.bfloat16)
    model.init_random(seed=0, image_hw=(518, 518))
    module = model.module
    params = model.params

    nt = args.num_tokens
    side = round((nt ** 0.5) * 14)
    bh = bw = round(nt ** 0.5)
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, side, side, 3)), jnp.float32)

    rows = {}

    # input resize (image -> 14*bh x 14*bw)
    f_resize = jax.jit(lambda x: resize_2d(x, (bh * 14, bw * 14), mode="bilinear", antialias=True))
    img14 = f_resize(img)
    rows["resize_in"] = bench(f_resize, (img,), n=args.n)

    # encoder only
    def enc(params, x):
        feats, cls = module.apply({"params": params}, x, bh, bw,
                                  method=lambda m, xx, h, w: m.encoder_module(
                                      xx, h, w, return_class_token=True, pre_resized=True))
        return feats, cls
    f_enc = jax.jit(enc)
    feats, cls = f_enc(params, img14)
    rows["encoder"] = bench(f_enc, (params, img14), n=args.n)

    # neck only
    def neck(params, feats):
        def m_fn(m, feats):
            uvs = make_level_uv(bh, bw, 5, 1.0, 1, m.dtype)
            in_features = [jnp.concatenate([feats, uvs[0]], axis=-1), uvs[1], uvs[2], uvs[3], uvs[4]]
            return m.neck_module(in_features)
        return module.apply({"params": params}, feats, method=m_fn)
    f_neck = jax.jit(neck)
    neck_feats = f_neck(params, feats)
    rows["neck"] = bench(f_neck, (params, feats), n=args.n)

    # each head
    for head in ("points_head", "normal_head", "mask_head"):
        def run_head(params, neck_feats, head=head):
            return module.apply({"params": params}, neck_feats,
                                method=lambda m, nf: getattr(m, head + "_module")(nf)[-1])
        f_h = jax.jit(run_head)
        f_h(params, neck_feats)
        rows[head] = bench(f_h, (params, neck_feats), n=args.n)

    # full decode (fair fused number; includes scale head)
    f_dec = jax.jit(lambda p, x: module.apply(
        {"params": p}, x, bh, bw, 1.0, True, method=MoGeV2.decode))
    raw = f_dec(params, img14)
    rows["decode_total"] = bench(f_dec, (params, img14), n=args.n)

    # epilogue: resize raw maps to input resolution + remap
    f_epi = jax.jit(lambda raw: apply_epilogue(raw, side, side, module.remap_output))
    full = f_epi(raw)
    rows["epilogue"] = bench(f_epi, (raw,), n=args.n)

    # postprocess: camera recovery etc.
    f_post = jax.jit(lambda full: postprocess(full, aspect_ratio=1.0))
    f_post(full)
    rows["postprocess"] = bench(f_post, (full,), n=args.n)

    # whole pipeline fused (one program), for reference
    def whole(p, x):
        raw = module.apply({"params": p}, x, bh, bw, 1.0, True, method=MoGeV2.decode)
        full = apply_epilogue(raw, side, side, module.remap_output)
        out = postprocess(full, aspect_ratio=1.0)
        return out["depth"]
    f_all = jax.jit(whole)
    f_all(params, img14)
    rows["whole_fused"] = bench(f_all, (params, img14), n=args.n)

    print(f"\n== breakdown @ num_tokens={nt} ({args.arch}), ms/image ==")
    for k, v in rows.items():
        print(f"{k:16s} {v:8.2f}")
    print(f"sum(stages)      {rows['resize_in'] + rows['decode_total'] + rows['epilogue'] + rows['postprocess']:8.2f}")


if __name__ == "__main__":
    main()
