"""Serialized deployment artifacts via jax.export (StableHLO).

The reference ships ONNX exports of the raw ``forward()`` for deployment on
other inference engines (reference docs/onnx.md), explicitly excluding the
post-processing — "recovering focal and shift and reprojection ... cannot be
exported to ONNX". The TPU-native analog is a **StableHLO artifact** from
``jax.export``: a self-contained serialized program (weights embedded as
constants) that runs under any PJRT plugin (TPU/CPU/GPU), reloads in JAX via
``jax.export.deserialize``, and — unlike the torch→ONNX path — CAN include
the full camera-recovery post-process, because in this framework that math is
ordinary XLA inside the same program (``ops/solvers.py``), not a host-side
scipy loop.

Like the reference's static-shape ONNX variant, artifacts are fixed-shape:
one (batch, height, width, num_tokens) signature per export (XLA's static
shapes ARE the deployment story on TPU; at runtime the bucketing subsystem
plays the role of ONNX dynamic axes). Artifacts are platform-targeted: a TPU
export embeds Mosaic (pallas) custom calls, a CPU export is pure StableHLO.

    moge export_stablehlo --pretrained model.pt -o model.hlo \
        --height 518 --width 518 --num_tokens 1800 --with_postprocess
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def make_raw_forward_fn(model, num_tokens: int, use_fp16: bool = False):
    """image (B, H, W, 3) f32 in [0,1] -> the model's raw forward outputs
    (the reference's ONNX surface: affine points / normal / mask logits /
    metric scale for v2; points / mask logits for v1)."""
    params = model.params
    module = model._module_for(model.dtype if use_fp16 else jnp.float32) \
        if hasattr(model, "_module_for") else model.module

    def fn(image):
        return module.apply({"params": params}, image, num_tokens)

    return fn


def make_infer_fn(model, height: int, width: int, num_tokens: int,
                  use_fp16: bool = True, force_projection: bool = True,
                  apply_mask: bool = True):
    """image (B, H, W, 3) f32 -> the FULL ``infer()`` output dict (points /
    depth / mask / intrinsics [/ normal / metric scale folded into points]),
    camera recovery included — the part the reference cannot put in ONNX.

    Composes the exact program pieces ``MoGeModel.infer`` dispatches
    (resize-in, decode, epilogue+postprocess), so the artifact's numerics
    match ``infer`` on the same shapes. MoGe-2 only (v1's infer contract
    differs; export its raw forward instead)."""
    from .v2 import MoGeModel, base_token_grid

    if not isinstance(model, MoGeModel):
        raise ValueError("--with_postprocess export requires a MoGe-2 model")
    aspect = width / height
    base_h, base_w = base_token_grid(num_tokens, aspect)
    dtype = model.dtype if use_fp16 else jnp.float32
    resize_in = model._resize_in_fn(base_h, base_w)
    decode = model._decode_fn(base_h, base_w, dtype)
    post = model._post_fn(height, width, aspect, False, force_projection, apply_mask)
    params = model.params

    def fn(image):
        raw = decode(params, resize_in(image), jnp.float32(aspect))
        return post(raw, jnp.float32(0))

    return fn


def export_stablehlo(model, height: int, width: int, num_tokens: int,
                     batch: int = 1, with_postprocess: bool = False,
                     use_fp16: Optional[bool] = None) -> bytes:
    """Serialize one inference program to a StableHLO artifact (bytes).

    Weights are embedded as program constants, so the artifact is
    self-contained like an ONNX file."""
    from jax import export as jexport

    if with_postprocess:
        fn = make_infer_fn(model, height, width, num_tokens,
                           use_fp16=True if use_fp16 is None else use_fp16)
    else:
        fn = make_raw_forward_fn(model, num_tokens,
                                 use_fp16=False if use_fp16 is None else use_fp16)
    spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32)
    exported = jexport.export(jax.jit(fn))(spec)
    return exported.serialize()


def load_stablehlo(blob: bytes):
    """Deserialize an artifact -> a callable taking image (B, H, W, 3) f32."""
    from jax import export as jexport

    exported = jexport.deserialize(
        blob if isinstance(blob, bytearray) else bytearray(blob))
    return exported.call
