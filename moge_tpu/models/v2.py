"""MoGe-2: modular encoder/neck/heads monocular geometry model (TPU-native).

Mirrors the public contract of reference moge/model/v2.py (same config schema,
same output dict keys/shapes/coordinate conventions) with a TPU-first
implementation: NHWC bf16 compute, the whole forward + fp32 post-processing
(including focal/shift recovery) compiled into a single XLA program per input
shape — no host round-trips.
"""

from __future__ import annotations

import math
from functools import partial
from numbers import Number
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.geometry import depth_map_to_point_map, intrinsics_from_focal_center
from ..ops.resize import resize_2d
from ..ops.solvers import recover_focal_shift
from .modules import MLP, ConvStack, DINOv2Encoder, make_level_uv
from .multihead import apply_heads_batched, heads_batchable


def remap_points(points: jax.Array, remap_output: str) -> jax.Array:
    """Output remapping (reference v2.py:122-136)."""
    if remap_output == "linear":
        return points
    if remap_output == "sinh":
        return jnp.sinh(points)
    if remap_output == "exp":
        xy, z = points[..., :2], points[..., 2:]
        z = jnp.exp(z)
        return jnp.concatenate([xy * z, z], axis=-1)
    if remap_output == "sinh_exp":
        xy, z = points[..., :2], points[..., 2:]
        return jnp.concatenate([jnp.sinh(xy), jnp.exp(z)], axis=-1)
    raise ValueError(f"Invalid remap output type: {remap_output}")


def base_token_grid(num_tokens: int, aspect_ratio: float) -> Tuple[int, int]:
    """(base_h, base_w) from token budget (reference v2.py:143-147)."""
    base_h = round((num_tokens / aspect_ratio) ** 0.5)
    base_w = round((num_tokens * aspect_ratio) ** 0.5)
    return base_h, base_w


class MoGeV2(nn.Module):
    """linen module: config-described assembly (reference v2.py:30-57).

    Config dicts use the exact checkpoint schema so published `model_config`
    blobs instantiate this module unchanged.
    """

    encoder: Dict[str, Any]
    neck: Dict[str, Any]
    points_head: Optional[Dict[str, Any]] = None
    mask_head: Optional[Dict[str, Any]] = None
    normal_head: Optional[Dict[str, Any]] = None
    scale_head: Optional[Dict[str, Any]] = None
    remap_output: str = "linear"
    num_tokens_range: Sequence[int] = (1200, 3600)
    dtype: Any = jnp.float32
    remat: bool = False
    use_flash: bool = False  # pallas flash attention (inference fwd path)
    scan_blocks: bool = False  # lax.scan blocks (fast compiles; training)
    sp_axis: Optional[str] = None  # sequence-parallel encoder (parallel/sp.py)
    sp_size: int = 1
    use_int8: bool = False  # W8A8 int8 encoder matmuls (opt-in serving mode)

    def setup(self):
        self.encoder_module = DINOv2Encoder(
            **self.encoder, dtype=self.dtype, remat=self.remat, use_flash=self.use_flash,
            scan_blocks=self.scan_blocks, sp_axis=self.sp_axis, sp_size=self.sp_size,
            use_int8=self.use_int8, name="encoder"
        )
        self.neck_module = ConvStack(**self.neck, dtype=self.dtype, remat=self.remat, name="neck")
        for head_name in ("points_head", "normal_head", "mask_head"):
            cfg = getattr(self, head_name)
            if cfg is not None:
                setattr(self, head_name + "_module",
                        ConvStack(**cfg, dtype=self.dtype, remat=self.remat, name=head_name))
        if self.scale_head is not None:
            self.scale_head_module = MLP(**self.scale_head, dtype=self.dtype, name="scale_head")

    def decode(
        self, image_14: jax.Array, base_h: int, base_w: int, aspect_ratio: float, pre_resized: bool = True
    ) -> Dict[str, jax.Array]:
        """Resolution-independent core: encoder + neck + heads at decoder
        resolution (no output resize/remap). ``image_14``: (B, 14*bh, 14*bw, 3)
        when ``pre_resized``; otherwise any (B, H, W, 3) is resized inside.

        Returns raw maps: 'points_raw'/'normal_raw' (B, 16bh, 16bw, 3),
        'mask_raw' logits (B, 16bh, 16bw, 1), 'metric_scale' (B,).
        This split lets the expensive program be jitted per token grid while
        the per-resolution epilogue compiles in seconds.
        """
        batch = image_14.shape[0]

        features, cls_token = self.encoder_module(
            image_14, base_h, base_w, return_class_token=True, pre_resized=pre_resized
        )

        # Per-level UV conditioning (reference v2.py:153-160).
        uvs = make_level_uv(base_h, base_w, 5, aspect_ratio, batch, self.dtype)
        in_features: List[Optional[jax.Array]] = [
            jnp.concatenate([features, uvs[0]], axis=-1),
            uvs[1], uvs[2], uvs[3], uvs[4],
        ]
        neck_features = self.neck_module(in_features)

        out: Dict[str, jax.Array] = {}
        head_names = [h for h in ("points_head", "normal_head", "mask_head")
                      if getattr(self, h) is not None]
        head_cfgs = [getattr(self, h) for h in head_names]
        if not self.is_initializing() and heads_batchable(head_cfgs, self.remat):
            # One batched pass over all heads (stacked weights; see multihead.py).
            plist = [getattr(self, h + "_module").variables["params"] for h in head_names]
            outs = apply_heads_batched(head_cfgs, plist, neck_features, self.dtype)
            for h, o in zip(head_names, outs):
                out[h.replace("_head", "_raw")] = o
        else:
            for head_name in head_names:
                head = getattr(self, head_name + "_module")
                out[head_name.replace("_head", "_raw")] = head(neck_features)[-1]
        if self.scale_head is not None:
            scale = self.scale_head_module(cls_token)
            out["metric_scale"] = jnp.exp(scale[..., 0])
        return out

    def epilogue(self, raw: Dict[str, jax.Array], img_h: int, img_w: int) -> Dict[str, jax.Array]:
        return apply_epilogue(raw, img_h, img_w, self.remap_output)

    def __call__(self, image: jax.Array, num_tokens: int) -> Dict[str, jax.Array]:
        """``image``: (B, H, W, 3) RGB in [0,1] fp32; ``num_tokens`` static.

        Returns dict with NHWC 'points' (B,H,W,3), 'normal', 'mask' (B,H,W),
        'metric_scale' (B,) — whichever heads exist.
        """
        batch, img_h, img_w, _ = image.shape
        aspect_ratio = img_w / img_h
        base_h, base_w = base_token_grid(num_tokens, aspect_ratio)
        raw = self.decode(image, base_h, base_w, aspect_ratio, pre_resized=False)
        return self.epilogue(raw, img_h, img_w)


def apply_epilogue(raw: Dict[str, jax.Array], img_h: int, img_w: int, remap_output: str) -> Dict[str, jax.Array]:
    """Per-resolution epilogue: bilinear resize to (H, W) + remap/normalize/
    sigmoid (reference v2.py:170-182). Parameter-free; cheap to compile."""
    out: Dict[str, jax.Array] = {}
    if "points_raw" in raw:
        pred = resize_2d(raw["points_raw"], (img_h, img_w), mode="bilinear", channel_last=True)
        out["points"] = remap_points(pred, remap_output)
    if "normal_raw" in raw:
        pred = resize_2d(raw["normal_raw"], (img_h, img_w), mode="bilinear", channel_last=True)
        # eps-safe normalize (NaN-free gradient at 0, torch F.normalize semantics)
        norm = jnp.sqrt(jnp.sum(jnp.square(pred), axis=-1, keepdims=True) + 1e-24)
        out["normal"] = pred / jnp.maximum(norm, 1e-12)
    if "mask_raw" in raw:
        pred = resize_2d(raw["mask_raw"], (img_h, img_w), mode="bilinear", channel_last=True)
        # Pre-sigmoid logit is exposed for the training BCE (computed in logit
        # space so the gradient stays p - y even where the bf16 sigmoid
        # saturates to exactly 0/1; see train/losses.py:mask_bce_logit_loss).
        out["mask_logit"] = pred[..., 0]
        out["mask"] = jax.nn.sigmoid(pred[..., 0])
    if "metric_scale" in raw:
        out["metric_scale"] = raw["metric_scale"]
    return out


def postprocess(
    output: Dict[str, jax.Array],
    aspect_ratio: float,
    fov_x: Optional[jax.Array] = None,
    force_projection: bool = True,
    apply_mask: bool = True,
    use_mask_for_solve: bool = True,
    mask_threshold: float = 0.5,
) -> Dict[str, jax.Array]:
    """fp32 post-processing: camera recovery, depth, intrinsics, masking.

    Mirrors reference v2.py:246-289 but runs fully on-device.
    """
    points = output.get("points")
    normal = output.get("normal")
    mask = output.get("mask")
    metric_scale = output.get("metric_scale")

    points = points.astype(jnp.float32) if points is not None else None
    normal = normal.astype(jnp.float32) if normal is not None else None
    mask = mask.astype(jnp.float32) if mask is not None else None
    metric_scale = metric_scale.astype(jnp.float32) if metric_scale is not None else None

    result: Dict[str, jax.Array] = {}
    mask_binary = (mask > mask_threshold) if mask is not None else None

    if points is not None:
        solve_mask = mask_binary if use_mask_for_solve else None
        if fov_x is None:
            focal, shift = recover_focal_shift(points, solve_mask)
        else:
            fov = jnp.deg2rad(jnp.asarray(fov_x, dtype=jnp.float32))
            focal = aspect_ratio / (1 + aspect_ratio ** 2) ** 0.5 / jnp.tan(fov / 2)
            focal = jnp.broadcast_to(focal, points.shape[:-3])
            _, shift = recover_focal_shift(points, solve_mask, focal=focal)
        fx = focal / 2 * (1 + aspect_ratio ** 2) ** 0.5 / aspect_ratio
        fy = focal / 2 * (1 + aspect_ratio ** 2) ** 0.5
        intrinsics = intrinsics_from_focal_center(fx, fy, jnp.float32(0.5), jnp.float32(0.5))
        points = points.at[..., 2].add(shift[..., None, None])
        if mask_binary is not None:
            mask_binary = mask_binary & (points[..., 2] > 0)
        depth = points[..., 2]

        if force_projection:
            points = depth_map_to_point_map(depth, intrinsics)

        if metric_scale is not None:
            points = points * metric_scale[..., None, None, None]
            depth = depth * metric_scale[..., None, None]

        if apply_mask and mask_binary is not None:
            points = jnp.where(mask_binary[..., None], points, jnp.inf)
            depth = jnp.where(mask_binary, depth, jnp.inf)
            if normal is not None:
                normal = jnp.where(mask_binary[..., None], normal, 0.0)

        result["points"] = points
        result["depth"] = depth
        result["intrinsics"] = intrinsics
    if mask_binary is not None:
        result["mask"] = mask_binary
    if normal is not None:
        result["normal"] = normal
    return result


class MoGeModel:
    """User-facing MoGe-2 wrapper: holds (module, params), jits per shape.

    API mirrors reference MoGeModel (v2.py:194-303): ``infer(image, ...)``
    with the same kwargs and output dict keys.
    """

    version = "v2"

    def __init__(self, config: Dict[str, Any], params: Any, dtype: Any = jnp.bfloat16, use_flash: bool = True,
                 scan_blocks: bool = False, sp_mesh: Optional[Any] = None,
                 use_int8: bool = False):
        config = dict(config)
        config.pop("model_version", None)
        # Drop deprecated/unknown kwargs like the reference does (v2.py:42-43).
        known = {
            "encoder", "neck", "points_head", "mask_head", "normal_head",
            "scale_head", "remap_output", "num_tokens_range",
        }
        config = {k: v for k, v in config.items() if k in known}
        self.config = config
        self.dtype = dtype
        self.use_flash = use_flash
        self.scan_blocks = scan_blocks
        # Sequence-parallel inference: a jax Mesh with an 'sp' axis. The
        # decode program is shard_map'ed over it — the encoder's token axis
        # is split across devices (attention all-gathers K/V), the decoder
        # runs replicated. Params stay replicated; see parallel/sp.py.
        self.sp_mesh = sp_mesh
        # W8A8 int8 encoder matmuls — a serving-mode compute path (~1e-2
        # output drift vs bf16; see ops/quant.py). Not the parity path.
        self.use_int8 = use_int8
        if params is not None:
            from .convert import adapt_block_layout

            params = adapt_block_layout(params, stacked=scan_blocks)
        self._modules: Dict[Any, MoGeV2] = {}
        self.module = self._module_for(dtype)  # default-compute module
        self.params = params
        self.num_tokens_range = config.get("num_tokens_range", [1200, 3600])
        self._jit_cache: Dict[Any, Any] = {}

    def _module_for(self, dtype) -> MoGeV2:
        key = jnp.dtype(dtype).name
        if key not in self._modules:
            sp_kwargs = {}
            if self.sp_mesh is not None:
                sp_kwargs = dict(sp_axis="sp", sp_size=self.sp_mesh.shape["sp"])
            self._modules[key] = MoGeV2(**self.config, dtype=dtype, use_flash=self.use_flash,
                                        scan_blocks=self.scan_blocks, use_int8=self.use_int8,
                                        **sp_kwargs)
        return self._modules[key]

    @classmethod
    def from_pretrained(cls, path, model_kwargs: Optional[Dict[str, Any]] = None, dtype: Any = jnp.bfloat16):
        from .io import load_checkpoint

        config, params = load_checkpoint(path, version="v2")
        if model_kwargs:
            config.update(model_kwargs)
        return cls(config, params, dtype=dtype)

    def init_random(self, seed: int = 0, image_hw: Tuple[int, int] = (224, 224)) -> "MoGeModel":
        """Initialize random params (for tests / training from scratch)."""
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, *image_hw, 3), jnp.float32)
        # jit the init: eager linen init dispatches thousands of tiny ops
        self.params = jax.jit(self.module.init, static_argnums=(2,))(rng, dummy, 1200)["params"]
        return self

    def forward(self, image: jax.Array, num_tokens: int) -> Dict[str, jax.Array]:
        return self.module.apply({"params": self.params}, image, num_tokens)

    # ---- infer program cache: the expensive decode program is keyed only by
    # (base_h, base_w, aspect, batch); the per-resolution resize-in and
    # epilogue+postprocess programs compile in seconds, so new input sizes of
    # a known aspect/token budget don't pay the multi-minute model compile.

    def _decode_fn(self, base_h: int, base_w: int, dtype):
        # aspect_ratio enters as a TRACED scalar: one decode compile serves
        # every aspect that rounds to the same integer token grid.
        key = ("decode", base_h, base_w, jnp.dtype(dtype).name)
        if key not in self._jit_cache:
            module = self._module_for(dtype)
            fn = lambda params, image_14, aspect: module.apply(
                {"params": params}, image_14, base_h, base_w, aspect, True,
                method=MoGeV2.decode,
            )
            if self.sp_mesh is not None:
                from jax.sharding import PartitionSpec as P

                fn = jax.shard_map(fn, mesh=self.sp_mesh, in_specs=(P(), P(), P()),
                                   out_specs=P(), check_vma=False)
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def _resize_in_fn(self, base_h: int, base_w: int):
        key = ("resize_in", base_h, base_w)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda image: resize_2d(image, (base_h * 14, base_w * 14), mode="bilinear", antialias=True)
            )
        return self._jit_cache[key]

    def _post_fn(self, img_h: int, img_w: int, aspect_ratio: float, has_fov: bool,
                 force_projection: bool, apply_mask: bool):
        key = ("post", img_h, img_w, aspect_ratio, has_fov, force_projection, apply_mask)
        if key not in self._jit_cache:
            remap = self.config.get("remap_output", "linear")

            @jax.jit
            def fn(raw, fov_x):
                full = apply_epilogue(raw, img_h, img_w, remap)
                return postprocess(
                    full,
                    aspect_ratio=aspect_ratio,
                    fov_x=fov_x if has_fov else None,
                    force_projection=force_projection,
                    apply_mask=apply_mask,
                )

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def infer(
        self,
        image,
        num_tokens: Optional[int] = None,
        resolution_level: int = 9,
        force_projection: bool = True,
        apply_mask: bool = True,
        fov_x: Optional[Union[Number, jax.Array]] = None,
        use_fp16: bool = True,
    ) -> Dict[str, jax.Array]:
        """Single-call inference with camera recovery (reference v2.py:194-303)."""
        image = jnp.asarray(image)
        omit_batch_dim = image.ndim == 3
        if omit_batch_dim:
            image = image[None]
        if image.shape[-1] != 3:  # accept NCHW for drop-in compatibility
            image = jnp.moveaxis(image, -3, -1)
        image = image.astype(jnp.float32)

        h, w = image.shape[-3], image.shape[-2]
        aspect_ratio = w / h
        if num_tokens is None:
            mn, mx = self.num_tokens_range
            num_tokens = int(mn + (resolution_level / 9) * (mx - mn))
        base_h, base_w = base_token_grid(num_tokens, aspect_ratio)
        # use_fp16 toggles reduced-precision compute (bf16, the TPU equivalent
        # of the reference's fp16 autocast, v2.py:241); False -> full fp32.
        compute_dtype = self.dtype if use_fp16 else jnp.float32

        image_14 = self._resize_in_fn(base_h, base_w)(image)
        raw = self._decode_fn(base_h, base_w, compute_dtype)(
            self.params, image_14, jnp.float32(aspect_ratio)
        )
        fov_arr = jnp.asarray(fov_x, dtype=jnp.float32) if fov_x is not None else jnp.float32(0)
        out = self._post_fn(h, w, aspect_ratio, fov_x is not None, force_projection, apply_mask)(raw, fov_arr)
        if omit_batch_dim:
            out = {k: v[0] for k, v in out.items()}
        return out
