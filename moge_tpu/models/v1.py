"""MoGe-1: monolithic encoder+head monocular geometry model (TPU-native).

Mirrors reference moge/model/v1.py: single `Head` with a ConvTranspose
upsampling pyramid and per-stage UV conditioning; points(3)+mask(1) outputs;
input resized by token budget *before* the backbone (v1.py:269-299); mask is
thresholded on the raw (non-sigmoid) output (v1.py:356).
"""

from __future__ import annotations

from numbers import Number
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.geometry import depth_map_to_point_map, intrinsics_from_focal_center, normalized_view_plane_uv
from ..ops.resize import resize_2d
from ..ops.solvers import recover_focal_shift
from .modules import Conv2d, ConvTranspose2x, ResidualConvBlock, DINOv2Encoder
from .dinov2 import VIT_ARCHS, DinoViT
from .v2 import remap_points


class HeadUpsampleStage(nn.Module):
    """[ConvTranspose2d(k=2,s=2), Conv2d 3x3] + res blocks (reference v1.py:82-101)."""

    out_channels: int
    num_res_blocks: int
    dim_times_res_block_hidden: int
    res_block_norm: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvTranspose2x(self.out_channels, 2, dtype=self.dtype, name="deconv")(x)
        x = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv")(x)
        for j in range(self.num_res_blocks):
            # v1 ResidualConvBlock: in_norm = GroupNorm(1) ('layer_norm'), hidden
            # norm selected by res_block_norm (reference v1.py:43-50).
            x = ResidualConvBlock(
                in_channels=self.out_channels,
                out_channels=self.out_channels,
                hidden_channels=self.dim_times_res_block_hidden * self.out_channels,
                activation="relu",
                in_norm="layer_norm",
                hidden_norm=self.res_block_norm,
                dtype=self.dtype,
                name=f"res_{j}",
            )(x)
        return x


class HeadOutputBlock(nn.Module):
    """[Conv2d 3x3, res blocks, ReLU, Conv2d kxk] (reference v1.py:103-109)."""

    dim_out: int
    last_res_blocks: int
    last_conv_channels: int
    last_conv_size: int
    dim_times_res_block_hidden: int
    res_block_norm: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.last_conv_channels, 3, dtype=self.dtype, name="conv_in")(x)
        for j in range(self.last_res_blocks):
            x = ResidualConvBlock(
                in_channels=self.last_conv_channels,
                out_channels=self.last_conv_channels,
                hidden_channels=self.dim_times_res_block_hidden * self.last_conv_channels,
                activation="relu",
                in_norm="layer_norm",
                hidden_norm=self.res_block_norm,
                dtype=self.dtype,
                name=f"res_{j}",
            )(x)
        x = nn.relu(x)
        x = Conv2d(self.dim_out, self.last_conv_size, dtype=self.dtype, name="conv_out")(x)
        return x


class MoGeV1Head(nn.Module):
    """Reference v1.py:61-142: project+sum features, 3 upsample stages with UV
    concat, bilinear to image size, UV concat, per-output blocks."""

    num_features: int
    dim_out: Sequence[int]
    dim_proj: int = 512
    dim_upsample: Sequence[int] = (256, 128, 128)
    dim_times_res_block_hidden: int = 1
    num_res_blocks: int = 1
    res_block_norm: str = "group_norm"
    last_res_blocks: int = 0
    last_conv_channels: int = 32
    last_conv_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[Tuple[jax.Array, jax.Array]], img_h: int, img_w: int, patch_h: int, patch_w: int):
        batch = features[0][0].shape[0]
        x = None
        for i, (feat, _cls) in enumerate(features):
            f = feat.reshape(batch, patch_h, patch_w, -1)
            proj = nn.Dense(self.dim_proj, dtype=self.dtype, param_dtype=jnp.float32, name=f"proj_{i}")(f)
            x = proj if x is None else x + proj

        for i, out_ch in enumerate(self.dim_upsample):
            uv = normalized_view_plane_uv(
                width=x.shape[-2], height=x.shape[-3], aspect_ratio=img_w / img_h, dtype=x.dtype
            )
            x = jnp.concatenate([x, jnp.broadcast_to(uv[None], (batch, *uv.shape))], axis=-1)
            x = HeadUpsampleStage(
                out_channels=out_ch,
                num_res_blocks=self.num_res_blocks,
                dim_times_res_block_hidden=self.dim_times_res_block_hidden,
                res_block_norm=self.res_block_norm,
                dtype=self.dtype,
                name=f"up_{i}",
            )(x)

        x = resize_2d(x, (img_h, img_w), mode="bilinear", channel_last=True)
        uv = normalized_view_plane_uv(width=img_w, height=img_h, aspect_ratio=img_w / img_h, dtype=x.dtype)
        x = jnp.concatenate([x, jnp.broadcast_to(uv[None], (batch, *uv.shape))], axis=-1)

        outputs = []
        for k, dim_out in enumerate(self.dim_out):
            outputs.append(
                HeadOutputBlock(
                    dim_out=dim_out,
                    last_res_blocks=self.last_res_blocks,
                    last_conv_channels=self.last_conv_channels,
                    last_conv_size=self.last_conv_size,
                    dim_times_res_block_hidden=self.dim_times_res_block_hidden,
                    res_block_norm=self.res_block_norm,
                    dtype=self.dtype,
                    name=f"output_{k}",
                )(x)
            )
        return outputs


class MoGeV1(nn.Module):
    """linen module for MoGe-1 (reference v1.py:145-299)."""

    encoder: str = "dinov2_vitb14"
    intermediate_layers: Union[int, Sequence[int]] = 4
    dim_proj: int = 512
    dim_upsample: Sequence[int] = (256, 128, 128)
    dim_times_res_block_hidden: int = 1
    num_res_blocks: int = 1
    remap_output: str = "linear"
    res_block_norm: str = "group_norm"
    num_tokens_range: Sequence[int] = (1200, 2500)
    last_res_blocks: int = 0
    last_conv_channels: int = 32
    last_conv_size: int = 1
    mask_threshold: float = 0.5
    dtype: Any = jnp.float32
    remat: bool = False
    use_flash: bool = False
    scan_blocks: bool = False

    @property
    def take_layers(self) -> Tuple[int, ...]:
        cfg = VIT_ARCHS[self.encoder]
        if isinstance(self.intermediate_layers, int):
            return tuple(range(cfg.depth - self.intermediate_layers, cfg.depth))
        return tuple(self.intermediate_layers)

    @nn.compact
    def __call__(self, image: jax.Array, num_tokens: int) -> Dict[str, jax.Array]:
        """``image``: (B, H, W, 3) RGB [0,1] fp32. Returns {'points','mask'} at
        (H, W) resolution; mask is raw (not sigmoided), reference v1.py:356."""
        batch, original_h, original_w, _ = image.shape

        # Resize by token budget before the backbone (reference v1.py:273-275).
        resize_factor = ((num_tokens * 14 ** 2) / (original_h * original_w)) ** 0.5
        resized_w, resized_h = int(original_w * resize_factor), int(original_h * resize_factor)
        image = resize_2d(image.astype(jnp.float32), (resized_h, resized_w), mode="bicubic", antialias=True)

        from .modules import IMAGENET_MEAN, IMAGENET_STD

        image_norm = (image - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        patch_h, patch_w = resized_h // 14, resized_w // 14
        image_14 = resize_2d(image_norm, (patch_h * 14, patch_w * 14), mode="bilinear", antialias=True)

        cfg = VIT_ARCHS[self.encoder]
        features = DinoViT(
            config=cfg, dtype=self.dtype, remat=self.remat, use_flash=self.use_flash,
            scan_blocks=self.scan_blocks, name="backbone"
        )(image_14, self.take_layers)

        out = MoGeV1Head(
            num_features=len(self.take_layers),
            dim_out=[3, 1],
            dim_proj=self.dim_proj,
            dim_upsample=self.dim_upsample,
            dim_times_res_block_hidden=self.dim_times_res_block_hidden,
            num_res_blocks=self.num_res_blocks,
            res_block_norm=self.res_block_norm,
            last_res_blocks=self.last_res_blocks,
            last_conv_channels=self.last_conv_channels,
            last_conv_size=self.last_conv_size,
            dtype=self.dtype,
            name="head",
        )(features, resized_h, resized_w, patch_h, patch_w)
        points, mask = out

        # fp32 resize to the original resolution + remap (reference v1.py:289-296).
        points = resize_2d(points.astype(jnp.float32), (original_h, original_w), mode="bilinear", channel_last=True)
        mask = resize_2d(mask.astype(jnp.float32), (original_h, original_w), mode="bilinear", channel_last=True)
        points = remap_points(points, self.remap_output)
        return {"points": points, "mask": mask[..., 0]}


class MoGeModel:
    """User-facing MoGe-1 wrapper (API parity with reference v1.py:301-392)."""

    version = "v1"

    def __init__(self, config: Dict[str, Any], params: Any, dtype: Any = jnp.bfloat16, use_flash: bool = True,
                 scan_blocks: bool = False):
        config = dict(config)
        config.pop("model_version", None)
        if "trained_area_range" in config:  # legacy kwarg (reference v1.py:169-171)
            lo, hi = config.pop("trained_area_range")
            config["num_tokens_range"] = [lo // 14 ** 2, hi // 14 ** 2]
        known = {
            "encoder", "intermediate_layers", "dim_proj", "dim_upsample",
            "dim_times_res_block_hidden", "num_res_blocks", "remap_output",
            "res_block_norm", "num_tokens_range", "last_res_blocks",
            "last_conv_channels", "last_conv_size", "mask_threshold",
        }
        config = {k: v for k, v in config.items() if k in known}
        if config.get("remap_output") in (False,):
            config["remap_output"] = "linear"
        if config.get("remap_output") in (True,):
            config["remap_output"] = "exp"
        self.config = config
        self.scan_blocks = scan_blocks
        if params is not None:
            from .convert import adapt_block_layout

            params = adapt_block_layout(params, stacked=scan_blocks)
        self.module = MoGeV1(**config, dtype=dtype, use_flash=use_flash, scan_blocks=scan_blocks)
        self.params = params
        self.num_tokens_range = config.get("num_tokens_range", [1200, 2500])
        self.mask_threshold = config.get("mask_threshold", 0.5)
        self._jit_cache: Dict[Any, Any] = {}

    @classmethod
    def from_pretrained(cls, path, model_kwargs: Optional[Dict[str, Any]] = None, dtype: Any = jnp.bfloat16):
        from .io import load_checkpoint

        config, params = load_checkpoint(path, version="v1")
        if model_kwargs:
            config.update(model_kwargs)
        return cls(config, params, dtype=dtype)

    def init_random(self, seed: int = 0, image_hw: Tuple[int, int] = (224, 224)) -> "MoGeModel":
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, *image_hw, 3), jnp.float32)
        # jit the init: eager linen init dispatches thousands of tiny ops
        self.params = jax.jit(self.module.init, static_argnums=(2,))(rng, dummy, 1200)["params"]
        return self

    def forward(self, image: jax.Array, num_tokens: int) -> Dict[str, jax.Array]:
        return self.module.apply({"params": self.params}, image, num_tokens)

    def _infer_fn(self, key):
        (num_tokens, aspect_ratio, has_fov, force_projection, apply_mask) = key

        @jax.jit
        def fn(params, image, fov_x):
            out = self.module.apply({"params": params}, image, num_tokens)
            points = out["points"].astype(jnp.float32)
            mask = out["mask"].astype(jnp.float32)
            mask_binary = mask > self.mask_threshold

            if has_fov:
                fov = jnp.deg2rad(fov_x)
                focal = aspect_ratio / (1 + aspect_ratio ** 2) ** 0.5 / jnp.tan(fov / 2)
                focal = jnp.broadcast_to(focal, points.shape[:-3])
                _, shift = recover_focal_shift(points, mask_binary, focal=focal)
            else:
                focal, shift = recover_focal_shift(points, mask_binary)
            fx = focal / 2 * (1 + aspect_ratio ** 2) ** 0.5 / aspect_ratio
            fy = focal / 2 * (1 + aspect_ratio ** 2) ** 0.5
            intrinsics = intrinsics_from_focal_center(fx, fy, jnp.float32(0.5), jnp.float32(0.5))
            depth = points[..., 2] + shift[..., None, None]

            if force_projection:
                points = depth_map_to_point_map(depth, intrinsics)
            else:
                points = points.at[..., 2].add(shift[..., None, None])

            if apply_mask:
                points = jnp.where(mask_binary[..., None], points, jnp.inf)
                depth = jnp.where(mask_binary, depth, jnp.inf)

            return {"points": points, "intrinsics": intrinsics, "depth": depth, "mask": mask_binary}

        return fn

    def infer(
        self,
        image,
        fov_x: Optional[Union[Number, jax.Array]] = None,
        resolution_level: int = 9,
        num_tokens: Optional[int] = None,
        apply_mask: bool = True,
        force_projection: bool = True,
        use_fp16: bool = True,
    ) -> Dict[str, jax.Array]:
        image = jnp.asarray(image)
        omit_batch_dim = image.ndim == 3
        if omit_batch_dim:
            image = image[None]
        if image.shape[-1] != 3:
            image = jnp.moveaxis(image, -3, -1)
        image = image.astype(jnp.float32)

        h, w = image.shape[-3], image.shape[-2]
        aspect_ratio = w / h
        if num_tokens is None:
            mn, mx = self.num_tokens_range
            num_tokens = int(mn + (resolution_level / 9) * (mx - mn))

        key = (num_tokens, aspect_ratio, fov_x is not None, force_projection, apply_mask, h, w)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._infer_fn(key[:5])
        fov_arr = jnp.asarray(fov_x, dtype=jnp.float32) if fov_x is not None else jnp.float32(0)
        out = self._jit_cache[key](self.params, image, fov_arr)
        if omit_batch_dim:
            out = {k: v[0] for k, v in out.items()}
        return out
