"""MoGe building blocks, TPU-native NHWC (flax.linen).

Functional equivalents of reference moge/model/modules.py (ResidualConvBlock,
DINOv2Encoder, Resampler, MLP, ConvStack), redesigned for XLA/TPU:

  * all convs NHWC with explicit replicate (edge) padding;
  * kernel==stride transposed conv (the reference's learned x2 upsampler,
    modules.py:160-165) is a single MXU matmul + depth-to-space reshape;
  * pixel shuffle/unshuffle are pure reshape/transposes;
  * bilinear/nearest upsampling uses the torch-exact matmul resampler;
  * norm statistics in fp32 under bf16 activations.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.conv import (conv3x3_replicate, conv3x3_up2_bilinear, conv3x3_chain,
                        chain_geometry, from_chain, use_chain_conv, _group_size)
from ..ops.resize import resize_2d
from ..ops.geometry import normalized_view_plane_uv
from .dinov2 import VIT_ARCHS, DinoViT

# ImageNet normalization (reference modules.py:96-97).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _activation(name: str):
    if name == "relu":
        return nn.relu
    if name == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if name == "silu":
        return nn.silu
    if name == "elu":
        return nn.elu
    raise ValueError(f"Unsupported activation function: {name}")


def group_norm_fp32(x: jax.Array, num_groups: int, scale, bias, eps: float = 1e-5) -> jax.Array:
    """GroupNorm over NHWC with fp32 statistics (torch GroupNorm semantics)."""
    dtype = x.dtype
    b, h, w, c = x.shape
    x32 = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 4), keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    if scale is not None:
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def instance_norm_fp32(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch InstanceNorm2d (affine=False) over NHWC with fp32 statistics."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


class Norm2d(nn.Module):
    """Config-selected norm (reference modules.py:48-57)."""

    kind: str  # 'group_norm' | 'layer_norm' | 'instance_norm' | 'none'
    channels: int

    @nn.compact
    def __call__(self, x):
        if self.kind == "none":
            return x
        if self.kind == "instance_norm":
            return instance_norm_fp32(x)
        groups = self.channels // 32 if self.kind == "group_norm" else 1
        scale = self.param("scale", nn.initializers.ones, (self.channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        return group_norm_fp32(x, groups, scale, bias)


class _Conv3x3(nn.Module):
    """Parameter container matching nn.Conv's tree ({kernel, bias}) that
    dispatches to the pallas pair-domain kernel for thin-channel bf16 convs
    (see ops/conv.py) and the XLA formulation otherwise."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, input_relu=False, fold_w=None, fold_b=None, up2=False,
                 chain_g=None, img_w=None, chain_in=False, chain_out=False):
        c = x.shape[-1] // chain_g if (chain_g is not None and chain_in) else x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if fold_w is not None:
            # Fold a following linear projection into the conv (exact in fp32).
            kernel = jnp.einsum("hwco,op->hwcp", kernel, fold_w)
            bias = bias @ fold_w + (0.0 if fold_b is None else fold_b)
        if up2:
            assert residual is None and not input_relu
            if chain_g is not None and chain_in:
                return conv3x3_up2_bilinear(x.astype(self.dtype), kernel, bias,
                                            chain_g=chain_g, img_w=img_w)
            return conv3x3_up2_bilinear(x.astype(self.dtype), kernel, bias)
        if chain_g is not None and (chain_in or chain_out):
            return conv3x3_chain(x.astype(self.dtype), kernel, bias, residual, input_relu,
                                 g=chain_g, img_w=img_w, chain_in=chain_in, chain_out=chain_out)
        return conv3x3_replicate(x.astype(self.dtype), kernel, bias, residual, input_relu)


class Conv2d(nn.Module):
    """NHWC conv with replicate padding (torch padding_mode='replicate').

    k==3 routes through ops/conv.py (pallas pair-domain kernel on TPU for
    C<128 where XLA runs at ~19 TF/s on v5e; XLA conv otherwise — it is
    already at the MXU roofline for C>=128). Other kernel sizes keep the
    plain XLA conv.
    """

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, input_relu=False, fold_w=None, fold_b=None, up2=False,
                 chain_g=None, img_w=None, chain_in=False, chain_out=False):
        k = self.kernel_size
        if k == 3:
            return _Conv3x3(self.features, dtype=self.dtype, name="conv")(
                x, residual, input_relu, fold_w, fold_b, up2,
                chain_g=chain_g, img_w=img_w, chain_in=chain_in, chain_out=chain_out)
        assert not up2, "fused upsample requires kernel_size == 3"
        if input_relu:
            x = jnp.maximum(x, 0)
        if k > 1:
            pad = k // 2
            x = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="edge")
        y = nn.Conv(
            self.features, (k, k), padding="VALID", dtype=self.dtype, param_dtype=jnp.float32,
            name="conv",
        )(x)
        if fold_w is not None:
            y = y @ fold_w.astype(y.dtype) + (0.0 if fold_b is None else fold_b.astype(y.dtype))
        return y if residual is None else y + residual


class ResidualConvBlock(nn.Module):
    """Reference modules.py:18-68: [norm, act, conv3, norm, act, conv3] + skip."""

    in_channels: int
    out_channels: Optional[int] = None
    hidden_channels: Optional[int] = None
    kernel_size: int = 3
    activation: str = "relu"
    in_norm: str = "layer_norm"
    hidden_norm: str = "group_norm"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, chain_g=None, img_w=None, chain_out=True):
        out_ch = self.out_channels or self.in_channels
        hid_ch = self.hidden_channels or self.in_channels
        act = _activation(self.activation)

        if chain_g is not None:
            # Chained group-domain path (caller guarantees: relu, no norms,
            # in == out channels, chain-compatible hidden width).
            assert (self.activation == "relu" and self.in_norm == "none"
                    and self.hidden_norm == "none" and out_ch == self.in_channels)
            h = Conv2d(hid_ch, self.kernel_size, dtype=self.dtype, name="conv1")(
                x, input_relu=True, chain_g=chain_g, img_w=img_w,
                chain_in=True, chain_out=True)
            return Conv2d(out_ch, self.kernel_size, dtype=self.dtype, name="conv2")(
                h, residual=x, input_relu=True, chain_g=chain_g, img_w=img_w,
                chain_in=True, chain_out=chain_out)

        skip = x
        if self.in_channels != out_ch:
            skip = nn.Dense(out_ch, dtype=self.dtype, param_dtype=jnp.float32, name="skip")(x)

        # relu folds into the conv kernel (exact; see ops/conv.py), removing
        # two elementwise HBM round-trips per block on TPU.
        fuse_relu = self.activation == "relu"
        h = Norm2d(self.in_norm, self.in_channels, name="norm1")(x)
        if not fuse_relu:
            h = act(h)
        h = Conv2d(hid_ch, self.kernel_size, dtype=self.dtype, name="conv1")(h, input_relu=fuse_relu)
        h = Norm2d(self.hidden_norm, hid_ch, name="norm2")(h)
        if not fuse_relu:
            h = act(h)
        return Conv2d(out_ch, self.kernel_size, dtype=self.dtype, name="conv2")(
            h, residual=skip, input_relu=fuse_relu)


class ConvTranspose2x(nn.Module):
    """ConvTranspose2d(kernel=scale, stride=scale) as matmul + depth-to-space.

    torch weight (I, O, s, s): y[2i+di, 2j+dj, o] = sum_c x[i,j,c] W[c,o,di,dj].
    """

    features: int
    scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        s, o = self.scale, self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (c, s, s, o), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (o,), jnp.float32)
        y = jnp.einsum("bhwc,cijo->bhwijo", x, kernel.astype(x.dtype))
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, w * s, o)  # (b, h, di, w, dj, o)
        return y + bias.astype(y.dtype)


def pixel_shuffle(x: jax.Array, scale: int) -> jax.Array:
    """torch PixelShuffle: NHWC input channels ordered (C, di, dj)."""
    b, h, w, c = x.shape
    s = scale
    x = x.reshape(b, h, w, c // (s * s), s, s)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * s, w * s, c // (s * s))


def pixel_unshuffle(x: jax.Array, scale: int) -> jax.Array:
    b, h, w, c = x.shape
    s = scale
    x = x.reshape(b, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // s, w // s, c * s * s)


class Resampler(nn.Module):
    """x2 up/down sampling in 7 flavours (reference modules.py:139-182)."""

    in_channels: int
    out_channels: int
    type_: str
    scale_factor: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fold_w=None, fold_b=None, chain_g=None, img_w=None,
                 chain_x=False, chain_out=False, post_residual=None):
        t, s = self.type_, self.scale_factor
        fold = dict(fold_w=fold_w, fold_b=fold_b)
        if t == "pixel_shuffle":
            x = Conv2d(self.out_channels * s * s, 3, dtype=self.dtype, name="conv_pre")(x)
            x = pixel_shuffle(x, s)
            x = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv_post")(x, **fold)
        elif t == "bilinear" and s == 2:
            # Fused upsample+conv (exact; see ops/conv.py:up2_conv3_weights).
            x = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv_post")(
                x, up2=True, chain_g=chain_g, img_w=img_w, chain_in=chain_x, **fold)
        elif t in ("nearest", "bilinear"):
            b, h, w, _ = x.shape
            x = resize_2d(x, (h * s, w * s), mode=t, channel_last=True)
            x = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv_post")(x, **fold)
        elif t == "conv_transpose":
            x = ConvTranspose2x(self.out_channels, s, dtype=self.dtype, name="deconv")(x)
            x = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv_post")(
                x, residual=post_residual, chain_g=chain_g, img_w=img_w,
                chain_in=False, chain_out=chain_out, **fold)
        elif t == "pixel_unshuffle":
            x = pixel_unshuffle(x, s)
            x = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv_post")(x, **fold)
        elif t == "avg_pool":
            # avg_pool is linear, so a fold into conv_pre commutes with it.
            x = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv_pre")(x, **fold)
            x = nn.avg_pool(x, (s, s), strides=(s, s))
        elif t == "max_pool":
            if fold_w is not None:
                raise ValueError("cannot fold a projection through max_pool")
            x = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv_pre")(x)
            x = nn.max_pool(x, (s, s), strides=(s, s))
        else:
            raise ValueError(f"Unsupported resampler type: {t}")
        return x


class MLP(nn.Module):
    """Linear/ReLU stack (reference modules.py:184-192)."""

    dims: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, dim_out in enumerate(self.dims[1:-1]):
            x = nn.Dense(dim_out, dtype=self.dtype, param_dtype=jnp.float32, name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.dims[-1], dtype=self.dtype, param_dtype=jnp.float32, name=f"fc{len(self.dims) - 2}")(x)


class _Proj(nn.Module):
    """Linear projection with nn.Dense's parameter tree ({kernel, bias}),
    exposing the weights so ConvStack can fold them into adjacent convs."""

    in_features: int
    features: int
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

    def __call__(self, x):
        y = x.astype(self.dtype) @ self.kernel.astype(self.dtype)
        return y + self.bias.astype(y.dtype)


class ConvStack(nn.Module):
    """Multi-scale residual conv pyramid (reference modules.py:195-254).

    ``__call__`` takes a list of per-level input features (or None) and returns
    per-level outputs; level i runs at 2^i x the base resolution.

    When the finest level is purely linear (no res blocks: resample -> +input
    projection -> output projection, the MoGe-2 head epilogue), the two
    projections are folded into the resampler's final 3x3 conv — exact linear
    algebra that removes the separate projection passes and the TPU layout
    copies XLA inserts around them at the largest spatial size.
    """

    dim_in: Union[Optional[int], Sequence[Optional[int]]]
    dim_res_blocks: Sequence[int]
    dim_out: Union[Optional[int], Sequence[Optional[int]]]
    resamplers: Union[str, Sequence[str]]
    dim_times_res_block_hidden: int = 1
    num_res_blocks: Union[int, Sequence[int]] = 1
    res_block_in_norm: str = "layer_norm"
    res_block_hidden_norm: str = "group_norm"
    activation: str = "relu"
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, in_features: List[Optional[jax.Array]]) -> List[Optional[jax.Array]]:
        n = len(self.dim_res_blocks)
        dims_in = self.dim_in if isinstance(self.dim_in, (list, tuple)) else [self.dim_in] * n
        dims_out = self.dim_out if isinstance(self.dim_out, (list, tuple)) else [self.dim_out] * n
        res_counts = (
            self.num_res_blocks if isinstance(self.num_res_blocks, (list, tuple)) else [self.num_res_blocks] * n
        )
        resampler_types = (
            self.resamplers if isinstance(self.resamplers, (list, tuple)) else [self.resamplers] * (n - 1)
        )

        res_block_cls = nn.remat(ResidualConvBlock) if self.remat else ResidualConvBlock
        resampler_cls = nn.remat(Resampler) if self.remat else Resampler

        # Finest-level linear epilogue -> fold projections into the resampler
        # conv (TPU path; exact). Padded to >=32 output lanes for the kernel.
        fuse_last = (
            n >= 2
            and res_counts[n - 1] == 0
            and dims_out[n - 1] is not None
            and resampler_types[n - 2] != "max_pool"
        )

        # Chained group-domain decode (TPU inference fast path): consecutive
        # convs of a level exchange pallas chain tensors so XLA inserts no
        # pad/relayout passes between them (see ops/conv.py:conv3x3_chain).
        chain_mode = (
            not self.remat
            and self.dtype == jnp.bfloat16
            and self.activation == "relu"
            and self.res_block_in_norm == "none"
            and self.res_block_hidden_norm == "none"
            and use_chain_conv()
        )

        def level_chain_g(i, h, w):
            """g if level i's conv chain is pallas-supported at (h, w)."""
            if not chain_mode or res_counts[i] < 1:
                return None
            dim = self.dim_res_blocks[i]
            hid = self.dim_times_res_block_hidden * dim
            g = chain_geometry(h, w, dim, max(dim, hid))
            if g is None or _group_size(hid) != g:
                return None
            if hid != dim and chain_geometry(h, w, hid, dim) != g:
                return None
            return g

        out_features: List[Optional[jax.Array]] = []
        x = None          # image-domain features at the current level
        x_ch = None       # chain-domain features (set instead of x when chained)
        ch_g = None
        ch_hw = None      # (H, W) of the current level when x_ch is set
        wo = bo = None  # padded fold weights, set at i == n-2 when fusing
        for i, dim in enumerate(self.dim_res_blocks):
            feat = in_features[i] if i < len(in_features) else None
            in_proj = None
            if dims_in[i] is not None and feat is not None:
                in_proj = _Proj(dims_in[i], dim, dtype=self.dtype, name=f"input_{i}")
            if fuse_last and i == n - 1:
                p_out = dims_out[i]
                # x arrived from resampler_{n-2} with wo/bo already folded in.
                out = x
                if in_proj is not None:
                    wi = in_proj.kernel @ wo  # (dims_in, p_pad); out-bias only once
                    bi = in_proj.bias @ wo
                    out = out + (feat.astype(self.dtype) @ wi.astype(self.dtype)
                                 + bi.astype(self.dtype))
                elif feat is not None:
                    out = out + feat.astype(self.dtype) @ wo.astype(self.dtype)
                out_features.append(out[..., :p_out])
                break
            if in_proj is not None:
                feat = in_proj(feat)
            if i == 0:
                x = feat
            elif x_ch is None and feat is not None:
                x = x + feat
            # (in chain mode the feat add was fused into conv_post's residual)
            for j in range(res_counts[i]):
                block = res_block_cls(
                    in_channels=dim,
                    hidden_channels=self.dim_times_res_block_hidden * dim,
                    activation=self.activation,
                    in_norm=self.res_block_in_norm,
                    hidden_norm=self.res_block_hidden_norm,
                    dtype=self.dtype,
                    name=f"res_{i}_{j}",
                )
                if x_ch is not None:
                    # The last block exits to image unless the fused up2
                    # resampler consumes the chain directly.
                    last = j == res_counts[i] - 1
                    keep_chain = not last or (
                        fuse_last and i == n - 2 and resampler_types[i] == "bilinear")
                    y = block(x_ch, chain_g=ch_g, img_w=ch_hw[1], chain_out=keep_chain)
                    if keep_chain:
                        x_ch = y
                    else:
                        x, x_ch = y, None
                else:
                    x = block(x)
            if x_ch is not None:
                x = from_chain(x_ch, ch_hw[1], dim)
            if dims_out[i] is not None:
                out_features.append(
                    _Proj(dim, dims_out[i], dtype=self.dtype, name=f"output_{i}")(x))
            else:
                out_features.append(x)
            if i < n - 1:
                resampler = resampler_cls(
                    in_channels=dim,
                    out_channels=self.dim_res_blocks[i + 1],
                    type_=resampler_types[i],
                    dtype=self.dtype,
                    name=f"resampler_{i}",
                )
                hw = ch_hw if x_ch is not None else (x.shape[1], x.shape[2])
                if fuse_last and i == n - 2:
                    nxt = self.dim_res_blocks[n - 1]
                    p_out = dims_out[n - 1]
                    if resampler_types[n - 2] == "bilinear":
                        # Fused up2 emits 4*p_pad phase-packed channels per
                        # lane group of g columns; the smallest p_pad filling
                        # full 128 lanes halves the kernel + depth-to-space
                        # cost vs a blanket pad of 32 (exact: zero weights).
                        gq = _group_size(self.dim_res_blocks[n - 2]) or 1
                        quantum = max(128 // (4 * gq), 8)
                        p_pad = max(-(-p_out // quantum) * quantum, quantum)
                    else:
                        p_pad = max(p_out, 32)
                    out_proj = _Proj(nxt, p_out, dtype=self.dtype, name=f"output_{n - 1}")
                    wo = jnp.zeros((nxt, p_pad), jnp.float32).at[:, :p_out].set(out_proj.kernel)
                    bo = jnp.zeros((p_pad,), jnp.float32).at[:p_out].set(out_proj.bias)
                    if x_ch is not None and resampler_types[i] == "bilinear":
                        x = resampler(x_ch, fold_w=wo, fold_b=bo,
                                      chain_g=ch_g, img_w=hw[1], chain_x=True)
                    else:
                        x = resampler(x, fold_w=wo, fold_b=bo)
                    x_ch = None
                else:
                    h2, w2 = 2 * hw[0], 2 * hw[1]
                    g2 = (level_chain_g(i + 1, h2, w2)
                          if resampler_types[i] == "conv_transpose" else None)
                    nxt_feat = in_features[i + 1] if i + 1 < len(in_features) else None
                    if g2 is not None:
                        # conv_post emits chain format; the level-(i+1) input
                        # projection is folded in as the conv's residual.
                        post_res = None
                        if dims_in[i + 1] is not None and nxt_feat is not None:
                            post_res = _Proj(dims_in[i + 1], self.dim_res_blocks[i + 1],
                                             dtype=self.dtype, name=f"input_{i + 1}")(nxt_feat)
                        elif nxt_feat is not None:
                            post_res = nxt_feat
                        x_ch = resampler(x, chain_g=g2, img_w=w2, chain_out=True,
                                         post_residual=post_res)
                        x = None
                        ch_g, ch_hw = g2, (h2, w2)
                        # mark the level-(i+1) feat as consumed
                        in_features = list(in_features)
                        if i + 1 < len(in_features):
                            in_features[i + 1] = None
                    else:
                        x = resampler(x)
                        x_ch = None
        return out_features


class DINOv2Encoder(nn.Module):
    """ViT encoder wrapper (reference modules.py:71-136): resize to the token
    grid, ImageNet-normalize, collect intermediate layers, 1x1-project & sum.
    """

    backbone: str
    intermediate_layers: Union[int, Sequence[int]]
    dim_out: int
    dtype: Any = jnp.float32
    remat: bool = False
    use_flash: bool = False
    scan_blocks: bool = False
    sp_axis: Optional[str] = None  # sequence-parallel token axis (parallel/sp.py)
    sp_size: int = 1
    use_int8: bool = False  # W8A8 int8 block matmuls (opt-in serving mode)

    @property
    def take_layers(self) -> Tuple[int, ...]:
        cfg = VIT_ARCHS[self.backbone]
        if isinstance(self.intermediate_layers, int):
            return tuple(range(cfg.depth - self.intermediate_layers, cfg.depth))
        return tuple(self.intermediate_layers)

    @nn.compact
    def __call__(
        self, image: jax.Array, token_rows: int, token_cols: int, return_class_token: bool = False,
        pre_resized: bool = False,
    ):
        """``image``: (B, H, W, 3) RGB in [0, 1], fp32. Returns
        (B, token_rows, token_cols, dim_out) features [+ cls (B, D)].
        ``pre_resized``: input is already (14*rows, 14*cols) — lets callers
        hoist the resolution-dependent resize out of this program."""
        cfg = VIT_ARCHS[self.backbone]
        p = cfg.patch_size
        # Resize + normalize in fp32 (the reference's autocast keeps these fp32).
        if pre_resized:
            image_14 = image.astype(jnp.float32)
        else:
            image_14 = resize_2d(
                image.astype(jnp.float32), (token_rows * p, token_cols * p), mode="bilinear", antialias=True
            )
        mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
        std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
        image_14 = (image_14 - mean) / std

        features = DinoViT(
            config=cfg, dtype=self.dtype, remat=self.remat, use_flash=self.use_flash,
            scan_blocks=self.scan_blocks, sp_axis=self.sp_axis, sp_size=self.sp_size,
            use_int8=self.use_int8, name="backbone"
        )(image_14, self.take_layers)

        b = image.shape[0]
        x = None
        for i, (patches, _cls) in enumerate(features):
            feat = patches.reshape(b, token_rows, token_cols, cfg.embed_dim)
            proj = nn.Dense(self.dim_out, dtype=self.dtype, param_dtype=jnp.float32, name=f"proj_{i}")(feat)
            x = proj if x is None else x + proj

        if return_class_token:
            return x, features[-1][1]
        return x


def make_level_uv(
    base_h: int, base_w: int, num_levels: int, aspect_ratio, batch: int, dtype
) -> List[jax.Array]:
    """Per-level aspect-ratio UV conditioning maps (reference v2.py:153-160).

    ``aspect_ratio`` may be a traced jnp scalar: the grids are then computed
    with jnp (static shapes, dynamic span), which lets the expensive decode
    program be keyed only by the integer token grid — images with different
    aspect ratios that round to the same (base_h, base_w) share one compile.
    """
    if isinstance(aspect_ratio, (int, float)):
        uvs = []
        for level in range(num_levels):
            uv = normalized_view_plane_uv(
                width=base_w * 2 ** level, height=base_h * 2 ** level, aspect_ratio=aspect_ratio, dtype=dtype
            )
            uvs.append(jnp.broadcast_to(uv[None], (batch, *uv.shape)))
        return uvs

    ar = jnp.asarray(aspect_ratio, jnp.float32)
    span_x = ar / jnp.sqrt(1 + ar ** 2)
    span_y = 1 / jnp.sqrt(1 + ar ** 2)
    uvs = []
    for level in range(num_levels):
        w = base_w * 2 ** level
        h = base_h * 2 ** level
        # linspace over pixel centers with traced endpoints (same formula as
        # normalized_view_plane_uv; shapes static, values dynamic)
        iu = jnp.arange(w, dtype=jnp.float32)
        iv = jnp.arange(h, dtype=jnp.float32)
        lo_u, hi_u = -span_x * (w - 1) / w, span_x * (w - 1) / w
        lo_v, hi_v = -span_y * (h - 1) / h, span_y * (h - 1) / h
        u = lo_u + (hi_u - lo_u) * (iu / max(w - 1, 1))
        v = lo_v + (hi_v - lo_v) * (iv / max(h - 1, 1))
        uv = jnp.stack(jnp.meshgrid(u, v, indexing="xy"), axis=-1).astype(dtype)
        uvs.append(jnp.broadcast_to(uv[None], (batch, *uv.shape)))
    return uvs
