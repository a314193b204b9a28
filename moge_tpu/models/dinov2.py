"""DINOv2 vision transformer, TPU-native (flax.linen).

Functionally equivalent to the torch DINOv2 vendored by the reference
(moge/model/dinov2/models/vision_transformer.py, layers/*) for the paths MoGe
uses: patch embed -> interpolated pos-embed -> pre-LN blocks with LayerScale ->
`get_intermediate_layers` with shared final LayerNorm. Design differences
(TPU-first, not a translation):

  * patch embedding is a reshape + single MXU matmul (a stride-14 conv with
    kernel==stride is exactly that);
  * attention runs in bf16 on the MXU with fp32 softmax (replaces torch SDPA /
    xformers memory-efficient attention);
  * LayerNorm statistics always in fp32 regardless of activation dtype
    (matches torch autocast numerics);
  * pos-embed interpolation reuses the torch-exact bicubic resampler with the
    historical ``interpolate_offset=0.1`` scale-factor kludge
    (reference vision_transformer.py:187-221), computed in fp32;
  * no nested-tensor/stochastic-depth paths (unused by MoGe: drop_path=0,
    single-size batches).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.attention import scaled_dot_product_attention
from ..ops.norm import layer_norm_fp32  # pallas single-pass kernel on TPU
from ..ops.quant import QuantDense
from ..ops.resize import resize_2d


def _dense(features: int, dtype, use_int8: bool, name: str):
    """nn.Dense or its W8A8 int8 twin (same param tree; ops/quant.py)."""
    if use_int8:
        return QuantDense(features, dtype=dtype, name=name)
    return nn.Dense(features, dtype=dtype, param_dtype=jnp.float32, name=name)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    patch_size: int = 14
    pos_grid: int = 37  # img_size 518 / patch 14 (hub defaults, backbones.py:18-31)
    init_values: Optional[float] = 1.0
    ffn: str = "mlp"  # "mlp" | "swiglu"
    interpolate_offset: float = 0.1
    num_register_tokens: int = 0


# Hub architectures (reference dinov2/models/vision_transformer.py:351-407).
VIT_ARCHS = {
    "dinov2_vits14": ViTConfig(embed_dim=384, depth=12, num_heads=6),
    "dinov2_vitb14": ViTConfig(embed_dim=768, depth=12, num_heads=12),
    "dinov2_vitl14": ViTConfig(embed_dim=1024, depth=24, num_heads=16),
    "dinov2_vitg14": ViTConfig(embed_dim=1536, depth=40, num_heads=24, ffn="swiglu"),
    # tiny arch for tests / multi-chip dryruns (not a published checkpoint)
    "dinov2_vitt14": ViTConfig(embed_dim=192, depth=4, num_heads=3),
}




class LayerNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return layer_norm_fp32(x, scale, bias, self.eps)


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32
    use_flash: bool = False  # pallas flash kernel (inference; fwd-only for now)
    # Sequence parallelism (inside shard_map): x holds this shard's tokens;
    # K/V are all-gathered to the full sequence, of which only the first
    # ``sp_kv_valid`` positions are real (the rest is shard padding).
    sp_axis: Optional[str] = None
    sp_kv_valid: Optional[int] = None
    use_int8: bool = False  # W8A8 MXU matmuls for qkv/proj (ops/quant.py)

    @nn.compact
    def __call__(self, x):
        batch, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = _dense(self.dim * 3, self.dtype, self.use_int8, "qkv")(x)
        qkv = qkv.reshape(batch, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        kv_valid = None
        if self.sp_axis is not None:
            k = jax.lax.all_gather(k, self.sp_axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, self.sp_axis, axis=1, tiled=True)
            kv_valid = self.sp_kv_valid
        # flag on -> auto (flash on TPU, XLA on CPU); flag off -> always XLA
        out = scaled_dot_product_attention(
            q, k, v, use_flash=None if self.use_flash else False, kv_valid=kv_valid)
        out = out.reshape(batch, n, self.dim)
        return _dense(self.dim, self.dtype, self.use_int8, "proj")(out)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32
    use_int8: bool = False

    @nn.compact
    def __call__(self, x):
        x = _dense(self.hidden, self.dtype, self.use_int8, "fc1")(x)
        # torch nn.GELU default = exact erf; the fp32 path matches it exactly.
        # In reduced-precision (bf16) compute the tanh approximation is used:
        # its error (<~1e-3 absolute) sits at the bf16 rounding floor of the
        # activations themselves, and erf costs ~0.15 ms/layer on the VPU at
        # N=3601 (~3.8 ms per ViT-L pass; measured in-jit, see BENCHMARKS.md).
        exact = jnp.dtype(self.dtype) != jnp.bfloat16
        x = nn.gelu(x, approximate=not exact)
        x = _dense(self.dim, self.dtype, self.use_int8, "fc2")(x)
        return x


class SwiGLU(nn.Module):
    """SwiGLUFFNFused (giant arch only; reference dinov2/layers/swiglu_ffn.py)."""

    dim: int
    hidden: int  # already the fused 2/3-adjusted hidden size
    dtype: Any = jnp.float32
    use_int8: bool = False

    @nn.compact
    def __call__(self, x):
        x12 = _dense(2 * self.hidden, self.dtype, self.use_int8, "w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return _dense(self.dim, self.dtype, self.use_int8, "w3")(nn.silu(x1) * x2)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_hidden: int
    use_layer_scale: bool = True
    ffn: str = "mlp"
    dtype: Any = jnp.float32
    use_flash: bool = False
    sp_axis: Optional[str] = None
    sp_kv_valid: Optional[int] = None
    use_int8: bool = False

    @nn.compact
    def __call__(self, x):
        h = LayerNorm(name="norm1")(x)
        h = Attention(self.dim, self.num_heads, dtype=self.dtype, use_flash=self.use_flash,
                      sp_axis=self.sp_axis, sp_kv_valid=self.sp_kv_valid,
                      use_int8=self.use_int8, name="attn")(h)
        if self.use_layer_scale:
            gamma1 = self.param("ls1_gamma", nn.initializers.ones, (self.dim,), jnp.float32)
            h = h * gamma1.astype(h.dtype)
        x = x + h

        h = LayerNorm(name="norm2")(x)
        if self.ffn == "swiglu":
            h = SwiGLU(self.dim, self.mlp_hidden, dtype=self.dtype, use_int8=self.use_int8, name="mlp")(h)
        else:
            h = Mlp(self.dim, self.mlp_hidden, dtype=self.dtype, use_int8=self.use_int8, name="mlp")(h)
        if self.use_layer_scale:
            gamma2 = self.param("ls2_gamma", nn.initializers.ones, (self.dim,), jnp.float32)
            h = h * gamma2.astype(h.dtype)
        return x + h


class _BlockScanBody(nn.Module):
    """Scan body: one transformer block + take-layer buffer update.

    carry = (x, buffer (T, B, N, D)); xs = (is_take (), slot ()) per step.
    Under nn.scan with variable_axes={'params': 0} the block's parameters are
    stacked along a leading depth axis — one compiled block program instead of
    `depth` unrolled copies (ViT-L: 24x smaller HLO, much faster compiles).
    """

    dim: int
    num_heads: int
    mlp_hidden: int
    use_layer_scale: bool
    ffn: str
    dtype: Any
    use_flash: bool
    remat: bool
    sp_axis: Optional[str] = None
    sp_kv_valid: Optional[int] = None
    use_int8: bool = False

    @nn.compact
    def __call__(self, carry, xs):
        x, buf = carry
        is_take, slot = xs
        block_cls = nn.remat(Block) if self.remat else Block
        x = block_cls(
            dim=self.dim,
            num_heads=self.num_heads,
            mlp_hidden=self.mlp_hidden,
            use_layer_scale=self.use_layer_scale,
            ffn=self.ffn,
            dtype=self.dtype,
            use_flash=self.use_flash,
            sp_axis=self.sp_axis,
            sp_kv_valid=self.sp_kv_valid,
            use_int8=self.use_int8,
            name="block",
        )(x)
        buf = jnp.where(is_take, buf.at[slot].set(x), buf)
        return (x, buf), None


class DinoViT(nn.Module):
    """DINOv2 backbone. Input: NHWC image (already resized to multiples of 14
    and ImageNet-normalized). Returns intermediate layers' (patch, cls) tokens.

    ``scan_blocks``: blocks run under lax.scan with depth-stacked parameters
    (fast compiles, for training); default is the unrolled layout
    (params named blocks_{i}; fastest runtime).
    """

    config: ViTConfig
    dtype: Any = jnp.float32
    remat: bool = False
    use_flash: bool = False
    # scan: one compiled block program with depth-stacked params (3.4x faster
    # compiles, measured ~13% slower at runtime) — used for training; the
    # unrolled layout is the inference default.
    scan_blocks: bool = False
    # Sequence parallelism: when sp_axis is set (and the module is applied
    # inside shard_map over a mesh with that axis of size sp_size), the token
    # axis is split into contiguous per-device chunks after the (cheap,
    # replicated) patch embed; every per-token op runs on the local chunk and
    # attention all-gathers K/V over ICI. Params stay fully replicated — no
    # checkpoint-layout change. See parallel/sp.py.
    sp_axis: Optional[str] = None
    sp_size: int = 1
    # W8A8 int8 MXU matmuls for the block projections (opt-in serving mode;
    # ops/quant.py — same param tree, different compute path)
    use_int8: bool = False

    def interpolate_pos_encoding(self, pos_embed: jax.Array, h0: int, w0: int) -> jax.Array:
        """Bicubic pos-embed interpolation with the historical 0.1 offset kludge
        (reference vision_transformer.py:187-221). fp32 compute."""
        cfg = self.config
        M = cfg.pos_grid
        if h0 == M and w0 == M:
            return pos_embed
        pe = pos_embed.astype(jnp.float32)
        class_pe, patch_pe = pe[:, :1], pe[:, 1:]
        dim = pe.shape[-1]
        patch_pe = patch_pe.reshape(1, M, M, dim)
        if cfg.interpolate_offset > 0:
            sf = (float(h0 + cfg.interpolate_offset) / M, float(w0 + cfg.interpolate_offset) / M)
            patch_pe = resize_2d(patch_pe, (h0, w0), mode="bicubic", scale_factor=sf, channel_last=True)
        else:
            patch_pe = resize_2d(patch_pe, (h0, w0), mode="bicubic", channel_last=True)
        patch_pe = patch_pe.reshape(1, h0 * w0, dim)
        return jnp.concatenate([class_pe, patch_pe], axis=1)

    @nn.compact
    def __call__(
        self, image: jax.Array, take_layers: Sequence[int]
    ) -> List[Tuple[jax.Array, jax.Array]]:
        """``image``: (B, H*14, W*14, 3) normalized NHWC. ``take_layers``: block
        indices whose outputs to return (reference get_intermediate_layers).
        Returns [(patch_tokens (B, h0*w0, D), cls_token (B, D)), ...], each
        passed through the shared final LayerNorm.
        """
        cfg = self.config
        b, hpix, wpix, _ = image.shape
        p = cfg.patch_size
        h0, w0 = hpix // p, wpix // p
        dim = cfg.embed_dim

        # Patch embedding: stride-p conv with kernel==stride == reshape+matmul.
        x = image.astype(self.dtype)
        x = x.reshape(b, h0, p, w0, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, h0 * w0, p * p * 3)
        kernel = self.param("patch_kernel", nn.initializers.lecun_normal(), (p * p * 3, dim), jnp.float32)
        pbias = self.param("patch_bias", nn.initializers.zeros, (dim,), jnp.float32)
        x = x @ kernel.astype(self.dtype) + pbias.astype(self.dtype)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, dim), jnp.float32)
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.pos_grid * cfg.pos_grid + 1, dim),
            jnp.float32,
        )

        x = jnp.concatenate([jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, dim)), x], axis=1)
        pe = self.interpolate_pos_encoding(pos_embed, h0, w0)
        x = x + pe.astype(self.dtype)

        if cfg.num_register_tokens:
            reg = self.param(
                "register_tokens", nn.initializers.zeros, (1, cfg.num_register_tokens, dim), jnp.float32
            )
            x = jnp.concatenate(
                [x[:, :1], jnp.broadcast_to(reg.astype(self.dtype), (b, cfg.num_register_tokens, dim)), x[:, 1:]],
                axis=1,
            )

        mlp_hidden = int(dim * cfg.mlp_ratio)
        if cfg.ffn == "swiglu":
            # SwiGLUFFNFused hidden sizing (reference swiglu_ffn.py): 2/3 * 4d,
            # rounded up to a multiple of 8.
            mlp_hidden = (int(dim * cfg.mlp_ratio * 2 / 3) + 7) // 8 * 8

        n_total = x.shape[1]
        sp_kv_valid = None
        if self.sp_axis is not None:
            # contiguous chunk of the (padded) token axis per device; padding
            # sits at the global tail and is masked in attention via kv_valid
            chunk = -(-n_total // self.sp_size)
            x = jnp.pad(x, ((0, 0), (0, chunk * self.sp_size - n_total), (0, 0)))
            idx = jax.lax.axis_index(self.sp_axis)
            x = jax.lax.dynamic_slice_in_dim(x, idx * chunk, chunk, axis=1)
            sp_kv_valid = n_total

        take = sorted(set(int(i) for i in take_layers))
        block_kwargs = dict(
            dim=dim,
            num_heads=cfg.num_heads,
            mlp_hidden=mlp_hidden,
            use_layer_scale=cfg.init_values is not None,
            ffn=cfg.ffn,
            dtype=self.dtype,
            use_flash=self.use_flash,
            sp_axis=self.sp_axis,
            sp_kv_valid=sp_kv_valid,
            use_int8=self.use_int8,
        )

        if self.scan_blocks:
            is_take = np.zeros(cfg.depth, dtype=bool)
            slot = np.zeros(cfg.depth, dtype=np.int32)
            for t, layer in enumerate(take):
                is_take[layer] = True
                slot[layer] = t
            buf0 = jnp.zeros((len(take), *x.shape), self.dtype)
            scan_cls = nn.scan(
                _BlockScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.depth,
                in_axes=0,
            )
            (_x_final, buf), _ = scan_cls(**block_kwargs, remat=self.remat, name="blocks")(
                (x, buf0), (jnp.asarray(is_take), jnp.asarray(slot))
            )
            outputs = [buf[t] for t in range(len(take))]
        else:
            block_cls = nn.remat(Block) if self.remat else Block
            take_set = set(take)
            outputs = []
            for i in range(cfg.depth):
                x = block_cls(**block_kwargs, name=f"blocks_{i}")(x)
                if i in take_set:
                    outputs.append(x)

        norm = LayerNorm(name="norm")
        results = []
        for out in outputs:
            out = norm(out)  # per-token: valid on local chunks too
            if self.sp_axis is not None:
                out = jax.lax.all_gather(out, self.sp_axis, axis=1, tiled=True)[:, :n_total]
            cls = out[:, 0]
            patches = out[:, 1 + cfg.num_register_tokens :]
            results.append((patches, cls))
        return results
