"""Run the MoGe-2 output heads as ONE batched decoder pass.

The reference runs points/normal/mask heads sequentially (moge/model/v2.py:
163-167) — three structurally identical ConvStacks over the same neck
features. On TPU that triples kernel launches, pad passes, and small-level
latency. This module stacks the heads' weights along a leading group axis
and evaluates all of them in one pass: the pallas conv kernel takes grouped
weights ((G,3,3,C,O), batch entry b uses group b // B), and the XLA glue ops
(projections, transposed-conv resamplers, pixel shuffles) become batched
einsums. Numerics are identical to the sequential path (same ops, same
order, fp32 parameter math).

Only the head configuration family the checkpoints actually use is
batchable (no norms, relu activations, non-pool resamplers, linear final
level); anything else falls back to the sequential path in v2.py.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.conv import conv3x3_replicate, up2_conv3_weights
from ..ops.resize import resize_2d

__all__ = ["heads_batchable", "apply_heads_batched"]

_SUPPORTED_RESAMPLERS = ("conv_transpose", "bilinear", "nearest", "pixel_shuffle")


def heads_batchable(cfgs: Sequence[Dict[str, Any]], remat: bool = False) -> bool:
    """True when all head configs are identical except the final dim_out and
    use only ops the batched interpreter implements."""
    # Measured on v5e ViT-L @518px: batched 20.5 ms vs sequential 20.0 ms
    # decode — the heads are bandwidth-bound and the per-call weight stacking
    # costs more than the launch overhead it saves. Off by default; kept as
    # an opt-in (and as the grouped-conv reference user) for future tuning.
    import os
    if os.environ.get("MOGE_BATCHED_HEADS", "0") in ("0", "false", ""):
        return False
    if remat or len(cfgs) < 2:
        return False
    c0 = cfgs[0]
    n = len(c0["dim_res_blocks"])
    for c in cfgs:
        for key in ("dim_in", "dim_res_blocks", "num_res_blocks", "resamplers"):
            if list(c.get(key) or []) != list(c0.get(key) or []):
                return False
        if c.get("dim_times_res_block_hidden", 1) != c0.get("dim_times_res_block_hidden", 1):
            return False
        if c.get("res_block_in_norm", "layer_norm") != "none":
            return False
        if c.get("res_block_hidden_norm", "group_norm") != "none":
            return False
        if c.get("activation", "relu") != "relu":
            return False
        douts = c.get("dim_out")
        if not isinstance(douts, (list, tuple)) or len(douts) != n:
            return False
        if any(d is not None for d in douts[:-1]) or douts[-1] is None:
            return False
    if n < 2 or list(c0["num_res_blocks"])[-1] != 0:
        return False
    rtypes = list(c0["resamplers"])
    if any(t not in _SUPPORTED_RESAMPLERS for t in rtypes):
        return False
    # res blocks keep in==out channels (no skip projection needed)
    dims = list(c0["dim_res_blocks"])
    dims_in = c0["dim_in"] if isinstance(c0["dim_in"], (list, tuple)) else [c0["dim_in"]] * n
    if any(d is None for d in dims_in):
        return False
    return True


def _get(tree, path: str):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def apply_heads_batched(
    cfgs: Sequence[Dict[str, Any]],
    plist: Sequence[Any],
    in_features: List[jax.Array],
    dtype: Any,
) -> List[jax.Array]:
    """Evaluate G ConvStack heads (stacked weights) over shared in_features.

    Returns the finest-level output per head: (B, H, W, dim_out_g) each.
    """
    G = len(plist)
    c0 = cfgs[0]
    dims = list(c0["dim_res_blocks"])
    n = len(dims)
    dims_in = c0["dim_in"] if isinstance(c0["dim_in"], (list, tuple)) else [c0["dim_in"]] * n
    res_counts = (c0["num_res_blocks"] if isinstance(c0["num_res_blocks"], (list, tuple))
                  else [c0["num_res_blocks"]] * n)
    rtypes = list(c0["resamplers"])
    p_outs = [c["dim_out"][n - 1] for c in cfgs]
    p_pad = max(32, max(p_outs))
    B = in_features[0].shape[0]

    def st(path):
        return jnp.stack([_get(p, path) for p in plist])

    def conv3(x, path, residual=None, input_relu=False, fold=None, up2=False):
        """Grouped 3x3 conv; x is (G*B, H, W, C)."""
        k = st(path + "/conv/kernel")
        b = st(path + "/conv/bias")
        if fold is not None:
            fw, fb = fold
            k = jnp.einsum("gxyco,gop->gxycp", k, fw)
            b = jnp.einsum("go,gop->gp", b, fw) + fb
        if up2:
            O = k.shape[-1]
            C = k.shape[-2]
            k2 = jax.vmap(up2_conv3_weights)(k).reshape(G, 3, 3, C, 4 * O)
            b2 = jnp.tile(b, (1, 4))
            y = conv3x3_replicate(x.astype(dtype), k2, b2)
            GB, H, W, _ = y.shape
            y = y.reshape(GB, H, W, 2, 2, O).transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(GB, 2 * H, 2 * W, O)
        return conv3x3_replicate(x.astype(dtype), k, b, residual, input_relu)

    def shared_proj(feat, path):
        """Project SHARED (B,...) features with per-head weights -> (G*B,...)."""
        w = st(path + "/kernel").astype(dtype)
        b = st(path + "/bias").astype(dtype)
        y = jnp.einsum("bhwc,gco->gbhwo", feat.astype(dtype), w) + b[:, None, None, None, :]
        return y.reshape(G * B, *y.shape[2:])

    def resampler(x, i):
        t = rtypes[i]
        path = f"resampler_{i}"
        last = i == n - 2
        fold = None
        if last:
            # fold the final output projections (padded) into the conv
            wo = jnp.stack([
                jnp.zeros((dims[n - 1], p_pad), jnp.float32)
                .at[:, :p_outs[g]].set(_get(plist[g], f"output_{n - 1}/kernel"))
                for g in range(G)])
            bo = jnp.stack([
                jnp.zeros((p_pad,), jnp.float32)
                .at[:p_outs[g]].set(_get(plist[g], f"output_{n - 1}/bias"))
                for g in range(G)])
            fold = (wo, bo)
        if t == "conv_transpose":
            k = st(path + "/deconv/kernel").astype(dtype)  # (G, C, 2, 2, O)
            b = st(path + "/deconv/bias").astype(dtype)
            GB, H, W, C = x.shape
            O = k.shape[-1]
            xg = x.reshape(G, B, H, W, C).astype(dtype)
            y = jnp.einsum("gbhwc,gcijo->gbhwijo", xg, k)
            y = y + b[:, None, None, None, None, None, :]
            y = y.transpose(0, 1, 2, 4, 3, 5, 6).reshape(G * B, 2 * H, 2 * W, O)
            return conv3(y, path + "/conv_post", fold=fold)
        if t == "bilinear":
            return conv3(x, path + "/conv_post", fold=fold, up2=True)
        if t == "nearest":
            GB, H, W, _ = x.shape
            x = resize_2d(x, (2 * H, 2 * W), mode="nearest", channel_last=True)
            return conv3(x, path + "/conv_post", fold=fold)
        if t == "pixel_shuffle":
            x = conv3(x, path + "/conv_pre")
            GB, H, W, C4 = x.shape
            C = C4 // 4
            x = x.reshape(GB, H, W, C, 2, 2).transpose(0, 1, 4, 2, 5, 3)
            x = x.reshape(GB, 2 * H, 2 * W, C)
            return conv3(x, path + "/conv_post", fold=fold)
        raise ValueError(t)

    x = None
    for i in range(n - 1):
        feat = in_features[i]
        z = shared_proj(feat, f"input_{i}")
        x = z if i == 0 else x + z
        for j in range(res_counts[i]):
            base = f"res_{i}_{j}"
            h = conv3(x, base + "/conv1", input_relu=True)
            x = conv3(h, base + "/conv2", residual=x, input_relu=True)
        x = resampler(x, i)

    # final level: linear epilogue, output projections already folded in
    feat = in_features[n - 1]
    wi = st(f"input_{n - 1}/kernel")
    bi = st(f"input_{n - 1}/bias")
    wo = jnp.stack([
        jnp.zeros((dims[n - 1], p_pad), jnp.float32)
        .at[:, :p_outs[g]].set(_get(plist[g], f"output_{n - 1}/kernel"))
        for g in range(G)])
    wio = jnp.einsum("gcd,gdp->gcp", wi, wo).astype(dtype)
    bio = jnp.einsum("gd,gdp->gp", bi, wo).astype(dtype)
    z = jnp.einsum("bhwc,gcp->gbhwp", feat.astype(dtype), wio) + bio[:, None, None, None, :]
    out = x.reshape(G, B, *x.shape[1:]) + z
    return [out[g][..., :p_outs[g]] for g in range(G)]
