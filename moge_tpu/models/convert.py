"""Checkpoint conversion: torch state_dicts -> moge_tpu flax param pytrees.

Handles the published MoGe checkpoint format ``{'model_config': ..., 'model':
state_dict}`` (reference moge/model/v1.py:214-242, v2.py:77-107) and raw
DINOv2 backbone state_dicts from the facebook hub. Accepts either torch
tensors or numpy arrays, so checkpoints can be read with the bundled
torch-free ``.pt`` reader (moge_tpu/utils/pt_loader.py) on hosts without
torch.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (avoid importing torch unless given one)
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def _dense(w, b=None) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(_np(w).T)}
    if b is not None:
        out["bias"] = _np(b)
    return out


def _norm(w, b) -> Dict[str, np.ndarray]:
    return {"scale": _np(w), "bias": _np(b)}


def _conv1x1(w, b=None) -> Dict[str, np.ndarray]:
    """torch Conv2d 1x1 weight (O, I, 1, 1) -> dense kernel (I, O)."""
    k = _np(w)[:, :, 0, 0].T
    out = {"kernel": np.ascontiguousarray(k)}
    if b is not None:
        out["bias"] = _np(b)
    return out


def _conv(w, b=None) -> Dict[str, np.ndarray]:
    """torch Conv2d weight (O, I, kh, kw) -> flax HWIO kernel (kh, kw, I, O)."""
    k = np.ascontiguousarray(_np(w).transpose(2, 3, 1, 0))
    out = {"kernel": k}
    if b is not None:
        out["bias"] = _np(b)
    return out


def _res_block(sd: Mapping[str, Any], prefix: str, in_norm: str, hidden_norm: str) -> Dict[str, Any]:
    """torch ResidualConvBlock (reference modules.py:18-68) -> flax params.

    torch Sequential indices: 0=in_norm, 1=act, 2=conv, 3=hidden_norm, 4=act,
    5=conv; plus skip_connection (1x1 conv) when in!=out channels.
    """
    blk: Dict[str, Any] = {}
    if in_norm in ("group_norm", "layer_norm"):
        blk["norm1"] = _norm(sd[prefix + "layers.0.weight"], sd[prefix + "layers.0.bias"])
    blk["conv1"] = {"conv": _conv(sd[prefix + "layers.2.weight"], sd[prefix + "layers.2.bias"])}
    if hidden_norm in ("group_norm", "layer_norm"):
        blk["norm2"] = _norm(sd[prefix + "layers.3.weight"], sd[prefix + "layers.3.bias"])
    blk["conv2"] = {"conv": _conv(sd[prefix + "layers.5.weight"], sd[prefix + "layers.5.bias"])}
    if prefix + "skip_connection.weight" in sd:
        blk["skip"] = _conv1x1(sd[prefix + "skip_connection.weight"], sd[prefix + "skip_connection.bias"])
    return blk


def _resampler(sd: Mapping[str, Any], prefix: str, type_: str) -> Dict[str, Any]:
    """torch Resampler Sequential (reference modules.py:139-182) -> flax params."""
    out: Dict[str, Any] = {}
    if type_ == "pixel_shuffle":
        out["conv_pre"] = {"conv": _conv(sd[prefix + "0.weight"], sd[prefix + "0.bias"])}
        out["conv_post"] = {"conv": _conv(sd[prefix + "2.weight"], sd[prefix + "2.bias"])}
    elif type_ in ("nearest", "bilinear"):
        out["conv_post"] = {"conv": _conv(sd[prefix + "1.weight"], sd[prefix + "1.bias"])}
    elif type_ == "conv_transpose":
        # torch ConvTranspose2d weight (I, O, s, s) -> our (I, s, s, O)
        w = _np(sd[prefix + "0.weight"]).transpose(0, 2, 3, 1)
        out["deconv"] = {"kernel": np.ascontiguousarray(w), "bias": _np(sd[prefix + "0.bias"])}
        out["conv_post"] = {"conv": _conv(sd[prefix + "1.weight"], sd[prefix + "1.bias"])}
    elif type_ == "pixel_unshuffle":
        out["conv_post"] = {"conv": _conv(sd[prefix + "1.weight"], sd[prefix + "1.bias"])}
    elif type_ in ("avg_pool", "max_pool"):
        out["conv_pre"] = {"conv": _conv(sd[prefix + "0.weight"], sd[prefix + "0.bias"])}
    else:
        raise ValueError(f"Unsupported resampler type: {type_}")
    return out


def convert_conv_stack(sd: Mapping[str, Any], prefix: str, cfg: Mapping[str, Any]) -> Dict[str, Any]:
    """torch ConvStack (reference modules.py:195-254) -> flax params."""
    dims = list(cfg["dim_res_blocks"])
    n = len(dims)
    num_res = cfg.get("num_res_blocks", 1)
    num_res = num_res if isinstance(num_res, list) else [num_res] * n
    resamplers = cfg["resamplers"]
    resamplers = resamplers if isinstance(resamplers, list) else [resamplers] * (n - 1)
    in_norm = cfg.get("res_block_in_norm", "layer_norm")
    hidden_norm = cfg.get("res_block_hidden_norm", "group_norm")

    params: Dict[str, Any] = {}
    for i in range(n):
        key = f"{prefix}input_blocks.{i}.weight"
        if key in sd:
            params[f"input_{i}"] = _conv1x1(sd[key], sd[f"{prefix}input_blocks.{i}.bias"])
        for j in range(num_res[i]):
            params[f"res_{i}_{j}"] = _res_block(sd, f"{prefix}res_blocks.{i}.{j}.", in_norm, hidden_norm)
        okey = f"{prefix}output_blocks.{i}.weight"
        if okey in sd:
            params[f"output_{i}"] = _conv1x1(sd[okey], sd[f"{prefix}output_blocks.{i}.bias"])
        if i < n - 1:
            params[f"resampler_{i}"] = _resampler(sd, f"{prefix}resamplers.{i}.", resamplers[i])
    return params


def convert_mlp(sd: Mapping[str, Any], prefix: str, dims: Sequence[int]) -> Dict[str, Any]:
    """torch MLP Sequential (Linear, ReLU, ..., Linear) -> flax params."""
    params: Dict[str, Any] = {}
    n_linear = len(dims) - 1
    for i in range(n_linear):
        torch_idx = 2 * i  # Linear at even indices, ReLU at odd
        params[f"fc{i}"] = _dense(sd[f"{prefix}{torch_idx}.weight"], sd[f"{prefix}{torch_idx}.bias"])
    return params


def convert_encoder(sd: Mapping[str, Any], prefix: str, cfg: Mapping[str, Any]) -> Dict[str, Any]:
    """torch DINOv2Encoder (reference modules.py:71-136) -> flax params."""
    params: Dict[str, Any] = {"backbone": convert_dinov2_backbone(sd, prefix + "backbone.")}
    layers = cfg["intermediate_layers"]
    num = layers if isinstance(layers, int) else len(layers)
    for i in range(num):
        params[f"proj_{i}"] = _conv1x1(
            sd[f"{prefix}output_projections.{i}.weight"], sd[f"{prefix}output_projections.{i}.bias"]
        )
    return params


def convert_moge2(checkpoint: Mapping[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Published MoGe-2 checkpoint {'model_config', 'model'} -> (config, flax params)."""
    config = dict(checkpoint["model_config"])
    sd = checkpoint["model"]
    params: Dict[str, Any] = {
        "encoder": convert_encoder(sd, "encoder.", config["encoder"]),
        "neck": convert_conv_stack(sd, "neck.", config["neck"]),
    }
    for head in ("points_head", "normal_head", "mask_head"):
        if config.get(head) is not None and any(k.startswith(head + ".") for k in sd):
            params[head] = convert_conv_stack(sd, head + ".", config[head])
    if config.get("scale_head") is not None and any(k.startswith("scale_head.") for k in sd):
        params["scale_head"] = convert_mlp(sd, "scale_head.", config["scale_head"]["dims"])
    return config, params


def convert_moge1(checkpoint: Mapping[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Published MoGe-1 checkpoint {'model_config', 'model'} -> (config, flax params).

    torch names (reference v1.py:61-142): head.projects.N (1x1),
    head.upsample_blocks.N = Sequential(Sequential(ConvT, Conv), res...),
    head.output_block.K = Sequential(Conv, res..., ReLU, Conv).
    """
    config = dict(checkpoint["model_config"])
    sd = checkpoint["model"]

    num_features = config.get("intermediate_layers", 4)
    if isinstance(num_features, (list, tuple)):
        num_features = len(num_features)
    dim_upsample = config.get("dim_upsample", [256, 128, 128])
    num_res_blocks = config.get("num_res_blocks", 1)
    last_res_blocks = config.get("last_res_blocks", 0)
    res_block_norm = config.get("res_block_norm", "group_norm")

    head: Dict[str, Any] = {}
    for i in range(num_features):
        head[f"proj_{i}"] = _conv1x1(sd[f"head.projects.{i}.weight"], sd[f"head.projects.{i}.bias"])
    for i in range(len(dim_upsample)):
        pre = f"head.upsample_blocks.{i}."
        stage: Dict[str, Any] = {
            "deconv": {
                "kernel": np.ascontiguousarray(_np(sd[pre + "0.0.weight"]).transpose(0, 2, 3, 1)),
                "bias": _np(sd[pre + "0.0.bias"]),
            },
            "conv": {"conv": _conv(sd[pre + "0.1.weight"], sd[pre + "0.1.bias"])},
        }
        for j in range(num_res_blocks):
            # v1 res block: in_norm GroupNorm(1) always, hidden norm per config
            stage[f"res_{j}"] = _res_block(sd, f"{pre}{1 + j}.", "layer_norm", res_block_norm)
        head[f"up_{i}"] = stage
    for k in range(2):  # dim_out = [3, 1]
        pre = f"head.output_block.{k}."
        blockp: Dict[str, Any] = {
            "conv_in": {"conv": _conv(sd[pre + "0.weight"], sd[pre + "0.bias"])},
        }
        for j in range(last_res_blocks):
            blockp[f"res_{j}"] = _res_block(sd, f"{pre}{1 + j}.", "layer_norm", res_block_norm)
        final_idx = 1 + last_res_blocks + 1
        blockp["conv_out"] = {"conv": _conv(sd[pre + f"{final_idx}.weight"], sd[pre + f"{final_idx}.bias"])}
        head[f"output_{k}"] = blockp

    params = {
        "backbone": convert_dinov2_backbone(sd, "backbone."),
        "head": head,
    }
    return config, params


def convert_dinov2_backbone(sd: Mapping[str, Any], prefix: str = "", stack_blocks: bool = False) -> Dict[str, Any]:
    """torch DINOv2 state_dict -> DinoViT flax params dict.

    ``stack_blocks``: stack per-block tensors along a leading depth axis for
    the lax.scan block layout (DinoViT.scan_blocks=True); default is the
    unrolled blocks_{i} layout.
    """
    g = lambda k: sd[prefix + k]  # noqa: E731
    p = _np(g("patch_embed.proj.weight"))  # (D, 3, p, p)
    dim = p.shape[0]
    psz = p.shape[-1]
    params: Dict[str, Any] = {
        "patch_kernel": np.ascontiguousarray(p.transpose(2, 3, 1, 0).reshape(psz * psz * 3, dim)),
        "patch_bias": _np(g("patch_embed.proj.bias")),
        "cls_token": _np(g("cls_token")),
        "pos_embed": _np(g("pos_embed")),
        "norm": _norm(g("norm.weight"), g("norm.bias")),
    }
    if prefix + "register_tokens" in sd:
        params["register_tokens"] = _np(g("register_tokens"))

    depth = 0
    while f"{prefix}blocks.{depth}.norm1.weight" in sd:
        depth += 1
    per_block = []
    for i in range(depth):
        bp = f"blocks.{i}."
        blk: Dict[str, Any] = {
            "norm1": _norm(g(bp + "norm1.weight"), g(bp + "norm1.bias")),
            "attn": {
                "qkv": _dense(g(bp + "attn.qkv.weight"), g(bp + "attn.qkv.bias")),
                "proj": _dense(g(bp + "attn.proj.weight"), g(bp + "attn.proj.bias")),
            },
            "norm2": _norm(g(bp + "norm2.weight"), g(bp + "norm2.bias")),
        }
        if prefix + bp + "mlp.fc1.weight" in sd:
            blk["mlp"] = {
                "fc1": _dense(g(bp + "mlp.fc1.weight"), g(bp + "mlp.fc1.bias")),
                "fc2": _dense(g(bp + "mlp.fc2.weight"), g(bp + "mlp.fc2.bias")),
            }
        else:  # SwiGLU (giant)
            blk["mlp"] = {
                "w12": _dense(g(bp + "mlp.w12.weight"), g(bp + "mlp.w12.bias")),
                "w3": _dense(g(bp + "mlp.w3.weight"), g(bp + "mlp.w3.bias")),
            }
        if prefix + bp + "ls1.gamma" in sd:
            blk["ls1_gamma"] = _np(g(bp + "ls1.gamma"))
            blk["ls2_gamma"] = _np(g(bp + "ls2.gamma"))
        per_block.append(blk)

    if stack_blocks:
        import jax

        params["blocks"] = {
            "block": jax.tree.map(lambda *leaves: np.stack(leaves, axis=0), *per_block)
        }
    else:
        for i, blk in enumerate(per_block):
            params[f"blocks_{i}"] = blk
    return params


# ---------------------------------------------------------------------------
# Export: moge_tpu flax param pytrees -> torch state_dicts (the inverse maps).
# Together with utils/pt_writer.save_pt this lets models trained here flow
# back into the reference's torch ecosystem (checkpoint format
# {'model_config', 'model'}, reference moge/model/v2.py:77-107).
# ---------------------------------------------------------------------------


_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)


def _dense_inv(sd: Dict[str, np.ndarray], prefix: str, p: Mapping[str, Any]) -> None:
    sd[prefix + "weight"] = np.ascontiguousarray(_np(p["kernel"]).T)
    if "bias" in p:
        sd[prefix + "bias"] = _np(p["bias"])


def _norm_inv(sd: Dict[str, np.ndarray], prefix: str, p: Mapping[str, Any]) -> None:
    sd[prefix + "weight"] = _np(p["scale"])
    sd[prefix + "bias"] = _np(p["bias"])


def _conv1x1_inv(sd: Dict[str, np.ndarray], prefix: str, p: Mapping[str, Any]) -> None:
    sd[prefix + "weight"] = np.ascontiguousarray(_np(p["kernel"]).T)[:, :, None, None]
    if "bias" in p:
        sd[prefix + "bias"] = _np(p["bias"])


def _conv_inv(sd: Dict[str, np.ndarray], prefix: str, p: Mapping[str, Any]) -> None:
    """flax HWIO kernel (kh, kw, I, O) -> torch Conv2d weight (O, I, kh, kw)."""
    sd[prefix + "weight"] = np.ascontiguousarray(_np(p["kernel"]).transpose(3, 2, 0, 1))
    if "bias" in p:
        sd[prefix + "bias"] = _np(p["bias"])


def _deconv_inv(sd: Dict[str, np.ndarray], prefix: str, p: Mapping[str, Any]) -> None:
    """our conv-transpose kernel (I, s, s, O) -> torch ConvTranspose2d (I, O, s, s)."""
    sd[prefix + "weight"] = np.ascontiguousarray(_np(p["kernel"]).transpose(0, 3, 1, 2))
    sd[prefix + "bias"] = _np(p["bias"])


def _res_block_inv(sd: Dict[str, np.ndarray], prefix: str, p: Mapping[str, Any]) -> None:
    """Inverse of _res_block: emits layers.{0,2,3,5} (+ skip_connection)."""
    if "norm1" in p:
        _norm_inv(sd, prefix + "layers.0.", p["norm1"])
    _conv_inv(sd, prefix + "layers.2.", p["conv1"]["conv"])
    if "norm2" in p:
        _norm_inv(sd, prefix + "layers.3.", p["norm2"])
    _conv_inv(sd, prefix + "layers.5.", p["conv2"]["conv"])
    if "skip" in p:
        _conv1x1_inv(sd, prefix + "skip_connection.", p["skip"])


def _resampler_inv(sd: Dict[str, np.ndarray], prefix: str, p: Mapping[str, Any], type_: str) -> None:
    if type_ == "pixel_shuffle":
        _conv_inv(sd, prefix + "0.", p["conv_pre"]["conv"])
        _conv_inv(sd, prefix + "2.", p["conv_post"]["conv"])
    elif type_ in ("nearest", "bilinear", "pixel_unshuffle"):
        _conv_inv(sd, prefix + "1.", p["conv_post"]["conv"])
    elif type_ == "conv_transpose":
        _deconv_inv(sd, prefix + "0.", p["deconv"])
        _conv_inv(sd, prefix + "1.", p["conv_post"]["conv"])
    elif type_ in ("avg_pool", "max_pool"):
        _conv_inv(sd, prefix + "0.", p["conv_pre"]["conv"])
    else:
        raise ValueError(f"Unsupported resampler type: {type_}")


def export_conv_stack(sd: Dict[str, np.ndarray], prefix: str, p: Mapping[str, Any],
                      cfg: Mapping[str, Any]) -> None:
    """Inverse of convert_conv_stack (torch names, reference modules.py:195-254)."""
    dims = list(cfg["dim_res_blocks"])
    n = len(dims)
    num_res = cfg.get("num_res_blocks", 1)
    num_res = num_res if isinstance(num_res, list) else [num_res] * n
    resamplers = cfg["resamplers"]
    resamplers = resamplers if isinstance(resamplers, list) else [resamplers] * (n - 1)
    for i in range(n):
        if f"input_{i}" in p:
            _conv1x1_inv(sd, f"{prefix}input_blocks.{i}.", p[f"input_{i}"])
        for j in range(num_res[i]):
            _res_block_inv(sd, f"{prefix}res_blocks.{i}.{j}.", p[f"res_{i}_{j}"])
        if f"output_{i}" in p:
            _conv1x1_inv(sd, f"{prefix}output_blocks.{i}.", p[f"output_{i}"])
        if i < n - 1:
            _resampler_inv(sd, f"{prefix}resamplers.{i}.", p[f"resampler_{i}"], resamplers[i])


def export_mlp(sd: Dict[str, np.ndarray], prefix: str, p: Mapping[str, Any],
               dims: Sequence[int]) -> None:
    for i in range(len(dims) - 1):
        _dense_inv(sd, f"{prefix}{2 * i}.", p[f"fc{i}"])


def export_dinov2_backbone(p: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of convert_dinov2_backbone. Accepts either block layout
    (unrolled blocks_{i} or the stacked scan layout)."""
    p = adapt_block_layout({k: v for k, v in p.items()}, stacked=False)
    sd: Dict[str, np.ndarray] = {}
    pk = _np(p["patch_kernel"])  # (psz*psz*3, D)
    dim = pk.shape[1]
    psz = int(round((pk.shape[0] // 3) ** 0.5))
    sd[prefix + "patch_embed.proj.weight"] = np.ascontiguousarray(
        pk.reshape(psz, psz, 3, dim).transpose(3, 2, 0, 1))
    sd[prefix + "patch_embed.proj.bias"] = _np(p["patch_bias"])
    sd[prefix + "cls_token"] = _np(p["cls_token"])
    sd[prefix + "pos_embed"] = _np(p["pos_embed"])
    if "register_tokens" in p:
        sd[prefix + "register_tokens"] = _np(p["register_tokens"])
    sd[prefix + "mask_token"] = np.zeros((1, dim), np.float32)  # unused by MoGe
    _norm_inv(sd, prefix + "norm.", p["norm"])
    i = 0
    while f"blocks_{i}" in p:
        blk = p[f"blocks_{i}"]
        bp = f"{prefix}blocks.{i}."
        _norm_inv(sd, bp + "norm1.", blk["norm1"])
        _dense_inv(sd, bp + "attn.qkv.", blk["attn"]["qkv"])
        _dense_inv(sd, bp + "attn.proj.", blk["attn"]["proj"])
        _norm_inv(sd, bp + "norm2.", blk["norm2"])
        if "fc1" in blk["mlp"]:
            _dense_inv(sd, bp + "mlp.fc1.", blk["mlp"]["fc1"])
            _dense_inv(sd, bp + "mlp.fc2.", blk["mlp"]["fc2"])
        else:  # SwiGLU (giant)
            _dense_inv(sd, bp + "mlp.w12.", blk["mlp"]["w12"])
            _dense_inv(sd, bp + "mlp.w3.", blk["mlp"]["w3"])
        if "ls1_gamma" in blk:
            sd[bp + "ls1.gamma"] = _np(blk["ls1_gamma"])
            sd[bp + "ls2.gamma"] = _np(blk["ls2_gamma"])
        i += 1
    return sd


def export_moge2(config: Mapping[str, Any], params: Mapping[str, Any]) -> Dict[str, Any]:
    """(config, flax params) -> reference checkpoint dict {'model_config', 'model'}.

    The inverse of convert_moge2: convert(export(x)) == x bitwise (tested in
    tests/test_pt_export.py). Write to disk with utils.pt_writer.save_pt.
    """
    sd: Dict[str, np.ndarray] = {}
    enc = params["encoder"]
    sd.update(export_dinov2_backbone(enc["backbone"], "encoder.backbone."))
    # ImageNet normalization buffers (constants in this framework; the
    # reference registers them as state_dict buffers, modules.py:96-97)
    sd["encoder.image_mean"] = _IMAGENET_MEAN.copy()
    sd["encoder.image_std"] = _IMAGENET_STD.copy()
    i = 0
    while f"proj_{i}" in enc:
        _conv1x1_inv(sd, f"encoder.output_projections.{i}.", enc[f"proj_{i}"])
        i += 1
    export_conv_stack(sd, "neck.", params["neck"], config["neck"])
    for head in ("points_head", "normal_head", "mask_head"):
        if head in params:
            export_conv_stack(sd, head + ".", params[head], config[head])
    if "scale_head" in params:
        export_mlp(sd, "scale_head.", params["scale_head"], config["scale_head"]["dims"])
    return {"model_config": dict(config), "model": sd}


def export_moge1(config: Mapping[str, Any], params: Mapping[str, Any]) -> Dict[str, Any]:
    """(config, flax params) -> reference MoGe-1 checkpoint dict (inverse of
    convert_moge1; torch names per reference moge/model/v1.py:61-142)."""
    sd: Dict[str, np.ndarray] = {}
    sd.update(export_dinov2_backbone(params["backbone"], "backbone."))
    # ImageNet normalization buffers (reference v1.py:200-204)
    sd["image_mean"] = _IMAGENET_MEAN.copy()
    sd["image_std"] = _IMAGENET_STD.copy()
    head = params["head"]
    dim_upsample = config.get("dim_upsample", [256, 128, 128])
    num_res_blocks = config.get("num_res_blocks", 1)
    last_res_blocks = config.get("last_res_blocks", 0)
    i = 0
    while f"proj_{i}" in head:
        _conv1x1_inv(sd, f"head.projects.{i}.", head[f"proj_{i}"])
        i += 1
    for i in range(len(dim_upsample)):
        pre = f"head.upsample_blocks.{i}."
        stage = head[f"up_{i}"]
        _deconv_inv(sd, pre + "0.0.", stage["deconv"])
        _conv_inv(sd, pre + "0.1.", stage["conv"]["conv"])
        for j in range(num_res_blocks):
            _res_block_inv(sd, f"{pre}{1 + j}.", stage[f"res_{j}"])
    for k in range(2):
        pre = f"head.output_block.{k}."
        blockp = head[f"output_{k}"]
        _conv_inv(sd, pre + "0.", blockp["conv_in"]["conv"])
        for j in range(last_res_blocks):
            _res_block_inv(sd, f"{pre}{1 + j}.", blockp[f"res_{j}"])
        final_idx = 1 + last_res_blocks + 1
        _conv_inv(sd, pre + f"{final_idx}.", blockp["conv_out"]["conv"])
    return {"model_config": dict(config), "model": sd}


def _find_backbone_dicts(params: Dict[str, Any]):
    """Yield every DinoViT param dict inside a model param tree."""
    if "patch_kernel" in params:
        yield params
    for v in params.values():
        if isinstance(v, dict):
            yield from _find_backbone_dicts(v)


def adapt_block_layout(params: Dict[str, Any], stacked: bool) -> Dict[str, Any]:
    """Convert DinoViT block params between the unrolled (blocks_{i}) and
    stacked-scan (blocks/block with a leading depth axis) layouts, in place
    on a shallow-copied tree. No-op if already in the requested layout."""
    import jax

    def to_stacked(bb: Dict[str, Any]):
        idx = sorted(int(k.split("_")[1]) for k in bb if k.startswith("blocks_"))
        per_block = [bb.pop(f"blocks_{i}") for i in idx]
        bb["blocks"] = {"block": jax.tree.map(lambda *ls: np.stack([np.asarray(l) for l in ls], axis=0), *per_block)}

    def to_unrolled(bb: Dict[str, Any]):
        stacked_tree = bb.pop("blocks")["block"]
        depth = jax.tree.leaves(stacked_tree)[0].shape[0]
        for i in range(depth):
            bb[f"blocks_{i}"] = jax.tree.map(lambda leaf: np.asarray(leaf)[i], stacked_tree)

    for bb in _find_backbone_dicts(params):
        has_stacked = "blocks" in bb
        has_unrolled = any(k.startswith("blocks_") for k in bb)
        if stacked and has_unrolled:
            to_stacked(bb)
        elif not stacked and has_stacked:
            to_unrolled(bb)
    return params
