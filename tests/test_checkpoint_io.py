"""Tests: torch-free .pt reader and checkpoint round trips."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from moge_tpu.utils.pt_loader import load_pt


def test_load_pt_matches_torch(tmp_path):
    torch.manual_seed(0)
    obj = {
        "model_config": {"a": 1, "nested": {"b": [1, 2, 3]}},
        "model": {
            "w_f32": torch.randn(4, 5),
            "w_f16": torch.randn(3, 3).half(),
            "w_bf16": torch.randn(2, 6).bfloat16(),
            "w_i64": torch.arange(7),
            "w_bool": torch.tensor([True, False, True]),
            "scalar": torch.tensor(3.5),
            "noncontig": torch.randn(6, 8).t(),
        },
    }
    path = tmp_path / "model.pt"
    torch.save(obj, path)

    loaded = load_pt(path)
    assert loaded["model_config"] == obj["model_config"]
    for k, v in obj["model"].items():
        got = loaded["model"][k]
        want = v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
        np.testing.assert_array_equal(np.asarray(got, dtype=want.dtype), want, err_msg=k)


def test_load_pt_real_state_dict(tmp_path):
    """nn.Module.state_dict() is an OrderedDict with a _metadata attribute —
    the torch-free reader must accept the pickled instance state."""
    torch.manual_seed(0)
    model = torch.nn.Sequential(torch.nn.Linear(4, 8), torch.nn.Conv2d(3, 6, 3))
    path = tmp_path / "m.pt"
    torch.save({"model_config": {"a": 1}, "model": model.state_dict()}, path)
    loaded = load_pt(path)
    sd = model.state_dict()
    assert set(loaded["model"].keys()) == set(sd.keys())
    for k in sd:
        np.testing.assert_array_equal(np.asarray(loaded["model"][k]), sd[k].numpy())


def test_load_pt_blocks_arbitrary_code(tmp_path):
    import pickle

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    path = tmp_path / "evil.pt"
    # build a fake zipfile-format archive containing an unsafe pickle
    import zipfile

    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps(Evil()))
    try:
        load_pt(path)
        raised = False
    except Exception:
        raised = True
    assert raised


@pytest.mark.slow
def test_hub_backbone_init_graft(tmp_path):
    """--backbone_checkpoint path: a hub-format DINOv2 state_dict (raw .pth,
    reference init_weights downloads it, train.py:188-192) converts and grafts
    into a randomly-initialized model's encoder.backbone subtree."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from ref_utils import add_reference_to_path

    add_reference_to_path()
    from moge.model.dinov2.hub import backbones as ref_backbones

    import jax

    from moge_tpu.models.convert import convert_dinov2_backbone

    torch.manual_seed(0)
    ref = ref_backbones.dinov2_vits14(pretrained=False)
    path = tmp_path / "dinov2_vits14_pretrain.pth"
    torch.save(ref.state_dict(), str(path))

    sd = load_pt(path)  # torch-free read of the hub format
    bb = convert_dinov2_backbone(sd, prefix="")

    # graft-compatibility with a randomly initialized MoGe-2 using this arch
    from moge_tpu.models.presets import get_preset
    from moge_tpu.models.v2 import MoGeModel

    model = MoGeModel(get_preset("moge-2-vits-normal")["config"], None, dtype=jnp.float32)
    model.init_random(seed=0, image_hw=(126, 126))
    rand_bb = model.params["encoder"]["backbone"]
    assert jax.tree.structure(jax.tree.map(np.asarray, rand_bb)) == jax.tree.structure(
        jax.tree.map(np.asarray, bb)
    )
    # a couple of value spot-checks against the torch tensors
    np.testing.assert_allclose(
        np.asarray(bb["cls_token"]), ref.cls_token.detach().numpy(), atol=0)
    np.testing.assert_allclose(
        np.asarray(bb["blocks_3"]["attn"]["qkv"]["bias"]),
        ref.blocks[3].attn.qkv.bias.detach().numpy(), atol=0)
