"""Tests: torch-free .pt WRITER + export converters (flax -> reference format).

The full interop loop, against the real torch reference models:
reference state_dict -> convert_* -> flax params -> export_* -> save_pt ->
(a) torch.load(weights_only=True) + load_state_dict(strict=True) into the
    reference model (proves naming/layout completeness),
(b) the repo's own load_checkpoint reads it back bitwise (round trip).
"""

import numpy as np
import torch

from ref_utils import add_reference_to_path

add_reference_to_path()

from moge.model import v1 as ref_v1  # noqa: E402
from moge.model import v2 as ref_v2  # noqa: E402

from moge_tpu.models.convert import (adapt_block_layout, convert_moge1,  # noqa: E402
                                     convert_moge2, export_moge1, export_moge2)
from moge_tpu.models.io import load_checkpoint, save_reference_checkpoint  # noqa: E402
from moge_tpu.utils.pt_loader import load_pt  # noqa: E402
from moge_tpu.utils.pt_writer import OrderedVal, save_pt  # noqa: E402

from test_model_v1 import TEST_CONFIG as V1_CONFIG  # noqa: E402
from test_model_v2 import TEST_CONFIG as V2_CONFIG  # noqa: E402


def _assert_tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: keys {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _assert_tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=f"{path}/{k}")


def test_pt_writer_roundtrip(tmp_path):
    """save_pt output loads with BOTH torch.load(weights_only=True) and the
    bundled torch-free reader, covering all supported leaf types."""
    rng = np.random.default_rng(0)
    obj = {
        "model_config": {"a": 1, "nested": {"lr": 1e-4}, "l": [1, "x", None, True],
                         "t": (3, 4), "big": 2 ** 40, "neg": -7},
        "model": OrderedVal({
            "w_f32": rng.standard_normal((4, 5)).astype(np.float32),
            "w_f16": rng.standard_normal((3, 3)).astype(np.float16),
            "w_i64": np.arange(7),
            "w_u8": np.arange(6, dtype=np.uint8).reshape(2, 3),
            "flag": np.array([True, False, True]),
            "zerodim": np.array(1.25, np.float64),
        }),
    }
    path = tmp_path / "ck.pt"
    save_pt(obj, path)

    back = load_pt(path)
    for k, v in obj["model"].items():
        np.testing.assert_array_equal(np.asarray(back["model"][k]), np.asarray(v))
    assert back["model_config"] == obj["model_config"]

    t = torch.load(path, map_location="cpu", weights_only=True)
    assert isinstance(t["model"], dict)
    for k, v in obj["model"].items():
        np.testing.assert_array_equal(t["model"][k].numpy(), np.asarray(v))
    assert t["model_config"]["l"] == [1, "x", None, True]
    assert t["model_config"]["t"] == (3, 4)


def test_pt_writer_bf16(tmp_path):
    import ml_dtypes

    x = (np.arange(8, dtype=np.float32) / 3).astype(ml_dtypes.bfloat16).reshape(2, 4)
    save_pt({"x": x}, tmp_path / "bf16.pt")
    t = torch.load(tmp_path / "bf16.pt", map_location="cpu", weights_only=True)
    assert t["x"].dtype == torch.bfloat16
    np.testing.assert_array_equal(t["x"].float().numpy(), x.astype(np.float32))
    back = load_pt(tmp_path / "bf16.pt")  # reader widens bf16 to f32
    np.testing.assert_array_equal(back["x"], x.astype(np.float32))


def test_export_moge2_strict_load_and_roundtrip(tmp_path):
    torch.manual_seed(1)
    ref = ref_v2.MoGeModel(**V2_CONFIG)
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    config, params = convert_moge2({"model_config": V2_CONFIG, "model": sd})
    ck = export_moge2(config, params)

    # naming/layout completeness: exactly the reference's keys, bitwise equal
    assert set(ck["model"]) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(ck["model"][k], sd[k], err_msg=k)

    # full file loop: save_pt -> torch.load -> strict load into the reference
    path = tmp_path / "exported.pt"
    save_reference_checkpoint(path, config, params, version="v2")
    t = torch.load(path, map_location="cpu", weights_only=True)
    assert t["model_config"] == V2_CONFIG
    ref.load_state_dict(t["model"], strict=True)

    # and back in through our own reader: bitwise param round trip
    config2, params2 = load_checkpoint(path, version="v2")
    assert config2 == config
    _assert_tree_equal(params2, params)


def test_export_moge2_from_scan_layout():
    """Export accepts the trainer's depth-stacked (lax.scan) block layout."""
    torch.manual_seed(2)
    ref = ref_v2.MoGeModel(**V2_CONFIG)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    config, params = convert_moge2({"model_config": V2_CONFIG, "model": sd})
    stacked = adapt_block_layout({k: v for k, v in params.items()}, stacked=True)
    ck = export_moge2(config, stacked)
    assert set(ck["model"]) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(ck["model"][k], sd[k], err_msg=k)


def test_export_moge1_strict_load_and_roundtrip(tmp_path):
    torch.manual_seed(3)
    ref = ref_v1.MoGeModel(**V1_CONFIG)
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    config, params = convert_moge1({"model_config": V1_CONFIG, "model": sd})
    ck = export_moge1(config, params)
    assert set(ck["model"]) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(ck["model"][k], sd[k], err_msg=k)

    path = tmp_path / "exported_v1.pt"
    save_reference_checkpoint(path, config, params, version="v1")
    t = torch.load(path, map_location="cpu", weights_only=True)
    ref.load_state_dict(t["model"], strict=True)
    config2, params2 = load_checkpoint(path, version="v1")
    _assert_tree_equal(params2, params)
