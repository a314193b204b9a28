"""Golden tests: eval metrics vs the reference moge/test/metrics.py."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_utils import add_reference_to_path

add_reference_to_path()

from moge.test import metrics as ref_metrics  # noqa: E402

from moge_tpu.eval import metrics as jmetrics  # noqa: E402
from moge_tpu.ops.geometry import depth_map_to_point_map, intrinsics_from_focal_center  # noqa: E402


def _sample(rng, h=60, w=80):
    depth = rng.uniform(1, 8, (h, w)).astype(np.float32)
    K = np.asarray(intrinsics_from_focal_center(1.1, 1.1 * w / h * h / w, 0.5, 0.5), np.float32)
    K = np.asarray(intrinsics_from_focal_center(1.1, 1.3, 0.5, 0.5), np.float32)
    points = np.asarray(depth_map_to_point_map(jnp.asarray(depth), jnp.asarray(K))).astype(np.float32)
    mask = rng.uniform(0, 1, (h, w)) > 0.25
    gt = {
        "depth": depth,
        "depth_mask": mask,
        "points": points,
        "intrinsics": K,
        "is_metric": True,
        "has_sharp_boundary": True,
    }
    return gt


def _to_torch(d):
    return {
        k: torch.from_numpy(np.asarray(v)) if isinstance(v, np.ndarray) else v for k, v in d.items()
    }


@pytest.mark.parametrize("pred_kind", ["depth_metric", "points_scale_invariant", "points_metric"])
@pytest.mark.slow
def test_compute_metrics_matches_reference(pred_kind):
    rng = np.random.default_rng(0)
    gt = _sample(rng)
    noise = lambda s: rng.normal(0, 0.03, s).astype(np.float32)

    pred = {}
    if pred_kind == "depth_metric":
        pred["depth_metric"] = (gt["depth"] * 1.0 + noise(gt["depth"].shape)).clip(0.1)
        pred["intrinsics"] = np.asarray(intrinsics_from_focal_center(1.0, 1.2, 0.5, 0.5), np.float32)
    elif pred_kind == "points_scale_invariant":
        pred["points_scale_invariant"] = gt["points"] * 0.5 + noise(gt["points"].shape)
    else:
        pred["points_metric"] = gt["points"] + 0.1 + noise(gt["points"].shape)

    ref_out, _ = ref_metrics.compute_metrics(_to_torch(pred), _to_torch(gt))
    got_out, _ = jmetrics.compute_metrics(pred, gt)

    assert set(got_out.keys()) == set(ref_out.keys()), (got_out.keys(), ref_out.keys())
    for group in ref_out:
        for k, rv in ref_out[group].items():
            gv = got_out[group][k]
            assert gv == pytest.approx(rv, rel=2e-2, abs=2e-3), f"{group}.{k}: {gv} vs {rv}"


@pytest.mark.slow
def test_local_points_metric():
    rng = np.random.default_rng(1)
    gt = _sample(rng)
    seg = (np.arange(60)[:, None] // 20 * 3 + np.arange(80)[None, :] // 27).astype(np.int32)
    gt["segmentation_mask"] = seg
    gt["segmentation_labels"] = {f"seg{k}": k for k in np.unique(seg)}

    pred = {"points_scale_invariant": gt["points"] * 0.7 + rng.normal(0, 0.02, gt["points"].shape).astype(np.float32)}

    gt_t = _to_torch({**gt, "segmentation_mask": gt["segmentation_mask"]})
    gt_t["segmentation_labels"] = gt["segmentation_labels"]
    ref_out, _ = ref_metrics.compute_metrics(_to_torch(pred), gt_t)
    got_out, _ = jmetrics.compute_metrics(pred, gt)

    assert "local_points" in got_out and "local_points" in ref_out
    for k in ("rel", "delta1"):
        assert got_out["local_points"][k] == pytest.approx(ref_out["local_points"][k], rel=3e-2, abs=5e-3)
