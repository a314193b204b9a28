"""End-to-end eval harness: synthetic benchmark -> EvalDataLoaderPipeline ->
baselines/moge.py -> compute_metrics -> output JSON (reference chain
moge/scripts/eval_baseline.py:23-161).

The benchmark directory is written with the repo's own codecs (write_image /
write_depth / write_segmentation + meta.json + .index.txt) and evaluated
with a tiny randomly-initialized MoGe-2 saved as a NATIVE checkpoint (which
``from_pretrained`` must load just like a published .pt).
"""

import json
from pathlib import Path

import numpy as np
import pytest

TINY_V2_CONFIG = {
    "encoder": {"backbone": "dinov2_vitt14", "intermediate_layers": [0, 1, 2, 3], "dim_out": 32},
    "neck": {
        "dim_in": [34, 2, 2, 2, 2],
        "dim_out": None,
        "dim_res_blocks": [32, 16, 8, 8, 8],
        "num_res_blocks": [0, 1, 1, 0, 0],
        "res_block_in_norm": "none",
        "res_block_hidden_norm": "none",
        "resamplers": ["conv_transpose", "pixel_shuffle", "nearest", "bilinear"],
    },
    "points_head": {
        "dim_in": [32, 16, 8, 8, 8],
        "dim_out": [None, None, None, None, 3],
        "dim_res_blocks": [32, 16, 8, 8, 8],
        "num_res_blocks": [0, 1, 1, 0, 0],
        "res_block_in_norm": "none",
        "res_block_hidden_norm": "none",
        "resamplers": ["conv_transpose", "conv_transpose", "conv_transpose", "bilinear"],
    },
    "mask_head": {
        "dim_in": [32, 16, 8, 8, 8],
        "dim_out": [None, None, None, None, 1],
        "dim_res_blocks": [32, 16, 8, 8, 8],
        "num_res_blocks": [0, 1, 1, 0, 0],
        "res_block_in_norm": "none",
        "res_block_hidden_norm": "none",
        "resamplers": ["conv_transpose", "conv_transpose", "conv_transpose", "bilinear"],
    },
    "scale_head": {"dims": [192, 32, 1]},
    "remap_output": "exp",
    "num_tokens_range": [100, 400],
}


def _write_benchmark(root: Path, n_samples=3):
    from moge_tpu.utils.io import write_depth, write_image, write_json, write_segmentation

    rng = np.random.default_rng(0)
    h, w = 60, 80
    names = []
    for i in range(n_samples):
        d = root / f"sample_{i}"
        d.mkdir(parents=True)
        image = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        write_image(d / "image.jpg", image)
        # smooth plausible scene: depth 2..6 m with a ramp, a few inf (sky)
        yy, xx = np.mgrid[0:h, 0:w]
        depth = (2.0 + 3.0 * yy / h + 0.5 * np.sin(xx / 7.0)).astype(np.float32)
        if i == 0:
            depth[:5, :5] = np.inf
        write_depth(d / "depth.png", depth)
        write_json(d / "meta.json", {
            "intrinsics": [[1.0, 0.0, 0.5], [0.0, w / h, 0.5], [0.0, 0.0, 1.0]],
        })
        if i == 1:  # one sample with segmentation -> segment-local metrics
            seg = np.zeros((h, w), np.uint16)
            seg[:, w // 2:] = 1
            seg[:10, :10] = 2
            write_segmentation(d / "segmentation.png",
                               seg, {"wall": 0, "floor": 1, "sky": 2})
        names.append(d.name)
    (root / ".index.txt").write_text("\n".join(names))


@pytest.mark.slow
def test_eval_baseline_end_to_end(tmp_path):
    import jax.numpy as jnp

    from moge_tpu.models.io import save_native_checkpoint
    from moge_tpu.models.v2 import MoGeModel
    from moge_tpu.scripts.eval_baseline import main as eval_main

    # tiny random model, saved as a native checkpoint
    model = MoGeModel(TINY_V2_CONFIG, None, dtype=jnp.float32)
    model.init_random(seed=0, image_hw=(112, 112))
    ckpt = tmp_path / "ckpt"
    save_native_checkpoint(ckpt, TINY_V2_CONFIG, model.params)

    bench_dir = tmp_path / "bench"
    _write_benchmark(bench_dir)

    config = {
        "synthetic": {
            "path": str(bench_dir),
            "width": 80,
            "height": 60,
            "depth_unit": 1.0,
            "has_sharp_boundary": True,
            "include_segmentation": True,
            "min_seg_area": 100,
            "num_load_workers": 1,
            "num_process_workers": 1,
        }
    }
    config_path = tmp_path / "eval_config.json"
    config_path.write_text(json.dumps(config))
    out_path = tmp_path / "out" / "result.json"

    baseline_py = Path(__file__).parent.parent / "baselines" / "moge.py"
    eval_main.main([
        "--baseline", str(baseline_py),
        "--config", str(config_path),
        "--output", str(out_path),
        "--num_tokens", "150",
        "--pretrained", str(ckpt),
        "--version", "v2",
    ], standalone_mode=False)

    result = json.loads(out_path.read_text())
    assert set(result) == {"synthetic", "mean"}
    bench = result["synthetic"]
    # metric families a metric-output baseline must produce (reference
    # metrics.py:103-111): metric + derived scale/affine-invariant classes
    for family in ("depth_metric", "depth_scale_invariant", "depth_affine_invariant",
                   "points_metric", "points_scale_invariant", "points_affine_invariant"):
        assert family in bench, f"missing metric family {family}"
        assert np.isfinite(bench[family]["rel"]), family
        assert 0.0 <= bench[family]["delta1"] <= 1.0, family
    assert "fov_x" in bench  # intrinsics -> FOV MAE
    assert "boundary" in bench  # has_sharp_boundary -> boundary F1
    assert "local_points" in bench, \
        "segment-local points metric missing despite segmentation sample"
    assert bench["inference_time"] > 0.0
    # incremental JSON checkpointing fired (i==0 writes before the loop ends)
    assert out_path.exists()


@pytest.mark.slow
def test_eval_oracle_mode_uses_gt_intrinsics(tmp_path):
    """--oracle passes GT intrinsics through to the baseline; FOV error
    should then be ~0 (the model is handed the true FOV)."""
    import jax.numpy as jnp

    from moge_tpu.models.io import save_native_checkpoint
    from moge_tpu.models.v2 import MoGeModel
    from moge_tpu.scripts.eval_baseline import main as eval_main

    model = MoGeModel(TINY_V2_CONFIG, None, dtype=jnp.float32)
    model.init_random(seed=0, image_hw=(112, 112))
    ckpt = tmp_path / "ckpt"
    save_native_checkpoint(ckpt, TINY_V2_CONFIG, model.params)

    bench_dir = tmp_path / "bench"
    _write_benchmark(bench_dir, n_samples=1)
    config_path = tmp_path / "eval_config.json"
    config_path.write_text(json.dumps({
        "synthetic": {"path": str(bench_dir), "width": 80, "height": 60, "depth_unit": 1.0,
                      "num_load_workers": 1, "num_process_workers": 1}
    }))
    out_path = tmp_path / "oracle.json"
    eval_main.main([
        "--baseline", str(Path(__file__).parent.parent / "baselines" / "moge.py"),
        "--config", str(config_path),
        "--output", str(out_path),
        "--oracle",
        "--num_tokens", "150",
        "--pretrained", str(ckpt),
        "--version", "v2",
    ], standalone_mode=False)
    result = json.loads(out_path.read_text())
    assert result["synthetic"]["fov_x"]["mae"] < 1.0  # degrees; GT fov given
