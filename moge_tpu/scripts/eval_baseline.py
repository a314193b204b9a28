"""Benchmark evaluation driver (reference moge/scripts/eval_baseline.py:23-161):
dynamic-import baseline, loop benchmarks x samples, per-invariance-class
metrics, incremental JSON checkpointing every 100 samples."""

import json
from pathlib import Path
from typing import Union

import click


@click.command(context_settings={"allow_extra_args": True, "ignore_unknown_options": True}, help="Evaluation script.")
@click.option("--baseline", "baseline_code_path", type=click.Path(), required=True, help="Path to the baseline model python code.")
@click.option("--config", "config_path", type=click.Path(), default="configs/eval/all_benchmarks.json", help="Path to the evaluation configurations.")
@click.option("--output", "-o", "output_path", type=click.Path(), required=True, help="Path to the output json file.")
@click.option("--oracle", "oracle_mode", is_flag=True, help="Use GT intrinsics input.")
@click.option("--dump_pred", is_flag=True, help="Dump prediction results.")
@click.option("--dump_gt", is_flag=True, help="Dump ground truth.")
@click.pass_context
def main(ctx: click.Context, baseline_code_path: str, config_path: str, oracle_mode: bool, output_path: Union[str, Path], dump_pred: bool, dump_gt: bool):
    import cv2
    import numpy as np

    from ..eval.baseline import MGEBaselineInterface
    from ..eval.dataloader import EvalDataLoaderPipeline
    from ..eval.metrics import compute_metrics
    from ..utils.geometry_numpy import intrinsics_to_fov_numpy
    from ..utils.tools import import_file_as_module, key_average, timeit
    from ..utils.vis import colorize_depth, colorize_normal

    module = import_file_as_module(baseline_code_path, Path(baseline_code_path).stem)
    baseline_cls = getattr(module, "Baseline")
    baseline: MGEBaselineInterface = baseline_cls.load.main(ctx.args, standalone_mode=False)

    config = json.loads(Path(config_path).read_text())

    Path(output_path).parent.mkdir(parents=True, exist_ok=True)
    all_metrics = {}
    for benchmark_name, benchmark_config in config.items():
        metrics_list = []
        with EvalDataLoaderPipeline(**benchmark_config) as eval_data_pipe:
            for i in range(len(eval_data_pipe)):
                sample = eval_data_pipe.get()
                image = sample["image"]
                gt_intrinsics = sample["intrinsics"]

                with timeit("_inference_timer", verbose=False) as timer:
                    if oracle_mode:
                        pred = baseline.infer_for_evaluation(image, gt_intrinsics)
                    else:
                        pred = baseline.infer_for_evaluation(image)
                    # Device-sync bracket, mirroring the reference's
                    # torch.cuda.synchronize() (eval_baseline.py:65-71): JAX
                    # dispatch is async, so block on the outputs and then
                    # read every array back to host INSIDE the timer —
                    # np.asarray is the only readback that provably waits on
                    # all backends (block_until_ready alone can return early
                    # over remote-device tunnels).
                    for v in pred.values():
                        if hasattr(v, "block_until_ready"):
                            v.block_until_ready()
                    pred = {k: np.asarray(v) for k, v in pred.items()}

                metrics, misc = compute_metrics(pred, sample, vis=dump_pred or dump_gt)
                metrics["inference_time"] = timer.elapsed
                metrics_list.append(metrics)

                dump_path = Path(str(output_path).replace(".json", "_dump"), benchmark_name,
                                 sample["filename"].replace(".zip", ""))
                if dump_pred:
                    dump_path.joinpath("pred").mkdir(parents=True, exist_ok=True)
                    cv2.imwrite(str(dump_path / "pred" / "image.jpg"),
                                cv2.cvtColor((image * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
                    (dump_path / "pred" / "metrics.json").write_text(json.dumps(metrics, indent=4))
                    if "pred_depth" in misc:
                        depth = misc["pred_depth"]
                        cv2.imwrite(str(dump_path / "pred" / "depth.png"),
                                    cv2.cvtColor(colorize_depth(depth), cv2.COLOR_RGB2BGR))
                    if "intrinsics" in pred:
                        fov_x, fov_y = intrinsics_to_fov_numpy(np.asarray(pred["intrinsics"]))
                        (dump_path / "pred" / "fov.json").write_text(json.dumps({
                            "fov_x": float(np.rad2deg(fov_x)),
                            "fov_y": float(np.rad2deg(fov_y)),
                            "intrinsics": np.asarray(pred["intrinsics"]).tolist(),
                        }))
                if dump_gt:
                    dump_path.joinpath("gt").mkdir(parents=True, exist_ok=True)
                    cv2.imwrite(str(dump_path / "gt" / "image.jpg"),
                                cv2.cvtColor((image * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
                    cv2.imwrite(str(dump_path / "gt" / "depth.png"),
                                cv2.cvtColor(colorize_depth(sample["depth"], mask=sample["depth_mask"]), cv2.COLOR_RGB2BGR))

                if i % 100 == 0 or i == len(eval_data_pipe) - 1:
                    Path(output_path).write_text(json.dumps(
                        {**all_metrics, benchmark_name: key_average(metrics_list)}, indent=4
                    ))
            all_metrics[benchmark_name] = key_average(metrics_list)
        print(f"{benchmark_name}: {json.dumps(all_metrics[benchmark_name])}")

    all_metrics["mean"] = key_average(list(all_metrics.values()))
    Path(output_path).write_text(json.dumps(all_metrics, indent=4))


if __name__ == "__main__":
    main()
