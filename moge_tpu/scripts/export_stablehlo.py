"""Export a serialized StableHLO inference artifact (jax.export).

The TPU-native counterpart of the reference's ONNX exports (reference
docs/onnx.md): a self-contained, fixed-shape program with weights embedded,
runnable under any PJRT runtime and reloadable with
``moge_tpu.models.export.load_stablehlo``. Unlike torch→ONNX, the
``--with_postprocess`` variant includes the full camera recovery
(focal/shift solve, FOV, reprojection) inside the artifact.
"""

from __future__ import annotations

import click


@click.command(help="Export a StableHLO inference artifact (the ONNX-export "
                    "analog for PJRT runtimes).")
@click.option("--pretrained", "pretrained_path", type=str, required=True,
              help="Checkpoint path (reference .pt or native dir).")
@click.option("--version", "model_version", type=click.Choice(["v1", "v2"]), default="v2",
              show_default=True)
@click.option("--output", "-o", "output_path", required=True, type=str)
@click.option("--height", type=int, default=518, show_default=True)
@click.option("--width", type=int, default=518, show_default=True)
@click.option("--batch", type=int, default=1, show_default=True)
@click.option("--num_tokens", type=int, default=1800, show_default=True,
              help="Token budget baked into the artifact (reference onnx.md "
                   "uses 1800 in its static example).")
@click.option("--with_postprocess", is_flag=True,
              help="Export the FULL infer() program (camera recovery included; "
                   "v2 only) instead of the raw forward().")
@click.option("--fp16/--fp32", "use_fp16", default=None,
              help="Compute precision inside the artifact. Default: fp32 for "
                   "raw forward (matching the reference's FP32 ONNX exports), "
                   "bf16 for --with_postprocess (the serving configuration).")
def main(pretrained_path, model_version, output_path, height, width, batch,
         num_tokens, with_postprocess, use_fp16):
    import jax.numpy as jnp

    from ..models import import_model_class_by_version
    from ..models.export import export_stablehlo

    model = import_model_class_by_version(model_version).from_pretrained(
        pretrained_path, dtype=jnp.bfloat16)
    blob = export_stablehlo(model, height, width, num_tokens, batch=batch,
                            with_postprocess=with_postprocess, use_fp16=use_fp16)
    with open(output_path, "wb") as f:
        f.write(blob)
    kind = "infer (with camera recovery)" if with_postprocess else "raw forward"
    click.echo(f"wrote {output_path} ({kind}, {batch}x{height}x{width}, "
               f"{num_tokens} tokens, {len(blob) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
