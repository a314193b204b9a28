"""Export a moge_tpu checkpoint to the reference's torch ``.pt`` format.

The outbound half of checkpoint interop: ``load_checkpoint`` already reads
both reference ``.pt`` files and moge_tpu-native orbax directories; this
command writes a reference-format archive ({'model_config', 'model':
state_dict}, reference moge/model/v2.py:77-107) from either input, torch-free
(utils/pt_writer.py). The result loads with the upstream torch
``MoGeModel.from_pretrained`` / ``torch.load(..., weights_only=True)``,
so a model trained on TPU drops straight into the reference ecosystem
(its eval harness, gradio app, downstream users).

    moge export_pt --checkpoint workspace/run1/step_20000 -o model.pt --version v2
"""

from __future__ import annotations

import click


@click.command(help="Export a checkpoint (native dir or .pt) to the reference "
                    "torch .pt format.")
@click.option("--checkpoint", "checkpoint_path", required=True, type=str,
              help="moge_tpu-native checkpoint directory or reference .pt file.")
@click.option("--output", "-o", "output_path", required=True, type=str,
              help="Output .pt path.")
@click.option("--version", "model_version", type=click.Choice(["v1", "v2"]), default="v2",
              show_default=True)
@click.option("--ema/--no_ema", default=False,
              help="For trainer checkpoints that carry an EMA param tree, "
                   "export the EMA weights instead of the raw ones.")
def main(checkpoint_path, output_path, model_version, ema):
    from ..models.io import load_checkpoint, save_reference_checkpoint

    if ema:
        # The trainer writes EMA weights as a sibling native checkpoint with
        # an `_ema` suffix (scripts/train.py; the reference saves a separate
        # `_ema` file likewise).
        from pathlib import Path

        ema_dir = Path(str(checkpoint_path).rstrip("/") + "_ema")
        if not ema_dir.exists():
            raise click.UsageError(f"no EMA checkpoint at {ema_dir}")
        checkpoint_path = str(ema_dir)
    config, params = load_checkpoint(checkpoint_path, version=model_version)
    save_reference_checkpoint(output_path, config, params, version=model_version)
    click.echo(f"wrote {output_path} (reference {model_version} format)")


if __name__ == "__main__":
    main()
