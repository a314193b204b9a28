"""moge_tpu command-line interface (reference moge/scripts/cli.py:11-23)."""

import os

import click

# Backend override for every subcommand: MOGE_PLATFORM=cpu|tpu. Needed because
# on some hosted TPU setups the JAX_PLATFORMS environment variable is fixed by
# the session and cannot be overridden per-process; jax.config can.
if os.environ.get("MOGE_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["MOGE_PLATFORM"])

from .app import main as app_main
from .infer import main as infer_main
from .infer_baseline import main as infer_baseline_main
from .infer_panorama import main as infer_panorama_main
from .eval_baseline import main as eval_baseline_main
from .serve import main as serve_main
from .train import main as train_main
from .vis_data import main as vis_data_main
from .verify_pretrained import main as verify_pretrained_main


@click.group(help="moge_tpu command line tools")
def main():
    pass


main.add_command(app_main, name="app")
main.add_command(infer_main, name="infer")
main.add_command(infer_baseline_main, name="infer_baseline")
main.add_command(infer_panorama_main, name="infer_panorama")
main.add_command(eval_baseline_main, name="eval_baseline")
main.add_command(serve_main, name="serve")
main.add_command(train_main, name="train")
main.add_command(vis_data_main, name="vis_data")
main.add_command(verify_pretrained_main, name="verify_pretrained")


if __name__ == "__main__":
    main()
