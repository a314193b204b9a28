"""moge_tpu command-line interface (reference moge/scripts/cli.py:11-23)."""

import os

import click

# Backend override for every subcommand: MOGE_PLATFORM=cpu|tpu. Needed because
# on some hosted TPU setups the JAX_PLATFORMS environment variable is fixed by
# the session and cannot be overridden per-process; jax.config can.
if os.environ.get("MOGE_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["MOGE_PLATFORM"])

# Persistent XLA compilation cache for every subcommand. First compile of the
# ViT-L graph costs 20-40s on TPU; the cache removes it across process
# restarts (serving redeploys, repeated CLI invocations). Opt out with
# MOGE_COMPILE_CACHE=0, or point it at a different directory.
_cache = os.environ.get("MOGE_COMPILE_CACHE", "")
if _cache != "0":
    import jax

    if not _cache:
        _cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "moge_tpu",
            "jax",
        )
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    # Cache every program regardless of compile time or call count.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from .app import main as app_main
from .infer import main as infer_main
from .infer_baseline import main as infer_baseline_main
from .infer_panorama import main as infer_panorama_main
from .eval_baseline import main as eval_baseline_main
from .export_pt import main as export_pt_main
from .export_stablehlo import main as export_stablehlo_main
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
main.add_command(export_pt_main, name="export_pt")
main.add_command(export_stablehlo_main, name="export_stablehlo")
main.add_command(serve_main, name="serve")
main.add_command(train_main, name="train")
main.add_command(vis_data_main, name="vis_data")
main.add_command(verify_pretrained_main, name="verify_pretrained")


if __name__ == "__main__":
    main()
