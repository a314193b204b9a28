"""The CLI enables a persistent XLA compilation cache for every subcommand
(moge_tpu/scripts/cli.py). Run it in a subprocess because the wiring is a
module-level import side effect driven by environment variables."""

import os
import subprocess
import sys


def _run_cli_help(env_overrides):
    env = dict(os.environ)
    env.update(env_overrides)
    env["MOGE_PLATFORM"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "moge_tpu.scripts.cli", "--help"],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )


def test_cache_dir_created_and_configured(tmp_path):
    cache = tmp_path / "jax_cache"
    proc = _run_cli_help({"MOGE_COMPILE_CACHE": str(cache)})
    assert proc.returncode == 0, proc.stderr
    assert cache.is_dir()


def test_cache_opt_out(tmp_path):
    cache = tmp_path / "jax_cache"
    env = {"MOGE_COMPILE_CACHE": "0", "XDG_CACHE_HOME": str(tmp_path)}
    proc = _run_cli_help(env)
    assert proc.returncode == 0, proc.stderr
    assert not cache.exists()
