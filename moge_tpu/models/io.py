"""Checkpoint loading for moge_tpu models.

Reads published MoGe ``.pt`` checkpoints ({'model_config', 'model'},
reference v1.py:214-242 / v2.py:77-107) through the torch-free reader
(falling back to torch if the archive uses an exotic format), converts to
flax pytrees, and also supports native orbax checkpoints saved by the
moge_tpu trainer.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

HF_DEFAULT_FILENAMES = {"model.pt"}


def _read_torch_checkpoint(path) -> Dict[str, Any]:
    from ..utils.pt_loader import load_pt

    try:
        return load_pt(path)
    except Exception:
        # Fall back to torch for legacy (non-zipfile) formats.
        import torch

        return torch.load(path, map_location="cpu", weights_only=True)


def _maybe_download(path_or_repo: str) -> str:
    p = Path(path_or_repo)
    if p.exists():
        return str(p)
    from huggingface_hub import hf_hub_download  # optional dependency path

    return hf_hub_download(repo_id=path_or_repo, repo_type="model", filename="model.pt")


def load_checkpoint(path_or_repo, version: str = "v2") -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a MoGe checkpoint -> (model_config, flax params)."""
    path = _maybe_download(str(path_or_repo))
    ckpt = _read_torch_checkpoint(path)
    if version == "v2":
        from .convert import convert_moge2

        return convert_moge2(ckpt)
    elif version == "v1":
        from .convert import convert_moge1

        return convert_moge1(ckpt)
    raise ValueError(f"Unknown model version: {version}")


def save_native_checkpoint(path, config: Dict[str, Any], params, step: Optional[int] = None,
                           max_retries: int = 5):
    """Save a moge_tpu-native checkpoint: config JSON + orbax param tree.

    Retries on I/O errors with backoff (the reference retries checkpoint
    writes forever on transient storage failures, train.py:219-226; we cap
    at ``max_retries``)."""
    import time

    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    last_err = None
    for attempt in range(max_retries):
        try:
            path.mkdir(parents=True, exist_ok=True)
            (path / "model_config.json").write_text(json.dumps({"config": config, "step": step}))
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path / "params", params, force=True)
            ckptr.wait_until_finished()
            return
        except (OSError, IOError) as e:  # transient storage failures
            last_err = e
            print(f"Checkpoint write failed (attempt {attempt + 1}/{max_retries}): {e}")
            time.sleep(min(2 ** attempt, 30))
    raise last_err


def load_native_checkpoint(path) -> Tuple[Dict[str, Any], Any]:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    meta = json.loads((path / "model_config.json").read_text())
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(path / "params")
    return meta["config"], params
