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
    """Load a MoGe checkpoint -> (model_config, flax params).

    Accepts reference-format ``.pt`` files (converted to flax pytrees) and
    moge_tpu-native checkpoint directories written by the trainer /
    ``save_native_checkpoint`` — so ``from_pretrained`` works on both the
    published checkpoints and this framework's own training output.
    """
    p = Path(str(path_or_repo))
    if p.is_dir() and (p / "model_config.json").exists():
        from .convert import adapt_block_layout

        config, params = load_native_checkpoint(p)
        # Trainer checkpoints may be in the scan_blocks (depth-stacked) layout;
        # normalize to the unrolled layout inference modules use by default.
        return config, adapt_block_layout(params, stacked=False)
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


def save_reference_checkpoint(path, config: Dict[str, Any], params, version: str = "v2"):
    """Export (config, flax params) to the reference's torch ``.pt`` format.

    The inverse of ``load_checkpoint`` for reference-format files: the result
    is a ``torch.save``-layout archive ({'model_config', 'model': state_dict},
    reference v2.py:77-107) that ``torch.load(..., weights_only=True)`` and the
    upstream ``MoGeModel.from_pretrained`` consume — written without torch
    (utils/pt_writer.py), so trained models can leave a TPU host for the torch
    ecosystem."""
    from ..utils.pt_writer import OrderedVal, save_pt
    from .convert import export_moge1, export_moge2

    export = export_moge2 if version == "v2" else export_moge1
    ck = export(config, params)
    save_pt({"model_config": ck["model_config"], "model": OrderedVal(ck["model"])}, path)


_ASYNC_CKPTR = None


def _shared_checkpointer():
    """Module-lifetime StandardCheckpointer for async (non-blocking) saves.

    orbax's StandardCheckpointer commits in a background thread; reusing one
    instance lets a save overlap the next training steps (the reference saves
    checkpoints from a ThreadPoolExecutor, train.py:219-226, 373-423). A
    second save issued while one is in flight blocks until it finishes —
    the same back-pressure the reference's single-worker executor gives.
    """
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.StandardCheckpointer()
    return _ASYNC_CKPTR


def wait_for_checkpoints():
    """Block until all async checkpoint writes have committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_train_checkpoint(path, config: Dict[str, Any], state, rng, max_retries: int = 5,
                          block: bool = True):
    """Save the FULL training state: params (in the native-checkpoint layout,
    so the directory doubles as an inference checkpoint) plus optimizer state,
    EMA params, step count, and the data RNG key.

    The reference persists {step, optimizer, lr_scheduler} and the EMA model
    alongside the weights (moge/scripts/train.py:373-423) so a resumed run is
    THE SAME run; here the optax schedule count lives inside ``opt_state``, so
    restoring it restores the LR schedule too.
    """
    import time

    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    step = int(state.step)
    train_tree = {
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
        "step": state.step,
        "rng": rng,
    }
    last_err = None
    for attempt in range(max_retries):
        try:
            path.mkdir(parents=True, exist_ok=True)
            (path / "model_config.json").write_text(json.dumps({"config": config, "step": step}))
            ckptr = _shared_checkpointer() if not block else ocp.StandardCheckpointer()
            ckptr.save(path / "params", state.params, force=True)
            ckptr.save(path / "train_state", train_tree, force=True)
            if block:
                ckptr.wait_until_finished()
            return
        except (OSError, IOError) as e:  # transient storage failures
            last_err = e
            print(f"Checkpoint write failed (attempt {attempt + 1}/{max_retries}): {e}")
            time.sleep(min(2 ** attempt, 30))
    raise last_err


def load_train_checkpoint(path, template_state, template_rng):
    """Restore a full training checkpoint onto the shardings/structure of
    ``template_state`` (a freshly built TrainState whose opt_state came from
    the same optimizer config). Returns (config, state, rng).

    Falls back to params-only restore (fresh optimizer/EMA, a warning) when
    the checkpoint predates full-state saving or was saved params-only.
    """
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding

    path = Path(path).absolute()
    meta = json.loads((path / "model_config.json").read_text())
    ckptr = ocp.StandardCheckpointer()

    def _to_abstract(tree):
        # Pin only mesh (NamedSharding) placements at restore time. Leaves the
        # template holds on a single default device (step scalar, rng key,
        # schedule counts) restore uncommitted instead — a committed
        # single-device scalar inside an otherwise mesh-sharded train state
        # makes jit reject the computation as cross-device.
        def leaf(x):
            sh = getattr(x, "sharding", None)
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=sh if isinstance(sh, NamedSharding) else None)

        return jax.tree.map(leaf, tree)

    def _uncommit(restored, template):
        import numpy as np

        def leaf(x, t):
            if isinstance(getattr(t, "sharding", None), NamedSharding):
                return x
            return jnp.asarray(np.asarray(x))

        return jax.tree.map(leaf, restored, template)

    params = _uncommit(
        ckptr.restore(path / "params", _to_abstract(template_state.params)),
        template_state.params,
    )

    cls = type(template_state)
    if not (path / "train_state").exists():
        print(f"WARNING: {path} has no train_state (params-only checkpoint); "
              "optimizer/EMA/schedule state re-initialized — the resumed run "
              "is NOT a continuation of the original optimization.")
        step = meta.get("step") or 0
        state = template_state._replace(
            step=jnp.asarray(step, template_state.step.dtype),
            params=params,
            ema_params=jax.tree.map(jnp.copy, params) if template_state.ema_params is not None else None,
        )
        return meta["config"], state, template_rng

    template_train = {
        "opt_state": template_state.opt_state,
        "ema_params": template_state.ema_params,
        "step": template_state.step,
        "rng": template_rng,
    }
    train_tree = _uncommit(
        ckptr.restore(path / "train_state", _to_abstract(template_train)), template_train
    )
    state = cls(
        step=train_tree["step"],
        params=params,
        opt_state=train_tree["opt_state"],
        ema_params=train_tree["ema_params"],
    )
    return meta["config"], state, train_tree["rng"]
