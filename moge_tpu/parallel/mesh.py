"""Device mesh + sharding layout for moge_tpu.

The reference's only parallelism is DDP data-parallel with NCCL all-reduce
(SURVEY §2.7; reference scripts/train.py:87-93, model/utils.py:41-49). The
TPU-native design generalizes that to a 2-D ('dp', 'fsdp') mesh:

  * batches are sharded over 'dp' x 'fsdp' (pure data parallelism — every
    device computes a batch shard; gradient reduction is XLA-inserted psum
    over ICI, replacing DDP's NCCL all-reduce);
  * parameters and optimizer state are sharded over 'fsdp' (ZeRO-style; XLA
    inserts all-gathers for use and reduce-scatters for grads). fsdp=1
    replicates params, recovering exact DDP semantics.

Multi-host: build the mesh from jax.devices() after jax.distributed
initialization — 'dp' spans hosts (DCN), 'fsdp' stays within a slice (ICI).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None, fsdp: int = 1, dp: Optional[int] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % fsdp == 0, f"{n} devices not divisible by fsdp={fsdp}"
        dp = n // fsdp
    assert dp * fsdp == n, f"dp*fsdp ({dp}*{fsdp}) != devices ({n})"
    return Mesh(np.asarray(devices).reshape(dp, fsdp), ("dp", "fsdp"))


def _param_spec(x: jax.Array, fsdp_size: int) -> P:
    """Shard the largest fsdp-divisible axis of a param over 'fsdp'."""
    if fsdp_size == 1 or x.ndim == 0:
        return P()
    axes = sorted(range(x.ndim), key=lambda a: -x.shape[a])
    for a in axes:
        if x.shape[a] % fsdp_size == 0 and x.shape[a] >= fsdp_size:
            spec = [None] * x.ndim
            spec[a] = "fsdp"
            return P(*spec)
    return P()  # too small to shard -> replicate


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree on the mesh with ZeRO-style 'fsdp' sharding."""
    fsdp_size = mesh.shape["fsdp"]

    def place(x):
        spec = _param_spec(x, fsdp_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    fsdp_size = mesh.shape["fsdp"]
    return jax.tree.map(lambda x: NamedSharding(mesh, _param_spec(x, fsdp_size)), params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) axis over all mesh devices ('dp' then 'fsdp')."""
    sharding = NamedSharding(mesh, P(("dp", "fsdp")))

    def place(x):
        if getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sharding)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
