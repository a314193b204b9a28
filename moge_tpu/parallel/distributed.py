"""Multi-host (multi-process) initialization and mesh layout.

The reference reaches multi-node scale through HF Accelerate spawning DDP
ranks over NCCL (moge/scripts/train.py:87-93). The TPU-native equivalent is
``jax.distributed.initialize`` + a global device mesh: every host runs the
same program, XLA collectives ride ICI within a slice and DCN across slices.

Layout policy: the 'fsdp' (param-sharding) axis is placed WITHIN a host's
local devices, so the per-use-site param all-gathers / grad reduce-scatters
stay on ICI; the 'dp' axis spans hosts, so only the (much smaller) gradient
psum crosses DCN. This is the standard FSDP-inside / DP-outside recipe for
pod-scale data parallelism.

Per-step randomness that the reference synchronizes with a runtime collective
(the num_tokens broadcast, train.py:289) needs NO collective here: every host
seeds the same host-side PRNG schedule (``random.seed(seed + initial_step)``),
so all hosts sample identical num_tokens/image sizes deterministically.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (idempotent).

    On TPU pods all arguments auto-detect from the environment; for manual
    launches (or CPU simulation) pass coordinator/num_processes/process_id
    explicitly. Safe to call when already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise


def layout_multihost_devices(devices: Sequence, fsdp: int, process_index_of=None) -> np.ndarray:
    """Arrange global devices into a (dp, fsdp) grid with each fsdp group
    contained in a single host's local devices.

    Pure layout logic (unit-testable with stub devices): rows are fsdp-sized
    contiguous chunks of each process's local device list, ordered by
    process index.
    """
    if process_index_of is None:
        process_index_of = lambda d: d.process_index
    by_proc = defaultdict(list)
    for d in devices:
        by_proc[process_index_of(d)].append(d)
    rows = []
    for proc in sorted(by_proc):
        local = by_proc[proc]
        if len(local) % fsdp != 0:
            raise ValueError(
                f"host {proc} has {len(local)} local devices, not divisible by fsdp={fsdp}; "
                "the fsdp axis must fit within one host so its collectives stay on ICI"
            )
        rows.extend(local[i : i + fsdp] for i in range(0, len(local), fsdp))
    return np.asarray(rows, dtype=object)


def make_multihost_mesh(fsdp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """('dp','fsdp') mesh over ALL processes' devices (call after
    :func:`initialize_distributed`); single-process this equals make_mesh."""
    devices = list(devices if devices is not None else jax.devices())
    grid = layout_multihost_devices(devices, fsdp)
    return Mesh(grid, ("dp", "fsdp"))


def shard_host_batch(batch: Any, mesh: Mesh) -> Any:
    """Assemble a globally-sharded batch from THIS host's local shard.

    Each host's data pipeline produces global_batch/num_processes instances;
    ``jax.make_array_from_process_local_data`` stitches the per-host arrays
    into global jax.Arrays sharded over ('dp','fsdp') without any transfer of
    other hosts' data through this host.
    """
    batch_sharding = NamedSharding(mesh, P(("dp", "fsdp")))
    replicated = NamedSharding(mesh, P())

    def place(x):
        x = np.asarray(x)
        if x.ndim >= 1:
            return jax.make_array_from_process_local_data(batch_sharding, x)
        return jax.make_array_from_process_local_data(replicated, x)

    return jax.tree.map(place, batch)
