"""Multi-host path tests: mesh layout logic (pure) and a real 2-process CPU
simulation of the sharded train step (something the torch reference can only
exercise on a live multi-node NCCL cluster)."""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from moge_tpu.parallel.distributed import layout_multihost_devices


class _StubDev:
    def __init__(self, proc, idx):
        self.process_index = proc
        self.id = idx

    def __repr__(self):
        return f"d{self.process_index}.{self.id}"


def test_layout_fsdp_within_host():
    """fsdp groups must never straddle hosts (their collectives ride ICI)."""
    devs = [_StubDev(p, i) for p in range(2) for i in range(4)]
    grid = layout_multihost_devices(devs, fsdp=4)
    assert grid.shape == (2, 4)
    for row in grid:
        assert len({d.process_index for d in row}) == 1
    # dp axis spans hosts in process order
    assert [row[0].process_index for row in grid] == [0, 1]

    grid2 = layout_multihost_devices(devs, fsdp=2)
    assert grid2.shape == (4, 2)
    for row in grid2:
        assert len({d.process_index for d in row}) == 1


def test_layout_rejects_straddling_fsdp():
    devs = [_StubDev(p, i) for p in range(2) for i in range(3)]
    with pytest.raises(ValueError, match="divisible by fsdp"):
        layout_multihost_devices(devs, fsdp=2)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cpu_train_step():
    """Spawn 2 processes x 2 virtual CPU devices; run one sharded train step
    over the (dp=2, fsdp=2) multihost mesh. Loss must be finite, identical on
    both ranks, and grads_ok=1.0 (the gradient psum crossed processes)."""
    worker = Path(__file__).parent / "mh_train_worker.py"
    port = _free_port()
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(pid), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert "MH_WORKER_OK" in out, out
    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if "MH_WORKER_OK" in ln][0]
        losses.append(float(line.split("loss=")[1].split()[0]))
    assert np.isclose(losses[0], losses[1]), losses
