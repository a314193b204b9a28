"""Worker for the 2-process multihost simulation test (not a test module).

Each process owns 2 virtual CPU devices; together they form a ('dp','fsdp') =
(2,2) mesh with fsdp within-process (ICI analog) and dp across processes (DCN
analog). Runs one full train step (loss -> grad psum -> AdamW -> EMA) on a
tiny conv model and prints the loss, which must match across processes.

Usage: python mh_train_worker.py <process_id> <coordinator_port>
"""
import os
import sys

pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moge_tpu.parallel.distributed import initialize_distributed, make_multihost_mesh, shard_host_batch

initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from moge_tpu.train.step import init_train_state, make_train_step
from moge_tpu.train.utils import build_optimizer


class TinyPoints(nn.Module):
    @nn.compact
    def __call__(self, image, num_tokens):
        x = nn.gelu(nn.Conv(8, (3, 3))(image))
        return {
            "points": nn.Conv(3, (3, 3))(x),
            "mask": jax.nn.sigmoid(nn.Conv(1, (3, 3))(x)[..., 0]),
        }


mesh = make_multihost_mesh(fsdp=2)
assert mesh.shape == {"dp": 2, "fsdp": 2}, mesh.shape

module = TinyPoints()
params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), 0)["params"]
# Identical on every host (same seed); place with global-view semantics,
# replicated (tiny model — fsdp sharding exercised via the batch axis).
params = jax.tree.map(lambda x: jax.device_put(np.asarray(x), NamedSharding(mesh, P())), params)

opt_cfg = {"type": "AdamW", "params": [{"params": {"include": ["*"]}, "lr": 1e-2}]}
tx = build_optimizer(params, opt_cfg, None)
state = init_train_state(params, tx)

loss_config = {
    "invalid": {},
    "A": {"global": {"function": "affine_invariant_global_loss", "weight": 1.0,
                     "params": {"align_resolution": 8}},
          "mask": {"function": "mask_bce_loss", "weight": 0.1}},
}
label_types = ["A", "invalid"]

# Per-host local batch shard (2 instances each, global batch 4) — DETERMINISTIC
# per process so the run is reproducible.
rng = np.random.default_rng(100 + pid)
b = 2
depth = rng.uniform(1, 5, (b, 16, 16)).astype(np.float32)
local = {
    "image": rng.uniform(0, 1, (b, 16, 16, 3)).astype(np.float32),
    "depth": depth,
    "normal": np.zeros((b, 16, 16, 3), np.float32),
    "normal_mask": np.ones((b, 16, 16), bool),
    "depth_mask_fin": rng.uniform(0, 1, (b, 16, 16)) > 0.1,
    "depth_mask_inf": np.zeros((b, 16, 16), bool),
    "intrinsics": np.broadcast_to(
        np.asarray([[1.0, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1.0]], np.float32), (b, 3, 3)),
    "label_type_idx": np.zeros((b,), np.int32),
    "is_metric": np.zeros((b,), bool),
}
batch = shard_host_batch(local, mesh)
assert batch["image"].shape == (4, 16, 16, 3)

train_step = jax.jit(make_train_step(module, tx, loss_config, label_types, 0))
with mesh:
    state, metrics = train_step(state, batch, jax.random.PRNGKey(7))
loss = float(metrics["total"])
assert np.isfinite(loss)
assert int(state.step) == 1
print(f"MH_WORKER_OK pid={pid} loss={loss:.6f} grads_ok={float(metrics['grads_ok'])}")
