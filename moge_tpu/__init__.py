"""moge_tpu — a TPU-native (JAX/XLA/Pallas) monocular-geometry framework.

Re-implements the full capability surface of microsoft/MoGe (MoGe-1 & MoGe-2:
affine-invariant / metric point maps, depth, normals, camera recovery) with a
TPU-first design: bf16 MXU compute, jit-compiled batched post-processing
(no host round-trips), pjit/shard_map data parallelism over device meshes.
"""

import jax as _jax

# Precision follows dtype: float32 matmuls must be true fp32 (the reference's
# post-processing solves run in fp32; TPU's default bf16-matmul truncation
# breaks them), while bf16 network matmuls still execute single-pass on the
# MXU. This mirrors torch's allow_tf32=False default semantics.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
