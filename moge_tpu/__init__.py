"""moge_tpu — a TPU-native (JAX/XLA/Pallas) monocular-geometry framework.

Re-implements the full capability surface of microsoft/MoGe (MoGe-1 & MoGe-2:
affine-invariant / metric point maps, depth, normals, camera recovery) with a
TPU-first design: bf16 MXU compute, jit-compiled batched post-processing
(no host round-trips), pjit/shard_map data parallelism over device meshes.
"""

# NOTE on matmul precision: TPU's default matmul precision truncates fp32
# operands to bf16, which breaks the fp32 post-processing solves. We do NOT
# set jax_default_matmul_precision=highest globally — that silently forces
# bf16 *network* matmuls into multi-pass fp32 emulation (measured ~5x slower
# ViT). Instead every fp32-critical matmul in ops/ passes
# precision=Precision.HIGHEST explicitly; bf16 MXU matmuls keep the fast
# default (bf16 inputs already accumulate in fp32 on the MXU).

__version__ = "0.1.0"
