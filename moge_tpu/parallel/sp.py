"""Sequence-parallel ViT encoding: shard the TOKEN axis over a mesh axis.

For the 2500-3600-token inference regime the encoder is the cost (the
reference's default ``resolution_level=9`` runs 3600 tokens,
/root/reference/moge/model/v2.py:236-238). Every encoder op except attention
is per-token, so splitting the token axis over ``sp`` devices divides the
whole encoder wall-clock by ~sp at the price of one K/V all-gather per block
(2 x N x D bf16 ≈ 14 MB for ViT-L @ 3600 tokens — ICI traffic, far below the
per-layer compute time).

Design (vs the torch reference, which has no multi-device inference story):
  * params stay fully REPLICATED — no resharding, no checkpoint-layout
    coupling, composable with dp (batch) sharding on an ('dp', 'sp') mesh;
  * the patch embed + pos-embed stage is recomputed on every shard
    (replicated; ~0.5% of encoder FLOPs) so the shard_map body contains the
    whole backbone and XLA sees one program;
  * each device takes one CONTIGUOUS chunk of the padded token axis; padding
    lives at the global tail and is masked inside the flash kernel via its
    ``kv_valid`` cross-length support (ops/attention.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
from jax.sharding import Mesh, PartitionSpec as P


from ..models.dinov2 import DinoViT, ViTConfig


def sequence_parallel_encode(
    config: ViTConfig,
    params: Any,
    image: jax.Array,
    take_layers: Sequence[int],
    mesh: Mesh,
    sp_axis: str = "sp",
    dtype: Any = None,
    use_flash: bool = False,
    scan_blocks: bool = False,
):
    """Run the DINOv2 backbone with the token axis sharded over ``sp_axis``.

    ``image``: (B, H*14, W*14, 3) normalized NHWC, replicated. Returns the
    same [(patch_tokens, cls), ...] structure as ``DinoViT.__call__``, fully
    replicated (each shard all-gathers the final tokens).
    """
    import jax.numpy as jnp

    vit = DinoViT(
        config,
        dtype=dtype if dtype is not None else jnp.float32,
        use_flash=use_flash,
        scan_blocks=scan_blocks,
        sp_axis=sp_axis,
        sp_size=mesh.shape[sp_axis],
    )

    def body(p, img):
        return vit.apply({"params": p}, img, take_layers)

    # inputs replicated, outputs replicated (the module gathers internally);
    # check_vma off: the all-gathered outputs are device-invariant but the
    # checker cannot prove it through the collectives.
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(params, image)
