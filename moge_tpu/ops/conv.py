"""Pallas TPU 3x3 replicate-pad convolution for thin-channel decoder levels.

Why this exists: the MoGe ConvStack decoder (reference moge/model/modules.py:
195-254) runs most of its FLOPs in 3x3 convs at large spatial sizes with SMALL
channel counts (64 in / 64 or 32 out at the two finest pyramid levels). On
TPU the lane (minor) dimension is 128 wide, so XLA's conv kernels execute
C=64/O=64 shapes at ~19 TF/s on v5e while the same convs with C>=128 run at
93-128 TF/s (measured; see BENCHMARKS.md). This module fixes the thin-channel
case with a pair-domain Pallas kernel and leaves C>=128 to XLA, which is
already at the MXU roofline there.

Kernel design ("group domain"): view the NHWC image as groups of g=128/C
adjacent columns — a free reshape (B, H, W, C) -> (B, H, W/g, gC) — so lanes
become gC = 128 (pairs for C=64, quads for C=32). A 3x3 conv in image space
is exactly a 3x3 conv in group space over (gC -> gO) channels whose gxg
sub-blocks are the original taps (most structurally zero). The kernel
processes row-tiles: one DMA per tile (double-buffered), a flat (TH*Wq, gC)
view, and per row-tap one MXU matmul against the expanded weights
(gC, 3*gO) with the three column group-taps folded into the N dimension;
outputs realign with shifted adds on the flat M axis. Measured at the MXU
ceiling of this formulation (~61 TF/s executed) — 1.6x XLA at C=64/O=64 and
more at O=32.

The public op `conv3x3_replicate` is a drop-in for
pad(edge)+conv_general_dilated(VALID) with fp32 accumulation, carries a
custom VJP (backward runs the XLA reference formulation), and falls back to
XLA off-TPU, for fp32 inputs, or for unsupported geometry.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_replicate", "conv3x3_up2_bilinear", "conv3x3_xla", "use_pallas_conv"]

_SUBLANE = 16  # bf16 packed sublane tile
_VMEM_BUDGET = 72 * 2 ** 20   # tile-picker working-set bound (see _pick_tile)
_VMEM_LIMIT = 100 * 2 ** 20   # Mosaic scoped-vmem ceiling for the kernel
_INTERPRET = False  # tests flip this to run the kernel in interpret mode on CPU


def use_pallas_conv() -> bool:
    """Pallas path enabled? MOGE_PALLAS_CONV=0/1 overrides; default: on TPU."""
    env = os.environ.get("MOGE_PALLAS_CONV")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def conv3x3_xla(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    residual: Optional[jax.Array] = None,
    input_relu: bool = False,
) -> jax.Array:
    """Reference formulation: [relu +] replicate pad + VALID conv [+ residual],
    fp32 accumulate. A 5-dim kernel (G,3,3,C,O) applies weight group b // B0
    to batch entry b (grouped form; see _conv3x3_pallas)."""
    if kernel.ndim == 5:
        G = kernel.shape[0]
        B0 = x.shape[0] // G
        xg = x.reshape(G, B0, *x.shape[1:])
        if residual is None:
            yg = jax.vmap(lambda xx, kk, bb: conv3x3_xla(xx, kk, bb, None, input_relu))(
                xg, kernel, bias)
        else:
            rg = residual.reshape(G, B0, *residual.shape[1:])
            yg = jax.vmap(lambda xx, kk, bb, rr: conv3x3_xla(xx, kk, bb, rr, input_relu))(
                xg, kernel, bias, rg)
        return yg.reshape(x.shape[0], *yg.shape[2:])
    if input_relu:
        x = jnp.maximum(x, 0)
    xpad = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
    y = jax.lax.conv_general_dilated(
        xpad, kernel.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)


def _build_group_weights(kernel: jax.Array, g: int) -> jax.Array:
    """(3,3,C,O) -> (3, gC, 3gO): per row-tap di, expand to the column-GROUP
    domain where ``g`` adjacent image columns form one lane-dim group (gC=128).

    Output sub-col j of group p reads input cols gp+j-1..gp+j+1, which live in
    groups p-1 (du block 0), p (block 1), p+1 (block 2). Entry (i -> j) of
    block du is the original column tap at offset ``g*(du-1)+i-j`` when that
    offset is in {-1,0,1}, else structurally zero.
    """
    w = kernel
    C, O = w.shape[2], w.shape[3]
    z = jnp.zeros((3, C, O), w.dtype)
    blocks = []
    for du in range(3):
        cols = []
        for j in range(g):
            rows = []
            for i in range(g):
                delta = g * (du - 1) + i - j
                rows.append(w[:, delta + 1] if -1 <= delta <= 1 else z)
            cols.append(jnp.concatenate(rows, axis=1))  # (3, gC, O)
        blocks.append(jnp.concatenate(cols, axis=-1))  # (3, gC, gO)
    return jnp.concatenate(blocks, axis=-1)  # (3, gC, 3gO)


def _kernel(*refs, TH, Wout, Wq, Cq, Oq, NT, input_relu, has_residual):
    if has_residual:
        xq_ref, w_ref, b_ref, r_ref, y_ref, xt, sem = refs
    else:
        xq_ref, w_ref, b_ref, y_ref, xt, sem = refs
        r_ref = None
    bidx = pl.program_id(0)
    t = pl.program_id(1)

    def get_dma(slot, tile):
        return pltpu.make_async_copy(
            xq_ref.at[bidx, pl.ds(tile * TH, TH + 3)], xt.at[slot], sem.at[slot])

    @pl.when(t == 0)
    def _():
        get_dma(0, 0).start()

    slot = jax.lax.rem(t, 2)

    @pl.when(t + 1 < NT)
    def _():
        get_dma(jax.lax.rem(t + 1, 2), t + 1).start()

    get_dma(slot, t).wait()
    M = TH * Wq
    a = xt[slot].reshape((TH + 3) * Wq, Cq)
    if input_relu:
        a = jnp.maximum(a, 0)
    acc = jnp.broadcast_to(b_ref[0, 0].astype(jnp.float32), (M, Oq))
    for di in range(3):
        p = jax.lax.dot_general(
            a[di * Wq:di * Wq + M + 2], w_ref[0, di],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = acc + p[0:M, 0:Oq] + p[1:M + 1, Oq:2 * Oq] + p[2:M + 2, 2 * Oq:3 * Oq]
    out = acc.reshape(TH, Wq, Oq)[:, :Wout]
    if r_ref is not None:
        out = out + r_ref[0].astype(jnp.float32)
    y_ref[0] = out.astype(y_ref.dtype)


def _pick_tile(H: int, Wq: int, Cq: int, Oq: int) -> Optional[int]:
    """Largest divisor of H whose working set fits the VMEM budget.

    The budget/limit pair is empirically calibrated on v5e: bigger tiles
    amortize per-grid-step overheads (296x296 C64: TH=8 -> 57 TF/s executed,
    TH=74 -> 80 TF/s), but Mosaic stack-allocates the per-di matmul result
    so the working set must stay under the scoped-vmem ceiling.
    """
    best = None
    for TH in range(1, H + 1):
        if H % TH:
            continue
        M = TH * Wq
        need = (
            2 * (TH + 3) * Wq * Cq * 2          # double-buffered input tiles
            + (M + 2) * max(3 * Oq, 128) * 4    # p (per-di matmul result, f32)
            + M * max(Oq, 128) * 4              # acc
            + 2 * TH * Wq * max(Oq, 128) * 2    # out block (pipelined x2)
        )
        if need <= _VMEM_BUDGET and (best is None or TH > best):
            best = TH
    return best


def _group_size(C: int) -> Optional[int]:
    """Columns per lane group: smallest g with g*C a multiple of 128.

    g=1 (C a lane multiple) runs the same kernel with one pixel per flat row
    and no FLOP expansion; thin channels pay an executed-FLOP factor of g.
    """
    if C % 128 == 0:
        return 1
    if C < 128 and 128 % C == 0:
        return 128 // C
    return None


def _supported(x: jax.Array, kernel: jax.Array) -> bool:
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    if x.dtype != jnp.bfloat16:
        return False
    if kernel.ndim == 5 and (B % kernel.shape[0] != 0):
        return False
    g = _group_size(C)
    if g is None:
        return False
    if W % g != 0 or H < 2 or W < 2 * g:
        return False
    Wq = -(-(W // g + 2) // _SUBLANE) * _SUBLANE
    return _pick_tile(H, Wq, g * C, g * O) is not None


def _conv3x3_pallas(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    residual: Optional[jax.Array] = None,
    input_relu: bool = False,
) -> jax.Array:
    """``kernel``: (3,3,C,O) shared, or (G,3,3,C,O) with x batched as
    (G*B0, H, W, C) — batch b uses weight group b // B0 (stacked decoder
    heads run as one grid). ``bias`` matches: (O,) or (G, O)."""
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    if kernel.ndim == 4:
        kernel = kernel[None]
        bias = bias[None]
    G = kernel.shape[0]
    B0 = B // G
    g = _group_size(C)
    Wq = -(-(W // g + 2) // _SUBLANE) * _SUBLANE
    Cq, Oq = g * C, g * O
    TH = _pick_tile(H, Wq, Cq, Oq)
    Wout = W // g
    # rows: +1 edge top, +1 edge bottom, +1 overhang row (du=2 of last tile);
    # cols: 1 group left edge (g cols), right pad to g*Wq.
    xq = jnp.pad(x, [(0, 0), (1, 2), (g, g * Wq - W - g), (0, 0)], mode="edge")
    xq = xq.reshape(B, H + 3, Wq, Cq)
    wq = jax.vmap(_build_group_weights, in_axes=(0, None))(kernel.astype(x.dtype), g)
    bq = jnp.tile(bias, (1, g)).astype(jnp.float32)
    NT = H // TH
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((1, 3, Cq, 3 * Oq), lambda bi, ti: (bi // B0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Oq), lambda bi, ti: (bi // B0, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [xq, wq, bq.reshape(G, 1, Oq)]
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, TH, Wout, Oq), lambda bi, ti: (bi, ti, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual.reshape(B, H, Wout, Oq))
    y = pl.pallas_call(
        functools.partial(_kernel, TH=TH, Wout=Wout, Wq=Wq, Cq=Cq, Oq=Oq, NT=NT,
                          input_relu=input_relu, has_residual=residual is not None),
        out_shape=jax.ShapeDtypeStruct((B, H, Wout, Oq), x.dtype),
        grid=(B, NT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TH, Wout, Oq), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, TH + 3, Wq, Cq), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(*args)
    return y.reshape(B, H, W, O)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _conv3x3_core(x, kernel, bias, residual, input_relu):
    if use_pallas_conv() and _supported(x, kernel):
        return _conv3x3_pallas(x, kernel.astype(x.dtype), bias, residual, input_relu)
    return conv3x3_xla(x, kernel.astype(x.dtype), bias, residual, input_relu)


def _fwd(x, kernel, bias, residual, input_relu):
    return _conv3x3_core(x, kernel, bias, residual, input_relu), (x, kernel, bias, residual)


def _bwd_formulation(x, kernel, bias, residual, input_relu):
    """Transposable twin of conv3x3_xla: the conv runs in the activation
    dtype WITHOUT preferred_element_type (a conv with fp32 preferred output
    on bf16 operands has no transpose rule for mixed-dtype cotangents);
    elementwise math stays fp32. Gradients match to activation precision."""
    if input_relu:
        x = jnp.maximum(x, 0)
    xpad = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
    y = jax.lax.conv_general_dilated(
        xpad, kernel.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.astype(jnp.float32) + bias
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)


def _bwd(input_relu, res, g):
    x, kernel, bias, residual = res
    if kernel.ndim == 5:
        G = kernel.shape[0]
        B0 = x.shape[0] // G

        def grouped(xx, kk, bb, rr):
            xg = xx.reshape(G, B0, *xx.shape[1:])
            if rr is None:
                yg = jax.vmap(lambda a, b, c: _bwd_formulation(a, b, c, None, input_relu))(
                    xg, kk, bb)
            else:
                rg = rr.reshape(G, B0, *rr.shape[1:])
                yg = jax.vmap(lambda a, b, c, d: _bwd_formulation(a, b, c, d, input_relu))(
                    xg, kk, bb, rg)
            return yg.reshape(xx.shape[0], *yg.shape[2:])

        _, vjp = jax.vjp(grouped, x, kernel, bias, residual)
    else:
        _, vjp = jax.vjp(
            lambda xx, kk, bb, rr: _bwd_formulation(xx, kk, bb, rr, input_relu),
            x, kernel, bias, residual)
    return vjp(g)


_conv3x3_core.defvjp(_fwd, _bwd)


# bilinear 2x (half-pixel, edge-clamped) row coefficients per (out parity a,
# conv row tap du): list of (input offset di, weight). Same table for columns.
_UP2_TAPS = {
    (0, 0): [(-1, 0.75), (0, 0.25)],
    (0, 1): [(-1, 0.25), (0, 0.75)],
    (0, 2): [(0, 0.75), (1, 0.25)],
    (1, 0): [(-1, 0.25), (0, 0.75)],
    (1, 1): [(0, 0.75), (1, 0.25)],
    (1, 2): [(0, 0.25), (1, 0.75)],
}


def up2_conv3_weights(kernel: jax.Array) -> jax.Array:
    """Compose bilinear 2x upsample (align_corners=False) with a 3x3 conv.

    Returns (3, 3, C, 2, 2, O): taps over the LOW-res input producing the 4
    output parities. Exact, including edges: the upsample's edge clamp and
    the conv's replicate pad both reduce to clamping low-res row/col indices,
    which is precisely this kernel under replicate padding (see tests).
    """
    C, O = kernel.shape[2], kernel.shape[3]
    w = jnp.zeros((3, 3, C, 2, 2, O), kernel.dtype)
    for a in range(2):
        for b in range(2):
            for du in range(3):
                for dv in range(3):
                    for di, ar in _UP2_TAPS[(a, du)]:
                        for dj, ac in _UP2_TAPS[(b, dv)]:
                            w = w.at[di + 1, dj + 1, :, a, b, :].add(ar * ac * kernel[du, dv])
    return w


def conv3x3_up2_bilinear(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
) -> jax.Array:
    """bilinear-2x upsample followed by a replicate-pad 3x3 conv, fused.

    Replaces resize(2x) + pad + conv (three full-resolution HBM passes plus
    the layout copies XLA inserts between them at the decoder's finest level)
    with ONE pallas conv at the LOW resolution over parity-expanded weights
    (3,3,C,4O) and a depth-to-space. Reference semantics:
    moge/model/modules.py:139-182 Resampler('bilinear') + its conv.
    """
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    wq = up2_conv3_weights(kernel).reshape(3, 3, C, 4 * O)
    bq = jnp.tile(bias, 4)
    y = conv3x3_replicate(x, wq, bq)                      # (B, H, W, 4O)
    y = y.reshape(B, H, W, 2, 2, O).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 2 * H, 2 * W, O)


def conv3x3_replicate(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    residual: Optional[jax.Array] = None,
    input_relu: bool = False,
) -> jax.Array:
    """3x3 stride-1 NHWC conv with replicate padding and fp32 accumulation.

    ``kernel``: (3, 3, C, O); ``bias``: (O,). Optionally fuses a pre-conv
    relu on the input (exact: relu commutes with replicate pad) and a
    post-conv residual add — the elementwise passes XLA would otherwise run
    as separate HBM round-trips between decoder convs. Uses the group-domain
    pallas kernel on TPU when supported, XLA otherwise. Matches
    `conv3x3_xla` within bf16 accumulation-order tolerance.
    """
    return _conv3x3_core(x, kernel, bias, residual, input_relu)
