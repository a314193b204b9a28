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

__all__ = ["conv3x3_replicate", "conv3x3_up2_bilinear", "conv3x3_xla", "use_pallas_conv",
           "conv3x3_chain", "to_chain", "from_chain", "chain_geometry"]

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


def use_chain_conv() -> bool:
    """Chained (group-domain) decoder conv path enabled? MOGE_CHAIN_CONV=0/1
    overrides; default: wherever the pallas conv runs."""
    env = os.environ.get("MOGE_CHAIN_CONV")
    if env is not None:
        return env not in ("0", "false", "")
    return use_pallas_conv()


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


def _kernel(*refs, TH, Wout, Wq, Cq, Oq, NT, H, g, O, input_relu, has_residual,
            chain_in, chain_out, res_chain):
    if has_residual:
        xq_ref, w_ref, b_ref, r_ref, y_ref, xt, sem = refs
    else:
        xq_ref, w_ref, b_ref, y_ref, xt, sem = refs
        r_ref = None
    bidx = pl.program_id(0)
    t = pl.program_id(1)

    if not chain_in:
        # xq_ref rows are pre-padded on the host: (B, H + 3, Wq, Cq).
        def start_dma(slot, tile):
            pltpu.make_async_copy(
                xq_ref.at[bidx, pl.ds(tile * TH, TH + 3)], xt.at[slot], sem.at[slot]).start()

        def wait_dma(slot, tile):
            pltpu.make_async_copy(
                xq_ref.at[bidx, pl.ds(tile * TH, TH + 3)], xt.at[slot], sem.at[slot]).wait()
    else:
        # xq_ref rows are raw image rows: (B, H, Wq, Cq). Each tile needs rows
        # [t*TH - 1, t*TH + TH + 2) with replicate clamping; the in-range span
        # is DMA'd (shape static per first/middle/last case) and the clamped
        # edge rows are duplicated in VMEM after the wait.
        def _dma(slot, tile, op):
            def go(src_lo, n, dst_lo):
                c = pltpu.make_async_copy(
                    xq_ref.at[bidx, pl.ds(src_lo, n)],
                    xt.at[slot, pl.ds(dst_lo, n)], sem.at[slot])
                c.start() if op == "start" else c.wait()
            if NT == 1:
                go(0, H, 1)
            else:
                @pl.when(tile == 0)
                def _():
                    go(0, TH + 2, 1)

                @pl.when(jnp.logical_and(tile > 0, tile < NT - 1))
                def _():
                    go(tile * TH - 1, TH + 3, 0)

                @pl.when(tile == NT - 1)
                def _():
                    go(tile * TH - 1, TH + 1, 0)

        def start_dma(slot, tile):
            _dma(slot, tile, "start")

        def wait_dma(slot, tile):
            _dma(slot, tile, "wait")

    @pl.when(t == 0)
    def _():
        start_dma(0, 0)

    slot = jax.lax.rem(t, 2)

    @pl.when(t + 1 < NT)
    def _():
        start_dma(jax.lax.rem(t + 1, 2), t + 1)

    wait_dma(slot, t)

    if chain_in:
        # Replicate clamped edge rows (top pad for the first tile, two bottom
        # pad rows for the last; a single tile holds H == TH rows at offset 1).
        last_row = (H - 1) - (TH * (NT - 1) - 1) if NT > 1 else TH

        @pl.when(t == 0)
        def _():
            xt[slot, 0] = xt[slot, 1]

        @pl.when(t == NT - 1)
        def _():
            xt[slot, last_row + 1] = xt[slot, last_row]
            xt[slot, last_row + 2] = xt[slot, last_row]

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
        r = r_ref[0, :, 1:Wout + 1] if res_chain else r_ref[0]
        out = out + r.astype(jnp.float32)
    out = out.astype(y_ref.dtype)
    if not chain_out:
        y_ref[0] = out
    else:
        # Emit the chain format directly: group 0 and the right pad groups are
        # the replicated image edge columns the NEXT chained conv expects.
        y_ref[0, :, 1:Wout + 1] = out
        left = out[:, 0, :O]
        right = out[:, Wout - 1, (g - 1) * O:]
        if g > 1:
            left = jnp.concatenate([left] * g, axis=-1)
            right = jnp.concatenate([right] * g, axis=-1)
        y_ref[0, :, 0] = left
        y_ref[0, :, Wout + 1:] = jnp.broadcast_to(
            right[:, None, :], (TH, Wq - Wout - 1, Oq))


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
    *,
    chain_in: bool = False,
    chain_out: bool = False,
    img_w: Optional[int] = None,
) -> jax.Array:
    """``kernel``: (3,3,C,O) shared, or (G,3,3,C,O) with x batched as
    (G*B0, H, W, C) — batch b uses weight group b // B0 (stacked decoder
    heads run as one grid). ``bias`` matches: (O,) or (G, O).

    ``chain_in``/``chain_out`` keep consecutive convs in the group domain
    (see ``to_chain``): chain_in takes x as (B, H, Wq, gC) with column edge
    groups but RAW rows (the kernel clamp-DMAs its row halo); chain_out emits
    (B, H, Wq, gO) with edge groups filled, ready to be the next chain_in.
    A chained residual is also in chain format. This removes the pad +
    relayout XLA passes between decoder convs (measured ~0.3 ms per link at
    the 3600-token decode sizes)."""
    O = kernel.shape[-1]
    if kernel.ndim == 4:
        kernel = kernel[None]
        bias = bias[None]
    G = kernel.shape[0]
    if chain_in:
        B, H, Wq, Cq = x.shape
        C = kernel.shape[-2]
        g = Cq // C
        W = img_w
        xq = x
    else:
        B, H, W, C = x.shape
        g = _group_size(C)
        Wq = -(-(W // g + 2) // _SUBLANE) * _SUBLANE
        # rows: +1 edge top, +1 edge bottom, +1 overhang row (du=2 of last
        # tile); cols: 1 group left edge (g cols), right pad to g*Wq.
        xq = jnp.pad(x, [(0, 0), (1, 2), (g, g * Wq - W - g), (0, 0)], mode="edge")
        xq = xq.reshape(B, H + 3, Wq, g * C)
    Cq, Oq = g * C, g * O
    B0 = B // G
    TH = _pick_tile(H, Wq, Cq, Oq)
    Wout = W // g
    wq = jax.vmap(_build_group_weights, in_axes=(0, None))(kernel.astype(x.dtype), g)
    bq = jnp.tile(bias, (1, g)).astype(jnp.float32)
    NT = H // TH
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((1, 3, Cq, 3 * Oq), lambda bi, ti: (bi // B0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Oq), lambda bi, ti: (bi // B0, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [xq, wq, bq.reshape(G, 1, Oq)]
    res_chain = chain_in and residual is not None
    if residual is not None:
        rw = Wq if res_chain else Wout
        in_specs.append(pl.BlockSpec((1, TH, rw, Oq), lambda bi, ti: (bi, ti, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual.reshape(B, H, rw, Oq))
    out_w = Wq if chain_out else Wout
    y = pl.pallas_call(
        functools.partial(_kernel, TH=TH, Wout=Wout, Wq=Wq, Cq=Cq, Oq=Oq, NT=NT,
                          H=H, g=g, O=O, input_relu=input_relu,
                          has_residual=residual is not None,
                          chain_in=chain_in, chain_out=chain_out, res_chain=res_chain),
        out_shape=jax.ShapeDtypeStruct((B, H, out_w, Oq), x.dtype),
        grid=(B, NT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TH, out_w, Oq), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, TH + 3, Wq, Cq), x.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(*args)
    if chain_out:
        return y
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
    elementwise math stays fp32. Gradients match to activation precision.

    MOGE_CONV_BWD_FP32=1 lifts the conv to fp32 (uniform dtypes, so the
    transpose rule applies and the gradient convolutions accumulate in fp32;
    the convert_element_type transposes cast cotangents back) — use if bf16
    gradient accumulation ever shows up as a training-quality issue."""
    out_dtype = x.dtype
    if input_relu:
        x = jnp.maximum(x, 0)
    if os.environ.get("MOGE_CONV_BWD_FP32", "0") != "0":
        x = x.astype(jnp.float32)
    xpad = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
    y = jax.lax.conv_general_dilated(
        xpad, kernel.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.astype(jnp.float32) + bias
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(out_dtype)


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
    *,
    chain_g: Optional[int] = None,
    img_w: Optional[int] = None,
) -> jax.Array:
    """bilinear-2x upsample followed by a replicate-pad 3x3 conv, fused.

    Replaces resize(2x) + pad + conv (three full-resolution HBM passes plus
    the layout copies XLA inserts between them at the decoder's finest level)
    with ONE pallas conv at the LOW resolution over parity-expanded weights
    (3,3,C,4O) and a depth-to-space. With ``chain_g``, ``x`` is a chain
    (group-domain) tensor of image width ``img_w`` (see ``to_chain``).
    Reference semantics: moge/model/modules.py:139-182 Resampler('bilinear')
    + its conv.
    """
    if chain_g is not None:
        B, H = x.shape[0], x.shape[1]
        W = img_w
        C = x.shape[-1] // chain_g
    else:
        B, H, W, C = x.shape
    O = kernel.shape[-1]
    wq = up2_conv3_weights(kernel).reshape(3, 3, C, 4 * O)
    bq = jnp.tile(bias, 4)
    if chain_g is not None:
        y = conv3x3_chain(x, wq, bq, g=chain_g, img_w=W, chain_out=False)
    else:
        y = conv3x3_replicate(x, wq, bq)                  # (B, H, W, 4O)
    y = y.reshape(B, H, W, 2, 2, O).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 2 * H, 2 * W, O)


def to_chain(x: jax.Array, g: int) -> jax.Array:
    """(B, H, W, C) image -> (B, H, Wq, gC) chain/group-domain tensor.

    Columns are edge-padded (one replicated group on the left, replicated
    right padding up to the sublane-aligned group count Wq) and folded into
    lanes; rows stay raw (the chained kernel clamp-DMAs its own row halo)."""
    B, H, W, C = x.shape
    Wq = -(-(W // g + 2) // _SUBLANE) * _SUBLANE
    xq = jnp.pad(x, [(0, 0), (0, 0), (g, g * Wq - W - g), (0, 0)], mode="edge")
    return xq.reshape(B, H, Wq, g * C)


def from_chain(y: jax.Array, img_w: int, channels: int) -> jax.Array:
    """(B, H, Wq, gO) chain tensor -> (B, H, W, O) image (drops edge groups)."""
    B, H, Wq, Oq = y.shape
    g = Oq // channels
    return y.reshape(B, H, Wq * g, channels)[:, :, g:g + img_w]


def chain_geometry(H: int, W: int, C: int, O: int) -> Optional[int]:
    """Group size g if a chained pallas conv supports this geometry, else None."""
    g = _group_size(C)
    if g is None or W % g != 0 or H < 2 or W < 2 * g:
        return None
    Wq = -(-(W // g + 2) // _SUBLANE) * _SUBLANE
    TH = _pick_tile(H, Wq, g * C, g * O)
    if TH is None:
        return None
    if H // TH > 1 and TH < 2:  # first-tile halo DMA needs H >= TH + 2
        return None
    return g


def _chain_ref(x, kernel, bias, residual, input_relu, g, img_w, chain_in,
               chain_out, precise=True):
    """Pure-XLA twin of the chained pallas conv (same semantics on arbitrary
    chain tensors, including non-edge pad-group content). Serves as the
    non-TPU fallback and the VJP formulation of :func:`conv3x3_chain`."""
    O = kernel.shape[-1]
    if chain_in:
        B, H, Wq, Cq = x.shape
        C = Cq // g
        ximg = x.reshape(B, H, Wq * g, C)
        if input_relu:
            ximg = jnp.maximum(ximg, 0)
        xpad = jnp.pad(ximg, [(0, 0), (1, 1), (0, 0), (0, 0)], mode="edge")
        # VALID output col c covers padded cols c..c+2; image col j sits at
        # padded col g + j, so image outputs are cols g-1 .. g-1+W.
        c0 = g - 1
    else:
        B, H, W, C = x.shape
        ximg = x
        if input_relu:
            ximg = jnp.maximum(ximg, 0)
        xpad = jnp.pad(ximg, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
        c0 = 0
    kw = dict(preferred_element_type=jnp.float32) if precise else {}
    y = jax.lax.conv_general_dilated(
        xpad, kernel.astype(ximg.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)
    y = y[:, :, c0:c0 + img_w].astype(jnp.float32) + bias
    if residual is not None:
        if chain_in:
            Wq = x.shape[2]
            rimg = residual.reshape(B, H, Wq * g, O)[:, :, g:g + img_w]
        else:
            rimg = residual
        y = y + rimg.astype(jnp.float32)
    y = y.astype(x.dtype)
    if chain_out:
        y = to_chain(y, g)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _chain_core(x, kernel, bias, residual, input_relu, g, img_w, chain_in, chain_out):
    if use_pallas_conv() and x.dtype == jnp.bfloat16:
        return _conv3x3_pallas(x, kernel.astype(x.dtype), bias, residual, input_relu,
                               chain_in=chain_in, chain_out=chain_out, img_w=img_w)
    return _chain_ref(x, kernel, bias, residual, input_relu, g, img_w,
                      chain_in, chain_out)


def _chain_fwd(x, kernel, bias, residual, input_relu, g, img_w, chain_in, chain_out):
    return (_chain_core(x, kernel, bias, residual, input_relu, g, img_w,
                        chain_in, chain_out),
            (x, kernel, bias, residual))


def _chain_bwd(input_relu, g, img_w, chain_in, chain_out, res, ct):
    x, kernel, bias, residual = res
    _, vjp = jax.vjp(
        lambda xx, kk, bb, rr: _chain_ref(
            xx, kk, bb, rr, input_relu, g, img_w, chain_in, chain_out, precise=False),
        x, kernel, bias, residual)
    return vjp(ct)


_chain_core.defvjp(_chain_fwd, _chain_bwd)


def conv3x3_chain(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    residual: Optional[jax.Array] = None,
    input_relu: bool = False,
    *,
    g: int,
    img_w: int,
    chain_in: bool = True,
    chain_out: bool = True,
) -> jax.Array:
    """Chained 3x3 replicate-pad conv in the group domain (``to_chain``
    format). Semantically equal to [from_chain ->] conv3x3_replicate ->
    [to_chain], but consecutive chained convs exchange tensors without any
    XLA pad/relayout passes between the pallas kernels. The ``residual``
    must be in the same domain as ``x`` (chain when chain_in, image
    otherwise)."""
    return _chain_core(x, kernel, bias, residual, input_relu, g, img_w,
                       chain_in, chain_out)


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
