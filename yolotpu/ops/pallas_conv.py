"""Pallas TPU kernel: fused int8 3x3 stride-1 convolution.

XLA's integer convolutions collapse at large-spatial/small-channel shapes
(the YOLOv2 early layers: 8-15 TOPS int16, ~40 int8, vs 107-156 at
channel-heavy shapes). This kernel owns the layout instead: each program
DMAs a (th+2, W+2, C) halo row-band from HBM into VMEM (overlapping bands —
expressed with an explicit async copy, since blocked BlockSpecs cannot
overlap), forms the 9-tap contraction on-chip with one MXU dot per tap,
and applies the requant/bias/leaky epilogue before writing int8 back —
one HBM read and one HBM write per activation.

Used by the w8a8 tier for the early stage (Mosaic cannot compile int16
dots yet, so the exact-int16 tier stays on XLA convs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_kernel(x_hbm, w_ref, b_ref, o_ref, xbuf, sem, *,
                    th: int, W: int, C: int, F: int,
                    shift_out: int, leaky: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)
    # halo band: rows [i*th, i*th + th + 2) of the padded input. The W
    # extent is 8-aligned (Mosaic requires sliced extents on tiled dims to
    # match the (8,128) tiling; the row dim is untiled and may be ragged).
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, th + 2), :, :], xbuf, sem)
    cp.start()
    cp.wait()

    acc = jnp.zeros((th * W, F), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            tap = xbuf[dy:dy + th, dx:dx + W, :].reshape(th * W, C)
            acc += jnp.dot(tap, w_ref[dy * 3 + dx],
                           preferred_element_type=jnp.int32)
    if shift_out > 0:
        mag = min(shift_out, 30)
        acc = (acc + (1 << (mag - 1))) >> mag
    elif shift_out < 0:
        acc = acc << min(-shift_out, 30)
    v = jnp.clip(acc + b_ref[:], -128, 127)
    if leaky:
        v = jnp.clip(jnp.where(v < 0, -((-v) // 10), v), -128, 127)
    o_ref[0] = v.reshape(th, W, F).astype(jnp.int8)


def _conv3x3_im2col_kernel(x_hbm, w_ref, b_ref, o_ref, xbuf, abuf, sem, *,
                           th: int, W: int, C: int, F: int,
                           shift_out: int, leaky: bool):
    """Variant for small C: assemble the (th*W, 9C) im2col matrix in VMEM so
    the single dot contracts over 9C >= 128 lanes (Mosaic rejects/underuses
    dots whose K is a fraction of the lane width)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, th + 2), :, :], xbuf, sem)
    cp.start()
    cp.wait()
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            abuf[:, tap * C:(tap + 1) * C] = \
                xbuf[dy:dy + th, dx:dx + W, :].reshape(th * W, C)
    acc = jnp.dot(abuf[:], w_ref[:], preferred_element_type=jnp.int32)
    if shift_out > 0:
        mag = min(shift_out, 30)
        acc = (acc + (1 << (mag - 1))) >> mag
    elif shift_out < 0:
        acc = acc << min(-shift_out, 30)
    v = jnp.clip(acc + b_ref[:], -128, 127)
    if leaky:
        v = jnp.clip(jnp.where(v < 0, -((-v) // 10), v), -128, 127)
    o_ref[0] = v.reshape(th, W, F).astype(jnp.int8)


def conv3x3_int8_im2col(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                        shift_out: int, leaky: bool = True, th: int = 16,
                        interpret: bool = False) -> jnp.ndarray:
    """im2col-in-VMEM variant (for small channel counts)."""
    B, H, W, C = x.shape
    F = w.shape[3]
    th = min(th, H)
    pad_h = (-H) % th
    pad_w = (-(W + 2)) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, 1 + pad_w), (0, 0)))
    Hp = H + pad_h
    W2a = W + 2 + pad_w
    # taps laid out kk-major in K so w.reshape matches assembly order
    wt = w.transpose(0, 1, 2, 3).reshape(9 * C, F)

    out = pl.pallas_call(
        functools.partial(_conv3x3_im2col_kernel, th=th, W=W, C=C, F=F,
                          shift_out=shift_out, leaky=leaky),
        grid=(B, Hp // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * C, F), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, F), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, F), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W2a, C), jnp.int8),
            pltpu.VMEM((th * W, 9 * C), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wt, bias)
    return out[:, :H]


def conv3x3_int8(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                 shift_out: int, leaky: bool = True, th: int = 16,
                 interpret: bool = False) -> jnp.ndarray:
    """x (B,H,W,C) int8, w (3,3,C,F) int8, bias (F,) int32 (pre-shifted).
    3x3 stride-1 SAME convolution with fused requant; returns int8."""
    B, H, W, C = x.shape
    F = w.shape[3]
    th = min(th, H)
    pad_h = (-H) % th
    pad_w = (-(W + 2)) % 8          # aligned halo width for the DMA
    xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, 1 + pad_w), (0, 0)))
    Hp = H + pad_h
    W2a = W + 2 + pad_w
    wt = w.reshape(9, C, F)

    out = pl.pallas_call(
        functools.partial(_conv3x3_kernel, th=th, W=W, C=C, F=F,
                          shift_out=shift_out, leaky=leaky),
        grid=(B, Hp // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec((9, C, F), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, F), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, F), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W2a, C), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wt, bias)
    return out[:, :H]
