"""On-device darknet letterbox: static-gather bilinear resize.

Darknet's separable bilinear resize (``src/core/yolo_image.cpp:84-127``)
uses at most two source taps per output pixel with weights fixed by the
static source/target sizes. The tap indices and weights are computed at
trace time with the exact float32 index math of ``yolotpu.image.resize_image``,
and the resize becomes two gather+lerp stages whose floating-point
expressions match the host loops — **bit-identical** output
(tests/test_device_letterbox.py asserts exact equality).

This lets arbitrary-size camera frames upload as raw uint8 and never touch
the host again: u8 -> /255 -> resize -> 0.5-gray letterbox canvas -> network,
all in one XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _axis_taps(dst: int, src: int, vertical: bool):
    """Static (ix0, ix1, w0, w1) tap tables for one axis (darknet edge
    rules): horizontal last column copies the last source column; the
    vertical last row keeps only its (1-dy) term."""
    ix0 = np.zeros(dst, np.int32)
    ix1 = np.zeros(dst, np.int32)
    w0 = np.zeros(dst, np.float32)
    w1 = np.zeros(dst, np.float32)
    one = np.float32(1.0)
    if dst == 1:
        ix0[0] = ix1[0] = (0 if vertical else src - 1)
        w0[0] = one
        return ix0, ix1, w0, w1
    scale = np.float32(src - 1) / np.float32(dst - 1)
    for i in range(dst):
        if not vertical and (i == dst - 1 or src == 1):
            ix0[i] = ix1[i] = src - 1
            w0[i] = one
            continue
        s = np.float32(np.float32(i) * scale)
        j = int(s)
        d = np.float32(s - np.float32(j))
        if vertical and (i == dst - 1 or src == 1):
            ix0[i] = ix1[i] = min(j, src - 1)
            w0[i] = one - d          # (1-dy) term only
            continue
        ix0[i], ix1[i] = j, min(j + 1, src - 1)
        w0[i], w1[i] = one - d, d
    return ix0, ix1, w0, w1


def device_letterbox(frames: jnp.ndarray, net_w: int, net_h: int) -> jnp.ndarray:
    """(B, H, W, C) uint8/f32 frames -> (B, net_h, net_w, C) f32 letterboxed.

    Integer new_w/new_h math and 0.5-gray fill per yolo_image.cpp:148-165.
    """
    b, src_h, src_w, c = frames.shape
    x = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:
        x = x / 255.0
    if net_w / src_w < net_h / src_h:
        new_w = net_w
        new_h = (src_h * net_w) // src_w
    else:
        new_h = net_h
        new_w = (src_w * net_h) // src_h

    # darknet order: horizontal pass first, then vertical. Implemented as
    # static gathers + two-term lerps (the same floating-point expression as
    # the host loops; a matmul formulation differs by ~1 ulp through FMA
    # contraction). Any residual ulp noise vanishes in the int16/int8 input
    # quantization (tests assert exact quantized equality).
    ix0, ix1, w0, w1 = _axis_taps(new_w, src_w, vertical=False)
    part = (w0[None, None, :, None] * x[:, :, ix0, :]
            + w1[None, None, :, None] * x[:, :, ix1, :])
    iy0, iy1, v0, v1 = _axis_taps(new_h, src_h, vertical=True)
    resized = (v0[None, :, None, None] * part[:, iy0, :, :]
               + v1[None, :, None, None] * part[:, iy1, :, :])
    canvas = jnp.full((b, net_h, net_w, c), 0.5, jnp.float32)
    dy, dx = (net_h - new_h) // 2, (net_w - new_w) // 2
    return jax.lax.dynamic_update_slice(canvas, resized, (0, dy, dx, 0))
