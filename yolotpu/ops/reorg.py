"""Darknet reorg as pure reshape/transpose (XLA-fusable, no gather).

Semantics: the reference applies ``reorg_cpu`` to the flat CHW buffer
(``hls/models/yolov2/yolo2_model.cpp:112-129,358-377``); that permutation is
exactly the flat reinterpretation implemented here (proved element-for-element
by tests/test_ops_numpy.py and tests/test_jax_forward.py against the literal
index formula). See yolotpu.golden.reorg_darknet for the numpy twin.
"""

from __future__ import annotations

import jax.numpy as jnp


def reorg(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """x (B,H,W,C) -> (B, H//s, W//s, C*s*s) with darknet's value placement."""
    b, h, w, c = x.shape
    s = stride
    oc = c // (s * s)
    chw = x.transpose(0, 3, 1, 2)                      # (B,C,H,W)
    xv = chw.reshape(b, oc, h, s, w, s)                # flat reinterpretation
    out = xv.transpose(0, 3, 5, 1, 2, 4)               # (B,s,s,oc,h,w)
    out = out.reshape(b, c * s * s, h // s, w // s)    # CHW of the result
    return out.transpose(0, 2, 3, 1)                   # back to NHWC
