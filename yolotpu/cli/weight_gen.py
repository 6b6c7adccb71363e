"""``yolov2_weight_gen``-equivalent CLI: weight (de)reorganization.

Flag contract follows the reference tool
(``src/models/yolov2/yolov2_weight_gen.cpp:137-276``): --cfg --weights
--out --precision fp32|int16, with the in-place-overwrite guard (``:156-167``).
Adds --unreorg to invert the transform (reference artifacts -> darknet
order) and --tm/--tn for non-default tile geometry (the reference bakes
these into params.hpp via scripts/hw_params_gen.py).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv: list[str] | None = None) -> int:
    from ..graph import NetworkSpec
    from ..models import zoo
    from ..weights import (DEFAULT_TM, DEFAULT_TN, weight_reorg,
                           weight_unreorg)

    ap = argparse.ArgumentParser(prog="yolov2_weight_gen", description=__doc__)
    ap.add_argument("--cfg", default=None)
    ap.add_argument("--model", default="yolov2")
    ap.add_argument("--weights", default=None, help="input weights .bin")
    ap.add_argument("--out", default=None, help="output .bin")
    ap.add_argument("--precision", default="fp32",
                    choices=["fp32", "f32", "float", "int16", "i16", "fixed"])
    ap.add_argument("--unreorg", action="store_true",
                    help="invert: tile-stream order -> darknet order")
    ap.add_argument("--tm", type=int, default=DEFAULT_TM)
    ap.add_argument("--tn", type=int, default=DEFAULT_TN)
    args = ap.parse_args(argv)

    is_int16 = args.precision in ("int16", "i16", "fixed")
    dtype = np.int16 if is_int16 else np.float32
    win = args.weights or (
        "weights/weight_int16.bin" if is_int16 else "weights/weights.bin")
    wout = args.out or (
        "weights/weights_reorg_int16.bin" if is_int16
        else "weights/weights_reorg.bin")
    if os.path.abspath(win) == os.path.abspath(wout):
        print("error: refusing to overwrite input file in place", file=sys.stderr)
        return 1

    spec = NetworkSpec.from_cfg(args.cfg) if args.cfg else zoo.build(args.model)
    flat = np.fromfile(win, dtype)
    out_parts = []
    pos = 0
    for l in spec.conv_layers():
        nw = l.nweights
        if pos + nw > flat.size:
            print(f"error: weights file truncated at conv layer {l.idx}",
                  file=sys.stderr)
            return 1
        wl = flat[pos:pos + nw]
        if args.unreorg:
            block = weight_unreorg(wl, l.n, l.c, l.size, args.tm, args.tn).reshape(-1)
        else:
            block = weight_reorg(wl.reshape(l.n, l.c, l.size, l.size),
                                 args.tm, args.tn)
        out_parts.append(block)
        pos += nw
        if is_int16 and (nw & 1):       # per-layer odd-count padding
            out_parts.append(np.zeros(1, dtype))
            pos += 1
    os.makedirs(os.path.dirname(os.path.abspath(wout)), exist_ok=True)
    np.concatenate(out_parts).astype(dtype).tofile(wout)
    print(f"Reorganized weights written to {wout}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
