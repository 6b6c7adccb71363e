"""Per-layer roofline evidence run (VERDICT r4 #1's proof deliverable).

Profiles the production int16 program on the real chip via in-program
prefix bisection at the bench batch, then scores every layer against its
MXU floor (exact-s16 semantics: 4 s8 MXU units per MAC -> ~98 useful-TOPS
ceiling on v5e) and its HBM floor (minimal bytes at peak bandwidth).
Writes ``plans/roofline_<precision>_<chip>.json`` and prints the table.

Usage: python tools/roofline.py [--batch 128] [--precision int16]
       [--compute pallas] [--chain 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--precision", default="int16")
    ap.add_argument("--compute", default="pallas")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yolotpu.models import engine_plan as ep
    from yolotpu.models import zoo
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.runtime.profiler import (profile_prefix, render_roofline,
                                          roofline_table)
    from yolotpu.weights import WeightStore

    spec = zoo.build("yolov2", width=args.width, height=args.height)
    store = WeightStore.synthetic(spec, seed=0)
    rng = np.random.default_rng(0)
    calib = [rng.random((3, spec.net.height, spec.net.width),
                        dtype=np.float32)]
    act_q = calibrate_activations(spec, store, calib)
    quantize_weights(store, act_q)
    if args.precision == "int8":
        from yolotpu.quant import (calibrate_activations_int8,
                                   quantize_weights_int8)
        quantize_weights_int8(store,
                              calibrate_activations_int8(spec, store, calib))

    t0 = time.time()
    rep = profile_prefix(spec, store, precision=args.precision,
                         compute=args.compute, batch=args.batch,
                         chain=args.chain, progress=True)
    doc = roofline_table(rep, spec, args.batch, precision=args.precision)
    doc["compute"] = args.compute
    doc["device_kind"] = ep.current_device_kind()
    doc["wall_s"] = round(time.time() - t0, 1)
    doc["date"] = time.strftime("%Y-%m-%d")
    print(render_roofline(doc), flush=True)

    slug = ep.device_kind_slug(doc["device_kind"])
    path = os.path.join(REPO, "plans",
                        f"roofline_{args.precision}_{slug}.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
