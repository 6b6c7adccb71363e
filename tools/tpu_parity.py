"""On-DEVICE bit-equality check: pallas-tier head vs int32-tier head.

The interpret-mode kernel tests prove the pallas tier's semantics on CPU;
this tool proves the Mosaic-COMPILED kernels on the real chip compute the
same bits (guards against miscompiles that would show up as "fast but
wrong" bench numbers). Prints one JSON line.

    python tools/tpu_parity.py [batch]

Env knobs (YOLO2_Q16_*) select the engine mix under test, same as the
production engine.
"""

from __future__ import annotations

import json
import os
import sys

# tools/ scripts run as `python tools/x.py` (sys.path[0] = tools/);
# make the repo root importable regardless of cwd/PYTHONPATH
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys

import numpy as np


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from yolotpu.models import yolov2 as m
    from yolotpu.models import zoo
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.weights import WeightStore

    rng = np.random.default_rng(7)
    spec = zoo.build("yolov2")
    store = WeightStore.synthetic(spec, seed=0)
    calib = [rng.random((3, 416, 416), dtype=np.float32)]
    act_q = calibrate_activations(spec, store, calib)
    quantize_weights(store, act_q)

    x = jnp.asarray(rng.random((B, 416, 416, 3), dtype=np.float32))

    heads = {}
    for compute in ("int32", "pallas"):
        params = (m.params_q16(spec, store) if compute == "pallas"
                  else m.params_int16(spec, store))
        fwd = m.build_forward(spec, "int16", store.qtables, compute=compute,
                              outputs=("head",))
        heads[compute] = np.asarray(
            jax.jit(lambda v, p=params, f=fwd: f(p, v)["head"])(x))

    eq = bool(np.array_equal(heads["int32"], heads["pallas"]))
    diff = (0 if eq else
            int(np.sum(heads["int32"] != heads["pallas"])))
    print(json.dumps({"probe": "tpu_parity", "B": B, "bit_equal": eq,
                      "mismatched": diff,
                      "total": int(heads["int32"].size)}), flush=True)
    return 0 if eq else 1


if __name__ == "__main__":
    sys.exit(main())
