"""Headline benchmark: YOLOv2 416x416 INT16 end-to-end throughput on TPU.

Prints ONE JSON line:
  {"metric": "yolov2_416_int16_fps", "value": N, "unit": "frames/sec",
   "vs_baseline": N / 0.1}

Baseline: the reference FPGA stack's known-good end-to-end throughput is
~0.1 FPS on the KV260 (reference HLS_OPTIMIZATION_TASKLIST.md:3-4; see
BASELINE.md). Measurement mirrors its method — mean over repeated timed
inferences of the full network (input quantization -> 32 layers -> region
head) — with the TPU-appropriate adaptation of batched steps and forced
device->host readback per step (the axon tunnel's block_until_ready returns
early, so a scalar readback is the sync point).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 0.1
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
# 30 steps/sync: the one mandatory sync readback costs ~39 ms over the
# axon dev tunnel (an RPC artifact, not device time) — at 10 steps it
# inflated every step by ~4 ms; at 30 it is ~1.3 ms (<3%) of a step
STEPS = int(os.environ.get("BENCH_STEPS", "30"))
# int16 conv engine: "pallas" = fused exact-int16 s8-decomposed kernels
# (the fast path on real TPU); "int32" = XLA s16 convs (same bits)
COMPUTE = os.environ.get("BENCH_COMPUTE", "pallas")
MODEL = os.environ.get("BENCH_MODEL", "yolov2")
# the official headline is the int16 tier (the reference's precision);
# BENCH_PRECISION=w8a16 measures the serving tier (per-channel s8 weights
# x s16 activations — meets the 0.1-mAP criterion, see STATUS.md) through
# the identical bench construction
PRECISION = os.environ.get("BENCH_PRECISION", "int16")


def main() -> int:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from yolotpu.models import yolov2 as m
    from yolotpu.models import zoo
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.weights import WeightStore

    # BENCH_WIDTH/HEIGHT: smoke-test the bench path at a reduced size
    # (e.g. on the CPU interpreter); the official metric is the default 416
    bw = os.environ.get("BENCH_WIDTH")
    bh = os.environ.get("BENCH_HEIGHT")
    spec = zoo.build(MODEL, width=int(bw) if bw else None,
                     height=int(bh) if bh else None)
    store = WeightStore.synthetic(spec, seed=0)
    rng = np.random.default_rng(0)
    calib = [rng.random((3, spec.net.height, spec.net.width),
                        dtype=np.float32)]
    act_q = calibrate_activations(spec, store, calib)
    quantize_weights(store, act_q)

    if PRECISION == "fp32":
        # the reference's own `--precision fp32` tier (yolov2_main.cpp
        # backend switch): on TPU XLA lowers f32 convs to MXU passes at
        # the backend's default precision (bf16 inputs, f32 accum)
        params = m.params_fp32(spec, store)
        fwd = m.build_forward(spec, "fp32", outputs=("head", "boxes"))
    elif PRECISION == "w8a16":
        from yolotpu.quant import quantize_weights_w8a16
        quantize_weights_w8a16(store, store.qtables.act_q)
        params = m.params_w8a16(spec, store,
                                pallas=(COMPUTE == "pallas"))
        fwd = m.build_forward(spec, "w8a16", store.qtables_w8,
                              compute=COMPUTE, outputs=("head", "boxes"))
    else:
        params = (m.params_q16(spec, store) if COMPUTE == "pallas"
                  else m.params_int16(spec, store))
        fwd = m.build_forward(spec, "int16", store.qtables, compute=COMPUTE,
                              outputs=("head", "boxes"))
    # Honest production shape: uint8 frames (what a camera/decoder hands
    # over — 4x cheaper on the host link; on-device /255 is bit-identical
    # to the host loader's float division, yolo2_image_loader.c:34-80).
    # No donation: XLA cannot alias a uint8 input into any output of this
    # program ("donated buffers were not usable" in BENCH_r01/r03 tails),
    # so donating was an inert claim — dropped rather than carried.
    fn = jax.jit(lambda x: fwd(params, x))

    base = rng.integers(0, 256, (BATCH, spec.net.height, spec.net.width, 3)
                        ).astype(np.uint8)

    def make_inputs():
        # distinct per step so no caching layer can elide a dispatch;
        # rebuilt per rep because donation consumes each buffer
        b = jnp.asarray(base)
        xs = [(b + jnp.uint8(i)) for i in range(STEPS)]
        _ = float(jnp.sum(xs[-1].astype(jnp.float32)))   # materialize
        return xs

    _ = float(jnp.sum(fn(jnp.asarray(base))["obj"]))   # warmup + compile

    # Pipelined throughput: dispatch STEPS independent steps asynchronously
    # and sync once at the end. A synchronous readback costs ~39 ms over the
    # axon dev tunnel (an RPC artifact, not device time), so per-step syncs
    # would measure the network.
    xs = make_inputs()
    sums = [jnp.sum(fn(xi)["obj"]) for xi in xs]
    _ = float(sum(float(s) for s in sums))     # warm all buffers/paths
    times = []
    for _rep in range(3):
        xs = make_inputs()                     # outside the timed region
        t0 = time.perf_counter()
        outs = [fn(xi)["obj"] for xi in xs]
        total = float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) / STEPS
    fps = BATCH / med

    # diagnostics to stderr (the driver records the tail): per-rep wall,
    # derived ms/step, and the engine-plan env so a future number is
    # attributable to its exact configuration
    plan_env = {k: v for k, v in os.environ.items()
                if k.startswith(("YOLO2_Q16", "YOLO2_INT8", "BENCH_"))}
    print(f"# bench reps_s={[round(t, 3) for t in times]} "
          f"ms_per_step={med * 1e3:.2f} batch={BATCH} steps={STEPS} "
          f"compute={COMPUTE} env={plan_env}", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": f"{MODEL}_{spec.net.width}_{PRECISION}_fps",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
