"""On-device validation + benchmark of the exact-int16 Pallas tier.

Stages:
  1. kernel-level exactness vs XLA int32-accum conv at modest shapes
  2. per-conv-layer timing of the q16 kernels on every yolov2 conv shape
  3. end-to-end int16 fps, compute='pallas' vs compute='int32'
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

LOG = lambda *a: print(*a, flush=True)  # noqa: E731
B = int(os.environ.get("Q16_BATCH", "32"))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from yolotpu.models import yolov2 as m
    from yolotpu.models import zoo
    from yolotpu.ops import convops
    from yolotpu.ops import pallas_q16 as q16
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.weights import WeightStore

    def floor_ms():
        f = jax.jit(lambda v: v + 1.0)
        _ = float(f(jnp.float32(0)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(f(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    FLOOR = floor_ms()
    LOG(json.dumps({"probe": "floor", "ms": FLOOR}))
    rng = np.random.default_rng(0)

    # ---- stage 1: on-device kernel exactness ----
    x = rng.integers(-32768, 32768, (2, 16, 16, 96)).astype(np.int16)
    w = rng.integers(-32768, 32768, (3, 3, 96, 64)).astype(np.int16)
    bias = rng.integers(-20000, 20000, 64).astype(np.int32)
    wp = q16.prep_conv_weights(w, bias)
    got = np.asarray(q16.conv3x3_q16_requant(jnp.asarray(x), wp, 9, True,
                                             interpret=False))
    want = np.asarray(jax.jit(lambda v: convops.conv_int16(
        v, jnp.asarray(w), jnp.asarray(bias), 1, 1, "leaky", 9))(
        jnp.asarray(x)))
    LOG(json.dumps({"probe": "conv3_device_exact",
                    "exact": bool(np.array_equal(got, want))}))

    xm = rng.integers(-32768, 32768, (1024, 256)).astype(np.int16)
    wm = rng.integers(-32768, 32768, (256, 130)).astype(np.int16)
    bm = rng.integers(-20000, 20000, 130).astype(np.int32)
    wpm = q16.prep_matmul_weights(wm, bm)
    gotm = np.asarray(q16.matmul_q16_requant(jnp.asarray(xm), wpm, 7, True,
                                             interpret=False))
    wantm = np.asarray(jax.jit(lambda v: convops.conv_int16(
        v[:, None, None, :], jnp.asarray(wm[None, None]), jnp.asarray(bm),
        1, 0, "leaky", 7))(jnp.asarray(xm)))[:, 0, 0, :]
    LOG(json.dumps({"probe": "mm_device_exact",
                    "exact": bool(np.array_equal(gotm, wantm))}))

    # ---- stage 2: per-layer kernel timing ----
    spec = zoo.build("yolov2")
    store = WeightStore.synthetic(spec, seed=0)
    calib = [rng.random((3, 416, 416), dtype=np.float32)]
    act_q = calibrate_activations(spec, store, calib)
    quantize_weights(store, act_q)
    params = m.params_q16(spec, store)
    plan = m.Int16Plan.build(spec, store.qtables)

    def timed(fn, x, n=5, ops=None, name="?"):
        try:
            one = jnp.ones((), x.dtype)
            xs = [x.at[(0,) * x.ndim].add(one * i) for i in range(n)]
            t0 = time.perf_counter()
            out = fn(xs[0])
            _ = float(jnp.sum(out.astype(jnp.float32)))
            comp = time.perf_counter() - t0
            for xi in xs:
                out = fn(xi)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [fn(xi) for xi in xs]
                s = jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs])
                _ = float(jnp.sum(s))
                ts.append(time.perf_counter() - t0)
            ms = max(1e-6, (float(np.median(ts)) * 1e3 - FLOOR) / n)
            rec = {"probe": name, "ms": round(ms, 3),
                   "compile_s": round(comp, 1)}
            if ops:
                rec["useful_tops"] = round(ops / (ms * 1e-3) / 1e12, 1)
            LOG(json.dumps(rec))
        except Exception as e:  # noqa: BLE001
            LOG(json.dumps({"probe": name,
                            "error": f"{type(e).__name__}: {e}"[:240]}))

    import functools
    for l in spec.conv_layers():
        pw = params[f"conv{l.idx}"]
        shift = plan.conv_shift_out[l.idx]
        leaky = l.activation == "leaky"
        ops = 2.0 * B * l.out_h * l.out_w * l.n * l.c * l.size * l.size
        name = f"L{l.idx:02d}_{pw['kind']}_{l.size}x{l.size}_{l.c}to{l.n}@{l.w}"
        if pw["kind"] == "mm":
            cin = pw["wp"]["Kp"]        # production feeds padded channels
            xi = jnp.asarray(rng.integers(
                -32768, 32768, (B, l.h, l.w, cin)).astype(np.int16))
            fn = jax.jit(lambda v, wp=pw["wp"], s=shift, lk=leaky:
                         q16.matmul_q16_requant(
                             v.reshape(-1, v.shape[-1]), wp, s, lk,
                             out_np=True))
        elif pw["kind"] == "conv3":
            cin = pw["wp"]["Cp"]
            xi = jnp.asarray(rng.integers(
                -32768, 32768, (B, l.h, l.w, cin)).astype(np.int16))
            fn = jax.jit(functools.partial(q16.conv3x3_q16_requant,
                                           wp=pw["wp"], shift_out=shift,
                                           leaky=leaky, out_np=True))
        elif pw["kind"] == "mm_patches":
            xi = jnp.asarray(rng.integers(
                -32768, 32768, (B, l.h, l.w, l.c)).astype(np.int16))

            def fn_(v, wp=pw["wp"], s=shift, lk=leaky):
                pq = m._patches3x3(v)
                return q16.matmul_q16_requant(
                    pq.reshape(-1, pq.shape[-1]), wp, s, lk, out_np=True)
            fn = jax.jit(fn_)
        else:
            continue
        timed(fn, xi, ops=ops, name=name)

    # ---- stage 3: e2e ----
    for compute, pm in (("pallas", params), ("int32", None)):
        if pm is None:
            pm = m.params_int16(spec, store)
        fwd = m.build_forward(spec, "int16", store.qtables, compute=compute,
                              outputs=("head", "boxes"))
        fn = jax.jit(lambda v, p=pm, f=fwd: f(p, v))
        xe = jnp.asarray(rng.random((B, 416, 416, 3), dtype=np.float32))
        try:
            t0 = time.perf_counter()
            out = fn(xe)
            _ = float(jnp.sum(out["obj"]))
            comp = time.perf_counter() - t0
            xs = [xe + jnp.float32(i) * 1e-6 for i in range(8)]
            sums = [jnp.sum(fn(v)["obj"]) for v in xs]
            _ = float(sum(float(s) for s in sums))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [fn(v)["obj"] for v in xs]
                _ = float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
                ts.append(time.perf_counter() - t0)
            ms = (float(np.median(ts)) * 1e3 - FLOOR) / 8
            LOG(json.dumps({"probe": f"e2e_{compute}_b{B}",
                            "ms_per_step": round(ms, 2),
                            "fps": round(B / (ms * 1e-3), 1),
                            "compile_s": round(comp, 1)}))
        except Exception as e:  # noqa: BLE001
            LOG(json.dumps({"probe": f"e2e_{compute}_b{B}",
                            "error": f"{type(e).__name__}: {e}"[:300]}))


if __name__ == "__main__":
    main()
