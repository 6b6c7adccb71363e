"""Round-2 TPU microbenchmarks: design-space probes for the int16 flagship.

Answers, on the real chip (one JSON line per probe):
  1. dot   — which operand dtype pairs does XLA dot_general accept on TPU and
             at what TOPS (s8xs8, s8xs16, s16xs16, u8 variants, bf16)?
             This decides whether exact s16 conv can ride 2 mixed dots
             (s16 = 256*hi8 + lo8) instead of 4 s8 dots.
  2. pallas— same dtype matrix for Mosaic (run in a subprocess: int16 dots
             historically crash the Mosaic backend).
  3. conv  — XLA conv_general_dilated dtype matrix on the YOLOv2 early-layer
             shapes (the int16 bottleneck: 1-15 TOPS in round 1).
  4. dec   — exactness + speed of the hi/lo int8 decomposition of an s16
             conv at the XLA level.
  5. profile — fresh per-layer int16 table at b64 (where do the 30 ms of
             late-half time actually go).

Methodology per yolotpu memory: the axon tunnel costs ~39 ms per synchronous
readback and block_until_ready returns early, so every timing dispatches a
chain of ops on distinct inputs and syncs ONCE via a scalar readback;
the measured RPC floor is subtracted.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

LOG = lambda *a: print(*a, flush=True)  # noqa: E731


def setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _floor_ms(jax, jnp) -> float:
    f = jax.jit(lambda v: v + 1.0)
    v = jnp.float32(0.0)
    _ = float(f(v))
    ts = []
    for _i in range(5):
        t0 = time.perf_counter()
        _ = float(f(v))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def time_chain(jax, jnp, fn, xs, floor_ms, reps=3):
    """Dispatch fn over all xs, sync once; return ms per call."""
    out = None
    for xi in xs:
        out = fn(xi)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(xi) for xi in xs]
        s = jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs])
        _ = float(jnp.sum(s))
        ts.append(time.perf_counter() - t0)
    return max(1e-6, (float(np.median(ts)) * 1e3 - floor_ms) / len(xs))


def rand_arr(rng, shape, dt):
    info_by = {"int8": (-127, 127), "int16": (-32767, 32767),
               "uint8": (0, 255)}
    if dt in info_by:
        lo, hi = info_by[dt]
        return rng.integers(lo, hi, size=shape).astype(dt)
    return rng.standard_normal(shape).astype(np.float32)


def exp_dot():
    jax = setup_jax()
    import jax.numpy as jnp
    floor = _floor_ms(jax, jnp)
    LOG(json.dumps({"probe": "floor", "ms": floor}))
    rng = np.random.default_rng(0)
    pairs = [("int8", "int8"), ("int8", "int16"), ("int16", "int8"),
             ("int16", "int16"), ("uint8", "int8"), ("int8", "uint8"),
             ("uint8", "uint8"), ("bfloat16", "bfloat16"),
             ("int4", "int8"), ("int8", "int4")]
    shapes = [(32768, 1152, 256), (32768, 288, 128), (8192, 4096, 4096)]
    for (M, K, N) in shapes:
        for (adt, bdt) in pairs:
            key = f"dot_{adt}x{bdt}_{M}x{K}x{N}"
            try:
                if adt == "int4":
                    a = jnp.asarray(rng.integers(-7, 7, (M, K)),
                                    dtype=jnp.int4)
                else:
                    a = jnp.asarray(rand_arr(rng, (M, K), adt))
                if bdt == "int4":
                    b = jnp.asarray(rng.integers(-7, 7, (K, N)),
                                    dtype=jnp.int4)
                else:
                    b = jnp.asarray(rand_arr(rng, (K, N), bdt))
                pref = (jnp.float32 if adt == "bfloat16" else jnp.int32)

                f = jax.jit(lambda x, w=b: jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=pref))
                one = jnp.ones((), a.dtype)
                xs = [a.at[0, 0].add(one * i) for i in range(8)]
                ms = time_chain(jax, jnp, f, xs, floor)
                tops = 2.0 * M * K * N / (ms * 1e-3) / 1e12
                LOG(json.dumps({"probe": key, "ms": round(ms, 3),
                                "tops": round(tops, 1)}))
            except Exception as e:  # noqa: BLE001
                LOG(json.dumps({"probe": key,
                                "error": f"{type(e).__name__}: {e}"[:300]}))


def exp_pallas():
    """Mosaic dtype matrix — tiny then big; isolate via subprocess caller."""
    jax = setup_jax()
    import functools

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    floor = _floor_ms(jax, jnp)
    rng = np.random.default_rng(0)

    def make_mm(adt, bdt, M, K, N, tm, tk, tn):
        def kern(x_ref, w_ref, o_ref, acc):
            @pl.when(pl.program_id(2) == 0)
            def _z():
                acc[:] = jnp.zeros_like(acc)
            acc[:] += jnp.dot(x_ref[:], w_ref[:],
                              preferred_element_type=jnp.int32)

            @pl.when(pl.program_id(2) == K // tk - 1)
            def _w():
                o_ref[:] = acc[:]

        return pl.pallas_call(
            kern, grid=(M // tm, N // tn, K // tk),
            in_specs=[pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)])

    only = sys.argv[2] if len(sys.argv) > 2 else None
    pairs = [("int8", "int16"), ("int16", "int8"), ("int16", "int16"),
             ("uint8", "int8"), ("int8", "int8")]
    for (adt, bdt) in pairs:
        if only and f"{adt}x{bdt}" != only:
            continue
        # correctness first at small shape
        M, K, N = 256, 256, 256
        key = f"pallas_{adt}x{bdt}"
        try:
            a = rand_arr(rng, (M, K), adt)
            b = rand_arr(rng, (K, N), bdt)
            f = jax.jit(functools.partial(make_mm(adt, bdt, M, K, N,
                                                  256, 256, 256)))
            got = np.asarray(f(jnp.asarray(a), jnp.asarray(b)))
            want = a.astype(np.int64) @ b.astype(np.int64)
            ok = bool(np.array_equal(got.astype(np.int64), want))
            # speed at 8192^2 x 2048
            M2, K2, N2 = 8192, 2048, 2048
            mm = make_mm(adt, bdt, M2, K2, N2, 512, 512, 512)
            a2 = jnp.asarray(rand_arr(rng, (M2, K2), adt))
            b2 = jnp.asarray(rand_arr(rng, (K2, N2), bdt))
            g = jax.jit(lambda x, w=b2: mm(x, w))
            one = jnp.ones((), a2.dtype)
            xs = [a2.at[0, 0].add(one * i) for i in range(8)]
            ms = time_chain(jax, jnp, g, xs, floor)
            tops = 2.0 * M2 * K2 * N2 / (ms * 1e-3) / 1e12
            LOG(json.dumps({"probe": key, "exact": ok,
                            "ms": round(ms, 3), "tops": round(tops, 1)}))
        except Exception as e:  # noqa: BLE001
            LOG(json.dumps({"probe": key,
                            "error": f"{type(e).__name__}: {e}"[:300]}))


def exp_conv():
    jax = setup_jax()
    import jax.numpy as jnp
    from jax import lax
    floor = _floor_ms(jax, jnp)
    rng = np.random.default_rng(0)
    B = int(os.environ.get("MICRO_BATCH", "32"))
    shapes = [(B, 208, 208, 32, 64), (B, 104, 104, 64, 128),
              (B, 52, 52, 128, 256), (B, 416, 416, 3, 32)]
    pairs = [("int8", "int8"), ("uint8", "int8"), ("int8", "int16"),
             ("int16", "int16")]
    for (b, h, w, c, f_) in shapes:
        for (adt, bdt) in pairs:
            key = f"conv_{adt}x{bdt}_{h}x{c}to{f_}"
            try:
                x = jnp.asarray(rand_arr(rng, (b, h, w, c), adt))
                k = jnp.asarray(rand_arr(rng, (3, 3, c, f_), bdt))
                fn = jax.jit(lambda v, kk=k: lax.conv_general_dilated(
                    v, kk, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32))
                one = jnp.ones((), x.dtype)
                xs = [x.at[0, 0, 0, 0].add(one * i) for i in range(6)]
                t0 = time.perf_counter()
                _ = fn(xs[0])
                LOG(json.dumps({"probe": key + "_compile",
                                "s": round(time.perf_counter() - t0, 1)}))
                ms = time_chain(jax, jnp, fn, xs, floor)
                tops = 2.0 * b * h * w * c * f_ * 9 / (ms * 1e-3) / 1e12
                LOG(json.dumps({"probe": key, "ms": round(ms, 3),
                                "tops": round(tops, 1)}))
            except Exception as e:  # noqa: BLE001
                LOG(json.dumps({"probe": key,
                                "error": f"{type(e).__name__}: {e}"[:300]}))


def exp_dec():
    """hi/lo decomposition of exact s16 conv via int8 convs, XLA level."""
    jax = setup_jax()
    import jax.numpy as jnp
    from jax import lax
    floor = _floor_ms(jax, jnp)
    rng = np.random.default_rng(0)

    def conv(x, k, pref=None):
        return lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pref or jnp.int32)

    def dec4(x16, k16):
        # x = 256*xh + xl (xl in [0,255]); same for w. All in s8/u8.
        xh = (x16 >> 8).astype(jnp.int8)
        xl = (x16 & 0xFF).astype(jnp.uint8)
        kh = (k16 >> 8).astype(jnp.int8)
        kl = (k16 & 0xFF).astype(jnp.uint8)
        hh = conv(xh, kh)
        hl = conv(xh, kl.astype(jnp.int8))  # placeholder; fixed below
        lh = conv(xl.astype(jnp.int8), kh)
        ll = conv(xl.astype(jnp.int8), kl.astype(jnp.int8))
        return hh, hl, lh, ll

    # correctness variant with u8 if supported, else offset math
    def dec4_u8(x16, k16):
        xh = (x16 >> 8).astype(jnp.int8)
        xl = (x16 & 0xFF).astype(jnp.uint8)
        kh = (k16 >> 8).astype(jnp.int8)
        kl = (k16 & 0xFF).astype(jnp.uint8)
        acc = (conv(xh, kh) << 16)
        acc += (conv(xh, kl) + conv(xl, kh)) << 8
        acc += conv(xl, kl)
        return acc

    B = 8
    x = jnp.asarray(rng.integers(-32767, 32767, (B, 52, 52, 64)), jnp.int16)
    k = jnp.asarray(rng.integers(-32767, 32767, (3, 3, 64, 64)), jnp.int16)
    try:
        got = np.asarray(jax.jit(dec4_u8)(x, k))
        want = np.asarray(jax.jit(lambda a, b: conv(a, b))(x, k))
        LOG(json.dumps({"probe": "dec4_u8_exact",
                        "exact": bool(np.array_equal(got, want))}))
    except Exception as e:  # noqa: BLE001
        LOG(json.dumps({"probe": "dec4_u8_exact",
                        "error": f"{type(e).__name__}: {e}"[:300]}))
    # speed on L2 shape
    B = int(os.environ.get("MICRO_BATCH", "32"))
    x = jnp.asarray(rng.integers(-32000, 32000, (B, 208, 208, 32)), jnp.int16)
    k = jnp.asarray(rng.integers(-32000, 32000, (3, 3, 32, 64)), jnp.int16)
    try:
        fn = jax.jit(dec4_u8)
        one = jnp.ones((), x.dtype)
        xs = [x.at[0, 0, 0, 0].add(one * i) for i in range(6)]
        ms = time_chain(jax, jnp, lambda v: fn(v, k), xs, floor)
        tops = 2.0 * B * 208 * 208 * 32 * 64 * 9 / (ms * 1e-3) / 1e12
        LOG(json.dumps({"probe": "dec4_u8_L2", "ms": round(ms, 3),
                        "eff_tops": round(tops, 1)}))
    except Exception as e:  # noqa: BLE001
        LOG(json.dumps({"probe": "dec4_u8_L2",
                        "error": f"{type(e).__name__}: {e}"[:300]}))
    _ = dec4  # unused alt kept for documentation


def exp_profile():
    setup_jax()
    sys.path.insert(0, "/root/repo")
    from yolotpu.models import zoo
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.runtime.profiler import profile_layers
    from yolotpu.weights import WeightStore
    spec = zoo.build("yolov2")
    store = WeightStore.synthetic(spec, seed=0)
    rng = np.random.default_rng(0)
    calib = [rng.random((3, 416, 416), dtype=np.float32)]
    act_q = calibrate_activations(spec, store, calib)
    quantize_weights(store, act_q)
    rep = profile_layers(spec, store, "int16", batch=64, progress=True)
    LOG(rep.render())


EXPS = {"dot": exp_dot, "pallas": exp_pallas, "conv": exp_conv,
        "dec": exp_dec, "profile": exp_profile}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp", choices=[*EXPS, "all"])
    ap.add_argument("filter", nargs="?", default=None)
    args, _ = ap.parse_known_args()
    if args.exp == "all":
        LOG("=== dot ===")
        EXPS["dot"]()
        # pallas runs in a subprocess (Mosaic s16 dots have crashed before)
        LOG("=== pallas (subprocess) ===")
        for pair in ("int8xint16", "int16xint8", "uint8xint8",
                     "int8xint8", "int16xint16"):
            r = subprocess.run(
                [sys.executable, __file__, "pallas", pair],
                capture_output=True, text=True, timeout=1800)
            print(r.stdout, flush=True)
            if r.returncode != 0:
                LOG(json.dumps({"probe": f"pallas_{pair}",
                                "rc": r.returncode,
                                "stderr": r.stderr[-400:]}))
        for name in ("profile", "dec", "conv"):
            LOG(f"=== {name} ===")
            EXPS[name]()
        return
    EXPS[args.exp]()


if __name__ == "__main__":
    main()
