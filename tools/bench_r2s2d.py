"""Probe: int16 conv throughput at the pad-then-space-to-depth shapes.

The round-2 early-stage design rewrites each 3x3/s1 conv (+ optional fused
2x2/s2 maxpool) as ONE dense 2x2 conv over the s2d(2) tensor of the
1-padded input: 4C in, 4N out, (H/2+1)^2 spatial, VALID. 16/9 more MACs but
channel-heavy shapes. This measures whether XLA's s16 convs deliver the
~110 TOPS there that they deliver on the native late-half shapes, plus the
s2d relayout cost and L0 variants (C'=12 vs C'=48 vs bf16 decomposition).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

LOG = lambda *a: print(*a, flush=True)  # noqa: E731


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    def floor_ms():
        f = jax.jit(lambda v: v + 1.0)
        v = jnp.float32(0.0)
        _ = float(f(v))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(f(v))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    FLOOR = floor_ms()
    LOG(json.dumps({"probe": "floor", "ms": FLOOR}))
    rng = np.random.default_rng(0)
    B = int(os.environ.get("MICRO_BATCH", "16"))

    def timed(fn, x, n=4, useful_ops=None, name="?"):
        try:
            one = jnp.ones((), x.dtype)
            xs = [x.at[(0,) * x.ndim].add(one * i) for i in range(n)]
            t0 = time.perf_counter()
            out = fn(xs[0])
            _ = float(jnp.sum(out.astype(jnp.float32)))
            LOG(json.dumps({"probe": name + "_compile",
                            "s": round(time.perf_counter() - t0, 1)}))
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
            rec = {"probe": name, "ms": round(ms, 3)}
            if useful_ops:
                rec["useful_tops"] = round(useful_ops / (ms * 1e-3) / 1e12, 1)
            LOG(json.dumps(rec))
        except Exception as e:  # noqa: BLE001
            LOG(json.dumps({"probe": name,
                            "error": f"{type(e).__name__}: {e}"[:300]}))

    # s2d-shaped 2x2 convs (s16). Shapes: (B, H2+1, H2+1, 4C) -> 4N
    # useful ops counted as the ORIGINAL conv's 2*9*H^2*C*N*B.
    cases = [
        # L2': 208^2 x32 -> 64
        (209, 128, 256, 416, 32, 64, "s2d_L2"),
        # L4': 104^2 x64 -> 128
        (105, 256, 512, 208, 64, 128, "s2d_L4"),
        # L8': 52^2 x128 -> 256
        (53, 512, 1024, 104, 128, 256, "s2d_L8"),
        # L0': 416^2 x3 -> 32 (C'=12)
        (209, 12, 128, 416, 3, 32, "s2d_L0"),
        # L12': 26^2 x256 -> 512 (is s2d worth it even in the late half?)
        (27, 1024, 2048, 52, 256, 512, "s2d_L12"),
    ]
    for (hp, c4, n4, rawh, c, n, name) in cases:
        import gc
        gc.collect()
        x = jnp.asarray(rng.integers(-32000, 32000, (B, hp, hp, c4)),
                        jnp.int16)
        k = jnp.asarray(rng.integers(-32000, 32000, (2, 2, c4, n4)),
                        jnp.int16)
        fn = jax.jit(lambda v, kk=k: lax.conv_general_dilated(
            v, kk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32))
        useful = 2.0 * B * rawh * rawh * 9 * c * n
        timed(fn, x, useful_ops=useful, name=name)

    # native late-half reference point: 13^2 conv 1024->1024 3x3 s16
    x = jnp.asarray(rng.integers(-32000, 32000, (B, 13, 13, 1024)), jnp.int16)
    k = jnp.asarray(rng.integers(-32000, 32000, (3, 3, 1024, 1024)), jnp.int16)
    fn = jax.jit(lambda v, kk=k: lax.conv_general_dilated(
        v, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32))
    timed(fn, x, useful_ops=2.0 * B * 13 * 13 * 9 * 1024 * 1024,
          name="native_L18")

    # s2d relayout cost: pad+reshape+transpose int16 416^2x32 -> 209^2x128
    def s2d(v):
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        bq, hq, wq, cq = vp.shape
        vv = vp.reshape(bq, hq // 2, 2, wq // 2, 2, cq)
        return vv.transpose(0, 1, 3, 2, 4, 5).reshape(
            bq, hq // 2, wq // 2, 4 * cq)
    x = jnp.asarray(rng.integers(-32000, 32000, (B, 416, 416, 32)), jnp.int16)
    timed(jax.jit(s2d), x, name="s2d_relayout_416x32")

    # phase-max pool: (B,208,208,4N) -> max over 4 phase groups
    x = jnp.asarray(rng.integers(-32000, 32000, (B, 208, 208, 128)),
                    jnp.int16)
    def pmax(v):
        bq, hq, wq, cq = v.shape
        return jnp.max(v.reshape(bq, hq, wq, 4, cq // 4), axis=3)
    timed(jax.jit(pmax), x, name="phase_max_208x128")

    # L0 bf16 4-pass decomposition (exact for K=27): four bf16 convs
    xi = jnp.asarray(rng.integers(-32000, 32000, (B, 416, 416, 3)), jnp.int16)
    k16 = jnp.asarray(rng.integers(-32000, 32000, (3, 3, 3, 32)), jnp.int16)

    def l0_bf16(v, kk=k16):
        vh = (v >> 8).astype(jnp.bfloat16)
        vl = (v & 0xFF).astype(jnp.bfloat16)
        kh = (kk >> 8).astype(jnp.bfloat16)
        kl = (kk & 0xFF).astype(jnp.bfloat16)
        def c(a, b):
            return lax.conv_general_dilated(
                a, b, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
        acc = (c(vh, kh).astype(jnp.int32) << 16)
        acc += (c(vh, kl).astype(jnp.int32) +
                c(vl, kh).astype(jnp.int32)) << 8
        acc += c(vl, kl).astype(jnp.int32)
        return acc
    timed(jax.jit(l0_bf16), xi,
          useful_ops=2.0 * B * 416 * 416 * 27 * 32, name="L0_bf16dec")

    # verify bf16-dec exactness vs direct int conv on a small case
    xs = jnp.asarray(rng.integers(-32767, 32767, (2, 33, 33, 3)), jnp.int16)
    want = np.asarray(jax.jit(lambda v: lax.conv_general_dilated(
        v, k16, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32))(xs))
    got = np.asarray(jax.jit(l0_bf16)(xs))
    LOG(json.dumps({"probe": "L0_bf16dec_exact",
                    "exact": bool(np.array_equal(got, want))}))


if __name__ == "__main__":
    main()
