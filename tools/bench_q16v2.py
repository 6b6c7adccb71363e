"""Probe: isolate the q16 conv kernel's cost components.

Per geometry (L2-like, L8-like, L18-like):
  dots   — dec2 dots on RESIDENT VMEM data, no tap slicing (upper bound)
  shifts — the 9 sublane-shifted tap copies alone, no dots (relayout cost)
  abuf   — assembly into a lane-aligned im2col buffer + ONE dec2 dot pair
  tap    — current tap-loop (9x2 small dots)
Also reproduces the L08/L18 compile failures with full error text.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

LOG = lambda *a: print(*a, flush=True)  # noqa: E731


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def floor_ms():
        f = jax.jit(lambda v: v + 1.0)
        _ = float(f(jnp.float32(0)))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            _ = float(f(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    FLOOR = floor_ms()
    LOG(json.dumps({"probe": "floor", "ms": round(FLOOR, 2)}))
    rng = np.random.default_rng(0)

    def timeit(f, x, n=10):
        one = jnp.ones((), x.dtype)
        xs = [x.at[(0,) * x.ndim].add(one * i) for i in range(n)]
        out = None
        for xi in xs:
            out = f(xi)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            outs = [f(xi) for xi in xs]
            s = jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in outs])
            _ = float(jnp.sum(s))
            ts.append(time.perf_counter() - t0)
        return max(1e-6, (float(np.median(ts)) * 1e3 - FLOOR) / n)

    # geometry: (name, B, th, W, Cp, tn, useful_ops_scale C, N)
    GEOS = [
        ("L2", 32, 8, 208, 128, 64, 32, 64),
        ("L8", 32, 13, 52, 128, 256, 128, 256),
        ("L18", 32, 13, 13, 512, 512, 512, 1024),
    ]

    for (name, B, th, W, Cp, tn, C, N) in GEOS:
        M = th * W
        K9 = 9 * Cp
        np_ = max(2 * tn, 128)
        nb = N // tn if N % tn == 0 else 1
        bands = 1  # per-program work; grid scales it
        H = th  # one band per program for the probe
        grid = (nb, B, bands)
        W2a = ((W + 2 + 7) // 8) * 8

        xh_np = rng.integers(-128, 128, (B, th + 2, W2a, Cp)).astype(np.int8)
        xl_np = rng.integers(-128, 128, (B, th + 2, W2a, Cp)).astype(np.int8)
        w2_np = rng.integers(-128, 128, (nb, K9, 2 * tn)).astype(np.int8)
        xh = jnp.asarray(xh_np)
        xl = jnp.asarray(xl_np)
        w2 = jnp.asarray(w2_np)
        useful = 2.0 * B * th * W * C * N * 9

        def mk(body, extra_scratch=()):
            return pl.pallas_call(
                body,
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                          pl.BlockSpec(memory_space=pltpu.ANY),
                          pl.BlockSpec((1, K9, 2 * tn), lambda j, b, i: (j, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, th, W, tn),
                                       lambda j, b, i: (b, i, 0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, th, W, N if N % tn == 0
                                                else tn), jnp.int16),
                scratch_shapes=[
                    pltpu.VMEM((th + 2, W2a, Cp), jnp.int8),
                    pltpu.VMEM((th + 2, W2a, Cp), jnp.int8),
                    pltpu.VMEM((M, 2 * tn), jnp.int32),
                    pltpu.VMEM((M, 2 * tn), jnp.int32),
                    pltpu.SemaphoreType.DMA((2,)),
                ] + list(extra_scratch),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",) * 3),
            )

        def dma_in(xh_hbm, xl_hbm, xh_s, xl_s, sems, b):
            c1 = pltpu.make_async_copy(xh_hbm.at[b], xh_s, sems.at[0])
            c2 = pltpu.make_async_copy(xl_hbm.at[b], xl_s, sems.at[1])
            c1.start(); c2.start(); c1.wait(); c2.wait()

        # --- variant: dots only (no taps; reuse one aligned view 9x) ---
        def body_dots(xh_hbm, xl_hbm, w_ref, o_ref, xh_s, xl_s, acch, accl,
                      sems):
            b = pl.program_id(1)
            dma_in(xh_hbm, xl_hbm, xh_s, xl_s, sems, b)
            acch[:] = jnp.zeros_like(acch)
            accl[:] = jnp.zeros_like(accl)
            base_h = xh_s[0:th, 0:W, :].reshape(M, Cp)
            base_l = xl_s[0:th, 0:W, :].reshape(M, Cp)
            for t in range(9):
                wblk = w_ref[0, t * Cp:(t + 1) * Cp, :]
                acch[:] += jnp.dot(base_h, wblk,
                                   preferred_element_type=jnp.int32)
                accl[:] += jnp.dot(base_l, wblk,
                                   preferred_element_type=jnp.int32)
            v = (acch[:, :tn] + accl[:, tn:]).astype(jnp.int16)
            o_ref[0] = v.reshape(th, W, tn)

        # --- variant: shifts only (tap copies, single dot pair) ---
        def body_shifts(xh_hbm, xl_hbm, w_ref, o_ref, xh_s, xl_s, acch,
                        accl, abuf_h, abuf_l, sems):
            b = pl.program_id(1)
            dma_in(xh_hbm, xl_hbm, xh_s, xl_s, sems, b)
            for dy in range(3):
                for dx in range(3):
                    t = dy * 3 + dx
                    abuf_h[:, t * Cp:(t + 1) * Cp] = \
                        xh_s[dy:dy + th, dx:dx + W, :].reshape(M, Cp)
                    abuf_l[:, t * Cp:(t + 1) * Cp] = \
                        xl_s[dy:dy + th, dx:dx + W, :].reshape(M, Cp)
            acch[:] = jnp.dot(abuf_h[:], w_ref[0],
                              preferred_element_type=jnp.int32)
            accl[:] = jnp.dot(abuf_l[:], w_ref[0],
                              preferred_element_type=jnp.int32)
            v = (acch[:, :tn] + accl[:, tn:]).astype(jnp.int16)
            o_ref[0] = v.reshape(th, W, tn)

        # --- variant: current tap-loop ---
        def body_tap(xh_hbm, xl_hbm, w_ref, o_ref, xh_s, xl_s, acch, accl,
                     sems):
            b = pl.program_id(1)
            dma_in(xh_hbm, xl_hbm, xh_s, xl_s, sems, b)
            acch[:] = jnp.zeros_like(acch)
            accl[:] = jnp.zeros_like(accl)
            for dy in range(3):
                for dx in range(3):
                    t = dy * 3 + dx
                    t_h = xh_s[dy:dy + th, dx:dx + W, :].reshape(M, Cp)
                    t_l = xl_s[dy:dy + th, dx:dx + W, :].reshape(M, Cp)
                    wblk = w_ref[0, t * Cp:(t + 1) * Cp, :]
                    acch[:] += jnp.dot(t_h, wblk,
                                       preferred_element_type=jnp.int32)
                    accl[:] += jnp.dot(t_l, wblk,
                                       preferred_element_type=jnp.int32)
            v = (acch[:, :tn] + accl[:, tn:]).astype(jnp.int16)
            o_ref[0] = v.reshape(th, W, tn)

        # --- variant: dy-only row taps (free dim-0 slices), dx via 3 dots
        #     over a W2a-wide flat view whose output we shift-add ---
        variants = [("dots", body_dots, ()),
                    ("abuf", body_shifts,
                     (pltpu.VMEM((M, K9), jnp.int8),
                      pltpu.VMEM((M, K9), jnp.int8))),
                    ("tap", body_tap, ())]
        for vn, body, extra in variants:
            try:
                f = jax.jit(lambda a, b_=xl, w_=w2, k=mk(body, extra):
                            k(a, b_, w_))
                ms = timeit(f, xh)
                LOG(json.dumps({"probe": f"{name}_{vn}", "ms": round(ms, 3),
                                "useful_tops":
                                    round(useful / (ms * 1e-3) / 1e12, 1)}))
            except Exception as e:  # noqa: BLE001
                msg = f"{type(e).__name__}: {e}"
                msg = " ".join(msg.split())[:500]
                LOG(json.dumps({"probe": f"{name}_{vn}", "error": msg}))


if __name__ == "__main__":
    main()
