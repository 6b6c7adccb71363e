"""Bisect the ~25us/program overhead: round-1 int8 conv kernel vs q16.

Mutations, one at a time, on L8 geometry (B=32, 52x52, C=128 -> N=256):
  r1        — round-1 conv3x3_int8 verbatim (single plane, single DMA)
  r1_dual   — + second input plane / dual DMA, (2,) semaphore array
  r1_jdim   — + leading j grid dim (grid (1, B, bands))
  r1_wflat  — + 3D weight block (1, 9C, F) instead of (9, C, F)
  r1_dimsem — + dimension_semantics arbitrary
  r1_i16out — + int16 output instead of int8
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

    B, H, W, C, F = 32, 52, 52, 128, 256
    th = 16  # pads H to 64 -> 4 bands
    useful = 2.0 * B * H * W * C * F * 9

    # baseline: round-1 kernel verbatim
    from yolotpu.ops.pallas_conv import conv3x3_int8
    x8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, (3, 3, C, F)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-1000, 1000, (F,)), jnp.int32)
    f = jax.jit(functools.partial(conv3x3_int8, w=w8, bias=b8, shift_out=9,
                                  th=th))
    ms = timeit(f, x8)
    LOG(json.dumps({"probe": "r1", "ms": round(ms, 3),
                    "useful_i8_tops": round(useful / ms / 1e9, 1)}))

    # mutated variants, inline
    Hp = ((H + th - 1) // th) * th
    pad_h = Hp - H
    pad_w = (-(W + 2)) % 8
    W2a = W + 2 + pad_w

    def make(variant):
        dual = variant in ("dual", "jdim", "wflat", "dimsem", "i16out")
        jdim = variant in ("jdim", "wflat", "dimsem", "i16out")
        wflat = variant in ("wflat", "dimsem", "i16out")
        dimsem = variant in ("dimsem", "i16out")
        i16out = variant == "i16out"

        def kern(*refs):
            idx = 0
            x_hbm = refs[idx]; idx += 1
            x2_hbm = refs[idx] if dual else None
            idx += 1 if dual else 0
            w_ref = refs[idx]; idx += 1
            b_ref = refs[idx]; idx += 1
            o_ref = refs[idx]; idx += 1
            xbuf = refs[idx]; idx += 1
            xbuf2 = refs[idx] if dual else None
            idx += 1 if dual else 0
            sem = refs[idx]; idx += 1
            b = pl.program_id(1 if jdim else 0)
            i = pl.program_id(2 if jdim else 1)
            if dual:
                c1 = pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(i * th, th + 2), :, :], xbuf,
                    sem.at[0])
                c2 = pltpu.make_async_copy(
                    x2_hbm.at[b, pl.ds(i * th, th + 2), :, :], xbuf2,
                    sem.at[1])
                c1.start(); c2.start(); c1.wait(); c2.wait()
            else:
                c1 = pltpu.make_async_copy(
                    x_hbm.at[b, pl.ds(i * th, th + 2), :, :], xbuf, sem)
                c1.start(); c1.wait()
            acc = jnp.zeros((th * W, F), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    tap = dy * 3 + dx
                    t = xbuf[dy:dy + th, dx:dx + W, :].reshape(th * W, C)
                    wblk = (w_ref[0, tap * C:(tap + 1) * C, :] if wflat
                            else w_ref[tap])
                    acc += jnp.dot(t, wblk,
                                   preferred_element_type=jnp.int32)
                    if dual:
                        t2 = xbuf2[dy:dy + th, dx:dx + W, :].reshape(
                            th * W, C)
                        acc += jnp.dot(t2, wblk,
                                       preferred_element_type=jnp.int32)
            v = jnp.clip((acc >> 9) + b_ref[:], -128, 127)
            if i16out:
                o_ref[0] = v.reshape(th, W, F).astype(jnp.int16)
            else:
                o_ref[0] = v.reshape(th, W, F).astype(jnp.int8)

        grid = (1, B, Hp // th) if jdim else (B, Hp // th)
        nil = (lambda j, b, i: 0) if jdim else (lambda b, i: 0)
        wspec = (pl.BlockSpec((1, 9 * C, F),
                              (lambda j, b, i: (j, 0, 0)) if jdim
                              else (lambda b, i: (0, 0, 0)),
                              memory_space=pltpu.VMEM) if wflat
                 else pl.BlockSpec((9, C, F),
                                   (lambda j, b, i: (0, 0, 0)) if jdim
                                   else (lambda b, i: (0, 0, 0)),
                                   memory_space=pltpu.VMEM))
        ospec = pl.BlockSpec((1, th, W, F),
                             (lambda j, b, i: (b, i, 0, 0)) if jdim
                             else (lambda b, i: (b, i, 0, 0)),
                             memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((F,), (lambda j, b, i: (0,)) if jdim
                             else (lambda b, i: (0,)),
                             memory_space=pltpu.VMEM)
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        if dual:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        in_specs += [wspec, bspec]
        scratch = [pltpu.VMEM((th + 2, W2a, C), jnp.int8)]
        if dual:
            scratch.append(pltpu.VMEM((th + 2, W2a, C), jnp.int8))
        scratch.append(pltpu.SemaphoreType.DMA((2,)) if dual
                       else pltpu.SemaphoreType.DMA)
        params = {}
        if dimsem:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * len(grid))
        wt = (w8.reshape(9, C, F).reshape(1, 9 * C, F) if wflat
              else w8.reshape(9, C, F))

        def run(x):
            xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, 1 + pad_w), (0, 0)))
            args = [xp, xp] if dual else [xp]
            return pl.pallas_call(
                kern, grid=grid, in_specs=in_specs, out_specs=ospec,
                out_shape=jax.ShapeDtypeStruct(
                    (B, Hp, W, F), jnp.int16 if i16out else jnp.int8),
                scratch_shapes=scratch, **params)(*args, wt, b8)
        return run

    for variant in ("dual", "jdim", "wflat", "dimsem", "i16out"):
        try:
            f = jax.jit(make(variant))
            ms = timeit(f, x8)
            scale = 2.0 if variant != "r1" else 1.0  # dual does 2x dots
            LOG(json.dumps({"probe": f"r1_{variant}", "ms": round(ms, 3),
                            "raw_i8_tops":
                                round(scale * useful / ms / 1e9, 1)}))
        except Exception as e:  # noqa: BLE001
            msg = " ".join(f"{type(e).__name__}: {e}".split())[:400]
            LOG(json.dumps({"probe": f"r1_{variant}", "error": msg}))


if __name__ == "__main__":
    main()
