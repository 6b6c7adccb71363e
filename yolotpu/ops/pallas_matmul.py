"""Pallas TPU kernels: fused int8 matmul + requantization epilogue.

The quantized 1x1 convolutions are pure matmuls; XLA's int8 dot reaches
~60 TOPS on v5e while this tiled Pallas kernel reaches ~156 TOPS (measured,
4096^3), because the MXU runs s8xs8->s32 natively and the requant/leaky
epilogue happens in VMEM before the int8 result ever touches HBM.

Kernel structure (the standard K-blocked matmul from the Pallas guide):
grid (M/tm, N/tn, K/tk); an int32 VMEM accumulator is zeroed on the first
K step and the epilogue (round-half-up shift, bias add, saturation, integer
leaky) runs on the last. Mosaic cannot currently compile int16 dots (the
backend crashes), which is why the exact-int16 path stays on XLA convs and
this kernel serves the w8a8 tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(size: int, preferred: int, multiple: int) -> int:
    """Largest tile <= preferred that divides size and is a multiple of
    ``multiple`` (falls back to size itself when it's small)."""
    if size <= preferred:
        return size
    best = multiple
    t = multiple
    while t <= preferred:
        if size % t == 0:
            best = t
        t += multiple
    return best


def _mm_requant_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *,
                       k_steps: int, shift_out: int, leaky: bool,
                       out_min: int, out_max: int, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _epilogue():
        acc = acc_ref[:]
        if shift_out > 0:
            mag = min(shift_out, 30)
            acc = (acc + (1 << (mag - 1))) >> mag
        elif shift_out < 0:
            acc = acc << min(-shift_out, 30)
        v = jnp.clip(acc + b_ref[:], out_min, out_max)
        if leaky:
            neg = -((-v) // 10)
            v = jnp.clip(jnp.where(v < 0, neg, v), out_min, out_max)
        o_ref[:] = v.astype(out_dtype)


def _mm_requant_kernel_vshift(x_ref, w_ref, b_ref, s_ref, o_ref, acc_ref, *,
                              k_steps: int, leaky: bool,
                              out_min: int, out_max: int, out_dtype):
    """Per-output-channel requant shift (per-channel int8 weight scales):
    the shift arrives as an (N,) int32 vector blocked like the bias and
    broadcasts over the M axis in the epilogue."""
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _epilogue():
        acc = acc_ref[:]
        s = s_ref[:][None, :]
        spos = jnp.clip(s, 0, 30)
        half = jnp.where(
            s > 0, jnp.left_shift(jnp.int32(1), jnp.maximum(spos - 1, 0)), 0)
        acc = jnp.where(s > 0, (acc + half) >> spos,
                        acc << jnp.clip(-s, 0, 30))
        v = jnp.clip(acc + b_ref[:], out_min, out_max)
        if leaky:
            neg = -((-v) // 10)
            v = jnp.clip(jnp.where(v < 0, neg, v), out_min, out_max)
        o_ref[:] = v.astype(out_dtype)


def _mm_w8a16_kernel(xh_ref, xl_ref, w_ref, b_ref, s_ref, cw_ref, o_ref,
                     acc_ref, *, k_steps: int, leaky: bool):
    """w8a16 fused matmul: int16 activations arrive pre-split as (hi, lo)
    s8 planes; each K step runs TWO s8 dots against ONE streamed weight
    tile (the hi dot's <<8 is folded at accumulate time, so the epilogue
    is the standard requant). cw is the lo-plane +128 offset correction
    (ops.convops.prep_weights_w8a16); the true accumulation fits int32
    (quantize_weights_w8a16 shift cap), making int32 wraparound exact."""
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += (
        (jnp.dot(xh_ref[:], w_ref[:], preferred_element_type=jnp.int32) << 8)
        + jnp.dot(xl_ref[:], w_ref[:], preferred_element_type=jnp.int32))

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _epilogue():
        acc = acc_ref[:] + cw_ref[:][None, :]
        s = s_ref[:][None, :]
        spos = jnp.clip(s, 0, 30)
        half = jnp.where(
            s > 0, jnp.left_shift(jnp.int32(1), jnp.maximum(spos - 1, 0)), 0)
        acc = jnp.where(s > 0, (acc + half) >> spos,
                        acc << jnp.clip(-s, 0, 30))
        v = jnp.clip(acc + b_ref[:], -32768, 32767)
        if leaky:
            neg = -((-v) // 10)
            v = jnp.clip(jnp.where(v < 0, neg, v), -32768, 32767)
        o_ref[:] = v.astype(jnp.int16)


def matmul_w8a16_requant(x: jnp.ndarray, w: jnp.ndarray, cw: jnp.ndarray,
                         bias: jnp.ndarray, shift_out,
                         leaky: bool = True,
                         interpret: bool | None = None) -> jnp.ndarray:
    """(M,K) int16 @ (K,N) int8 -> int16 via hi/lo s8 plane dots with a
    fused per-channel requant epilogue (the w8a16 tier's 1x1 engine).

    bias: (N,) int32 pre-shifted into the output scale domain.
    cw: (N,) int32 lo-plane offset correction (prep_weights_w8a16).
    shift_out: int or (N,) per-output-channel vector.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, K = x.shape
    K2, N = w.shape
    assert K == K2 and bias.shape == (N,) and cw.shape == (N,)

    xh = (x >> 8).astype(jnp.int8)
    xl = (jnp.bitwise_and(x, 255) - 128).astype(jnp.int8)

    tm = _pick_tile(M, 512, 32)
    tn = _pick_tile(N, 512, 128)
    tk = _pick_tile(K, 512, 128) if K % 128 == 0 else K
    if N % tn or K % tk:
        raise ValueError(f"matmul_w8a16: N={N} K={K} must tile by "
                         f"(tn={tn}, tk={tk}); pad N/K to multiples of 128")
    pad_m = (-M) % tm
    if pad_m:
        # int16 zero encodes as (hi 0, lo -128); cw restores the +128
        xh = jnp.pad(xh, ((0, pad_m), (0, 0)))
        xl = jnp.pad(xl, ((0, pad_m), (0, 0)), constant_values=-128)
    Mp = M + pad_m
    k_steps = K // tk

    s = (jnp.full((N,), int(shift_out), jnp.int32)
         if isinstance(shift_out, (int, np.integer))
         else jnp.asarray(shift_out, jnp.int32))
    xspec = pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((tn,), lambda i, j, k: (j,),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mm_w8a16_kernel, k_steps=k_steps, leaky=leaky),
        grid=(Mp // tm, N // tn, k_steps),
        in_specs=[
            xspec, xspec,
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            vspec, vspec, vspec,
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.int16),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        interpret=interpret,
    )(xh, xl, w, bias, s, cw)
    return out[:M] if pad_m else out


def matmul_int8_requant(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                        shift_out, leaky: bool = True,
                        interpret: bool | None = None) -> jnp.ndarray:
    """(M,K) int8 @ (K,N) int8 -> int8, with fused requant epilogue.

    bias: (N,) int32 already shifted into the output scale domain.
    shift_out: python int, or an (N,) per-output-channel shift vector
    (per-channel int8 weight scales).
    """
    return _matmul_requant(x, w, bias, shift_out, leaky, jnp.int8,
                           -128, 127, interpret)


def matmul_int16_out_requant(x: jnp.ndarray, w: jnp.ndarray,
                             bias: jnp.ndarray, shift_out: int,
                             leaky: bool = True,
                             interpret: bool = False) -> jnp.ndarray:
    """int8 x int8 -> int16 output (w8 activations at 16-bit output scale)."""
    return _matmul_requant(x, w, bias, shift_out, leaky, jnp.int16,
                           -32768, 32767, interpret)


def _matmul_requant(x, w, bias, shift_out, leaky, out_dtype, out_min,
                    out_max, interpret):
    if interpret is None:   # auto: interpret off-TPU (CPU tests)
        interpret = jax.default_backend() != "tpu"
    M, K = x.shape
    K2, N = w.shape
    assert K == K2 and bias.shape == (N,)

    tm = _pick_tile(M, 512, 32)
    tn = _pick_tile(N, 512, 128)
    tk = _pick_tile(K, 512, 128) if K % 128 == 0 else K
    # M is padded below; N and K are not — fail loudly on shapes the grid
    # would silently truncate (grid N//tn drops trailing columns otherwise)
    if N % tn or K % tk:
        raise ValueError(f"matmul_requant: N={N} K={K} must tile by "
                         f"(tn={tn}, tk={tk}); pad N/K to multiples of 128")
    pad_m = (-M) % tm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    k_steps = K // tk

    vec_shift = not isinstance(shift_out, (int, np.integer))
    vspec = pl.BlockSpec((tn,), lambda i, j, k: (j,),
                         memory_space=pltpu.VMEM)
    if vec_shift:
        s = jnp.asarray(shift_out, jnp.int32)
        assert s.shape == (N,), (s.shape, N)
        kern = functools.partial(_mm_requant_kernel_vshift, k_steps=k_steps,
                                 leaky=leaky, out_min=out_min,
                                 out_max=out_max, out_dtype=out_dtype)
        in_specs_tail, operands = [vspec, vspec], (bias, s)
    else:
        kern = functools.partial(_mm_requant_kernel, k_steps=k_steps,
                                 shift_out=int(shift_out), leaky=leaky,
                                 out_min=out_min, out_max=out_max,
                                 out_dtype=out_dtype)
        in_specs_tail, operands = [vspec], (bias,)

    out = pl.pallas_call(
        kern,
        grid=(Mp // tm, N // tn, k_steps),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            *in_specs_tail,
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        interpret=interpret,
    )(x, w, *operands)
    return out[:M] if pad_m else out
