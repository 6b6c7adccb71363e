"""Pallas TPU kernels: EXACT int16 convolution via s8 MXU decomposition.

The v5e MXU runs s8xs8->s32 natively (~394 TOPS peak); XLA's s16 convs top
out around 45 TOPS on the YOLOv2 shapes and collapse to 1-15 at the early
layers (measured round 2, tools/bench_r2micro.py). Mosaic cannot compile
s16 dots at all. This module therefore computes the exact s16xs16->s32
accumulation as multi-word arithmetic on s8 dots:

    x = 256*xh + (xl + 128)      xh = x >> 8           (int8)
    w = 256*wh + (wl + 128)      xl = (x & 0xFF) - 128 (int8)

    sum x*w = (sum xh*wh << 16)
            + ((sum xh*wl + sum xl*wh) << 8)
            +  sum xl*wl
            + 128*((sum_k xh << 8) + sum_k xl)      per-row (activations)
            + (csum_wh << 15) + (csum_wl << 7)      per-col (static)
            + 16384*K                               static

All terms are computed mod 2^32 (int32 wraparound), which equals the true
sum whenever the true sum fits int32 — the same contract the int32-accum
XLA path and the numpy golden already rely on. Bit-exactness is therefore
preserved, and verified by the existing golden tests running this path in
interpret mode.

The two hi/lo weight planes are concatenated along N, so each K step issues
TWO s8 dots of width 2N ("dec2") — measured at 334 raw TOPS = 83.6 USEFUL
int16 TOPS (tools/bench_r2mm2.py), vs 45 for XLA's native s16 conv.

Zero padding: an encoded zero is (hi=0, lo=-128). Both the activation
K-padding and the weight K/N-padding use encoded zeros, which makes padded
positions contribute exactly 0 through the identity above.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ENC_ZERO_LO = -128      # lo-plane value encoding integer zero


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile(size: int, preferred: int, multiple: int) -> int:
    if size <= preferred:
        return size
    best = None
    t = multiple
    while t <= preferred:
        if size % t == 0:
            best = t
        t += multiple
    return best or size


# ---------------------------------------------------------------------------
# Weight preparation (numpy, at params-build time)
# ---------------------------------------------------------------------------

def split_weights_np(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int16 -> (hi, lo) s8 planes with the +128 lo offset encoding."""
    w = w.astype(np.int32)
    hi = (w >> 8).astype(np.int8)
    lo = ((w & 0xFF) - 128).astype(np.int8)
    return hi, lo


def prep_matmul_weights(w16: np.ndarray, bias_shifted: np.ndarray,
                        kp: int | None = None, np_: int | None = None,
                        tn: int | None = None):
    """w16 (K, N) int16 -> dict for matmul_q16_requant.

    Pads K to ``kp`` and N to ``np_`` with encoded zeros; interleaves the
    hi/lo planes per N-tile of ``tn`` so a (tk, 2tn) block at index (k, j)
    is [WH_j | WL_j].
    """
    K, N = w16.shape
    kp = kp or _round_up(K, 8)
    np_ = np_ or _round_up(N, 64)
    tn = tn or _pick_tile(np_, 512, 64)
    wp = np.zeros((kp, np_), np.int32)
    wp[:K, :N] = w16.astype(np.int32)
    # encoded zero for padded rows/cols: value 0 -> hi 0, lo -128
    hi = (wp >> 8).astype(np.int8)
    lo = ((wp & 0xFF) - 128).astype(np.int8)
    blocks = []
    for j in range(np_ // tn):
        blocks.append(np.concatenate(
            [hi[:, j * tn:(j + 1) * tn], lo[:, j * tn:(j + 1) * tn]], axis=1))
    w2 = np.concatenate(blocks, axis=1)            # (kp, 2*np_)
    csum_hi = hi.sum(axis=0, dtype=np.int64)
    csum_lo = lo.sum(axis=0, dtype=np.int64)
    nconst = ((csum_hi << 15) + (csum_lo << 7)
              + (128 * 128) * kp).astype(np.int32)  # mod 2^32
    bias = np.zeros(np_, np.int32)
    bias[:N] = bias_shifted.astype(np.int32)
    return {"w2": jnp.asarray(w2), "nconst": jnp.asarray(nconst),
            "bias": jnp.asarray(bias), "K": K, "Kp": kp, "N": N,
            "Np": np_, "tn": tn}


def prep_conv_weights(w16_hwio: np.ndarray, bias_shifted: np.ndarray,
                      cp: int | None = None, tn: int | None = None,
                      vmem_budget: int = 5 << 20):
    """w16 (kh, kw, C, N) int16 -> dict for conv3x3_q16_requant.

    Layout (N/tn, kh*kw*Cp, 2tn) so the j-block holds every tap's
    [WH_j | WL_j], tap-major along the sublane dim.
    """
    kh, kw, C, N = w16_hwio.shape
    cp = cp or max(_round_up(C, 8), LANE)
    np_ = _round_up(N, 64)
    if tn is None:
        tn = _pick_tile(np_, 512, 64)
        while kh * kw * cp * 2 * tn > vmem_budget and tn > 64:
            tn //= 2
    wp = np.zeros((kh * kw, cp, np_), np.int32)
    wp[:, :C, :N] = w16_hwio.astype(np.int32).transpose(0, 1, 2, 3).reshape(
        kh * kw, C, N)
    hi = (wp >> 8).astype(np.int8)
    lo = ((wp & 0xFF) - 128).astype(np.int8)
    jblocks = []
    for j in range(np_ // tn):
        jb = np.concatenate([hi[:, :, j * tn:(j + 1) * tn],
                             lo[:, :, j * tn:(j + 1) * tn]], axis=2)
        jblocks.append(jb.reshape(kh * kw * cp, 2 * tn))
    w2 = np.stack(jblocks, axis=0)                 # (np_/tn, taps*Cp, 2tn)
    csum_hi = hi.sum(axis=(0, 1), dtype=np.int64)
    csum_lo = lo.sum(axis=(0, 1), dtype=np.int64)
    nconst = ((csum_hi << 15) + (csum_lo << 7)
              + (128 * 128) * (kh * kw * cp)).astype(np.int32)
    bias = np.zeros(np_, np.int32)
    bias[:N] = bias_shifted.astype(np.int32)
    return {"w2": jnp.asarray(w2), "nconst": jnp.asarray(nconst),
            "bias": jnp.asarray(bias), "C": C, "Cp": cp, "N": N,
            "Np": np_, "tn": tn, "kh": kh, "kw": kw}


# ---------------------------------------------------------------------------
# Shared epilogue
# ---------------------------------------------------------------------------

def _recombine(acch, accl, rsum, nconst, tn):
    hh, hl = acch[:, :tn], acch[:, tn:]
    lh, ll = accl[:, :tn], accl[:, tn:]
    acc = (hh << 16) + ((hl + lh) << 8) + ll
    return acc + (rsum << 7) + nconst[None, :]


def _requant(acc, bias, shift_out: int, leaky: bool):
    if shift_out > 0:
        mag = min(shift_out, 30)
        acc = (acc + (1 << (mag - 1))) >> mag
    elif shift_out < 0:
        acc = acc << min(-shift_out, 30)
    v = jnp.clip(acc + bias[None, :], -32768, 32767)
    if leaky:
        v = jnp.clip(jnp.where(v < 0, -((-v) // 10), v), -32768, 32767)
    return v.astype(jnp.int16)


def _split(x16):
    xh = (x16 >> 8).astype(jnp.int8)
    xl = ((x16 & 0xFF) - 128).astype(jnp.int8)
    return xh, xl


# ---------------------------------------------------------------------------
# Kernel 1: fused matmul (1x1 convs; L0 via im2col'd patches)
# ---------------------------------------------------------------------------

def _mm_kernel(x_ref, w_ref, nconst_ref, bias_ref, o_ref,
               acch, accl, rsum, *, ksteps, tn, shift_out, leaky):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acch[:] = jnp.zeros_like(acch)
        accl[:] = jnp.zeros_like(accl)
        rsum[:] = jnp.zeros_like(rsum)

    xh, xl = _split(x_ref[:])
    w2 = w_ref[:]
    acch[:] += jnp.dot(xh, w2, preferred_element_type=jnp.int32)
    accl[:] += jnp.dot(xl, w2, preferred_element_type=jnp.int32)
    rsum[:] += ((jnp.sum(xh.astype(jnp.int32), axis=1, keepdims=True) << 8)
                + jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True))

    @pl.when(pl.program_id(2) == ksteps - 1)
    def _epi():
        acc = _recombine(acch[:], accl[:], rsum[:], nconst_ref[:], tn)
        o_ref[:] = _requant(acc, bias_ref[:], shift_out, leaky)


def matmul_q16_requant(x: jnp.ndarray, wp: dict, shift_out: int,
                       leaky: bool, interpret: bool | None = None
                       ) -> jnp.ndarray:
    """x (M, K) int16 @ prepared weights -> (M, N) int16 with fused requant.

    Exact int16 semantics (see module docstring). M must be divisible by a
    reasonable tile (it is padded otherwise); K is padded to the prepared Kp
    with encoded zeros.
    """
    if interpret is None:
        interpret = _interpret_default()
    M, K = x.shape
    assert K == wp["K"], (K, wp["K"])
    kp, np_, tn = wp["Kp"], wp["Np"], wp["tn"]
    if kp != K:
        x = jnp.pad(x, ((0, 0), (0, kp - K)))   # int16 0 == encoded zero
    tm = _pick_tile(M, 512, 32)
    if tm > 1024:          # no friendly divisor — pad M up instead
        tm = 512
    pad_m = (-M) % tm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    tk = _pick_tile(kp, 512, 8)
    ksteps = kp // tk

    out = pl.pallas_call(
        functools.partial(_mm_kernel, ksteps=ksteps, tn=tn,
                          shift_out=shift_out, leaky=leaky),
        grid=(Mp // tm, np_ // tn, ksteps),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, 2 * tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn,), lambda i, j, k: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn,), lambda i, j, k: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, np_), jnp.int16),
        scratch_shapes=[pltpu.VMEM((tm, 2 * tn), jnp.int32),
                        pltpu.VMEM((tm, 2 * tn), jnp.int32),
                        pltpu.VMEM((tm, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x, wp["w2"], wp["nconst"], wp["bias"])
    out = out[:M] if pad_m else out
    return out[:, :wp["N"]] if np_ != wp["N"] else out


# ---------------------------------------------------------------------------
# Kernel 2: fused 3x3 stride-1 conv (halo row bands, tap-loop dots)
# ---------------------------------------------------------------------------

def _conv_kernel(x_hbm, w_ref, nconst_ref, bias_ref, o_ref,
                 xbuf, xh_s, xl_s, acch, accl, rsum, sem, *,
                 th, W, Cp, tn, kh, kw, shift_out, leaky):
    b = pl.program_id(1)
    i = pl.program_id(2)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, th + kh - 1), :, :], xbuf, sem)
    cp.start()
    cp.wait()
    xh_s[:], xl_s[:] = _split(xbuf[:])

    acch[:] = jnp.zeros_like(acch)
    accl[:] = jnp.zeros_like(accl)
    rsum[:] = jnp.zeros_like(rsum)
    for dy in range(kh):
        for dx in range(kw):
            tap = dy * kw + dx
            t_h = xh_s[dy:dy + th, dx:dx + W, :].reshape(th * W, Cp)
            t_l = xl_s[dy:dy + th, dx:dx + W, :].reshape(th * W, Cp)
            wblk = w_ref[0, tap * Cp:(tap + 1) * Cp, :]
            acch[:] += jnp.dot(t_h, wblk, preferred_element_type=jnp.int32)
            accl[:] += jnp.dot(t_l, wblk, preferred_element_type=jnp.int32)
            rsum[:] += ((jnp.sum(t_h.astype(jnp.int32), axis=1,
                                 keepdims=True) << 8)
                        + jnp.sum(t_l.astype(jnp.int32), axis=1,
                                  keepdims=True))
    acc = _recombine(acch[:], accl[:], rsum[:], nconst_ref[:], tn)
    v = _requant(acc, bias_ref[:], shift_out, leaky)
    o_ref[0] = v.reshape(th, W, tn)


def conv3x3_q16_requant(x: jnp.ndarray, wp: dict, shift_out: int,
                        leaky: bool, th: int | None = None,
                        interpret: bool | None = None) -> jnp.ndarray:
    """x (B, H, W, C) int16, SAME 3x3/s1 conv with fused exact-int16
    requant; returns (B, H, W, N) int16. C is padded to >=128 lanes and the
    halo band is DMA'd per (batch, row-band) program."""
    if interpret is None:
        interpret = _interpret_default()
    B, H, W, C = x.shape
    kh, kw = wp["kh"], wp["kw"]
    Cp, np_, tn = wp["Cp"], wp["Np"], wp["tn"]
    assert C == wp["C"], (C, wp["C"])
    if th is None:
        th = max(1, min(H, 2048 // W if W <= 256 else 8))
        while H % th:
            th -= 1
    pad_h = (-H) % th
    pad_w = (-(W + kw - 1)) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, 1 + pad_w), (0, Cp - C)))
    Hp = H + pad_h
    W2a = W + kw - 1 + pad_w

    out = pl.pallas_call(
        functools.partial(_conv_kernel, th=th, W=W, Cp=Cp, tn=tn,
                          kh=kh, kw=kw, shift_out=shift_out, leaky=leaky),
        grid=(np_ // tn, B, Hp // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, kh * kw * Cp, 2 * tn), lambda j, b, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn,), lambda j, b, i: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn,), lambda j, b, i: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, tn), lambda j, b, i: (b, i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, np_), jnp.int16),
        scratch_shapes=[
            pltpu.VMEM((th + kh - 1, W2a, Cp), jnp.int16),
            pltpu.VMEM((th + kh - 1, W2a, Cp), jnp.int8),
            pltpu.VMEM((th + kh - 1, W2a, Cp), jnp.int8),
            pltpu.VMEM((th * W, 2 * tn), jnp.int32),
            pltpu.VMEM((th * W, 2 * tn), jnp.int32),
            pltpu.VMEM((th * W, 1), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(xp, wp["w2"], wp["nconst"], wp["bias"])
    out = out[:, :H] if pad_h else out
    return out[..., :wp["N"]] if np_ != wp["N"] else out
