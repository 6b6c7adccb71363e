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
XLA path and the numpy golden already rely on, so the tier stays bit-exact
(verified by interpret-mode tests against the golden oracle).

The hi/lo weight planes are concatenated along N, so each K step issues TWO
s8 dots of width 2N ("dec2", 334 raw TOPS at matmul geometry). Hardware
lessons baked in (tools/bench_q16bisect.py / bench_q16v3.py):
  - outputs are written FLAT (rows, N) — a ragged (th, W, N) block reshape
    relayouts every store and halves throughput (int16 worse than int8);
  - no dimension_semantics (it cost ~20%);
  - channel counts are padded to >=128 lanes END-TO-END (pad channels carry
    encoded zeros, contributing exactly 0), because sub-128-lane tiles
    relayout every access;
  - per-tap accumulator updates are VPU-bound at big K — layers with
    9*Cp >= ~2304 assemble a lane-aligned im2col buffer and contract in ONE
    dot pair instead ("abuf");
  - 13x13 layers batch G images per program so M is MXU-sized.

Zero padding: an encoded zero is (hi=0, lo=-128). Activation K/C padding
and weight K/N padding both use encoded zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


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


def pad_channels(x: jnp.ndarray, cp: int) -> jnp.ndarray:
    """Zero-pad the channel (last) dim; int16 zeros ARE encoded zeros once
    split, so padded channels contribute exactly nothing downstream."""
    c = x.shape[-1]
    if c == cp:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, cp - c)]
    return jnp.pad(x, pad)


def split16(x16: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """int16 -> (hi, lo) s8 planes at the XLA level (Mosaic cannot legalize
    int16 vector shifts in-kernel)."""
    xh = (x16 >> 8).astype(jnp.int8)
    xl = ((x16 & 0xFF) - 128).astype(jnp.int8)
    return xh, xl


# ---------------------------------------------------------------------------
# Weight preparation (numpy, at params-build time)
# ---------------------------------------------------------------------------

def _split_pad_np(w32: np.ndarray):
    hi = (w32 >> 8).astype(np.int8)
    lo = ((w32 & 0xFF) - 128).astype(np.int8)
    return hi, lo


def prep_matmul_weights(w16: np.ndarray, bias_shifted: np.ndarray,
                        kp: int | None = None, np_: int | None = None,
                        tn: int | None = None):
    """w16 (K, N) int16 -> dict for matmul_q16_requant.

    K pads to >=8 (or given kp, e.g. the consumer tensor's padded channel
    count), N to >=128; hi/lo planes interleave per N-tile so block (k, j)
    is [WH_j | WL_j].
    """
    K, N = w16.shape
    kp = kp or _round_up(K, 8)
    np_ = np_ or max(_round_up(N, 64), LANE)
    tn = tn or _pick_tile(np_, 512, 64)
    wp = np.zeros((kp, np_), np.int32)
    wp[:K, :N] = w16.astype(np.int32)
    hi, lo = _split_pad_np(wp)
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
                      vmem_budget: int = 4 << 20):
    """w16 (kh, kw, C, N) int16 -> dict for conv3x3_q16_requant.

    Layout (Np/tn, kh*kw*Cp, 2tn): block j holds every tap's [WH_j | WL_j],
    tap-major along sublanes. C pads to >=128 (consumer tensors are
    channel-padded to match); N pads to >=128.
    """
    kh, kw, C, N = w16_hwio.shape
    cp = cp or max(_round_up(C, 8), LANE)
    np_ = max(_round_up(N, 64), LANE)
    if tn is None:
        tn = _pick_tile(np_, 512, 64)
        while kh * kw * cp * 2 * tn > vmem_budget and tn > 128:
            tn //= 2
    wp = np.zeros((kh * kw, cp, np_), np.int32)
    wp[:, :C, :N] = w16_hwio.astype(np.int32).reshape(kh * kw, C, N)
    hi, lo = _split_pad_np(wp)
    jblocks = []
    for j in range(np_ // tn):
        jb = np.concatenate([hi[:, :, j * tn:(j + 1) * tn],
                             lo[:, :, j * tn:(j + 1) * tn]], axis=2)
        jblocks.append(jb.reshape(kh * kw * cp, 2 * tn))
    w2 = np.stack(jblocks, axis=0)                 # (Np/tn, taps*Cp, 2tn)
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
# Shared epilogue (all int32 — Mosaic-legal)
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


# ---------------------------------------------------------------------------
# Kernel 1: fused matmul (1x1 convs; patch-matmuls for tiny-C entry convs)
# ---------------------------------------------------------------------------

def _mm_kernel(xh_ref, xl_ref, w_ref, nconst_ref, bias_ref, o_ref,
               acch, accl, rsum, *, ksteps, tn, shift_out, leaky):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acch[:] = jnp.zeros_like(acch)
        accl[:] = jnp.zeros_like(accl)
        rsum[:] = jnp.zeros_like(rsum)

    xh, xl = xh_ref[:], xl_ref[:]
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
                       leaky: bool, out_np: bool = False,
                       interpret: bool | None = None) -> jnp.ndarray:
    """x (M, K) int16 @ prepared weights -> (M, Np or N) int16, fused
    exact requant. K may be the real K or the padded Kp (channel-padded
    callers). With ``out_np`` the padded Np columns are kept (zero-bias pad
    channels) so downstream kernels see a lane-aligned tensor."""
    if interpret is None:
        interpret = _interpret_default()
    M, K = x.shape
    kp, np_, tn = wp["Kp"], wp["Np"], wp["tn"]
    assert K in (wp["K"], kp), (K, wp["K"], kp)
    if K != kp:
        x = jnp.pad(x, ((0, 0), (0, kp - K)))   # int16 0 == encoded zero
    # M-tile: small-K programs are overhead-bound — grow tm to the VMEM
    # budget (acc pair 8*tm*tn + inputs 2*tm*tk bytes)
    budget = 8 << 20
    pref = 512
    while pref < 4096 and (8 * 2 * pref * tn + 4 * pref * kp) < budget:
        pref *= 2
    tm = _pick_tile(M, pref, 32)
    if tm > 4096:
        tm = pref
    pad_m = (-M) % tm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    tk = _pick_tile(kp, 1024, 8)
    ksteps = kp // tk

    xh, xl = split16(x)
    out = pl.pallas_call(
        functools.partial(_mm_kernel, ksteps=ksteps, tn=tn,
                          shift_out=shift_out, leaky=leaky),
        grid=(Mp // tm, np_ // tn, ksteps),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(xh, xl, wp["w2"], wp["nconst"], wp["bias"])
    out = out[:M] if pad_m else out
    if out_np or np_ == wp["N"]:
        return out
    return out[:, :wp["N"]]


# ---------------------------------------------------------------------------
# Kernel 2: fused 3x3/s1 conv — halo bands, tap or abuf contraction,
# flat output rows, optional G images per program
# ---------------------------------------------------------------------------

def _conv_kernel(xh_hbm, xl_hbm, w_ref, nconst_ref, bias_ref, o_ref,
                 xh_s, xl_s, acch, accl, rsum, sems, *,
                 G, th, W, W2a, Cp, tn, kh, kw, shift_out, leaky,
                 use_abuf, abuf_refs=None):
    b = pl.program_id(1)
    i = pl.program_id(2)
    nb = pl.num_programs(2)
    # G images share a program at small spatial sizes; bands otherwise
    if G > 1:
        src_h = xh_hbm.at[pl.ds(b * G, G)]
        src_l = xl_hbm.at[pl.ds(b * G, G)]
    else:
        src_h = xh_hbm.at[b, pl.ds(i * th, th + kh - 1)]
        src_l = xl_hbm.at[b, pl.ds(i * th, th + kh - 1)]
    c1 = pltpu.make_async_copy(src_h, xh_s, sems.at[0])
    c2 = pltpu.make_async_copy(src_l, xl_s, sems.at[1])
    c1.start()
    c2.start()
    c1.wait()
    c2.wait()
    del nb

    M1 = th * W

    def tap_views(g, dy, dx):
        if G > 1:
            t_h = xh_s[g, dy:dy + th, dx:dx + W, :].reshape(M1, Cp)
            t_l = xl_s[g, dy:dy + th, dx:dx + W, :].reshape(M1, Cp)
        else:
            t_h = xh_s[dy:dy + th, dx:dx + W, :].reshape(M1, Cp)
            t_l = xl_s[dy:dy + th, dx:dx + W, :].reshape(M1, Cp)
        return t_h, t_l

    if use_abuf:
        ah, al = abuf_refs
        for g in range(G):
            for dy in range(kh):
                for dx in range(kw):
                    t = dy * kw + dx
                    t_h, t_l = tap_views(g, dy, dx)
                    ah[g * M1:(g + 1) * M1, t * Cp:(t + 1) * Cp] = t_h
                    al[g * M1:(g + 1) * M1, t * Cp:(t + 1) * Cp] = t_l
        w2 = w_ref[0]
        acch[:] = jnp.dot(ah[:], w2, preferred_element_type=jnp.int32)
        accl[:] = jnp.dot(al[:], w2, preferred_element_type=jnp.int32)
        rsum[:] = ((jnp.sum(ah[:].astype(jnp.int32), axis=1,
                            keepdims=True) << 8)
                   + jnp.sum(al[:].astype(jnp.int32), axis=1,
                             keepdims=True))
    else:
        acch[:] = jnp.zeros_like(acch)
        accl[:] = jnp.zeros_like(accl)
        rsum[:] = jnp.zeros_like(rsum)
        for g in range(G):
            sl = slice(g * M1, (g + 1) * M1)
            for dy in range(kh):
                for dx in range(kw):
                    t = dy * kw + dx
                    t_h, t_l = tap_views(g, dy, dx)
                    wblk = w_ref[0, t * Cp:(t + 1) * Cp, :]
                    acch[sl] += jnp.dot(t_h, wblk,
                                        preferred_element_type=jnp.int32)
                    accl[sl] += jnp.dot(t_l, wblk,
                                        preferred_element_type=jnp.int32)
                    rsum[sl] += ((jnp.sum(t_h.astype(jnp.int32), axis=1,
                                          keepdims=True) << 8)
                                 + jnp.sum(t_l.astype(jnp.int32), axis=1,
                                           keepdims=True))
    acc = _recombine(acch[:], accl[:], rsum[:], nconst_ref[:], tn)
    o_ref[0] = _requant(acc, bias_ref[:], shift_out, leaky)


def conv3x3_q16_requant(x: jnp.ndarray, wp: dict, shift_out: int,
                        leaky: bool, th: int | None = None,
                        G: int | None = None, use_abuf: bool | None = None,
                        out_np: bool = False,
                        interpret: bool | None = None) -> jnp.ndarray:
    """x (B, H, W, C or Cp) int16 -> SAME 3x3/s1 conv, exact int16 requant.

    Returns (B, H, W, Np or N) int16. Output rows are computed flat
    (th*W, Np) and reshaped for free at the XLA level (contiguous dims).
    """
    if interpret is None:
        interpret = _interpret_default()
    B, H, W, C = x.shape
    kh, kw = wp["kh"], wp["kw"]
    Cp, np_, tn = wp["Cp"], wp["Np"], wp["tn"]
    assert C in (wp["C"], Cp), (C, wp["C"], Cp)
    if C != Cp:
        x = pad_channels(x, Cp)
    if G is None:
        G = max(1, min(B, 2048 // (H * W))) if H * W <= 512 else 1
        while B % G:
            G -= 1
    if G > 1:
        th = H
    elif th is None:
        th = max(1, min(H, 2048 // W))
        while H % th:
            th -= 1
    if use_abuf is None:
        # per-tap accumulator updates are VPU-bound at big K
        use_abuf = kh * kw * Cp >= 2304 and th * W * G * kh * kw * Cp <= (6 << 20)
    pad_h = (-H) % th
    pad_w = (-(W + kw - 1)) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, 1 + pad_w), (0, 0)))
    Hp = H + pad_h
    W2a = W + kw - 1 + pad_w
    xh, xl = split16(xp)
    M = G * th * W
    nbands = Hp // th if G == 1 else 1

    if G > 1:
        xbuf_shape = (G, th + kh - 1, W2a, Cp)
    else:
        xbuf_shape = (th + kh - 1, W2a, Cp)
    scratch = [
        pltpu.VMEM(xbuf_shape, jnp.int8),
        pltpu.VMEM(xbuf_shape, jnp.int8),
        pltpu.VMEM((M, 2 * tn), jnp.int32),
        pltpu.VMEM((M, 2 * tn), jnp.int32),
        pltpu.VMEM((M, 1), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    common = dict(G=G, th=th, W=W, W2a=W2a, Cp=Cp, tn=tn, kh=kh, kw=kw,
                  shift_out=shift_out, leaky=leaky)
    if use_abuf:
        scratch = scratch[:-1] + [
            pltpu.VMEM((M, kh * kw * Cp), jnp.int8),
            pltpu.VMEM((M, kh * kw * Cp), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ]

        def kern(xh_hbm, xl_hbm, w_ref, nc_ref, b_ref, o_ref,
                 xh_s, xl_s, acch, accl, rsum, ah, al, sems):
            _conv_kernel(xh_hbm, xl_hbm, w_ref, nc_ref, b_ref, o_ref,
                         xh_s, xl_s, acch, accl, rsum, sems,
                         use_abuf=True, abuf_refs=(ah, al), **common)
    else:
        def kern(xh_hbm, xl_hbm, w_ref, nc_ref, b_ref, o_ref,
                 xh_s, xl_s, acch, accl, rsum, sems):
            _conv_kernel(xh_hbm, xl_hbm, w_ref, nc_ref, b_ref, o_ref,
                         xh_s, xl_s, acch, accl, rsum, sems,
                         use_abuf=False, **common)

    out = pl.pallas_call(
        kern,
        grid=(np_ // tn, B // G, nbands),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, kh * kw * Cp, 2 * tn), lambda j, b, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn,), lambda j, b, i: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn,), lambda j, b, i: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, M, tn),
            (lambda j, b, i: (b, 0, j)) if G > 1
            else (lambda j, b, i: (b * nbands + i, 0, j)),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            ((B // G) if G > 1 else B * nbands, M, np_), jnp.int16),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xh, xl, wp["w2"], wp["nconst"], wp["bias"])

    # flat rows -> (B, H(+pad), W, Np): contiguous-dim reshape (free)
    if G > 1:
        out = out.reshape(B, th * W, np_).reshape(B, th, W, np_)
    else:
        out = out.reshape(B, nbands * th, W, np_)
    out = out[:, :H] if pad_h else out
    if out_np or np_ == wp["N"]:
        return out
    return out[..., :wp["N"]]
