"""Pallas TPU kernels: EXACT int16 convolution via s8 MXU decomposition.

The v5e MXU runs s8xs8->s32 natively (~394 TOPS peak); XLA's s16 convs top
out around 45 TOPS on the YOLOv2 shapes and collapse to 1-15 at the early
layers (measured round 2; harness now tools/probe_layer.py). Mosaic cannot compile
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
lessons baked in (measured round 2; harness now tools/probe_layer.py):
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


def recombine16(ph: jnp.ndarray, pl_: jnp.ndarray) -> jnp.ndarray:
    """(hi, lo) s8 planes -> int16 (inverse of split16; XLA level)."""
    return ((ph.astype(jnp.int16) << 8)
            + (pl_.astype(jnp.int16) + 128)).astype(jnp.int16)


def pad_planes(planes, pad_spec) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Spatial/channel pad of an (hi, lo) plane pair with ENCODED zeros
    (hi 0, lo -128) — the plane-flow replacement for padding the int16
    tensor then re-splitting (two full-tensor passes saved per edge)."""
    ph, pl_ = planes
    return (jnp.pad(ph, pad_spec),
            jnp.pad(pl_, pad_spec, constant_values=-128))


def hpool2_planes(planes, W: int, out_planes: bool = True):
    """Horizontal half of a darknet 2x2/s2 maxpool on a vertically
    pre-pooled (hi, lo) pair (the conv kernels fold the vertical half into
    their epilogue — ``out_mode='planes_vpool'``). One fused XLA pass:
    recombine -> col-pair max -> re-split (or int16 out)."""
    ph, pl_ = planes
    b, h2, w, c = ph.shape
    assert w >= W and W % 2 == 0
    y = recombine16(ph[:, :, :W], pl_[:, :, :W])
    y = jnp.max(y.reshape(b, h2, W // 2, 2, c), axis=3)
    return split16(y) if out_planes else y


# ---------------------------------------------------------------------------
# Weight preparation (numpy, at params-build time)
# ---------------------------------------------------------------------------

def _split_pad_np(w32: np.ndarray):
    hi = (w32 >> 8).astype(np.int8)
    lo = ((w32 & 0xFF) - 128).astype(np.int8)
    return hi, lo


def _split_w_np(w32: np.ndarray):
    """Weight-plane split, balanced when representable.

    Balanced: w = 256*wh + wl with wh=(w+128)>>8, wl=w-256*wh, BOTH s8 —
    valid for w <= 32639 (w in [32640, 32767] forces wh=128). With the
    activation encoding x = 256*xh + (xl+128) the whole correction
    collapses to the static column constant 128*colsum(w): no per-row
    rsum reduce in the kernel (the dominant VPU cost at big K).
    Falls back to the offset encoding (hi, lo+128) when any weight is
    unrepresentable; returns (hi, lo, balanced).
    """
    if w32.max(initial=0) <= 32639:
        hi = ((w32 + 128) >> 8).astype(np.int8)
        lo = (w32 - 256 * hi.astype(np.int32)).astype(np.int8)
        return hi, lo, True
    hi, lo = _split_pad_np(w32)
    return hi, lo, False


def _nconst_np(w32, hi, lo, bal, kp, axis=0):
    """Static epilogue constant (mod 2^32) for either encoding."""
    if bal:
        return (128 * w32.sum(axis=axis, dtype=np.int64)).astype(np.int32)
    csum_hi = hi.sum(axis=axis, dtype=np.int64)
    csum_lo = lo.sum(axis=axis, dtype=np.int64)
    return ((csum_hi << 15) + (csum_lo << 7)
            + (128 * 128) * kp).astype(np.int32)


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
    if kp > 1024:
        kp = _round_up(kp, LANE)   # K will be lane-blocked: see tk pick
    np_ = np_ or max(_round_up(N, 64), LANE)
    tn = tn or _pick_tile(np_, 512, 64)
    wp = np.zeros((kp, np_), np.int32)
    wp[:K, :N] = w16.astype(np.int32)
    hi, lo, bal = _split_w_np(wp)
    blocks = []
    for j in range(np_ // tn):
        blocks.append(np.concatenate(
            [hi[:, j * tn:(j + 1) * tn], lo[:, j * tn:(j + 1) * tn]], axis=1))
    w2 = np.concatenate(blocks, axis=1)            # (kp, 2*np_)
    nconst = _nconst_np(wp, hi, lo, bal, kp, axis=0)
    bias = np.zeros(np_, np.int32)
    bias[:N] = bias_shifted.astype(np.int32)
    return {"w2": jnp.asarray(w2), "nconst": jnp.asarray(nconst),
            "bias": jnp.asarray(bias), "K": K, "Kp": kp, "N": N,
            "Np": np_, "tn": tn, "bal": bal}


import os as _os
_CONV_W_BUDGET = int(_os.environ.get("YOLO2_Q16_CONV_W_BUDGET",
                                     str(4 << 20)))
_FLAT_M_TARGET = int(_os.environ.get("YOLO2_Q16_FLAT_M", "8192"))


def wi_tn(H: int, W: int, cp: int, n: int, kh: int = 3,
          kw: int = 3) -> int | None:
    """Largest N-tile (>=128) that keeps the weight-resident (wi) conv
    path inside its VMEM budget for an (H, W, cp) layer — the 24*M1*tn
    accumulator term dominates, so big-spatial layers need tn=128 where
    the default weight-budget rule would pick 256+. None when even 128
    does not fit (caller lets prep_conv_weights pick; the abuf/banded
    path applies)."""
    np_ = max(_round_up(n, 64), LANE)
    W2a = _round_up(W + kw - 1, 8)
    M1 = H * W2a
    FL2 = (H + kh) * W2a
    K = kh * kw * cp
    budget = int(_os.environ.get("YOLO2_Q16_WI_BUDGET", str(13 << 20)))
    tn = _pick_tile(np_, 512, 64)
    while kh * kw * cp * 2 * tn > _CONV_W_BUDGET and tn > 128:
        tn //= 2
    while tn >= LANE:
        if np_ % tn == 0 and 4 * FL2 * cp + 4 * K * tn + 24 * M1 * tn \
                <= budget:
            return tn
        tn //= 2
    return None


def prep_conv_weights(w16_hwio: np.ndarray, bias_shifted: np.ndarray,
                      cp: int | None = None, tn: int | None = None,
                      vmem_budget: int | None = None,
                      tn_wi: int | None = None):
    """w16 (kh, kw, C, N) int16 -> dict for conv3x3_q16_requant.

    Layout (Np/tn, kh*kw*Cp, 2tn): block j holds every tap's [WH_j | WL_j],
    tap-major along sublanes. C pads to >=128 (consumer tensors are
    channel-padded to match); N pads to >=128.

    ``tn_wi`` is the weight-resident path's N-tile HINT: it is honored only
    when the wi path can actually run (balanced split AND YOLO2_Q16_WI
    enabled); otherwise the abuf/banded budget rule picks tn, so disabling
    wi at runtime never strands those kernels on a wi-sized tile.
    """
    kh, kw, C, N = w16_hwio.shape
    if vmem_budget is None:
        vmem_budget = _CONV_W_BUDGET
    cp = cp or max(_round_up(C, 8), LANE)
    np_ = max(_round_up(N, 64), LANE)
    wp = np.zeros((kh * kw, cp, np_), np.int32)
    wp[:, :C, :N] = w16_hwio.astype(np.int32).reshape(kh * kw, C, N)
    hi, lo, bal = _split_w_np(wp)
    wi_on = _os.environ.get("YOLO2_Q16_WI", "1") == "1"
    if tn is None and tn_wi is not None and bal and wi_on:
        tn = tn_wi
    if tn is None:
        tn = _pick_tile(np_, 512, 64)
        while kh * kw * cp * 2 * tn > vmem_budget and tn > 128:
            tn //= 2
    jblocks = []
    for j in range(np_ // tn):
        jb = np.concatenate([hi[:, :, j * tn:(j + 1) * tn],
                             lo[:, :, j * tn:(j + 1) * tn]], axis=2)
        jblocks.append(jb.reshape(kh * kw * cp, 2 * tn))
    w2 = np.stack(jblocks, axis=0)                 # (Np/tn, taps*Cp, 2tn)
    nconst = _nconst_np(wp, hi, lo, bal, kh * kw * cp, axis=(0, 1))
    bias = np.zeros(np_, np.int32)
    bias[:N] = bias_shifted.astype(np.int32)
    return {"w2": jnp.asarray(w2), "nconst": jnp.asarray(nconst),
            "bias": jnp.asarray(bias), "C": C, "Cp": cp, "N": N,
            "Np": np_, "tn": tn, "kh": kh, "kw": kw, "bal": bal}


def pack2(x: jnp.ndarray) -> jnp.ndarray:
    """Space-to-depth 2x2 into lanes: (B,H,W,C) -> (B,H/2,W/2,4C).

    Lane order is subposition-major, (a,b) row-major then channel — block
    (i,j) holds original pixels (2i+a, 2j+b). This is the layout the
    conv3x3p2 kernel consumes: with C in {32, 64} the packed channel count
    is an exact multiple of 128 lanes, so the early small-C convs stop
    wasting MXU columns on pad channels (the 2x2 spatial pack is the TPU
    space-to-depth stem trick, here applied mid-network)."""
    b, h, w, c = x.shape
    v = x.reshape(b, h // 2, 2, w // 2, 2, c)
    v = v.transpose(0, 1, 3, 2, 4, 5)
    return v.reshape(b, h // 2, w // 2, 4 * c)


def unpack2(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack2: (B,Hb,Wb,4C) -> (B,2Hb,2Wb,C)."""
    b, hb, wb, c4 = y.shape
    c = c4 // 4
    v = y.reshape(b, hb, wb, 2, 2, c)
    v = v.transpose(0, 1, 3, 2, 4, 5)
    return v.reshape(b, 2 * hb, 2 * wb, c)


def maxpool2x2_p2(y: jnp.ndarray) -> jnp.ndarray:
    """2x2/s2 darknet maxpool fused with unpacking: on a p2-packed tensor
    each block IS one pool window, so the pool is a max over the 4
    subposition lane groups. (B,Hb,Wb,4C) -> (B,Hb,Wb,C) flat at H/2."""
    b, hb, wb, c4 = y.shape
    c = c4 // 4
    return jnp.max(y.reshape(b, hb, wb, 4, c), axis=3)


def prep_conv_weights_p2(w16_hwio: np.ndarray, bias_shifted: np.ndarray):
    """w16 (3, 3, C, N) int16 -> dict for conv3x3p2_q16_requant.

    Requires 4C % 128 == 0 and N % 64 == 0 (so each subposition dot is
    lane-exact: K = 16C, dual-plane lanes = 2N >= 128).

    Per output subposition s=(a,b) the kernel contracts a 2x2 packed-block
    window (16C channels); weight row k = ((dy*2+dx)*4 + (p*2+q))*C + c maps
    to original tap (dr, dc) = (a+2*dy+p-2, b+2*dx+q-2); taps outside the
    3x3 stencil carry encoded zeros (hi=0, lo=-128), which the multi-word
    identity cancels exactly for ANY activation value."""
    kh, kw, C, N = w16_hwio.shape
    assert (kh, kw) == (3, 3)
    assert (4 * C) % LANE == 0, f"pack2 needs 4C%128==0, C={C}"
    assert N % 64 == 0, f"pack2 needs N%64==0, N={N}"
    K = 16 * C
    w4 = np.zeros((4, K, N), np.int32)
    for a in range(2):
        for b in range(2):
            s = a * 2 + b
            for dy in range(2):
                for dx in range(2):
                    for p in range(2):
                        for q in range(2):
                            dr = a + 2 * dy + p - 2
                            dc = b + 2 * dx + q - 2
                            if -1 <= dr <= 1 and -1 <= dc <= 1:
                                k0 = ((dy * 2 + dx) * 4 + (p * 2 + q)) * C
                                w4[s, k0:k0 + C, :] = \
                                    w16_hwio[dr + 1, dc + 1].astype(np.int32)
    hi, lo, bal = _split_w_np(w4)
    w2 = np.concatenate([hi, lo], axis=2)          # (4, K, 2N)
    nconst = _nconst_np(w4, hi, lo, bal, K, axis=1)  # (4, N)
    bias = bias_shifted.astype(np.int32)
    return {"w2": jnp.asarray(w2), "nconst": jnp.asarray(nconst),
            "bias": jnp.asarray(bias), "C": C, "N": N, "K": K, "bal": bal}


def prep_matmul_weights_pairs(w16_hwio: np.ndarray,
                              bias_shifted: np.ndarray):
    """w16 (3, 3, C, N) int16 -> dict for the column-pair-packed entry conv.

    The entry conv (C=3) cannot usefully pad channels; instead each matmul
    row computes a PAIR of horizontally adjacent output pixels from a 3x4
    patch window (K = 12C), so the dual-plane lane width is 2*(2N) — full
    128 lanes at N=32 instead of 4x pad waste. Patch row k = (dy*4+dxi)*C+c
    maps to padded input (dy, dxi); output sub-column s' uses taps with
    dc = dxi-1-s' in {-1,0,1}; others carry encoded zeros."""
    kh, kw, C, N = w16_hwio.shape
    assert (kh, kw) == (3, 3)
    assert (2 * N) % 32 == 0
    K = 12 * C
    w32 = np.zeros((K, 2 * N), np.int32)
    for dy in range(3):
        for dxi in range(4):
            k0 = (dy * 4 + dxi) * C
            for sp in range(2):
                dc = dxi - 1 - sp
                if -1 <= dc <= 1:
                    w32[k0:k0 + C, sp * N:(sp + 1) * N] = \
                        w16_hwio[dy, dc + 1].astype(np.int32)
    kp = _round_up(K, 8)
    wpad = np.zeros((kp, 2 * N), np.int32)
    wpad[:K] = w32
    hi, lo = _split_pad_np(wpad)
    w2 = np.concatenate([hi, lo], axis=1)          # (kp, 4N)
    csum_hi = hi.sum(axis=0, dtype=np.int64)
    csum_lo = lo.sum(axis=0, dtype=np.int64)
    nconst = ((csum_hi << 15) + (csum_lo << 7)
              + (128 * 128) * kp).astype(np.int32)
    bias2 = np.tile(bias_shifted.astype(np.int32), 2)
    return {"w2": jnp.asarray(w2), "nconst": jnp.asarray(nconst),
            "bias": jnp.asarray(bias2), "K": K, "Kp": kp,
            "N": 2 * N, "Np": 2 * N, "tn": 2 * N}


def _conv_p2_kernel(xh_hbm, xl_hbm, w_ref, nconst_ref, bias_ref, o_ref,
                    xh_s, xl_s, ah, al, ystore, sems, *,
                    th, Wb, C4, N, shift_out, leaky, bal):
    b = pl.program_id(0)
    i = pl.program_id(1)
    c1 = pltpu.make_async_copy(xh_hbm.at[b, pl.ds(i * th, th + 2)],
                               xh_s, sems.at[0])
    c2 = pltpu.make_async_copy(xl_hbm.at[b, pl.ds(i * th, th + 2)],
                               xl_s, sems.at[1])
    c1.start()
    c2.start()
    c1.wait()
    c2.wait()

    M = th * Wb
    for s in range(4):
        a, bb = s // 2, s % 2
        for dy in range(2):
            for dx in range(2):
                t = dy * 2 + dx
                ah[:, t * C4:(t + 1) * C4] = \
                    xh_s[a + dy:a + dy + th, bb + dx:bb + dx + Wb, :] \
                    .reshape(M, C4)
                al[:, t * C4:(t + 1) * C4] = \
                    xl_s[a + dy:a + dy + th, bb + dx:bb + dx + Wb, :] \
                    .reshape(M, C4)
        w2 = w_ref[s]
        acch = jnp.dot(ah[:], w2, preferred_element_type=jnp.int32)
        accl = jnp.dot(al[:], w2, preferred_element_type=jnp.int32)
        if bal:
            rsum = None
        else:
            rsum = ((jnp.sum(ah[:].astype(jnp.int32), axis=1,
                             keepdims=True) << 8)
                    + jnp.sum(al[:].astype(jnp.int32), axis=1,
                              keepdims=True))
        acc = _recombine(acch, accl, rsum, nconst_ref[s], N)
        ystore[:, s * N:(s + 1) * N] = _requant(acc, bias_ref[:], shift_out,
                                                leaky)
    o_ref[0] = ystore[:]


def conv3x3p2_q16_requant(x: jnp.ndarray, wp: dict, shift_out: int,
                          leaky: bool, th: int | None = None,
                          interpret: bool | None = None) -> jnp.ndarray:
    """SAME 3x3/s1 conv on a p2-packed tensor, exact int16 requant.

    x (B, Hb, Wb, 4C) int16 p2-packed (see pack2) -> (B, Hb, Wb, 4N)
    p2-packed. Each subposition contracts K = 16C fully-resident channels
    (9C useful -> 56% vs 12.5-25% for lane-padding small C), with all
    loads/dots lane-exact. Output subposition stores are 2N-lane aligned
    for N >= 64 (N == 64 writes half lane-tiles, a small penalty)."""
    if interpret is None:
        interpret = _interpret_default()
    B, Hb, Wb, C4 = x.shape
    C, N, K = wp["C"], wp["N"], wp["K"]
    assert C4 == 4 * C, (C4, C)
    if th is None:
        # VMEM: band 2*(th+2)*(Wb+2)*C4 + abuf 2*th*Wb*K + acc 8*th*Wb*2N
        th = max(1, min(Hb, (5 << 20) // (2 * Wb * K + 16 * Wb * N)))
        while Hb % th:
            th -= 1
    pad_w = (-(Wb + 2)) % 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + pad_w), (0, 0)))
    xh, xl = split16(xp)
    M = th * Wb
    nbands = Hb // th

    out = pl.pallas_call(
        functools.partial(_conv_p2_kernel, th=th, Wb=Wb, C4=C4, N=N,
                          shift_out=shift_out, leaky=leaky,
                          bal=wp.get("bal", False)),
        grid=(B, nbands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, K, 2 * N), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N,), lambda b, i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, 4 * N), lambda b, i: (b * nbands + i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nbands, M, 4 * N), jnp.int16),
        scratch_shapes=[
            pltpu.VMEM((th + 2, Wb + 2 + pad_w, C4), jnp.int8),
            pltpu.VMEM((th + 2, Wb + 2 + pad_w, C4), jnp.int8),
            pltpu.VMEM((M, K), jnp.int8),
            pltpu.VMEM((M, K), jnp.int8),
            pltpu.VMEM((M, 4 * N), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xh, xl, wp["w2"], wp["nconst"], wp["bias"])
    return out.reshape(B, Hb, Wb, 4 * N)


def _convf_prologue(xh_hbm, xl_hbm, xh_s, xl_s, ah, al, rsum, sems,
                    b, i, j, *, G, th, W2a, Cp, kh, kw, bal):
    """Shared flat-band load + im2col (runs once per (b, i) at j == 0)."""
    M1 = th * W2a
    FLb = (th + kh - 1) * W2a

    @pl.when(j == 0)
    def _load():
        # dst is a leading slice: the scratch carries kw-1 extra (rounded)
        # rows so the largest tap offset dy*W2a+dx stays in bounds; the
        # tail is uninitialized and only feeds discarded garbage columns
        if G > 1:
            src_h = xh_hbm.at[pl.ds(b * G, G)]
            src_l = xl_hbm.at[pl.ds(b * G, G)]
            dst_h = xh_s.at[:, pl.ds(0, FLb)]
            dst_l = xl_s.at[:, pl.ds(0, FLb)]
        else:
            src_h = xh_hbm.at[b, pl.ds(i * M1, FLb)]
            src_l = xl_hbm.at[b, pl.ds(i * M1, FLb)]
            dst_h = xh_s.at[pl.ds(0, FLb)]
            dst_l = xl_s.at[pl.ds(0, FLb)]
        c1 = pltpu.make_async_copy(src_h, dst_h, sems.at[0])
        c2 = pltpu.make_async_copy(src_l, dst_l, sems.at[1])
        c1.start()
        c2.start()
        c1.wait()
        c2.wait()
        # one shared im2col: every tap of the flattened (rows*W2a) band is a
        # CONTIGUOUS sublane slice at offset dy*W2a+dx — no ragged per-row
        # copies (the previous kernel's dominant cost); wrap-around columns
        # compute garbage that the caller slices off
        for g in range(G):
            for dy in range(kh):
                for dx in range(kw):
                    t = dy * kw + dx
                    off = dy * W2a + dx
                    if G > 1:
                        s_h = xh_s[g, off:off + M1]
                        s_l = xl_s[g, off:off + M1]
                    else:
                        s_h = xh_s[off:off + M1]
                        s_l = xl_s[off:off + M1]
                    ah[g * M1:(g + 1) * M1, t * Cp:(t + 1) * Cp] = s_h
                    al[g * M1:(g + 1) * M1, t * Cp:(t + 1) * Cp] = s_l
        if not bal:
            rsum[:] = ((jnp.sum(ah[:].astype(jnp.int32), axis=1,
                                keepdims=True) << 8)
                       + jnp.sum(al[:].astype(jnp.int32), axis=1,
                                 keepdims=True))


def _convf_kernel(xh_hbm, xl_hbm, w_ref, nc_ref, b_ref, o_ref,
                  xh_s, xl_s, ah, al, rsum, sems, *,
                  G, th, W2a, Cp, tn, kh, kw, shift_out, leaky, bal):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    _convf_prologue(xh_hbm, xl_hbm, xh_s, xl_s, ah, al, rsum, sems,
                    b, i, j, G=G, th=th, W2a=W2a, Cp=Cp, kh=kh, kw=kw,
                    bal=bal)
    w2 = w_ref[0]
    acch = jnp.dot(ah[:], w2, preferred_element_type=jnp.int32)
    accl = jnp.dot(al[:], w2, preferred_element_type=jnp.int32)
    acc = _recombine(acch, accl, None if bal else rsum[:],
                     nc_ref[0, 0], tn)
    o_ref[0] = _requant(acc, b_ref[0, 0], shift_out, leaky)


def _convf_kernel_pl(xh_hbm, xl_hbm, w_ref, nc_ref, b_ref, oh_ref, ol_ref,
                     xh_s, xl_s, ah, al, rsum, sems, *,
                     G, th, W2a, Cp, tn, kh, kw, shift_out, leaky, bal,
                     vpool):
    """Flat-band conv emitting (hi, lo) s8 PLANES; with ``vpool`` the
    vertical half of a following 2x2/s2 darknet maxpool is folded into
    the epilogue (row-pair max on the pre-cast int32 requant values —
    legal because max commutes with the monotone requant chain and int16
    max would not legalize in Mosaic anyway)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    _convf_prologue(xh_hbm, xl_hbm, xh_s, xl_s, ah, al, rsum, sems,
                    b, i, j, G=G, th=th, W2a=W2a, Cp=Cp, kh=kh, kw=kw,
                    bal=bal)
    w2 = w_ref[0]
    acch = jnp.dot(ah[:], w2, preferred_element_type=jnp.int32)
    accl = jnp.dot(al[:], w2, preferred_element_type=jnp.int32)
    acc = _recombine(acch, accl, None if bal else rsum[:],
                     nc_ref[0, 0], tn)
    v32 = _requant32(acc, b_ref[0, 0], shift_out, leaky)
    if not vpool:
        hi, lo = _split32(v32)
        oh_ref[0] = hi
        ol_ref[0] = lo
        return
    # vertical pool: rows r/r+1 of one image are adjacent W2a-blocks of
    # the flat rows (G-grouped images stack their rows contiguously)
    rows = th
    for g in range(G):
        base = g * rows * W2a
        obase = g * (rows // 2) * W2a
        for a in range(rows // 2):
            vmax = jnp.maximum(
                v32[base + (2 * a) * W2a:base + (2 * a + 1) * W2a],
                v32[base + (2 * a + 1) * W2a:base + (2 * a + 2) * W2a])
            hi, lo = _split32(vmax)
            oh_ref[0, obase + a * W2a:obase + (a + 1) * W2a] = hi
            ol_ref[0, obase + a * W2a:obase + (a + 1) * W2a] = lo


def _convw_body(xh_ref, xl_ref, w2, nc, *, M1, W2a, Cp, tn, kh, kw):
    """Implicit-im2col accumulation: every tap (dy, dx) of the flattened
    whole-image band is a CONTIGUOUS sublane slice at offset dy*W2a+dx,
    fed to the MXU directly — no materialized (M1, K) patch buffer. That
    buffer (2*M1*K bytes) was THE VMEM limiter of the abuf kernel; without
    it the N-tile loop can be the MAJOR grid dim (weight tile resident
    across all images) while the image bands pipeline via BlockSpec.
    Balanced weight encoding only (no rsum reduce)."""
    acch = accl = None
    for dy in range(kh):
        for dx in range(kw):
            off = dy * W2a + dx
            t = dy * kw + dx
            wt = w2[t * Cp:(t + 1) * Cp]
            ph = jnp.dot(xh_ref[0, off:off + M1], wt,
                         preferred_element_type=jnp.int32)
            pl2 = jnp.dot(xl_ref[0, off:off + M1], wt,
                          preferred_element_type=jnp.int32)
            acch = ph if acch is None else acch + ph
            accl = pl2 if accl is None else accl + pl2
    return _recombine(acch, accl, None, nc, tn)


def _convw_kernel(xh_ref, xl_ref, w_ref, nc_ref, b_ref, o_ref, *,
                  M1, W2a, Cp, tn, kh, kw, shift_out, leaky):
    acc = _convw_body(xh_ref, xl_ref, w_ref[0], nc_ref[0, 0],
                      M1=M1, W2a=W2a, Cp=Cp, tn=tn, kh=kh, kw=kw)
    o_ref[0] = _requant(acc, b_ref[0, 0], shift_out, leaky)


def _convw_kernel_pl(xh_ref, xl_ref, w_ref, nc_ref, b_ref, oh_ref, ol_ref,
                     *, M1, W2a, Cp, tn, kh, kw, shift_out, leaky, vpool):
    acc = _convw_body(xh_ref, xl_ref, w_ref[0], nc_ref[0, 0],
                      M1=M1, W2a=W2a, Cp=Cp, tn=tn, kh=kh, kw=kw)
    v32 = _requant32(acc, b_ref[0, 0], shift_out, leaky)
    if not vpool:
        hi, lo = _split32(v32)
        oh_ref[0] = hi
        ol_ref[0] = lo
        return
    rows = M1 // W2a
    for a in range(rows // 2):
        vmax = jnp.maximum(v32[(2 * a) * W2a:(2 * a + 1) * W2a],
                           v32[(2 * a + 1) * W2a:(2 * a + 2) * W2a])
        hi, lo = _split32(vmax)
        oh_ref[0, a * W2a:(a + 1) * W2a] = hi
        ol_ref[0, a * W2a:(a + 1) * W2a] = lo


def _flat_geometry(B: int, H: int, W: int, Cp: int, K: int, tn: int,
                   kh: int, budget: int = 11 << 20):
    """Pick (G, th, nbands, W2a, Hp) for conv3x3_q16_flat.

    Cost model counts scratch (band planes, abuf, rsum), the weight tile,
    the int16 out block, AND the two (M, 2tn) int32 dot results that live
    on the Mosaic stack (the dominant hidden term — the 16 MB scoped-vmem
    limit includes them).

    Banded DMA starts index the flat (tiled) dim, so bands require
    th*W2a % 32 == 0 (int8 sublane tiling); whole-image programs slice
    only the untiled batch dim and carry no such constraint."""
    W2a8 = _round_up(W + kh - 1, 8)

    def vmem(g, t, w2a):
        m1 = t * w2a
        return (2 * g * (t + kh - 1) * w2a * Cp + 2 * g * m1 * K
                + 4 * g * m1 + 2 * K * tn + 2 * g * m1 * tn
                + 16 * g * m1 * tn)

    # whole image per program (any H), grouping G images when small
    # (YOLO2_Q16_FLAT_M targets rows/program for the grouped dots)
    if vmem(1, H, W2a8) <= budget:
        G = max(1, min(B, _FLAT_M_TARGET // max(1, H * W2a8)))
        while B % G or (G > 1 and vmem(G, H, W2a8) > budget):
            G -= 1
        return G, H, 1, W2a8, H
    # banded: widest legal band wins; a 32-aligned row width unlocks
    # th values an 8-aligned width cannot express
    best = None
    for w2a in dict.fromkeys((W2a8, _round_up(W + kh - 1, 32))):
        for t in range(min(H, 4096 // w2a), 0, -1):
            if H % t or (t * w2a) % 32 or vmem(1, t, w2a) > budget:
                continue
            if best is None or t > best[0]:
                best = (t, w2a)
            break
    if best is None:
        return None              # no legal banding; caller falls back
    th, w2a = best
    return 1, th, H // th, w2a, H


def conv3x3_q16_flat(x, wp: dict, shift_out: int,
                     leaky: bool, interpret: bool | None = None,
                     out_mode: str = "i16"):
    """Flat-band SAME 3x3/s1 conv, exact int16 requant (fast path).

    Same contract and wp dict as conv3x3_q16_requant (returns padded-Np
    channels). Returns None when no legal flat geometry exists so the
    caller can fall back to the banded kernel.

    Plane flow (round 3): ``x`` may be an (hi, lo) s8 plane pair instead
    of an int16 tensor (skips the XLA-side split16 pass), and ``out_mode``
    selects the output form:
      "i16"          — int16 tensor (legacy)
      "planes"       — (hi, lo) s8 pair (consumer kernels skip their split)
      "planes_vpool" — (hi, lo) pair with the VERTICAL half of a following
                       darknet 2x2/s2 maxpool folded into the epilogue
                       (rows halved; finish with hpool2_planes)
    """
    if interpret is None:
        interpret = _interpret_default()
    planes_in = isinstance(x, (tuple, list))
    B, H, W, C = (x[0] if planes_in else x).shape
    kh, kw = wp["kh"], wp["kw"]
    Cp, np_, tn = wp["Cp"], wp["Np"], wp["tn"]
    assert C in (wp["C"], Cp), (C, wp["C"], Cp)
    if Cp % LANE:
        return None
    vpool = out_mode == "planes_vpool"
    if C != Cp:
        if planes_in:
            x = pad_planes(x, [(0, 0)] * 3 + [(0, Cp - C)])
        else:
            x = pad_channels(x, Cp)
    K = kh * kw * Cp

    # weight-resident implicit-im2col path (whole-image geometries): the
    # N-tile loop is the MAJOR grid dim so each weight tile streams from
    # HBM ONCE per step instead of B/G times (the abuf kernel re-streams
    # the 13x13 block's full weight set per image: ~10 GB/step at B=128);
    # image bands pipeline as plain BlockSpec blocks (no manual DMA).
    # Feasibility is judged on the WI path's OWN vmem need (no abuf, so
    # geometries the abuf model must band — e.g. 52x52 at tn=128 — still
    # qualify as whole-image here).
    if (_os.environ.get("YOLO2_Q16_WI", "1") == "1"
            and wp.get("bal") and not (vpool and H % 2)):
        W2a = _round_up(W + kw - 1, 8)
        FL2 = (H + kh) * W2a
        budget = int(_os.environ.get("YOLO2_Q16_WI_BUDGET",
                                     str(13 << 20)))

        def wi_need(t):
            return 4 * (t + kh) * W2a * Cp + 4 * K * tn + 24 * t * W2a * tn

        # band rows: whole image when it fits; else the largest divisor
        # of H (even under vpool) whose accumulator block fits — bands
        # stack into the batch dim (overlap kh rows, materialized once)
        th = None
        for t in sorted({d for d in range(1, H + 1) if H % d == 0},
                        reverse=True):
            if vpool and t % 2:
                continue
            if wi_need(t) <= budget:
                th = t
                break
        if th is not None and th >= 8:
            M1 = th * W2a
            nb = H // th
            pad2 = ((0, 0), (1, kh - 1), (1, W2a - W - 1), (0, 0))
            if planes_in:
                xh, xl = pad_planes(x, pad2)
            else:
                xh, xl = split16(jnp.pad(x, pad2))
            xh = xh.reshape(B, FL2, Cp)
            xl = xl.reshape(B, FL2, Cp)
            if nb > 1:
                FL2b = (th + kh) * W2a

                def bands(v):
                    vb = jnp.stack(
                        [v[:, i * M1:i * M1 + FL2b] for i in range(nb)],
                        axis=1)
                    return vb.reshape(B * nb, FL2b, Cp)
                xh, xl = bands(xh), bands(xl)
                FL2 = FL2b
            Bk = B * nb
            nj = np_ // tn
            wi_common = dict(M1=M1, W2a=W2a, Cp=Cp, tn=tn, kh=kh, kw=kw,
                             shift_out=shift_out, leaky=leaky)
            bspec = pl.BlockSpec((1, FL2, Cp), lambda j, b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
            wspec = lambda shp: pl.BlockSpec(shp, lambda j, b: (j, 0, 0),
                                             memory_space=pltpu.VMEM)
            wi_in = [bspec, bspec, wspec((1, K, 2 * tn)),
                     wspec((1, 1, tn)), wspec((1, 1, tn))]
            wi_grid = (nj, Bk)
            wi_args = (xh, xl, wp["w2"], wp["nconst"].reshape(nj, 1, tn),
                       wp["bias"].reshape(nj, 1, tn))
            if out_mode == "i16":
                out = pl.pallas_call(
                    functools.partial(_convw_kernel, **wi_common),
                    grid=wi_grid, in_specs=wi_in,
                    out_specs=pl.BlockSpec((1, M1, tn),
                                           lambda j, b: (b, 0, j),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((Bk, M1, np_),
                                                   jnp.int16),
                    interpret=interpret)(*wi_args)
                return out.reshape(B, H, W2a, np_)[:, :, :W]
            Mo = M1 // (2 if vpool else 1)
            ospec = pl.BlockSpec((1, Mo, tn), lambda j, b: (b, 0, j),
                                 memory_space=pltpu.VMEM)
            oshape = jax.ShapeDtypeStruct((Bk, Mo, np_), jnp.int8)
            oh, ol = pl.pallas_call(
                functools.partial(_convw_kernel_pl, vpool=vpool,
                                  **wi_common),
                grid=wi_grid, in_specs=wi_in,
                out_specs=(ospec, ospec), out_shape=(oshape, oshape),
                interpret=interpret)(*wi_args)
            Ho = H // 2 if vpool else H
            oh = oh.reshape(B, Ho, W2a, np_)
            ol = ol.reshape(B, Ho, W2a, np_)
            if vpool:
                return oh, ol        # garbage cols; hpool2_planes crops
            return oh[:, :, :W], ol[:, :, :W]

    geo = _flat_geometry(B, H, W, Cp, K, tn, kh)
    if geo is None:
        return None
    G, th, nbands, W2a, Hp = geo
    if vpool and (H % 2 or th % 2):
        return None                  # caller falls back to unfused pool
    M1 = th * W2a

    pad_spec = ((0, 0), (1, 1 + (Hp - H) + (kh - 3)),
                (1, W2a - W - 1), (0, 0))
    if planes_in:
        xh, xl = pad_planes(x, pad_spec)
    else:
        xh, xl = split16(jnp.pad(x, pad_spec))
    FL = (Hp + kh - 1) * W2a
    xh = xh.reshape(B, FL, Cp)
    xl = xl.reshape(B, FL, Cp)

    FLs = _round_up((th + kh - 1) * W2a + kw - 1, 8)
    if G > 1:
        xs_shape = (G, FLs, Cp)
    else:
        xs_shape = (FLs, Cp)
    common = dict(G=G, th=th, W2a=W2a, Cp=Cp, tn=tn, kh=kh, kw=kw,
                  shift_out=shift_out, leaky=leaky,
                  bal=wp.get("bal", False))
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, K, 2 * tn), lambda b, i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tn), lambda b, i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tn), lambda b, i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM(xs_shape, jnp.int8),
        pltpu.VMEM(xs_shape, jnp.int8),
        pltpu.VMEM((G * M1, K), jnp.int8),
        pltpu.VMEM((G * M1, K), jnp.int8),
        pltpu.VMEM((G * M1, 1), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    grid = (B // G, nbands, np_ // tn)
    args = (xh, xl, wp["w2"], wp["nconst"].reshape(np_ // tn, 1, tn),
            wp["bias"].reshape(np_ // tn, 1, tn))
    if out_mode == "i16":
        out = pl.pallas_call(
            functools.partial(_convf_kernel, **common),
            grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((1, G * M1, tn),
                                   lambda b, i, j: (b * nbands + i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(((B // G) * nbands, G * M1, np_),
                                           jnp.int16),
            scratch_shapes=scratch, interpret=interpret)(*args)
        if G > 1:
            out = out.reshape(B, th, W2a, np_)
        else:
            out = out.reshape(B, nbands * th, W2a, np_)
        return out[:, :H, :W]

    Mo = G * M1 // (2 if vpool else 1)
    ospec = pl.BlockSpec((1, Mo, tn), lambda b, i, j: (b * nbands + i, 0, j),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct(((B // G) * nbands, Mo, np_), jnp.int8)
    oh, ol = pl.pallas_call(
        functools.partial(_convf_kernel_pl, vpool=vpool, **common),
        grid=grid, in_specs=in_specs,
        out_specs=(ospec, ospec), out_shape=(oshape, oshape),
        scratch_shapes=scratch, interpret=interpret)(*args)
    Ho = H // 2 if vpool else H
    if G > 1:
        oh = oh.reshape(B, th // 2 if vpool else th, W2a, np_)
        ol = ol.reshape(B, th // 2 if vpool else th, W2a, np_)
    else:
        oh = oh.reshape(B, -1, W2a, np_)
        ol = ol.reshape(B, -1, W2a, np_)
    if vpool:
        # garbage cols remain (hpool2_planes crops to W)
        return oh[:, :Ho], ol[:, :Ho]
    return oh[:, :H, :W], ol[:, :H, :W]


# ---------------------------------------------------------------------------
# w8a16 tier: weight-resident 3x3 conv with SINGLE s8 weight plane
# ---------------------------------------------------------------------------

def prep_conv_weights_w8(w8_hwio: np.ndarray, bias_shifted: np.ndarray,
                         shift_out, cp: int | None = None,
                         tn: int | None = None):
    """w8 (kh, kw, C, N) int8 -> dict for conv3x3_w8a16_wi.

    The w8a16 analog of prep_conv_weights with HALF the weight bytes: one
    s8 plane instead of the dec2 [WH | WL] pair, so every tap dot is width
    tn (not 2tn) — the kernel's MXU work halves against the exact-int16
    conv3 kernels. ``shift_out`` is the per-output-channel requant shift
    vector (or a scalar, broadcast), baked into the pack because the
    kernel applies it as a lane vector.
    """
    kh, kw, C, N = w8_hwio.shape
    cp = cp or max(_round_up(C, 8), LANE)
    np_ = max(_round_up(N, 64), LANE)
    wp = np.zeros((kh * kw, cp, np_), np.int8)
    wp[:, :C, :N] = w8_hwio.reshape(kh * kw, C, N)
    if tn is None:
        tn = _pick_tile(np_, 512, 64)
        while kh * kw * cp * tn > _CONV_W_BUDGET and tn > 128:
            tn //= 2
    jblocks = [wp[:, :, j * tn:(j + 1) * tn].reshape(kh * kw * cp, tn)
               for j in range(np_ // tn)]
    w1 = np.stack(jblocks, axis=0)                 # (Np/tn, taps*Cp, tn)
    # lo-plane +128 offset correction: 128 * sum over taps x channels
    # (padded channels carry weight 0 and contribute nothing)
    nconst = ((128 * wp.astype(np.int64).sum(axis=(0, 1)))
              & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    bias = np.zeros(np_, np.int32)
    bias[:N] = bias_shifted.astype(np.int32)
    shifts = np.zeros(np_, np.int32)
    shifts[:N] = np.asarray(shift_out, np.int32)
    return {"w1": jnp.asarray(w1), "nconst": jnp.asarray(nconst),
            "bias": jnp.asarray(bias), "shifts": jnp.asarray(shifts),
            "C": C, "Cp": cp, "N": N, "Np": np_, "tn": tn,
            "kh": kh, "kw": kw}


def _convw_s8_kernel(x_ref, w_ref, b_ref, s_ref, o_ref, *,
                     M1, W2a, Cp, tn, kh, kw, leaky):
    """w8a8 weight-resident body: plain s8 activations need no plane
    split and no offset correction — ONE width-tn dot per tap (half the
    w8a16 kernel, a quarter of the exact-int16 kernels)."""
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            off = dy * W2a + dx
            t = dy * kw + dx
            wt = w_ref[0][t * Cp:(t + 1) * Cp]
            p = jnp.dot(x_ref[0, off:off + M1], wt,
                        preferred_element_type=jnp.int32)
            acc = p if acc is None else acc + p
    s = s_ref[0, 0][None, :]
    spos = jnp.clip(s, 0, 30)
    half = jnp.where(s > 0,
                     jnp.left_shift(jnp.int32(1), jnp.maximum(spos - 1, 0)),
                     0)
    acc = jnp.where(s > 0, (acc + half) >> spos, acc << jnp.clip(-s, 0, 30))
    v = jnp.clip(acc + b_ref[0, 0][None, :], -128, 127)
    if leaky:
        v = jnp.clip(jnp.where(v < 0, -((-v) // 10), v), -128, 127)
    o_ref[0] = v.astype(jnp.int8)


def conv3x3_s8_wi(x: jnp.ndarray, wp: dict, leaky: bool,
                  interpret: bool | None = None):
    """Weight-resident SAME 3x3/s1 conv for the w8a8 tier: s8 activations
    x the single s8 weight plane of prep_conv_weights_w8 (its ``nconst``
    is unused here — plain s8 zero-padding needs no correction).

    Returns int8 (B, H, W, Np) padded-channel output, or None when no
    band geometry fits (caller falls back to the XLA s8 conv)."""
    if interpret is None:
        interpret = _interpret_default()
    B, H, W, C = x.shape
    kh, kw = wp["kh"], wp["kw"]
    Cp, np_, tn = wp["Cp"], wp["Np"], wp["tn"]
    assert C in (wp["C"], Cp), (C, wp["C"], Cp)
    if Cp % LANE:
        return None
    if C != Cp:
        x = pad_channels(x, Cp)
    K = kh * kw * Cp
    W2a = _round_up(W + kw - 1, 8)
    FL2 = (H + kh) * W2a
    budget = int(_os.environ.get("YOLO2_Q16_WI_BUDGET", str(13 << 20)))

    def wi_need(t):
        # one s8 band + s8 weight tile + one int32 dot block + s8 out
        return (t + kh) * W2a * Cp + K * tn + 14 * t * W2a * tn

    th = None
    for t in sorted({d for d in range(1, H + 1) if H % d == 0},
                    reverse=True):
        if wi_need(t) <= budget:
            th = t
            break
    if th is None or th < 8:
        return None
    M1 = th * W2a
    nb = H // th
    pad2 = ((0, 0), (1, kh - 1), (1, W2a - W - 1), (0, 0))
    xq = jnp.pad(x, pad2).reshape(B, FL2, Cp)
    if nb > 1:
        FL2b = (th + kh) * W2a
        xq = jnp.stack([xq[:, i * M1:i * M1 + FL2b] for i in range(nb)],
                       axis=1).reshape(B * nb, FL2b, Cp)
        FL2 = FL2b
    Bk = B * nb
    nj = np_ // tn
    bspec = pl.BlockSpec((1, FL2, Cp), lambda j, b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = lambda shp: pl.BlockSpec(shp, lambda j, b: (j, 0, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_convw_s8_kernel, M1=M1, W2a=W2a, Cp=Cp, tn=tn,
                          kh=kh, kw=kw, leaky=leaky),
        grid=(nj, Bk),
        in_specs=[bspec, wspec((1, K, tn)), wspec((1, 1, tn)),
                  wspec((1, 1, tn))],
        out_specs=pl.BlockSpec((1, M1, tn), lambda j, b: (b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bk, M1, np_), jnp.int8),
        interpret=interpret)(
            xq, wp["w1"], wp["bias"].reshape(nj, 1, tn),
            wp["shifts"].reshape(nj, 1, tn))
    return out.reshape(B, H, W2a, np_)[:, :, :W]


def _convw_w8_kernel(xh_ref, xl_ref, w_ref, nc_ref, b_ref, s_ref, o_ref, *,
                     M1, W2a, Cp, tn, kh, kw, leaky):
    """Implicit-im2col w8a16 body: per tap TWO width-tn s8 dots (hi, lo
    planes x the single weight plane), then acc = (ah<<8) + al + nconst
    and the per-channel requant epilogue — all int32 (Mosaic-legal)."""
    acch = accl = None
    for dy in range(kh):
        for dx in range(kw):
            off = dy * W2a + dx
            t = dy * kw + dx
            wt = w_ref[0][t * Cp:(t + 1) * Cp]
            ph = jnp.dot(xh_ref[0, off:off + M1], wt,
                         preferred_element_type=jnp.int32)
            pl2 = jnp.dot(xl_ref[0, off:off + M1], wt,
                          preferred_element_type=jnp.int32)
            acch = ph if acch is None else acch + ph
            accl = pl2 if accl is None else accl + pl2
    acc = (acch << 8) + accl + nc_ref[0, 0][None, :]
    s = s_ref[0, 0][None, :]
    spos = jnp.clip(s, 0, 30)
    half = jnp.where(s > 0,
                     jnp.left_shift(jnp.int32(1), jnp.maximum(spos - 1, 0)),
                     0)
    acc = jnp.where(s > 0, (acc + half) >> spos, acc << jnp.clip(-s, 0, 30))
    v = jnp.clip(acc + b_ref[0, 0][None, :], -32768, 32767)
    if leaky:
        v = jnp.clip(jnp.where(v < 0, -((-v) // 10), v), -32768, 32767)
    o_ref[0] = v.astype(jnp.int16)


def conv3x3_w8a16_wi(x, wp: dict, leaky: bool,
                     interpret: bool | None = None):
    """Weight-resident SAME 3x3/s1 w8a16 conv (whole-image / band-stacked
    geometry — the shape class where the weight-resident int16 kernels won
    round 3's big-split config, at half their MXU and weight-byte cost).

    ``x``: int16 NHWC (exact or padded channels) or an (hi, lo) s8 plane
    pair. Returns int16 (B, H, W, Np) with PADDED output channels (caller
    slices to N), or None when no band geometry fits the VMEM budget so
    the caller can fall back to the XLA plane-stacked conv.
    """
    if interpret is None:
        interpret = _interpret_default()
    planes_in = isinstance(x, (tuple, list))
    B, H, W, C = (x[0] if planes_in else x).shape
    kh, kw = wp["kh"], wp["kw"]
    Cp, np_, tn = wp["Cp"], wp["Np"], wp["tn"]
    assert C in (wp["C"], Cp), (C, wp["C"], Cp)
    if Cp % LANE:
        return None
    if C != Cp:
        if planes_in:
            x = pad_planes(x, [(0, 0)] * 3 + [(0, Cp - C)])
        else:
            x = pad_channels(x, Cp)
    K = kh * kw * Cp
    W2a = _round_up(W + kw - 1, 8)
    FL2 = (H + kh) * W2a
    budget = int(_os.environ.get("YOLO2_Q16_WI_BUDGET", str(13 << 20)))

    def wi_need(t):
        # s8 band planes + the single s8 weight tile + int32 dot pair and
        # epilogue blocks (Mosaic stack) + the int16 out block
        return 2 * (t + kh) * W2a * Cp + K * tn + 22 * t * W2a * tn

    th = None
    for t in sorted({d for d in range(1, H + 1) if H % d == 0},
                    reverse=True):
        if wi_need(t) <= budget:
            th = t
            break
    if th is None or th < 8:
        return None
    M1 = th * W2a
    nb = H // th
    pad2 = ((0, 0), (1, kh - 1), (1, W2a - W - 1), (0, 0))
    if planes_in:
        xh, xl = pad_planes(x, pad2)
    else:
        xh, xl = split16(jnp.pad(x, pad2))
    xh = xh.reshape(B, FL2, Cp)
    xl = xl.reshape(B, FL2, Cp)
    if nb > 1:
        FL2b = (th + kh) * W2a

        def bands(v):
            vb = jnp.stack([v[:, i * M1:i * M1 + FL2b] for i in range(nb)],
                           axis=1)
            return vb.reshape(B * nb, FL2b, Cp)
        xh, xl = bands(xh), bands(xl)
        FL2 = FL2b
    Bk = B * nb
    nj = np_ // tn
    bspec = pl.BlockSpec((1, FL2, Cp), lambda j, b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = lambda shp: pl.BlockSpec(shp, lambda j, b: (j, 0, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_convw_w8_kernel, M1=M1, W2a=W2a, Cp=Cp, tn=tn,
                          kh=kh, kw=kw, leaky=leaky),
        grid=(nj, Bk),
        in_specs=[bspec, bspec, wspec((1, K, tn)), wspec((1, 1, tn)),
                  wspec((1, 1, tn)), wspec((1, 1, tn))],
        out_specs=pl.BlockSpec((1, M1, tn), lambda j, b: (b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bk, M1, np_), jnp.int16),
        interpret=interpret)(
            xh, xl, wp["w1"], wp["nconst"].reshape(nj, 1, tn),
            wp["bias"].reshape(nj, 1, tn), wp["shifts"].reshape(nj, 1, tn))
    return out.reshape(B, H, W2a, np_)[:, :, :W]


# ---------------------------------------------------------------------------
# Fused entry conv: 3x3/s1 C=3 conv + 2x2/s2 maxpool + requant in one pass
# ---------------------------------------------------------------------------

def prep_entry8_weights(w16_hwio: np.ndarray, bias_shifted: np.ndarray):
    """w16 (3, 3, 3, N) int16 -> dict for entry8_conv_pool_q16.

    Each matmul row computes EIGHT horizontally adjacent output pixels
    from a 3x10 patch window (K = 90 -> padded 128, the minimum lane-
    aligned width for a C=3 conv). Output columns are ordered
    (parity, pooled-col p, n): col = parity*4N + p*N + n with output
    sub-column s = 2p + parity — so the horizontal half of the following
    2x2/s2 maxpool is the tile-aligned max(v[:, :4N], v[:, 4N:]).
    Patch row k = (dy*10 + dxi)*3 + c maps to padded input (dy, dxi);
    sub-column s uses taps with dc = dxi - 1 - s in {-1, 0, 1}."""
    kh, kw, C, N = w16_hwio.shape
    assert (kh, kw) == (3, 3) and C <= 4
    K, KP = 30 * C, LANE
    w32 = np.zeros((KP, 8 * N), np.int32)
    for dy in range(3):
        for dxi in range(10):
            k0 = (dy * 10 + dxi) * C
            for s in range(8):
                dc = dxi - 1 - s
                if -1 <= dc <= 1:
                    parity, p = s % 2, s // 2
                    col = parity * 4 * N + p * N
                    w32[k0:k0 + C, col:col + N] = \
                        w16_hwio[dy, dc + 1].astype(np.int32)
    hi, lo, bal = _split_w_np(w32)
    w2 = np.concatenate([hi, lo], axis=1)          # (128, 16N)
    nconst = _nconst_np(w32, hi, lo, bal, KP, axis=0)
    bias4 = np.tile(bias_shifted.astype(np.int32), 4)   # (4N,) per p,n
    return {"w2": jnp.asarray(w2), "nconst": jnp.asarray(nconst),
            "bias": jnp.asarray(bias4), "N": N, "K": K, "Kp": KP,
            "bal": bal}


def patches_entry8(xq: jnp.ndarray, pad_value: int = 0) -> jnp.ndarray:
    """(B, H, W, C<=4) -> (B, H, W//8, 30C) 8-output patch rows.

    Row (b, r, j) holds the union 3x10 window for output pixels
    (r, 8j..8j+7): taps (dy, dxi, c) at padded row r+dy-1, padded col
    8j+dxi-1 (matches prep_entry8_weights' row order). ``pad_value``
    carries the encoded zero for s8 lo-plane inputs."""
    b, h, w, c = xq.shape
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 15), (0, 0)),
                 constant_values=pad_value)
    xv = xp.reshape(b, h + 2, (w + 16) // 8, 8, c)
    nb = w // 8
    taps = [xv[:, dy:dy + h, dxi // 8:dxi // 8 + nb, dxi % 8, :]
            for dy in range(3) for dxi in range(10)]
    return jnp.concatenate(taps, axis=-1)


def _entry8_kernel(xh_ref, xl_ref, w_ref, nc_ref, b_ref, o_ref, *,
                   shift_out, leaky, bal, n4):
    xh, xl = xh_ref[:], xl_ref[:]
    w2 = w_ref[:]
    acch = jnp.dot(xh, w2, preferred_element_type=jnp.int32)
    accl = jnp.dot(xl, w2, preferred_element_type=jnp.int32)
    if bal:
        rs = None
    else:
        rs = ((jnp.sum(xh.astype(jnp.int32), axis=1, keepdims=True) << 8)
              + jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True))
    acc = _recombine(acch, accl, rs, nc_ref[0], 2 * n4)
    # horizontal maxpool half on the int32 accumulator (parity blocks are
    # tile-aligned lane halves; legal: int16 max won't legalize in Mosaic,
    # and max commutes with the monotone requant chain)
    v32 = jnp.maximum(acc[:, :n4], acc[:, n4:])
    o_ref[:] = _requant(v32, b_ref[0], shift_out, leaky)


def entry8_conv_pool_q16(ph: jnp.ndarray, pl_: jnp.ndarray, wp: dict,
                         shift_out: int, leaky: bool,
                         interpret: bool | None = None) -> jnp.ndarray:
    """8-output entry conv + horizontal pool half: (M, Kp) s8 patch-row
    PLANES -> (M, 4N) int16, lanes = (pooled-col p, n). The vertical pool
    half is a cheap XLA reshape-max on the untiled row dim (done by the
    caller), because output rows r and r+1 live in different M rows.
    Plane inputs keep HBM peak low (the b128 int16 patch tensor plus its
    splits pushed the whole program past device memory)."""
    if interpret is None:
        interpret = _interpret_default()
    M, K = ph.shape
    kp, N = wp["Kp"], wp["N"]
    # activations ALWAYS use the offset encoding (x = 256*xh + (xl+128));
    # an encoded activation zero is (hi 0, lo -128) whatever the WEIGHT
    # encoding is
    lo_zero = -128
    if K != kp:
        ph = jnp.pad(ph, ((0, 0), (0, kp - K)))
        pl_ = jnp.pad(pl_, ((0, 0), (0, kp - K)),
                      constant_values=lo_zero)
    n4 = 4 * N
    tm = _pick_tile(M, 2048, 32)
    if tm > 4096:
        tm = 2048
    pad_m = (-M) % tm
    if pad_m:
        ph = jnp.pad(ph, ((0, pad_m), (0, 0)))
        pl_ = jnp.pad(pl_, ((0, pad_m), (0, 0)),
                      constant_values=lo_zero)
    Mp = M + pad_m
    xh, xl = ph, pl_
    out = pl.pallas_call(
        functools.partial(_entry8_kernel, shift_out=shift_out, leaky=leaky,
                          bal=wp.get("bal", False), n4=n4),
        grid=(Mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, 16 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, n4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, n4), jnp.int16),
        interpret=interpret,
    )(xh, xl, wp["w2"], wp["nconst"].reshape(1, 8 * N),
      wp["bias"].reshape(1, 4 * N))
    return out[:M] if pad_m else out


def entry8_forward(xq: jnp.ndarray, wp: dict, shift_out: int,
                   leaky: bool) -> jnp.ndarray:
    """Full fused entry: quantized image (B, H, W, C) -> pooled conv
    output (B, H/2, W/2, N) int16 (conv 3x3/s1 SAME + maxpool 2x2/s2)."""
    B, H, W, C = xq.shape
    N = wp["N"]
    qh, ql = split16(xq)            # split the small image, THEN build
    pf_h = patches_entry8(qh)       # patch planes (s8): halves HBM peak
    pf_l = patches_entry8(ql, -128)   # encoded activation zero
    M = B * H * (W // 8)
    o = entry8_conv_pool_q16(pf_h.reshape(M, pf_h.shape[-1]),
                             pf_l.reshape(M, pf_l.shape[-1]), wp,
                             shift_out, leaky)
    o = o.reshape(B, H, W // 8, 4 * N)
    # vertical pool half: untiled row dim, reshape-max
    o = o.reshape(B, H // 2, 2, W // 8, 4 * N).max(axis=2)
    # unpack pooled columns from lanes: (.., W//8, 4, N) -> (.., W//2, N)
    o = o.reshape(B, H // 2, W // 8, 4, N)
    return o.reshape(B, H // 2, W // 8 * 4, N)


def prep_entryf_weights(w16_hwio: np.ndarray, bias_shifted: np.ndarray):
    """w16 (3, 3, C<=4, N) int16 -> dict for entryf_forward (the in-kernel
    patch-feed fused entry conv+pool).

    Patch rows live in GROUP space: the padded image row is reshaped into
    groups of 8 pixels x C channels, lane-padded to SLOT=32. The 3x10
    window of output pixels (r, 8j..8j+7) is then exactly SIX slots of the
    flattened (row*NG+group, 32) tensor — (dy in 0..2) x (g in 0..1) at
    flat offsets dy*NG+g — so the kernel assembles patches with contiguous
    sublane slices at 32-aligned lane offsets (no XLA-side concats: the
    3-lane-concat patch build is what cost entry8 160 ms in-program).

    K layout: k = (dy*2+g)*32 + (dxi-8g)*C + c for dxi in [8g, 8g+7];
    dead K positions (u >= 8C, and g=1 taps dxi>9) carry zero weights —
    exact for any activation under the multi-word identity. Output columns
    (parity, pooled-col p, n): col = parity*4N + p*N + n, output pixel
    s = 2p + parity, taps with dc = dxi-1-s in {-1,0,1} (same column
    layout as prep_entry8_weights, so the horizontal pool half is the
    lane-tile-aligned max of the two parity halves)."""
    kh, kw, C, N = w16_hwio.shape
    assert (kh, kw) == (3, 3) and C <= 4
    SLOT = 32
    K = 6 * SLOT
    w32 = np.zeros((K, 8 * N), np.int32)
    for dy in range(3):
        for dxi in range(10):
            g = dxi // 8
            k0 = (dy * 2 + g) * SLOT + (dxi - 8 * g) * C
            for s in range(8):
                dc = dxi - 1 - s
                if -1 <= dc <= 1:
                    parity, p = s % 2, s // 2
                    col = parity * 4 * N + p * N
                    w32[k0:k0 + C, col:col + N] = \
                        w16_hwio[dy, dc + 1].astype(np.int32)
    hi, lo, bal = _split_w_np(w32)
    w2 = np.concatenate([hi, lo], axis=1)          # (192, 16N)
    nconst = _nconst_np(w32, hi, lo, bal, K, axis=0)   # (8N,)
    bias4 = np.tile(bias_shifted.astype(np.int32), 4)  # (4N,)
    return {"w2": jnp.asarray(w2), "nconst": jnp.asarray(nconst),
            "bias": jnp.asarray(bias4), "N": N, "C": C, "K": K,
            "bal": bal}


def _entryf_kernel(xh_hbm, xl_hbm, w_ref, nc_ref, b_ref, o_ref,
                   bh, bl, ah, al, ystore, sems, *,
                   th, NG, flb, shift_out, leaky, bal, n4):
    b = pl.program_id(0)
    i = pl.program_id(1)
    SLOT = 32
    M1 = th * NG
    # group rows are lane-padded to 128 at the XLA level: sub-128-lane
    # HBM tiles both forbid manual DMA and relayout on every access (the
    # 32-lane BlockSpec variant measured 2x SLOWER than the XLA entry);
    # dense 128-lane rows DMA at full rate and cost only pad bytes
    c1 = pltpu.make_async_copy(xh_hbm.at[b, pl.ds(i * M1, flb)],
                               bh.at[pl.ds(0, flb)], sems.at[0])
    c2 = pltpu.make_async_copy(xl_hbm.at[b, pl.ds(i * M1, flb)],
                               bl.at[pl.ds(0, flb)], sems.at[1])
    c1.start()
    c2.start()
    c1.wait()
    c2.wait()
    # patch assembly: six contiguous sublane slices per plane (first 32
    # of 128 lanes carry the real 8-pixel group)
    for dy in range(3):
        for g in range(2):
            slot = dy * 2 + g
            off = dy * NG + g
            ah[:, slot * SLOT:(slot + 1) * SLOT] = \
                bh[off:off + M1, 0:SLOT]
            al[:, slot * SLOT:(slot + 1) * SLOT] = \
                bl[off:off + M1, 0:SLOT]
    w2 = w_ref[:]
    acch = jnp.dot(ah[:], w2, preferred_element_type=jnp.int32)
    accl = jnp.dot(al[:], w2, preferred_element_type=jnp.int32)
    if bal:
        rs = None
    else:
        rs = ((jnp.sum(ah[:].astype(jnp.int32), axis=1, keepdims=True) << 8)
              + jnp.sum(al[:].astype(jnp.int32), axis=1, keepdims=True))
    acc = _recombine(acch, accl, rs, nc_ref[0], 2 * n4)
    # horizontal pool half on the int32 accumulator (parity halves are
    # lane-tile aligned; max commutes with the monotone requant chain)
    v32 = jnp.maximum(acc[:, :n4], acc[:, n4:])
    # requant stays int32 end-to-end: the vertical pool max below would
    # not legalize as an int16 Mosaic op
    ystore[:] = _requant32(v32, b_ref[0], shift_out, leaky)
    # vertical pool half: output rows r/r+1 are M-adjacent NG-row blocks
    for a in range(th // 2):
        o_ref[0, a * NG:(a + 1) * NG] = jnp.maximum(
            ystore[(2 * a) * NG:(2 * a + 1) * NG],
            ystore[(2 * a + 1) * NG:(2 * a + 2) * NG]).astype(jnp.int16)


def entryf_forward(xq: jnp.ndarray, wp: dict, shift_out: int,
                   leaky: bool, th: int | None = None,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Fully fused entry stage with IN-KERNEL patch feed: quantized image
    (B, H, W, C<=4) int16 -> (B, H/2, W/2, N) int16 (3x3/s1 SAME conv +
    2x2/s2 maxpool + exact requant, one kernel).

    XLA-side prep is pad+reshape+split only (~3 cheap passes over the
    small image tensor); the 30-tap patch matrix is assembled inside the
    kernel from contiguous sublane slices (see prep_entryf_weights).
    Replaces the two separate reference engine launches for conv0+pool0
    (yolo2_accel.cpp:127-168, core_compute.cpp:266-305)."""
    if interpret is None:
        interpret = _interpret_default()
    C = wp["C"]
    if xq.ndim == 4:
        B, H, W, C4 = xq.shape
        assert C4 == C
        xq = xq.reshape(B, H, W * C)
    else:
        B, H, WC = xq.shape
        W = WC // C
    N = wp["N"]
    SLOT = 32
    assert W % 8 == 0 and H % 2 == 0
    NG = W // 8 + 2
    n4 = 4 * N
    LROW = LANE    # group rows lane-padded to 128 (dense DMA-able rows)
    # ALL prep happens in the merged (W*C) dense-lane domain: a
    # materialized (B, H, W, 3) tensor is PHYSICALLY ~42x padded on TPU
    # (minor dims tile to (8,128)), so any pass over it moves gigabytes
    # (measured: 9.2 ms for the prep alone at b128). Callers should merge
    # BEFORE quantizing — reshape of the network input is a free bitcast,
    # and everything downstream stays dense. Pixel pads become C-scaled
    # lane pads; the group split is a contiguous reshape.
    xr = xq
    xr = jnp.pad(xr, ((0, 0), (1, 1), (C, (8 * NG - W - 1) * C)))
    xv = xr.reshape(B, H + 2, NG, 8 * C)
    xv = jnp.pad(xv, ((0, 0), (0, 0), (0, 0), (0, LROW - 8 * C)))
    xh, xl = split16(xv)
    FL = (H + 2) * NG
    xh = xh.reshape(B, FL, LROW)
    xl = xl.reshape(B, FL, LROW)

    align = 1 if interpret else 32   # int8 DMA flat-offset rule is HW-only
    if th is None:
        # dominant VMEM: dot-pair stack temps 8*M1*16N + abuf 2*M1*256
        th = H
        while th > 2 and (H % th or th % 2 or (th * NG) % align
                          or th * NG * (16 * n4 + 1024) > (9 << 20)):
            th -= 2
    assert H % th == 0 and th % 2 == 0 and (th * NG) % align == 0, \
        (H, W, th)
    M1 = th * NG
    nbands = H // th
    FLs = _round_up((th + 2) * NG + 1, max(8, align))
    tail = max(8, (nbands - 1) * M1 + FLs - FL)
    xh = jnp.pad(xh, ((0, 0), (0, tail), (0, 0)))
    xl = jnp.pad(xl, ((0, 0), (0, tail), (0, 0)), constant_values=-128)

    out = pl.pallas_call(
        functools.partial(_entryf_kernel, th=th, NG=NG, flb=FLs,
                          shift_out=shift_out, leaky=leaky,
                          bal=wp.get("bal", False), n4=n4),
        grid=(B, nbands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((wp["K"], 16 * N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M1 // 2, n4),
                               lambda b, i: (b * nbands + i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nbands, M1 // 2, n4),
                                       jnp.int16),
        scratch_shapes=[
            pltpu.VMEM((FLs, LROW), jnp.int8),
            pltpu.VMEM((FLs, LROW), jnp.int8),
            pltpu.VMEM((M1, 6 * SLOT), jnp.int8),
            pltpu.VMEM((M1, 6 * SLOT), jnp.int8),
            pltpu.VMEM((M1, n4), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xh, xl, wp["w2"], wp["nconst"].reshape(1, 8 * N),
      wp["bias"].reshape(1, 4 * N))
    # (B*nbands, th/2*NG, 4N) -> (B, H/2, NG, 4, N) -> crop pad groups
    out = out.reshape(B, H // 2, NG, 4, N)
    return out[:, :, :W // 8].reshape(B, H // 2, W // 2, N)


def _convp2f_kernel(xh_hbm, xl_hbm, w_ref, nc_ref, b_ref, o_ref,
                    xh_s, xl_s, ah, al, ystore, sems, *,
                    th, W1a, C4, N, shift_out, leaky, bal):
    b = pl.program_id(0)
    i = pl.program_id(1)
    M1 = th * W1a
    Ma = (th + 1) * W1a
    FLb = (th + 2) * W1a

    src_h = xh_hbm.at[b, pl.ds(i * M1, FLb)]
    src_l = xl_hbm.at[b, pl.ds(i * M1, FLb)]
    c1 = pltpu.make_async_copy(src_h, xh_s.at[pl.ds(0, FLb)], sems.at[0])
    c2 = pltpu.make_async_copy(src_l, xl_s.at[pl.ds(0, FLb)], sems.at[1])
    c1.start()
    c2.start()
    c1.wait()
    c2.wait()

    # ONE shared 2x2-block im2col over anchors (built once); subposition
    # (a, b) then reads the SAME buffer at row offset a*W1a + b — the
    # window-per-subposition problem becomes a shifted contiguous slice
    for dy in range(2):
        for dx in range(2):
            t = dy * 2 + dx
            off = dy * W1a + dx
            ah[:Ma, t * C4:(t + 1) * C4] = xh_s[off:off + Ma]
            al[:Ma, t * C4:(t + 1) * C4] = xl_s[off:off + Ma]

    for s in range(4):
        a, bb = s // 2, s % 2
        off_s = a * W1a + bb
        w2 = w_ref[s]
        xa_h = ah[off_s:off_s + M1]
        xa_l = al[off_s:off_s + M1]
        acch = jnp.dot(xa_h, w2, preferred_element_type=jnp.int32)
        accl = jnp.dot(xa_l, w2, preferred_element_type=jnp.int32)
        if bal:
            rs = None
        else:
            rs = ((jnp.sum(xa_h.astype(jnp.int32), axis=1,
                           keepdims=True) << 8)
                  + jnp.sum(xa_l.astype(jnp.int32), axis=1, keepdims=True))
        acc = _recombine(acch, accl, rs, nc_ref[s], N)
        ystore[:, s * N:(s + 1) * N] = _requant(acc, b_ref[0], shift_out,
                                                leaky)
    o_ref[0] = ystore[:]


def conv3x3p2f_q16_requant(x: jnp.ndarray, wp: dict, shift_out: int,
                           leaky: bool, th: int | None = None,
                           interpret: bool | None = None) -> jnp.ndarray:
    """SAME 3x3/s1 conv on a p2-packed tensor, flat-band formulation.

    x (B, Hb, Wb, 4C) int16 p2-packed (pack2 layout) -> (B, Hb, Wb, 4N)
    p2-packed. One shared (anchors, 16C) im2col per band serves all four
    output subpositions via shifted row reads; each subposition contracts
    K = 16C with 9C useful (56%, vs 25% for lane-padding C=32).
    """
    if interpret is None:
        interpret = _interpret_default()
    B, Hb, Wb, C4 = x.shape
    C, N, K = wp["C"], wp["N"], wp["K"]
    assert C4 == 4 * C and C4 % LANE == 0, (C4, C)
    W1a = _round_up(Wb + 2, 8)
    align = 1 if interpret else 32   # DMA flat-offset rule is HW-only
    if th is None:
        th = min(Hb, max(1, 4096 // W1a))
        while th > 1 and (Hb % th or (th * W1a) % align):
            th -= 1
    if Hb % th or (th * W1a) % align:
        return None
    M1 = th * W1a
    nbands = Hb // th

    # packed SAME pad: 1 block each side (sub-rows beyond the stencil is
    # covered by structurally-zero weights in the (2,2,4C,4N) expansion)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, W1a - Wb - 1), (0, 0)))
    xh, xl = split16(xp)
    FL = (Hb + 2) * W1a
    xh = xh.reshape(B, FL, C4)
    xl = xl.reshape(B, FL, C4)
    FLs = _round_up((th + 2) * W1a + 2, 8)

    out = pl.pallas_call(
        functools.partial(_convp2f_kernel, th=th, W1a=W1a, C4=C4, N=N,
                          shift_out=shift_out, leaky=leaky,
                          bal=wp.get("bal", False)),
        grid=(B, nbands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, K, 2 * N), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M1, 4 * N),
                               lambda b, i: (b * nbands + i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nbands, M1, 4 * N), jnp.int16),
        scratch_shapes=[
            pltpu.VMEM((FLs, C4), jnp.int8),
            pltpu.VMEM((FLs, C4), jnp.int8),
            pltpu.VMEM(((th + 1) * W1a + 2, 4 * C4), jnp.int8),
            pltpu.VMEM(((th + 1) * W1a + 2, 4 * C4), jnp.int8),
            pltpu.VMEM((M1, 4 * N), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xh, xl, wp["w2"], wp["nconst"], wp["bias"].reshape(1, N))

    out = out.reshape(B, Hb, W1a, 4 * N)
    return out[:, :, :Wb]


# ---------------------------------------------------------------------------
# Shared epilogue (all int32 — Mosaic-legal)
# ---------------------------------------------------------------------------

def _recombine(acch, accl, rsum, nconst, tn):
    """rsum is None for balanced-encoded weights (the row term vanishes;
    only the static 128*colsum(w) column constant remains)."""
    hh, hl = acch[:, :tn], acch[:, tn:]
    lh, ll = accl[:, :tn], accl[:, tn:]
    acc = (hh << 16) + ((hl + lh) << 8) + ll
    if rsum is not None:
        acc = acc + (rsum << 7)
    return acc + nconst[None, :]


def _requant32(acc, bias, shift_out: int, leaky: bool):
    """Requant chain kept in int32 (shift, bias, saturate, integer leaky) —
    callers cast to int16 or split to s8 planes (int32 shifts ARE
    Mosaic-legal, unlike int16)."""
    if shift_out > 0:
        mag = min(shift_out, 30)
        acc = (acc + (1 << (mag - 1))) >> mag
    elif shift_out < 0:
        acc = acc << min(-shift_out, 30)
    v = jnp.clip(acc + bias[None, :], -32768, 32767)
    if leaky:
        v = jnp.clip(jnp.where(v < 0, -((-v) // 10), v), -32768, 32767)
    return v


def _requant(acc, bias, shift_out: int, leaky: bool):
    return _requant32(acc, bias, shift_out, leaky).astype(jnp.int16)


def _split32(v32):
    """int32 in int16 range -> (hi, lo) s8 plane values (in-kernel form of
    split16: the encoded planes of the value, computed before any int16
    cast so Mosaic only sees int32 shifts)."""
    return ((v32 >> 8).astype(jnp.int8),
            ((v32 & 0xFF) - 128).astype(jnp.int8))


# ---------------------------------------------------------------------------
# Kernel 1: fused matmul (1x1 convs; patch-matmuls for tiny-C entry convs)
# ---------------------------------------------------------------------------

def _mm_kernel(xh_ref, xl_ref, w_ref, nconst_ref, bias_ref, o_ref,
               acch, accl, rsum, *, ksteps, tn, shift_out, leaky, bal):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acch[:] = jnp.zeros_like(acch)
        accl[:] = jnp.zeros_like(accl)
        if not bal:
            rsum[:] = jnp.zeros_like(rsum)

    xh, xl = xh_ref[:], xl_ref[:]
    w2 = w_ref[:]
    acch[:] += jnp.dot(xh, w2, preferred_element_type=jnp.int32)
    accl[:] += jnp.dot(xl, w2, preferred_element_type=jnp.int32)
    if not bal:
        rsum[:] += ((jnp.sum(xh.astype(jnp.int32), axis=1,
                             keepdims=True) << 8)
                    + jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True))

    @pl.when(pl.program_id(2) == ksteps - 1)
    def _epi():
        acc = _recombine(acch[:], accl[:], None if bal else rsum[:],
                         nconst_ref[0, 0], tn)
        o_ref[:] = _requant(acc, bias_ref[0, 0], shift_out, leaky)


def _mm_kernel_pl(xh_ref, xl_ref, w_ref, nconst_ref, bias_ref,
                  oh_ref, ol_ref,
                  acch, accl, rsum, *, ksteps, tn, shift_out, leaky, bal):
    """matmul kernel emitting (hi, lo) s8 planes."""
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acch[:] = jnp.zeros_like(acch)
        accl[:] = jnp.zeros_like(accl)
        if not bal:
            rsum[:] = jnp.zeros_like(rsum)

    xh, xl = xh_ref[:], xl_ref[:]
    w2 = w_ref[:]
    acch[:] += jnp.dot(xh, w2, preferred_element_type=jnp.int32)
    accl[:] += jnp.dot(xl, w2, preferred_element_type=jnp.int32)
    if not bal:
        rsum[:] += ((jnp.sum(xh.astype(jnp.int32), axis=1,
                             keepdims=True) << 8)
                    + jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True))

    @pl.when(pl.program_id(2) == ksteps - 1)
    def _epi():
        acc = _recombine(acch[:], accl[:], None if bal else rsum[:],
                         nconst_ref[0, 0], tn)
        v32 = _requant32(acc, bias_ref[0, 0], shift_out, leaky)
        hi, lo = _split32(v32)
        oh_ref[:] = hi
        ol_ref[:] = lo


def matmul_q16_requant(x, wp: dict, shift_out: int,
                       leaky: bool, out_np: bool = False,
                       interpret: bool | None = None,
                       out_mode: str = "i16"):
    """x (M, K) int16 @ prepared weights -> (M, Np or N) int16, fused
    exact requant. K may be the real K or the padded Kp (channel-padded
    callers). With ``out_np`` the padded Np columns are kept (zero-bias pad
    channels) so downstream kernels see a lane-aligned tensor.

    Plane flow: ``x`` may be an (hi, lo) s8 pair (skips the split16 pass);
    ``out_mode='planes'`` returns an (hi, lo) pair (always padded Np)."""
    if interpret is None:
        interpret = _interpret_default()
    planes_in = isinstance(x, (tuple, list))
    M, K = (x[0] if planes_in else x).shape
    kp, np_, tn = wp["Kp"], wp["Np"], wp["tn"]
    assert K in (wp["K"], kp), (K, wp["K"], kp)
    if K != kp:
        if planes_in:
            x = pad_planes(x, ((0, 0), (0, kp - K)))
        else:
            x = jnp.pad(x, ((0, 0), (0, kp - K)))  # int16 0 == encoded zero
    # M-tile: small-K programs are overhead-bound — grow tm to the VMEM
    # budget (acc pair 8*tm*tn + inputs 2*tm*tk bytes)
    budget = 8 << 20
    pref = 512
    while pref < 4096 and (8 * 2 * pref * tn + 4 * pref * kp) < budget:
        pref *= 2
    tm = _pick_tile(M, pref, 32)
    if tm > 4096 or (tm < min(256, M) <= pref):
        tm = pref     # no good divisor: pad M rather than run 32-row tiles
    pad_m = (-M) % tm
    if pad_m:
        if planes_in:
            x = pad_planes(x, ((0, pad_m), (0, 0)))
        else:
            x = jnp.pad(x, ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    # K blocks are the x operand's lane dim: either the full (possibly
    # sub-128) kp, or a multiple of 128 (prep rounds kp to 128 when
    # blocking will be needed, so a legal tile always divides)
    tk = kp if kp <= 1024 else _pick_tile(kp, 1024, 128)
    ksteps = kp // tk

    xh, xl = x if planes_in else split16(x)
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tk, 2 * tn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        # 1-D operands blocked below full size hit an XLA/Mosaic layout
        # mismatch (T(np_) vs T(tn)); feed the epilogue tables as 2-D
        # (np_//tn, tn) rows instead
        pl.BlockSpec((1, 1, tn), lambda i, j, k: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tn), lambda i, j, k: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((tm, 2 * tn), jnp.int32),
               pltpu.VMEM((tm, 2 * tn), jnp.int32),
               pltpu.VMEM((tm, 1), jnp.int32)]
    grid = (Mp // tm, np_ // tn, ksteps)
    args = (xh, xl, wp["w2"], wp["nconst"].reshape(np_ // tn, 1, tn),
            wp["bias"].reshape(np_ // tn, 1, tn))
    common = dict(ksteps=ksteps, tn=tn, shift_out=shift_out, leaky=leaky,
                  bal=wp.get("bal", False))
    if out_mode == "planes":
        ospec = pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                             memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((Mp, np_), jnp.int8)
        oh, ol = pl.pallas_call(
            functools.partial(_mm_kernel_pl, **common),
            grid=grid, in_specs=in_specs,
            out_specs=(ospec, ospec), out_shape=(oshape, oshape),
            scratch_shapes=scratch, interpret=interpret)(*args)
        if pad_m:
            oh, ol = oh[:M], ol[:M]
        return oh, ol
    out = pl.pallas_call(
        functools.partial(_mm_kernel, **common),
        grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, np_), jnp.int16),
        scratch_shapes=scratch, interpret=interpret,
    )(*args)
    out = out[:M] if pad_m else out
    if out_np or np_ == wp["N"]:
        return out
    return out[:, :wp["N"]]


# ---------------------------------------------------------------------------
# Kernel 1b: fused patch-matmul entry conv+pool ("entry_sdmm")
#
# The entry 3x3 conv (C=3) is lane-starved in every conv formulation: the
# XLA 4x4/s2 fused form (entry_sd) measures ~4.8 useful TOPS at b128
# because the MXU contracts over only 3 (padded) channels. This kernel
# reformulates it as ONE fused matmul: space-to-depth(2) turns the
# 4x4/stride-2 window into a 2x2 cell block (K = 2*2*2*2*C = 48 packed
# contraction lanes), the 4 pool-window members are output-channel GROUPS
# (groups-major, as in convops.make_entry_sd_weights), and the group-max
# runs on the recombined int32 accumulator inside the epilogue — the same
# max-commutes-with-requant identity entry_sd uses, so the result is
# bit-identical to conv3x3 -> +bias -> leaky -> requant -> maxpool2x2/s2
# (reference semantics: hls/core/core_compute.cpp conv + pool engines).
# ---------------------------------------------------------------------------

def _mm_kernel_pool4(xh_ref, xl_ref, w_ref, nconst_ref, bias_ref, o_ref,
                     acch, accl, rsum, *, ksteps, tn, gn, shift_out, leaky,
                     bal):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acch[:] = jnp.zeros_like(acch)
        accl[:] = jnp.zeros_like(accl)
        if not bal:
            rsum[:] = jnp.zeros_like(rsum)

    xh, xl = xh_ref[:], xl_ref[:]
    w2 = w_ref[:]
    acch[:] += jnp.dot(xh, w2, preferred_element_type=jnp.int32)
    accl[:] += jnp.dot(xl, w2, preferred_element_type=jnp.int32)
    if not bal:
        rsum[:] += ((jnp.sum(xh.astype(jnp.int32), axis=1,
                             keepdims=True) << 8)
                    + jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True))

    @pl.when(pl.program_id(2) == ksteps - 1)
    def _epi():
        acc = _recombine(acch[:], accl[:], None if bal else rsum[:],
                         nconst_ref[0, 0], tn)
        # groups-major pool max on the TRUE int32 accumulator (nconst is
        # already folded in per column, so each group's lanes carry real
        # sums); max commutes with the monotone requant chain
        m = acc[:, :gn]
        for g in range(1, tn // gn):
            m = jnp.maximum(m, acc[:, g * gn:(g + 1) * gn])
        o_ref[:] = _requant(m, bias_ref[0, 0, :gn], shift_out, leaky)


def prep_entry_sdmm_weights(w4: np.ndarray, bias_shifted: np.ndarray):
    """w4 (4, 4, C, 4N) int16 (make_entry_sd_weights layout, groups-major
    output channels) -> wp for entry_sdmm_forward.

    K layout matches the patch builder: k = (a, b, py, px, c) where the
    original 4x4 tap is (2a+py, 2b+px) — i.e. (cell-row, cell-col,
    row-parity, col-parity, channel) of the space-to-depth(2) view.
    """
    kh, kw, C, N4 = w4.shape
    assert (kh, kw) == (4, 4) and N4 % 4 == 0
    N = N4 // 4
    wmat = (w4.reshape(2, 2, 2, 2, C, N4)     # (a, py, b, px, c, n)
            .transpose(0, 2, 1, 3, 4, 5)      # (a, b, py, px, c, n)
            .reshape(16 * C, N4))
    wp = prep_matmul_weights(wmat, np.tile(
        bias_shifted.astype(np.int32), 4))
    assert wp["Np"] == wp["tn"], (
        "entry_sdmm needs a single N tile (pool groups span all lanes)",
        wp["Np"], wp["tn"])
    wp["groups"] = 4
    wp["N_out"] = N
    return wp


def entry_sdmm_forward(xq_nchw: jnp.ndarray, wp: dict, shift_out: int,
                       leaky: bool, interpret: bool | None = None):
    """Fused entry conv3x3/s1 + darknet maxpool2x2/s2 as one patch-matmul.

    xq_nchw (B, C, H, W) int16, H and W even. Returns (B, H//2, W//2, N)
    int16 — bit-identical to entry_sd / conv+pool (see module comment).

    The patch tensor is built at the XLA level as (hi, lo) s8 planes
    (split16 runs once on the DENSE NCHW image, 42x cheaper than on a
    3-lane NHWC tensor) via reshape/slice only — no gathers.
    """
    if interpret is None:
        interpret = _interpret_default()
    B, C, H, W = xq_nchw.shape
    assert H % 2 == 0 and W % 2 == 0
    Ho, Wo = H // 2, W // 2
    # conv SAME pad 1 + 4x4 window anchored at (2i-1, 2j-1): pad (1, 2)
    # each spatial side (same geometry as convops.conv_pool_entry_sd)
    xh, xl = split16(xq_nchw)
    ph = jnp.pad(xh, ((0, 0), (0, 0), (1, 1), (1, 1)))
    pl_ = jnp.pad(xl, ((0, 0), (0, 0), (1, 1), (1, 1)),
                  constant_values=-128)

    def s2d(v):
        # (B, C, H+2, W+2) -> cells (B, Ho+1, Wo+1, 2, 2, C) -> 4C planes
        v = v.reshape(B, C, Ho + 1, 2, Wo + 1, 2)
        v = v.transpose(0, 2, 4, 3, 5, 1)            # (B, I, J, py, px, c)
        return v.reshape(B, Ho + 1, Wo + 1, 4 * C)

    sh, sl = s2d(ph), s2d(pl_)
    parts_h = [sh[:, a:a + Ho, b:b + Wo] for a in (0, 1) for b in (0, 1)]
    parts_l = [sl[:, a:a + Ho, b:b + Wo] for a in (0, 1) for b in (0, 1)]
    K = 16 * C
    gh = jnp.concatenate(parts_h, axis=-1).reshape(-1, K)
    gl = jnp.concatenate(parts_l, axis=-1).reshape(-1, K)

    kp, np_, tn = wp["Kp"], wp["Np"], wp["tn"]
    gn = np_ // wp["groups"]
    if K != kp:
        gh, gl = pad_planes((gh, gl), ((0, 0), (0, kp - K)))
    M = gh.shape[0]
    budget = 8 << 20
    pref = 512
    while pref < 4096 and (8 * 2 * pref * tn + 4 * pref * kp) < budget:
        pref *= 2
    tm = _pick_tile(M, pref, 32)
    if tm > 4096 or (tm < min(256, M) <= pref):
        tm = pref
    pad_m = (-M) % tm
    if pad_m:
        gh, gl = pad_planes((gh, gl), ((0, pad_m), (0, 0)))
    Mp = M + pad_m
    tk = kp if kp <= 1024 else _pick_tile(kp, 1024, 128)
    ksteps = kp // tk
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tk, 2 * tn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tn), lambda i, j, k: (j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tn), lambda i, j, k: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((tm, 2 * tn), jnp.int32),
               pltpu.VMEM((tm, 2 * tn), jnp.int32),
               pltpu.VMEM((tm, 1), jnp.int32)]
    out = pl.pallas_call(
        functools.partial(
            _mm_kernel_pool4, ksteps=ksteps, tn=tn, gn=gn,
            shift_out=shift_out, leaky=leaky, bal=wp.get("bal", False)),
        grid=(Mp // tm, np_ // tn, ksteps), in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, gn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, gn), jnp.int16),
        scratch_shapes=scratch, interpret=interpret,
    )(gh, gl, wp["w2"], wp["nconst"].reshape(np_ // tn, 1, tn),
      wp["bias"].reshape(np_ // tn, 1, tn))
    out = out[:M] if pad_m else out
    return out.reshape(B, Ho, Wo, gn)[..., :wp["N_out"]]


# ---------------------------------------------------------------------------
# Kernel 2: fused 3x3/s1 conv — halo bands, tap or abuf contraction,
# flat output rows, optional G images per program
# ---------------------------------------------------------------------------

def _conv_kernel(xh_hbm, xl_hbm, w_ref, nconst_ref, bias_ref, o_ref,
                 xh_s, xl_s, acch, accl, rsum, sems, *,
                 G, th, W, W2a, Cp, tn, kh, kw, shift_out, leaky,
                 use_abuf, bal=False, abuf_refs=None):
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
        if not bal:
            rsum[:] = ((jnp.sum(ah[:].astype(jnp.int32), axis=1,
                                keepdims=True) << 8)
                       + jnp.sum(al[:].astype(jnp.int32), axis=1,
                                 keepdims=True))
    else:
        acch[:] = jnp.zeros_like(acch)
        accl[:] = jnp.zeros_like(accl)
        if not bal:
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
                    if not bal:
                        rsum[sl] += ((jnp.sum(t_h.astype(jnp.int32), axis=1,
                                              keepdims=True) << 8)
                                     + jnp.sum(t_l.astype(jnp.int32), axis=1,
                                               keepdims=True))
    acc = _recombine(acch[:], accl[:], None if bal else rsum[:],
                     nconst_ref[0, 0], tn)
    o_ref[0] = _requant(acc, bias_ref[0, 0], shift_out, leaky)


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

    def vmem_need(g, t, ab):
        m = g * t * W
        band = (t + kh - 1) * (W + kw - 1 + 7) * Cp * 2 * max(g, 1)
        return (band + 16 * m * tn + kh * kw * Cp * 2 * tn
                + 2 * m * tn + 4 * m + (2 * m * kh * kw * Cp if ab else 0))

    if use_abuf is None:
        # per-tap accumulator updates are VPU-bound at big K
        use_abuf = kh * kw * Cp >= 2304 and th * W * G * kh * kw * Cp <= (6 << 20)
    # scratch must fit VMEM (~16 MB): shrink the image group, then drop the
    # abuf, then shrink the row band (G-batched 13x13 layers at large batch
    # otherwise demand 20-30 MB and Mosaic fails with ResourceExhausted)
    budget = 11 << 20
    while G > 1 and vmem_need(G, th, use_abuf) > budget:
        G //= 2
        while B % G:
            G -= 1
    if use_abuf and vmem_need(G, th, True) > budget:
        use_abuf = False
    while G == 1 and th > 1 and vmem_need(G, th, use_abuf) > budget:
        th = max(1, th // 2)
        while H % th:
            th -= 1
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
                  shift_out=shift_out, leaky=leaky,
                  bal=wp.get("bal", False))
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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, kh * kw * Cp, 2 * tn), lambda j, b, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            # 2-D epilogue tables: see matmul_q16_requant
            pl.BlockSpec((1, 1, tn), lambda j, b, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tn), lambda j, b, i: (j, 0, 0),
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
    )(xh, xl, wp["w2"], wp["nconst"].reshape(np_ // tn, 1, tn),
      wp["bias"].reshape(np_ // tn, 1, tn))

    # flat rows -> (B, H(+pad), W, Np): contiguous-dim reshape (free)
    if G > 1:
        out = out.reshape(B, th * W, np_).reshape(B, th, W, np_)
    else:
        out = out.reshape(B, nbands * th, W, np_)
    out = out[:, :H] if pad_h else out
    if out_np or np_ == wp["N"]:
        return out
    return out[..., :wp["N"]]
