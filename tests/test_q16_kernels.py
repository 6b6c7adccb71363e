"""Exact-int16 decomposed Pallas kernels vs the XLA int32-accum oracle.

The contract is int32-wraparound accumulation (what XLA's s16 conv with
preferred_element_type=int32 computes and what the numpy golden reproduces
for in-range sums); the decomposition computes the same value mod 2^32 by
multi-word arithmetic. Kernels run in interpret mode on CPU.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from yolotpu.ops import convops
from yolotpu.ops import pallas_q16 as q16


def _mm_oracle(x, w, bias, shift, leaky):
    """int32-wraparound matmul + requant, via the conv_int16 path (1x1)."""
    xi = jnp.asarray(x[:, None, None, :])                 # (M,1,1,K)
    wi = jnp.asarray(w[None, None])                       # (1,1,K,N)
    out = convops.conv_int16(xi, wi, jnp.asarray(bias), 1, 0,
                             "leaky" if leaky else "linear", shift)
    return np.asarray(out)[:, 0, 0, :]


@pytest.mark.parametrize("shape,shift,leaky", [
    ((96, 48, 40), 7, True),        # N padded to 64, K kept
    ((128, 27, 32), 5, False),      # L0-like: K padded to 32, N to 64
    ((512, 128, 64), 9, True),      # L5-like 1x1
    ((96, 260, 130), 11, True),     # ragged K and N
    ((64, 2310, 40), 8, True),      # K > 1024: lane-blocked K steps
])
def test_matmul_q16_exact(shape, shift, leaky):
    M, K, N = shape
    rng = np.random.default_rng(1)
    x = rng.integers(-32768, 32768, (M, K)).astype(np.int16)
    w = rng.integers(-32768, 32768, (K, N)).astype(np.int16)
    bias = rng.integers(-30000, 30000, N).astype(np.int32)
    wp = q16.prep_matmul_weights(w, bias)
    got = np.asarray(q16.matmul_q16_requant(
        jnp.asarray(x), wp, shift, leaky, interpret=True))
    want = _mm_oracle(x, w, bias, shift, leaky)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape,shift,leaky", [
    ((2, 12, 11, 32, 40), 9, True),     # C padded 32->128
    ((1, 13, 13, 130, 24), 6, False),   # ragged C
    ((2, 8, 9, 128, 64), 12, True),     # aligned C
])
def test_conv3x3_q16_exact(shape, shift, leaky):
    B, H, W, C, N = shape
    rng = np.random.default_rng(2)
    x = rng.integers(-32768, 32768, (B, H, W, C)).astype(np.int16)
    w = rng.integers(-32768, 32768, (3, 3, C, N)).astype(np.int16)
    bias = rng.integers(-20000, 20000, N).astype(np.int32)
    wp = q16.prep_conv_weights(w, bias)
    got = np.asarray(q16.conv3x3_q16_requant(
        jnp.asarray(x), wp, shift, leaky, interpret=True))
    want = np.asarray(convops.conv_int16(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), 1, 1,
        "leaky" if leaky else "linear", shift))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape,shift,leaky", [
    ((2, 13, 13, 128, 64), 9, True),    # G-grouped whole-image path
    ((1, 16, 12, 128, 256), 6, False),  # banded path (th<H)
    ((2, 12, 11, 32, 40), 7, True),     # C padded 32->128, ragged W/N
])
def test_conv3x3_flat_exact(shape, shift, leaky):
    """Flat-band kernel == banded kernel == XLA int32-accum, bit for bit."""
    B, H, W, C, N = shape
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32768, (B, H, W, C)).astype(np.int16)
    w = rng.integers(-32768, 32768, (3, 3, C, N)).astype(np.int16)
    bias = rng.integers(-20000, 20000, N).astype(np.int32)
    wp = q16.prep_conv_weights(w, bias)
    got = q16.conv3x3_q16_flat(jnp.asarray(x), wp, shift, leaky,
                               interpret=True)
    assert got is not None
    got = np.asarray(got)[..., :N]
    want = np.asarray(convops.conv_int16(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), 1, 1,
        "leaky" if leaky else "linear", shift))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape,shift,leaky", [
    ((2, 12, 10, 32, 64), 9, True),     # L2-like: 4C=128, N=64
    ((1, 8, 6, 64, 128), 6, False),     # L4-like: 4C=256, N=128
])
def test_conv3x3p2_q16_exact(shape, shift, leaky):
    """p2-packed conv == flat conv on the unpacked tensor, bit for bit."""
    B, H, W, C, N = shape
    rng = np.random.default_rng(4)
    x = rng.integers(-32768, 32768, (B, H, W, C)).astype(np.int16)
    w = rng.integers(-32768, 32768, (3, 3, C, N)).astype(np.int16)
    bias = rng.integers(-20000, 20000, N).astype(np.int32)
    wp = q16.prep_conv_weights_p2(w, bias)
    xpk = q16.pack2(jnp.asarray(x))
    got = q16.conv3x3p2_q16_requant(xpk, wp, shift, leaky, interpret=True)
    got = np.asarray(q16.unpack2(got))
    want = np.asarray(convops.conv_int16(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), 1, 1,
        "leaky" if leaky else "linear", shift))
    np.testing.assert_array_equal(got, want)


def test_pack2_maxpool_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.integers(-32768, 32768, (2, 12, 10, 32)).astype(np.int16)
    xp = q16.pack2(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(q16.unpack2(xp)), x)
    from yolotpu.ops import pool as pool_ops
    got = np.asarray(q16.maxpool2x2_p2(xp))
    want = np.asarray(pool_ops.maxpool(jnp.asarray(x), 2, 2, 0))
    np.testing.assert_array_equal(got, want)


def test_mm_pairs_entry_conv_exact():
    """Column-pair-packed entry conv == flat 3x3 conv, bit for bit."""
    from yolotpu.models.yolov2 import _patches3x3_pairs
    B, H, W, C, N = 2, 10, 12, 3, 32
    rng = np.random.default_rng(6)
    xq = rng.integers(-2000, 2000, (B, H, W, C)).astype(np.int16)
    w = rng.integers(-32768, 32768, (3, 3, C, N)).astype(np.int16)
    bias = rng.integers(-20000, 20000, N).astype(np.int32)
    wp = q16.prep_matmul_weights_pairs(w, bias)
    pf = _patches3x3_pairs(jnp.asarray(xq).astype(jnp.float32))
    pq = pf.astype(jnp.int16)
    o = q16.matmul_q16_requant(pq.reshape(-1, pq.shape[-1]), wp, 7, True,
                               interpret=True)
    got = np.asarray(o).reshape(B, H, W // 2, 2 * N).reshape(B, H, W, N)
    want = np.asarray(convops.conv_int16(
        jnp.asarray(xq), jnp.asarray(w), jnp.asarray(bias), 1, 1,
        "leaky", 7))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("wmax,expect_bal", [
    (32639, True),     # balanced split representable
    (32767, False),    # weights >= 32640 force the offset fallback
])
def test_balanced_weight_split(wmax, expect_bal):
    """Balanced weight planes (no per-row rsum) == offset encoding ==
    oracle, bit for bit; the fallback triggers exactly when needed."""
    rng = np.random.default_rng(11)
    M, K, N = 96, 96, 40
    x = rng.integers(-32768, 32768, (M, K)).astype(np.int16)
    w = rng.integers(-32768, wmax + 1, (K, N)).astype(np.int16)
    if expect_bal:
        w = np.minimum(w, 32639).astype(np.int16)
    else:
        w[0, 0] = 32700          # ensure at least one unrepresentable
    bias = rng.integers(-30000, 30000, N).astype(np.int32)
    wp = q16.prep_matmul_weights(w, bias)
    assert wp["bal"] == expect_bal
    got = np.asarray(q16.matmul_q16_requant(
        jnp.asarray(x), wp, 6, True, interpret=True))
    want = _mm_oracle(x, w, bias, 6, True)
    np.testing.assert_array_equal(got, want)


def test_balanced_conv_flat_and_banded():
    B, H, W, C, N = 2, 10, 9, 128, 64
    rng = np.random.default_rng(12)
    x = rng.integers(-32768, 32768, (B, H, W, C)).astype(np.int16)
    w = rng.integers(-32768, 32640, (3, 3, C, N)).astype(np.int16)
    bias = rng.integers(-20000, 20000, N).astype(np.int32)
    wp = q16.prep_conv_weights(w, bias)
    assert wp["bal"]
    want = np.asarray(convops.conv_int16(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), 1, 1,
        "leaky", 8))
    got_b = np.asarray(q16.conv3x3_q16_requant(
        jnp.asarray(x), wp, 8, True, interpret=True))[..., :N]
    np.testing.assert_array_equal(got_b, want)
    got_f = q16.conv3x3_q16_flat(jnp.asarray(x), wp, 8, True,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got_f)[..., :N], want)


def test_encoded_zero_padding_is_zero():
    """K/N/C padding uses (hi=0, lo=-128) encoded zeros: padded positions
    must contribute exactly nothing."""
    rng = np.random.default_rng(3)
    M, K, N = 64, 20, 16
    x = rng.integers(-32768, 32768, (M, K)).astype(np.int16)
    w = rng.integers(-32768, 32768, (K, N)).astype(np.int16)
    bias = np.zeros(N, np.int32)
    wp = q16.prep_matmul_weights(w, bias)
    assert wp["Kp"] > K or wp["Np"] > N
    got = np.asarray(q16.matmul_q16_requant(
        jnp.asarray(x), wp, 0, False, interpret=True))
    want = _mm_oracle(x, w, bias, 0, False)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_full_net_pallas_bitexact_vs_golden():
    """The whole yolov2 graph under compute='pallas' (interpret mode on
    CPU) must equal the golden int32-mode forward bit-for-bit — the same
    contract the default int16 tier carries."""
    from yolotpu.golden import GoldenNet
    from yolotpu.models import yolov2, zoo
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.weights import WeightStore

    spec = zoo.build("yolov2", width=64, height=64)
    store = WeightStore.synthetic(spec, seed=0)
    rng = np.random.default_rng(100)
    # force the full hybrid kind mix regardless of the production default
    # (which routes all 3x3 to XLA per in-program bisection)
    old_env = os.environ.get("YOLO2_Q16_XLA_MIN_C")
    try:
        os.environ["YOLO2_Q16_XLA_MIN_C"] = "192"
        img = rng.random((3, 64, 64)).astype(np.float32)
        act_q = calibrate_activations(spec, store, [img])
        quantize_weights(store, act_q)

        g = GoldenNet(spec).forward_int16(img, store.int16, store.qtables,
                                          mode="int32")
        fwd = yolov2.build_forward(spec, "int16", store.qtables,
                                   compute="pallas", outputs=("head",))
        params = yolov2.params_q16(spec, store)
        head = np.asarray(fwd(params, jnp.asarray(
            img.transpose(1, 2, 0)[None]))["head"])[0]
    finally:
        if old_env is None:
            os.environ.pop("YOLO2_Q16_XLA_MIN_C", None)
        else:
            os.environ["YOLO2_Q16_XLA_MIN_C"] = old_env
    np.testing.assert_array_equal(head.transpose(2, 0, 1), g[spec.n - 1])
    # coverage sanity: the graph must exercise every kernel kind
    kinds = {params[f"conv{l.idx}"]["kind"] for l in spec.conv_layers()}
    assert {"mm", "conv3", "xla"} <= kinds, kinds


@pytest.mark.slow
def test_full_net_dec8_bitexact(monkeypatch):
    """The whole graph with every XLA-routed 3x3 on the dec8 engine
    (three int8 MXU convs) == golden int32 bit-for-bit, including the
    xla8 plane-flow edges in build_forward."""
    from yolotpu.golden import GoldenNet
    from yolotpu.models import yolov2, zoo
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.weights import WeightStore

    spec = zoo.build("yolov2", width=64, height=64)
    store = WeightStore.synthetic(spec, seed=0)
    rng = np.random.default_rng(100)
    monkeypatch.setenv("YOLO2_Q16_XLA_DEC8", "1")
    monkeypatch.setenv("YOLO2_Q16_XLA_MIN_C", "192")
    img = rng.random((3, 64, 64)).astype(np.float32)
    act_q = calibrate_activations(spec, store, [img])
    quantize_weights(store, act_q)
    g = GoldenNet(spec).forward_int16(img, store.int16, store.qtables,
                                      mode="int32")
    fwd = yolov2.build_forward(spec, "int16", store.qtables,
                               compute="pallas", outputs=("head",))
    params = yolov2.params_q16(spec, store)
    head = np.asarray(fwd(params, jnp.asarray(
        img.transpose(1, 2, 0)[None]))["head"])[0]
    np.testing.assert_array_equal(head.transpose(2, 0, 1), g[spec.n - 1])
    kinds = {params[f"conv{l.idx}"]["kind"] for l in spec.conv_layers()}
    assert "xla8" in kinds, kinds


@pytest.mark.slow
def test_full_net_pallas_bitexact_tiny():
    """yolov2-tiny through the pallas q16 path == golden, bit for bit
    (covers the stride-1 overlapping maxpool and small-C conv ladder)."""
    from yolotpu.golden import GoldenNet
    from yolotpu.models import yolov2, zoo
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.weights import WeightStore

    spec = zoo.build("yolov2-tiny", width=96, height=96)
    store = WeightStore.synthetic(spec, seed=3)
    rng = np.random.default_rng(0)
    img = rng.random((3, 96, 96)).astype(np.float32)
    act_q = calibrate_activations(spec, store, [img])
    quantize_weights(store, act_q)
    g = GoldenNet(spec).forward_int16(img, store.int16, store.qtables,
                                      mode="int32")
    params = yolov2.params_q16(spec, store)
    fwd = yolov2.build_forward(spec, "int16", store.qtables,
                               compute="pallas", outputs=("head",))
    head = np.asarray(fwd(params, jnp.asarray(
        img.transpose(1, 2, 0)[None]))["head"])[0]
    np.testing.assert_array_equal(head.transpose(2, 0, 1), g[spec.n - 1])


@pytest.mark.parametrize("shape,shift,leaky,wmax", [
    ((2, 12, 10, 32, 64), 9, True, 32767),    # legacy encoding
    ((1, 16, 12, 32, 64), 6, False, 32639),   # balanced encoding
    ((2, 8, 10, 64, 128), 7, True, 32639),    # 4C=256, N=128
])
def test_conv3x3p2f_exact(shape, shift, leaky, wmax):
    """Flat-band p2 kernel (shared shifted abuf) == oracle, bit for bit."""
    B, H, W, C, N = shape
    rng = np.random.default_rng(13)
    x = rng.integers(-32768, 32768, (B, H, W, C)).astype(np.int16)
    w = np.minimum(rng.integers(-32768, 32768, (3, 3, C, N)),
                   wmax).astype(np.int16)
    bias = rng.integers(-20000, 20000, N).astype(np.int32)
    wp = q16.prep_conv_weights_p2(w, bias)
    xpk = q16.pack2(jnp.asarray(x))
    got = q16.conv3x3p2f_q16_requant(xpk, wp, shift, leaky, interpret=True)
    assert got is not None
    got = np.asarray(q16.unpack2(got))
    want = np.asarray(convops.conv_int16(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), 1, 1,
        "leaky" if leaky else "linear", shift))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape,shift,leaky,wmax", [
    ((2, 16, 16, 3, 32), 7, True, 32639),     # balanced
    ((1, 8, 24, 3, 32), 5, False, 32767),     # legacy fallback
])
def test_entry8_conv_pool_exact(shape, shift, leaky, wmax):
    """Fused entry conv+pool == conv_int16 then darknet maxpool 2x2/s2,
    bit for bit (pool commutes with the monotone requant chain)."""
    from yolotpu.ops import pool as pool_ops
    B, H, W, C, N = shape
    rng = np.random.default_rng(14)
    xq = rng.integers(-30000, 30000, (B, H, W, C)).astype(np.int16)
    w = np.minimum(rng.integers(-32768, 32768, (3, 3, C, N)),
                   wmax).astype(np.int16)
    if wmax == 32767:
        w[0, 0, 0, 0] = 32700
    bias = rng.integers(-20000, 20000, N).astype(np.int32)
    wp = q16.prep_entry8_weights(w, bias)
    assert wp["bal"] == (wmax == 32639)
    got = np.asarray(q16.entry8_forward(jnp.asarray(xq), wp, shift, leaky))
    conv = convops.conv_int16(
        jnp.asarray(xq), jnp.asarray(w), jnp.asarray(bias), 1, 1,
        "leaky" if leaky else "linear", shift)
    want = np.asarray(pool_ops.maxpool(conv, 2, 2, 0))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape,shift,leaky,wmax", [
    ((2, 16, 16, 3, 32), 7, True, 32639),     # balanced
    ((1, 8, 24, 3, 32), 5, False, 32767),     # legacy fallback
    ((2, 32, 32, 3, 32), 9, True, 32639),     # multi-band (th < H)
])
def test_entryf_conv_pool_exact(shape, shift, leaky, wmax):
    """In-kernel patch-feed fused entry == conv_int16 then darknet
    maxpool 2x2/s2, bit for bit."""
    from yolotpu.ops import pool as pool_ops
    B, H, W, C, N = shape
    rng = np.random.default_rng(14)
    xq = rng.integers(-30000, 30000, (B, H, W, C)).astype(np.int16)
    w = np.minimum(rng.integers(-32768, 32768, (3, 3, C, N)),
                   wmax).astype(np.int16)
    if wmax == 32767:
        w[0, 0, 0, 0] = 32700
    bias = rng.integers(-20000, 20000, N).astype(np.int32)
    wp = q16.prep_entryf_weights(w, bias)
    assert wp["bal"] == (wmax == 32639)
    th = 4 if H > 16 else None    # force multi-band coverage
    got = np.asarray(q16.entryf_forward(jnp.asarray(xq), wp, shift, leaky,
                                        th=th))
    conv = convops.conv_int16(
        jnp.asarray(xq), jnp.asarray(w), jnp.asarray(bias), 1, 1,
        "leaky" if leaky else "linear", shift)
    want = np.asarray(pool_ops.maxpool(conv, 2, 2, 0))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shift,act", [(7, "leaky"), (5, "linear")])
def test_entry_sd_conv_pool_exact(shift, act):
    """Space-to-depth fused entry (one 4x4/s2 XLA conv + group-max on the
    int32 accumulator) == conv_int16 then darknet maxpool 2x2/s2, bit for
    bit — including saturation extremes."""
    from yolotpu.ops import pool as pool_ops
    B, H, W, C, N = 2, 20, 16, 3, 32
    rng = np.random.default_rng(15)
    xq = rng.integers(-32768, 32768, (B, H, W, C)).astype(np.int16)
    xq[0, 0] = 32767
    xq[1, -1] = -32768
    w = rng.integers(-32768, 32768, (3, 3, C, N)).astype(np.int16)
    bias = rng.integers(-20000, 20000, N).astype(np.int32)
    w4 = convops.make_entry_sd_weights(w, N)
    got = np.asarray(convops.conv_pool_entry_sd(
        jnp.asarray(xq.transpose(0, 3, 1, 2)), jnp.asarray(w4),
        jnp.asarray(bias), shift, act))
    conv = convops.conv_int16(jnp.asarray(xq), jnp.asarray(w),
                              jnp.asarray(bias), 1, 1, act, shift)
    want = np.asarray(pool_ops.maxpool(conv, 2, 2, 0))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shift,act", [(7, "leaky"), (5, "linear")])
def test_sd_pool_conv_pool_exact(shift, act):
    """Mid-stage fused conv+pool (sd_pool: NHWC 4x4/s2 conv + group-max,
    C>=8) == conv_int16 then darknet maxpool 2x2/s2, bit for bit —
    saturation extremes included."""
    from yolotpu.ops import pool as pool_ops
    B, H, W, C, N = 2, 20, 16, 32, 64
    rng = np.random.default_rng(21)
    xq = rng.integers(-32768, 32768, (B, H, W, C)).astype(np.int16)
    xq[0, 0] = 32767
    xq[1, -1] = -32768
    w = rng.integers(-32768, 32768, (3, 3, C, N)).astype(np.int16)
    bias = rng.integers(-20000, 20000, N).astype(np.int32)
    w4 = convops.make_entry_sd_weights(w, N)
    got = np.asarray(convops.conv_pool_sd(
        jnp.asarray(xq), jnp.asarray(w4), jnp.asarray(bias), shift, act))
    conv = convops.conv_int16(jnp.asarray(xq), jnp.asarray(w),
                              jnp.asarray(bias), 1, 1, act, shift)
    want = np.asarray(pool_ops.maxpool(conv, 2, 2, 0))
    np.testing.assert_array_equal(got, want)


def test_full_net_sd_pool_bitexact(monkeypatch):
    """Whole 64px graph with sd_pool overriding the xla-routed
    conv-before-pool layers (idx 2 and 6) == the int32 tier bit-for-bit
    (plan routing, pool skip, downstream consumption)."""
    from yolotpu.golden import GoldenNet
    from yolotpu.models import yolov2, zoo
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.weights import WeightStore

    monkeypatch.setenv("YOLO2_Q16_PLAN", "2:sd_pool,6:sd_pool")
    spec = zoo.build("yolov2", width=64, height=64)
    store = WeightStore.synthetic(spec, seed=0)
    rng = np.random.default_rng(103)
    img = rng.random((3, 64, 64)).astype(np.float32)
    act_q = calibrate_activations(spec, store, [img])
    quantize_weights(store, act_q)
    g = GoldenNet(spec).forward_int16(img, store.int16, store.qtables,
                                      mode="int32")
    params = yolov2.params_q16(spec, store)
    assert params["conv2"]["kind"] == "sd_pool"
    assert params["conv6"]["kind"] == "sd_pool"
    fwd = yolov2.build_forward(spec, "int16", store.qtables,
                               compute="pallas", outputs=("head",))
    head = np.asarray(fwd(params, jnp.asarray(
        img.transpose(1, 2, 0)[None]))["head"])[0]
    np.testing.assert_array_equal(head.transpose(2, 0, 1), g[spec.n - 1])


@pytest.mark.parametrize("shift,act", [(7, "leaky"), (5, "linear")])
def test_entry_s2d_conv_pool_exact(shift, act):
    """Block-aligned space-to-depth entry (2x2/s1 conv over 4C channels)
    == the entry_sd formulation bit for bit, saturation extremes
    included (same int32 accumulation, sums reordered)."""
    B, H, W, C, N = 2, 20, 16, 3, 32
    rng = np.random.default_rng(17)
    xq = rng.integers(-32768, 32768, (B, C, H, W)).astype(np.int16)
    xq[0, :, 0] = 32767
    xq[1, :, -1] = -32768
    w = rng.integers(-32768, 32768, (3, 3, C, N)).astype(np.int16)
    bias = rng.integers(-20000, 20000, N).astype(np.int32)
    want = np.asarray(convops.conv_pool_entry_sd(
        jnp.asarray(xq), jnp.asarray(convops.make_entry_sd_weights(w, N)),
        jnp.asarray(bias), shift, act))
    got = np.asarray(convops.conv_pool_entry_s2d(
        jnp.asarray(xq), jnp.asarray(convops.make_entry_s2d_weights(w, N)),
        jnp.asarray(bias), shift, act))
    np.testing.assert_array_equal(got, want)


def test_full_net_entry_s2d_bitexact(monkeypatch):
    """Whole 64px graph with the entry_s2d override == the int32 tier
    bit-for-bit (plan routing + prologue s2d glue)."""
    from yolotpu.models import yolov2, zoo
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.weights import WeightStore

    monkeypatch.setenv("YOLO2_Q16_PLAN", "0:entry_s2d")
    spec = zoo.build("yolov2", width=64, height=64)
    store = WeightStore.synthetic(spec, seed=0)
    rng = np.random.default_rng(103)
    img = rng.random((3, 64, 64)).astype(np.float32)
    act_q = calibrate_activations(spec, store, [img])
    quantize_weights(store, act_q)
    x = jnp.asarray(img.transpose(1, 2, 0)[None])
    pi = yolov2.params_int16(spec, store)
    fi = yolov2.build_forward(spec, "int16", store.qtables,
                              compute="int32", outputs=("head",))
    want = np.asarray(fi(pi, x)["head"])
    params = yolov2.params_q16(spec, store)
    assert params["conv0"]["kind"] == "entry_s2d"
    fwd = yolov2.build_forward(spec, "int16", store.qtables,
                               compute="pallas", outputs=("head",))
    got = np.asarray(fwd(params, x)["head"])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shift,act,wmax", [(9, "leaky", 30000),
                                            (6, "linear", 32767)])
def test_entry_sdmm_conv_pool_exact(shift, act, wmax):
    """Fused Pallas patch-matmul entry (s2d K=48 packing + in-epilogue
    pool group-max; evidence-only kind, lost the r4 e2e bisection) ==
    the XLA entry_sd formulation bit for bit, both weight encodings."""
    B, H, W, C, N = 2, 20, 16, 3, 32
    rng = np.random.default_rng(16)
    xq = rng.integers(-32768, 32768, (B, C, H, W)).astype(np.int16)
    xq[0, :, 0] = 32767
    xq[1, :, -1] = -32768
    w = rng.integers(-wmax - 1, wmax + 1, (3, 3, C, N)).astype(np.int16)
    w[0, 0, 0, 0] = wmax                      # pin the encoding branch
    bias = rng.integers(-20000, 20000, N).astype(np.int32)
    w4 = convops.make_entry_sd_weights(w, N)
    want = np.asarray(convops.conv_pool_entry_sd(
        jnp.asarray(xq), jnp.asarray(w4), jnp.asarray(bias), shift, act))
    wp = q16.prep_entry_sdmm_weights(w4, bias)
    assert wp["bal"] == (wmax <= 32639)
    got = np.asarray(q16.entry_sdmm_forward(
        jnp.asarray(xq), wp, shift, act == "leaky"))
    np.testing.assert_array_equal(got, want)


def test_full_net_entry_sdmm_bitexact(monkeypatch):
    """Whole 64px graph with the entry_sdmm override == the int32 tier
    bit-for-bit (exercises the YOLO2_Q16_PLAN routing + fallback glue)."""
    from yolotpu.models import yolov2, zoo
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.weights import WeightStore

    monkeypatch.setenv("YOLO2_Q16_PLAN", "0:entry_sdmm")
    spec = zoo.build("yolov2", width=64, height=64)
    store = WeightStore.synthetic(spec, seed=0)
    rng = np.random.default_rng(102)
    img = rng.random((3, 64, 64)).astype(np.float32)
    act_q = calibrate_activations(spec, store, [img])
    quantize_weights(store, act_q)
    x = jnp.asarray(img.transpose(1, 2, 0)[None])
    pi = yolov2.params_int16(spec, store)
    fi = yolov2.build_forward(spec, "int16", store.qtables,
                              compute="int32", outputs=("head",))
    want = np.asarray(fi(pi, x)["head"])
    params = yolov2.params_q16(spec, store)
    assert params["conv0"]["kind"] == "entry_sdmm"
    fwd = yolov2.build_forward(spec, "int16", store.qtables,
                               compute="pallas", outputs=("head",))
    got = np.asarray(fwd(params, x)["head"])
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_full_net_entry_sd_bitexact(monkeypatch):
    """Whole graph with the sd entry == golden int32 bit-for-bit (entry
    conv + pool fused through params_q16/build_forward)."""
    from yolotpu.golden import GoldenNet
    from yolotpu.models import yolov2, zoo
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.weights import WeightStore

    monkeypatch.setenv("YOLO2_Q16_ENTRY", "sd")
    spec = zoo.build("yolov2", width=64, height=64)
    store = WeightStore.synthetic(spec, seed=0)
    rng = np.random.default_rng(101)
    img = rng.random((3, 64, 64)).astype(np.float32)
    act_q = calibrate_activations(spec, store, [img])
    quantize_weights(store, act_q)
    g = GoldenNet(spec).forward_int16(img, store.int16, store.qtables,
                                      mode="int32")
    params = yolov2.params_q16(spec, store)
    assert params["conv0"]["kind"] == "entry_sd"
    fwd = yolov2.build_forward(spec, "int16", store.qtables,
                               compute="pallas", outputs=("head",))
    head = np.asarray(fwd(params, jnp.asarray(
        img.transpose(1, 2, 0)[None]))["head"])[0]
    np.testing.assert_array_equal(head.transpose(2, 0, 1), g[spec.n - 1])


@pytest.mark.parametrize("vpool", [False, True])
def test_conv3_flat_planes_modes(vpool):
    """Plane-in/plane-out (+fused vertical pool half) == int16 kernel +
    XLA pool, bit for bit."""
    from yolotpu.ops import pool as pool_ops
    B, H, W, C, N = 2, 12, 10, 128, 64
    rng = np.random.default_rng(21)
    x = rng.integers(-32768, 32768, (B, H, W, C)).astype(np.int16)
    w = rng.integers(-32768, 32768, (3, 3, C, N)).astype(np.int16)
    bias = rng.integers(-20000, 20000, N).astype(np.int32)
    wp = q16.prep_conv_weights(w, bias)
    planes = q16.split16(jnp.asarray(x))
    om = "planes_vpool" if vpool else "planes"
    got = q16.conv3x3_q16_flat(planes, wp, 8, True, interpret=True,
                               out_mode=om)
    assert got is not None
    ref = q16.conv3x3_q16_flat(jnp.asarray(x), wp, 8, True, interpret=True)
    if vpool:
        y = np.asarray(q16.hpool2_planes(got, W, out_planes=False))
        want = np.asarray(pool_ops.maxpool(ref, 2, 2, 0))
        np.testing.assert_array_equal(y, want[..., :y.shape[-1]])
    else:
        y = np.asarray(q16.recombine16(got[0], got[1]))
        np.testing.assert_array_equal(y, np.asarray(ref))


def test_matmul_planes_modes():
    M, K, N = 96, 128, 64
    rng = np.random.default_rng(22)
    x = rng.integers(-32768, 32768, (M, K)).astype(np.int16)
    w = rng.integers(-32768, 32768, (K, N)).astype(np.int16)
    bias = rng.integers(-30000, 30000, N).astype(np.int32)
    wp = q16.prep_matmul_weights(w, bias)
    ref = np.asarray(q16.matmul_q16_requant(jnp.asarray(x), wp, 7, True,
                                            out_np=True, interpret=True))
    planes = q16.split16(jnp.asarray(x))
    oh, ol = q16.matmul_q16_requant(planes, wp, 7, True, out_np=True,
                                    interpret=True, out_mode="planes")
    got = np.asarray(q16.recombine16(oh, ol))
    np.testing.assert_array_equal(got, ref)


def test_conv_int16_dec8_bitexact():
    """dec8 XLA engine (three int8 MXU convs, balanced weight planes +
    s8 activation planes) == int32 engine bit-for-bit, including int32
    wraparound extremes, plane input and plane output forms."""
    from yolotpu.ops import convops
    rng = np.random.default_rng(30)
    C, N, H = 64, 96, 9
    x = rng.integers(-32768, 32768, (2, H, H, C)).astype(np.int16)
    x[0, 0] = 32767
    x[0, 1] = -32768
    w = rng.integers(-30000, 30000, (3, 3, C, N)).astype(np.int16)
    w[0, 0, 0, 0] = 32639          # balanced-encoding boundary
    w[0, 0, 0, 1] = -32768
    b = rng.integers(-1000, 1000, N).astype(np.int32)
    sp = convops.split_weights_dec8(w)
    assert sp is not None
    wh, wl, cw = sp
    for act in ("leaky", "linear"):
        for shift in (7, -2, 0):
            ref = convops.conv_int16(jnp.asarray(x), jnp.asarray(w),
                                     jnp.asarray(b), 1, 1, act, shift)
            got = convops.conv_int16_dec8(
                jnp.asarray(x), jnp.asarray(wh), jnp.asarray(wl),
                jnp.asarray(cw), jnp.asarray(b), 1, 1, act, shift)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # plane input and plane output (the plane-flow edge forms)
    ref = convops.conv_int16(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                             1, 1, "leaky", 7)
    oh, ol = convops.conv_int16_dec8(
        q16.split16(jnp.asarray(x)), jnp.asarray(wh), jnp.asarray(wl),
        jnp.asarray(cw), jnp.asarray(b), 1, 1, "leaky", 7, out_planes=True)
    np.testing.assert_array_equal(np.asarray(q16.recombine16(oh, ol)),
                                  np.asarray(ref))
    # unbalanced weights must refuse the split
    wbad = np.full((3, 3, 4, 4), 32700, np.int16)
    assert convops.split_weights_dec8(wbad) is None


@pytest.mark.parametrize("B,H,W,C,N", [
    (2, 26, 26, 128, 128),
    (1, 52, 52, 128, 256),   # abuf model must band this; wi hosts it whole
])
@pytest.mark.slow
def test_conv3_flat_wi_matches_abuf(B, H, W, C, N):
    """Weight-resident implicit-im2col path (whole-image geometries)
    == the abuf kernel bit-for-bit across output modes and plane input."""
    import os
    rng = np.random.default_rng(31)
    w = rng.integers(-30000, 30000, (3, 3, C, N)).astype(np.int16)
    b = rng.integers(-500, 500, N).astype(np.int32)
    tn = q16.wi_tn(H, W, C, N)
    assert tn is not None
    wp = q16.prep_conv_weights(w, b, tn=tn)
    assert wp["bal"]
    x = rng.integers(-32768, 32768, (B, H, W, wp["Cp"])).astype(np.int16)
    xj = jnp.asarray(x)
    try:
        for om in ("i16", "planes", "planes_vpool"):
            os.environ["YOLO2_Q16_WI"] = "1"
            a = q16.conv3x3_q16_flat(xj, wp, 7, True, interpret=True,
                                     out_mode=om)
            os.environ["YOLO2_Q16_WI"] = "0"
            r = q16.conv3x3_q16_flat(xj, wp, 7, True, interpret=True,
                                     out_mode=om)
            assert a is not None and r is not None, om
            pair = (a, r) if om == "i16" else (a[0], r[0], a[1], r[1])
            if om == "i16":
                np.testing.assert_array_equal(np.asarray(a), np.asarray(r))
            else:
                for i in (0, 1):
                    np.testing.assert_array_equal(
                        np.asarray(a[i][:, :, :W]), np.asarray(r[i][:, :, :W]))
        os.environ["YOLO2_Q16_WI"] = "1"
        a = q16.conv3x3_q16_flat(q16.split16(xj), wp, 7, True,
                                 interpret=True, out_mode="i16")
        r = q16.conv3x3_q16_flat(xj, wp, 7, True, interpret=True,
                                 out_mode="i16")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))
    finally:
        os.environ.pop("YOLO2_Q16_WI", None)


def test_conv_int16_nchw_bitexact():
    """Dense-NCHW entry conv == NHWC conv_int16 bit-for-bit (C=3 entry
    geometry, leaky, including saturation extremes)."""
    from yolotpu.ops import convops
    rng = np.random.default_rng(32)
    x = rng.integers(-32768, 32768, (2, 20, 20, 3)).astype(np.int16)
    x[0, 0] = 32767
    w = rng.integers(-32768, 32768, (3, 3, 3, 32)).astype(np.int16)
    b = rng.integers(-1000, 1000, 32).astype(np.int32)
    for act, shift in (("leaky", 9), ("linear", -1)):
        ref = convops.conv_int16(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b), 1, 1, act, shift)
        got = convops.conv_int16_nchw(
            jnp.asarray(x.transpose(0, 3, 1, 2)), jnp.asarray(w),
            jnp.asarray(b), 1, 1, act, shift)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_conv3_wi_banded_bitexact(monkeypatch):
    """Banded weight-resident path (bands stacked into the batch dim,
    kh-row overlap) == unbanded == oracle across output modes."""
    monkeypatch.setenv("YOLO2_Q16_WI", "1")
    rng = np.random.default_rng(33)
    B, H, W, C, N = 2, 16, 12, 128, 128
    w = rng.integers(-30000, 30000, (3, 3, C, N)).astype(np.int16)
    b = rng.integers(-500, 500, N).astype(np.int32)
    wp = q16.prep_conv_weights(w, b, tn=128)
    assert wp["bal"]
    x = rng.integers(-32768, 32768, (B, H, W, C)).astype(np.int16)
    xj = jnp.asarray(x)
    ref = np.asarray(convops.conv_int16(
        xj, jnp.asarray(w), jnp.asarray(b), 1, 1, "leaky", 7))
    for om in ("i16", "planes", "planes_vpool"):
        monkeypatch.setenv("YOLO2_Q16_WI_BUDGET", str(1_200_000))  # th=8
        a = q16.conv3x3_q16_flat(xj, wp, 7, True, interpret=True,
                                 out_mode=om)
        assert a is not None, om
        if om == "i16":
            np.testing.assert_array_equal(np.asarray(a)[..., :N], ref)
        elif om == "planes":
            got = np.asarray(q16.recombine16(a[0][:, :, :W],
                                             a[1][:, :, :W]))
            np.testing.assert_array_equal(got[..., :N], ref)
        else:
            v = q16.recombine16(a[0], a[1])
            got = np.asarray(jnp.maximum(v[:, :, 0::2], v[:, :, 1::2])
                             [:, :, : W // 2])
            want = ref.reshape(B, H // 2, 2, W, N).max(axis=2)
            want = np.maximum(want[:, :, 0::2], want[:, :, 1::2])
            np.testing.assert_array_equal(got[..., :N], want)
