"""w8a8 turbo tier + Pallas fused matmul kernel (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from yolotpu import golden
from yolotpu.graph import ConvSpec
from yolotpu.models import yolov2, zoo
from yolotpu.ops import convops
from yolotpu.ops.pallas_matmul import matmul_int8_requant
from yolotpu.quant import (calibrate_activations, calibrate_activations_int8,
                           quantize_weights, quantize_weights_int8)
from yolotpu.weights import WeightStore


def _np_requant_ref(x, w, bias, shift, leaky):
    acc = x.astype(np.int64) @ w.astype(np.int64)
    if shift > 0:
        acc = (acc + (1 << (shift - 1))) >> shift
    elif shift < 0:
        acc = acc << -shift
    v = np.clip(acc + bias, -128, 127).astype(np.int32)
    if leaky:
        v = np.clip(np.where(v < 0, -((-v) // 10), v), -128, 127)
    return v.astype(np.int8)


@pytest.mark.parametrize("M,K,N,shift,leaky", [
    (256, 128, 128, 8, True),
    (512, 256, 128, 6, False),
    (300, 128, 256, 8, True),   # M padded internally
    (169, 384, 128, 10, True),  # conv-head-like M
])
def test_pallas_matmul_requant_interpret(M, K, N, shift, leaky):
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (M, K)).astype(np.int8)
    w = rng.integers(-128, 128, (K, N)).astype(np.int8)
    b = rng.integers(-1000, 1000, N).astype(np.int32)
    got = np.asarray(matmul_int8_requant(jnp.asarray(x), jnp.asarray(w),
                                         jnp.asarray(b), shift, leaky,
                                         interpret=True))
    want = _np_requant_ref(x, w, b, shift, leaky)
    np.testing.assert_array_equal(got, want)


def test_conv_int8_matches_numpy_twin():
    rng = np.random.default_rng(1)
    spec = ConvSpec(idx=0, h=16, w=16, c=32, out_h=16, out_w=16, out_c=24,
                    n=24, size=3, stride=1, pad=1, activation="leaky")
    x = rng.integers(-128, 128, (32, 16, 16)).astype(np.int8)
    w = rng.integers(-128, 128, (24, 32, 3, 3)).astype(np.int8)
    b = rng.integers(-100, 100, 24).astype(np.int8)
    qw, qa_in, qa_out, qb = 6, 4, 3, 5
    want = golden.conv_int8_int32acc(x, w, b, spec, qw, qa_in, qa_out, qb)

    bias_shifted = golden.shift_round_half_up(
        b.astype(np.int64), qb - qa_out).astype(np.int32)
    got = np.asarray(convops.conv_int8(
        jnp.asarray(x.transpose(1, 2, 0)[None]),
        jnp.asarray(w.transpose(2, 3, 1, 0)),
        jnp.asarray(bias_shifted), 1, 1, "leaky",
        qa_in + qw - qa_out))[0].transpose(2, 0, 1)
    np.testing.assert_array_equal(got, want)


def test_conv_int8_pallas_3x3_bitexact(monkeypatch):
    """The probe-gated int8 3x3 Pallas path (im2col + fused matmul kernel)
    must be bit-identical to the XLA s8 conv it replaces."""
    monkeypatch.setattr(convops, "_INT8_PALLAS_3X3", True)
    rng = np.random.default_rng(5)
    B, H, W, C, N = 2, 16, 16, 128, 128
    x = rng.integers(-128, 128, (B, H, W, C)).astype(np.int8)
    w = rng.integers(-128, 128, (3, 3, C, N)).astype(np.int8)
    b = rng.integers(-1000, 1000, N).astype(np.int32)
    for leaky in (True, False):
        act = "leaky" if leaky else "linear"
        got = np.asarray(convops.conv_int8(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1, 1, act, 7,
            use_pallas=True))
        monkeypatch.setattr(convops, "_INT8_PALLAS_3X3", False)
        want = np.asarray(convops.conv_int8(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1, 1, act, 7,
            use_pallas=True))
        monkeypatch.setattr(convops, "_INT8_PALLAS_3X3", True)
        np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_int8_forward_runs_and_correlates_with_fp32():
    spec = zoo.build("yolov2", width=64, height=64)
    store = WeightStore.synthetic(spec, seed=0)
    rng = np.random.default_rng(5)
    img = rng.random((3, 64, 64)).astype(np.float32)

    act_q8 = calibrate_activations_int8(spec, store, [img])
    quantize_weights_int8(store, act_q8)
    params8 = yolov2.params_int8(spec, store)
    f8 = yolov2.build_forward(spec, "int8", store.qtables8, outputs=("head",))
    h8 = np.asarray(f8(params8, jnp.asarray(img.transpose(1, 2, 0)[None]))["head"])

    fp = yolov2.build_forward(spec, "fp32", outputs=("head",))
    params = yolov2.params_fp32(spec, store)
    h32 = np.asarray(fp(params, jnp.asarray(img.transpose(1, 2, 0)[None]))["head"])

    corr = np.corrcoef(h8.reshape(-1), h32.reshape(-1))[0, 1]
    assert corr > 0.97, corr   # 8-bit tier: looser than int16 but usable


def test_int8_pallas_path_matches_xla_path():
    """compute='pallas' (interpretable on CPU) must equal the XLA dot path
    for the 1x1 layers it takes over."""
    rng = np.random.default_rng(2)
    M, C, F = 512, 128, 128
    x = rng.integers(-128, 128, (1, 16, 32, C)).astype(np.int8)
    w = rng.integers(-128, 128, (1, 1, C, F)).astype(np.int8)
    b = rng.integers(-500, 500, F).astype(np.int32)
    a = np.asarray(convops.conv_int8(jnp.asarray(x), jnp.asarray(w),
                                     jnp.asarray(b), 1, 0, "leaky", 7,
                                     use_pallas=False))
    # interpret path: call the kernel directly on the flattened matmul
    got = np.asarray(matmul_int8_requant(
        jnp.asarray(x.reshape(-1, C)), jnp.asarray(w.reshape(C, F)),
        jnp.asarray(b), 7, True, interpret=True)).reshape(a.shape)
    np.testing.assert_array_equal(got, a)


@pytest.mark.slow
def test_int8_jax_forward_bitexact_vs_golden():
    from yolotpu.golden import GoldenNet
    spec = zoo.build("yolov2", width=64, height=64)
    store = WeightStore.synthetic(spec, seed=0)
    rng = np.random.default_rng(9)
    img = rng.random((3, 64, 64)).astype(np.float32)
    act_q8 = calibrate_activations_int8(spec, store, [img])
    quantize_weights_int8(store, act_q8)
    g = GoldenNet(spec).forward_int16(img, store.int8, store.qtables8,
                                      mode="int8")
    params8 = yolov2.params_int8(spec, store)
    f8 = yolov2.build_forward(spec, "int8", store.qtables8, outputs=("head",))
    head = np.asarray(f8(params8, jnp.asarray(
        img.transpose(1, 2, 0)[None]))["head"])[0].transpose(2, 0, 1)
    np.testing.assert_array_equal(head, g[spec.n - 1])


@pytest.mark.parametrize("variant", ["direct", "im2col"])
def test_pallas_conv3x3_interpret(variant):
    from yolotpu.ops.pallas_conv import conv3x3_int8, conv3x3_int8_im2col
    from yolotpu.golden import im2col
    fn = conv3x3_int8 if variant == "direct" else conv3x3_int8_im2col
    rng = np.random.default_rng(0)
    B, H, W, C, F = 2, 16, 20, 32, 64
    x = rng.integers(-128, 128, (B, H, W, C)).astype(np.int8)
    w = rng.integers(-128, 128, (3, 3, C, F)).astype(np.int8)
    b = rng.integers(-500, 500, F).astype(np.int32)
    got = np.asarray(fn(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                        7, True, th=8, interpret=True))
    for i in range(B):
        cols = im2col(x[i].transpose(2, 0, 1).astype(np.int64), 3, 1, 1)
        acc = w.transpose(3, 2, 0, 1).reshape(F, -1).astype(np.int64) @ cols
        acc = ((acc + (1 << 6)) >> 7) + b.reshape(-1, 1)
        v = np.clip(acc, -128, 127)
        v = np.clip(np.where(v < 0, -((-v) // 10), v), -128, 127).reshape(F, H, W)
        np.testing.assert_array_equal(got[i].transpose(2, 0, 1).astype(int), v)
