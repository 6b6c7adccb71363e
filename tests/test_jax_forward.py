"""JAX forward parity vs the numpy golden oracle (CPU backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

from yolotpu import golden
from yolotpu.golden import GoldenNet
from yolotpu.models import yolov2, zoo
from yolotpu.ops import pool as pool_ops
from yolotpu.ops import reorg as reorg_ops
from yolotpu.ops import region as region_ops
from yolotpu.postprocess import forward_region
from yolotpu.quant import calibrate_activations, quantize_weights
from yolotpu.weights import WeightStore


def _small_setup(width=64, seed=0):
    spec = zoo.build("yolov2", width=width, height=width)
    store = WeightStore.synthetic(spec, seed=seed)
    rng = np.random.default_rng(seed + 100)
    img = rng.random((3, width, width)).astype(np.float32)
    return spec, store, img


def _nhwc(chw: np.ndarray) -> np.ndarray:
    return chw.transpose(1, 2, 0)[None]


def test_reorg_jax_matches_golden():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 26, 26)).astype(np.float32)
    want = golden.reorg_darknet(x, 2)
    got = np.asarray(reorg_ops.reorg(jnp.asarray(_nhwc(x)), 2))[0]
    np.testing.assert_array_equal(got.transpose(2, 0, 1), want)


def test_maxpool_jax_matches_golden():
    from yolotpu.graph import MaxPoolSpec
    rng = np.random.default_rng(1)
    for (h, size, stride, padding) in [(8, 2, 2, 1), (5, 2, 1, 1), (9, 3, 2, 2)]:
        out_h = (h + padding - size) // stride + 1
        x = rng.standard_normal((4, h, h)).astype(np.float32)
        spec = MaxPoolSpec(idx=0, h=h, w=h, c=4, out_h=out_h, out_w=out_h,
                           out_c=4, size=size, stride=stride, padding=padding)
        want = golden.maxpool(x, spec, -np.inf)
        got = np.asarray(pool_ops.maxpool(jnp.asarray(_nhwc(x)), size, stride, padding))[0]
        np.testing.assert_array_equal(got.transpose(2, 0, 1), want)


def test_fp32_forward_matches_golden():
    spec, store, img = _small_setup()
    acts = GoldenNet(spec).forward_fp32(img, store.fp32)
    fwd = yolov2.build_forward(spec, "fp32", outputs=("head",))
    params = yolov2.params_fp32(spec, store)
    head = np.asarray(fwd(params, jnp.asarray(_nhwc(img)))["head"])[0]
    want = acts[spec.n - 1]
    got = head.transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_int16_forward_bitexact_vs_golden_int32_mode():
    spec, store, img = _small_setup()
    act_q = calibrate_activations(spec, store, [img])
    quantize_weights(store, act_q)
    g = GoldenNet(spec).forward_int16(img, store.int16, store.qtables,
                                      mode="int32")
    fwd = yolov2.build_forward(spec, "int16", store.qtables,
                               compute="int32", outputs=("head",))
    params = yolov2.params_int16(spec, store)
    head = np.asarray(fwd(params, jnp.asarray(_nhwc(img)))["head"])[0]
    want = g[spec.n - 1]               # dequantized fp32 region input
    got = head.transpose(2, 0, 1)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_int16_f32_compute_mode_close_to_int32():
    """The f32 compute modes are *approximate*: f32 cannot represent odd
    integers above 2**24, so occasional requant ties flip by 1 LSB and then
    wander through the downstream quantized layers. Assert the divergence
    stays small (a few LSB at the head) and nearly perfectly correlated —
    bit-exactness is the int32 mode's contract, not this one's."""
    spec, store, img = _small_setup()
    act_q = calibrate_activations(spec, store, [img])
    quantize_weights(store, act_q)
    params = yolov2.params_int16(spec, store)
    x = jnp.asarray(_nhwc(img))
    f_exact = yolov2.build_forward(spec, "int16", store.qtables, "int32", ("head",))
    f_f32 = yolov2.build_forward(spec, "int16", store.qtables, "f32_highest", ("head",))
    a = np.asarray(f_exact(params, x)["head"]).reshape(-1)
    b = np.asarray(f_f32(params, x)["head"]).reshape(-1)
    qstep = 2.0 ** (-store.qtables.act_q[-1])
    assert np.abs(a - b).max() <= 16 * qstep
    assert np.corrcoef(a, b)[0, 1] > 0.99999


def test_int16_exact_vs_production_divergence_bounded():
    """Characterize reference-exact (per-group requant) vs production
    (int32 accum) divergence: must stay within a few LSB at the head."""
    spec, store, img = _small_setup(width=32)
    act_q = calibrate_activations(spec, store, [img])
    quantize_weights(store, act_q)
    g = GoldenNet(spec)
    a = g.forward_int16(img, store.int16, store.qtables, mode="exact")[spec.n - 1]
    b = g.forward_int16(img, store.int16, store.qtables, mode="int32")[spec.n - 1]
    qstep = 2.0 ** (-store.qtables.act_q[-1])
    corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
    assert corr > 0.999
    assert np.abs(a - b).max() < 200 * qstep  # reference's own rounding noise


def test_region_decode_matches_postprocess():
    spec, store, img = _small_setup()
    fwd = yolov2.build_forward(spec, "fp32", outputs=("head", "boxes"))
    params = yolov2.params_fp32(spec, store)
    out = fwd(params, jnp.asarray(_nhwc(img)))
    head = np.asarray(out["head"])[0]
    rspec = spec.region
    # numpy reference decode over the CHW flat head
    act = forward_region(head.transpose(2, 0, 1).reshape(-1), rspec)
    stride = rspec.w * rspec.h
    x = act.reshape(rspec.num, 4 + 1 + rspec.classes, stride)
    boxes = np.asarray(out["boxes"])[0]
    obj = np.asarray(out["obj"])[0]
    probs = np.asarray(out["probs"])[0]
    # device order: cell-major, anchor-minor
    for i in range(stride):
        row, col = i // rspec.w, i % rspec.w
        for a in range(rspec.num):
            k = i * rspec.num + a
            bx = (col + x[a, 0, i]) / rspec.w
            by = (row + x[a, 1, i]) / rspec.h
            bw = np.exp(x[a, 2, i]) * rspec.biases[2 * a] / rspec.w
            bh = np.exp(x[a, 3, i]) * rspec.biases[2 * a + 1] / rspec.h
            np.testing.assert_allclose(boxes[k], [bx, by, bw, bh], rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(obj[k], x[a, 4, i], rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(probs[k], x[a, 5:, i], rtol=1e-4, atol=1e-6)


def test_batched_forward():
    spec, store, img = _small_setup()
    fwd = yolov2.build_forward(spec, "fp32", outputs=("head",))
    params = yolov2.params_fp32(spec, store)
    x1 = jnp.asarray(_nhwc(img))
    x4 = jnp.concatenate([x1, x1 * 0.5, x1 * 0.0, x1], axis=0)
    h4 = np.asarray(fwd(params, x4)["head"])
    h1 = np.asarray(fwd(params, x1)["head"])
    np.testing.assert_allclose(h4[0], h1[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(h4[3], h1[0], rtol=1e-5, atol=1e-5)


def test_tiny_yolo_forward_fp32():
    """yolov2-tiny exercises the stride-1 maxpool (bottom/right clipped
    windows) through the jitted path."""
    spec = zoo.build("yolov2-tiny", width=128, height=128)
    store = WeightStore.synthetic(spec, seed=3)
    rng = np.random.default_rng(3)
    img = rng.random((3, 128, 128)).astype(np.float32)
    acts = GoldenNet(spec).forward_fp32(img, store.fp32)
    fwd = yolov2.build_forward(spec, "fp32", outputs=("head",))
    params = yolov2.params_fp32(spec, store)
    head = np.asarray(fwd(params, jnp.asarray(_nhwc(img)))["head"])[0]
    np.testing.assert_allclose(head.transpose(2, 0, 1), acts[spec.n - 1],
                               rtol=3e-4, atol=3e-4)


def test_voc_forward_int16():
    spec = zoo.build("yolov2-voc", width=64, height=64)
    store = WeightStore.synthetic(spec, seed=4)
    rng = np.random.default_rng(4)
    img = rng.random((3, 64, 64)).astype(np.float32)
    act_q = calibrate_activations(spec, store, [img])
    quantize_weights(store, act_q)
    g = GoldenNet(spec).forward_int16(img, store.int16, store.qtables,
                                      mode="int32")
    fwd = yolov2.build_forward(spec, "int16", store.qtables, "int32", ("head",))
    params = yolov2.params_int16(spec, store)
    head = np.asarray(fwd(params, jnp.asarray(_nhwc(img)))["head"])[0]
    np.testing.assert_array_equal(head.transpose(2, 0, 1), g[spec.n - 1])
