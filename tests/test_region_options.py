"""Full darknet activation set + region softmax/background cfg options.

Covers VERDICT round-1 gaps: the 5 previously-missing activations
(plse/loggy/stair/hardtan/lhtan, reference yolo_math.cpp:111-129) and the
region head's softmax=0 / background=1 semantics (yolo_region.cpp:123-141),
checked device-vs-host (the host path is the validated oracle).
"""

import numpy as np
import jax.numpy as jnp

from yolotpu import golden
from yolotpu.graph import RegionSpec
from yolotpu.ops import convops, region
from yolotpu.postprocess import forward_region

ALL_ACTIVATIONS = ("linear", "leaky", "relu", "logistic", "tanh", "elu",
                   "ramp", "relie", "loggy", "plse", "stair", "hardtan",
                   "lhtan")


def test_all_activations_golden_vs_jax():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 64)).astype(np.float32) * 3.0
    # include exact integers and halves (stair branch points)
    x[0, :8] = [-3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 2.5, -2.5]
    for act in ALL_ACTIVATIONS:
        want = golden.activate_fp32(x, act)
        got = np.asarray(convops.activate_fp32(jnp.asarray(x), act))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6,
                                   err_msg=act)


def test_activation_reference_values():
    """Spot-check the C formulas on hand-computed points."""
    x = np.array([-5.0, -1.0, 0.0, 0.5, 1.5, 5.0], np.float32)
    np.testing.assert_allclose(
        golden.activate_fp32(x, "plse"),
        [0.01 * (-5 + 4), 0.125 * -1 + 0.5, 0.5, 0.125 * 0.5 + 0.5,
         0.125 * 1.5 + 0.5, 0.01 * (5 - 4) + 1], rtol=1e-6)
    np.testing.assert_allclose(
        golden.activate_fp32(x, "hardtan"), [-1, -1, 0, 0.5, 1, 1])
    np.testing.assert_allclose(
        golden.activate_fp32(x, "lhtan"),
        [0.001 * -5, 0.001 * -1, 0, 0.5, 0.001 * 0.5 + 1, 0.001 * 4 + 1],
        rtol=1e-5)
    np.testing.assert_allclose(
        golden.activate_fp32(x, "loggy"),
        2.0 / (1.0 + np.exp(-x)) - 1.0, rtol=1e-6)
    # stair: n=floor(x); even n -> floor(x/2); odd n -> (x-n)+floor(x/2)
    xs = np.array([0.25, 1.25, 2.25, -0.75, -1.75, 4.0], np.float32)
    want = []
    for v in xs:
        n = int(np.floor(v))
        half = np.float32(np.floor(v / 2.0))
        want.append(half if n % 2 == 0 else (v - n) + half)
    np.testing.assert_allclose(golden.activate_fp32(xs, "stair"), want,
                               rtol=1e-6)


def _spec(num=2, classes=3, softmax=True, background=False, h=3, w=3):
    return RegionSpec(idx=0, h=h, w=w, c=num * (classes + 5), out_h=h,
                      out_w=w, out_c=num * (classes + 5), num=num,
                      classes=classes, coords=4, softmax=softmax,
                      background=background,
                      biases=(1.0, 2.0, 3.0, 1.5))


def _device_vs_host(spec):
    rng = np.random.default_rng(7)
    head = rng.standard_normal(
        (1, spec.h, spec.w, spec.num * (spec.classes + 5))).astype(np.float32)
    stride = spec.h * spec.w

    # host oracle on the CHW-flat layout
    chw = head[0].transpose(2, 0, 1).reshape(-1)
    host = forward_region(chw, spec).reshape(
        spec.num, spec.classes + 5, stride)
    host_obj = host[:, spec.coords, :]               # (n, stride)
    host_cls = host[:, spec.coords + 1:, :]          # (n, classes, stride)

    _, obj, probs = region.decode_region(jnp.asarray(head), spec)
    # device order is cell-major anchor-minor
    dev_obj = np.asarray(obj)[0].reshape(stride, spec.num).T
    dev_cls = np.asarray(probs)[0].reshape(
        stride, spec.num, spec.classes).transpose(1, 2, 0)
    np.testing.assert_allclose(dev_obj, host_obj, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(dev_cls, host_cls, rtol=1e-5, atol=1e-6)

    # activated_head must equal the host tensor wholesale (NHWC vs CHW)
    act = np.asarray(region.activated_head(jnp.asarray(head), spec))
    act_chw = act[0].transpose(2, 0, 1).reshape(
        spec.num, spec.classes + 5, stride)
    np.testing.assert_allclose(act_chw, host, rtol=1e-5, atol=1e-6)


def test_region_softmax_on_background_off():
    _device_vs_host(_spec(softmax=True, background=False))


def test_region_softmax_off():
    _device_vs_host(_spec(softmax=False, background=False))


def test_region_background_on_softmax_on():
    _device_vs_host(_spec(softmax=True, background=True))


def test_region_background_on_softmax_off():
    _device_vs_host(_spec(softmax=False, background=True))
