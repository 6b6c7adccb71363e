"""Native C++ preprocessing: bit-exact vs the numpy implementations."""

import numpy as np
import pytest

from yolotpu import image as pyimg
from yolotpu import native
from yolotpu.golden import quantize_fp32_to_int16
from yolotpu.runtime.camera import yuyv_to_rgb as py_yuyv

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ unavailable")


def test_hwc_to_chw():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (37, 53, 3), np.uint8)
    a = native.hwc_to_chw(rgb)
    b = (rgb.astype(np.float32) / 255.0).transpose(2, 0, 1)
    np.testing.assert_array_equal(a, b)


def test_resize_bit_exact():
    rng = np.random.default_rng(1)
    for (sh, sw, dh, dw) in [(48, 64, 416, 312), (576, 768, 312, 416),
                             (10, 10, 31, 7), (216, 216, 416, 416)]:
        im = rng.random((3, sh, sw)).astype(np.float32)
        a = native.resize(im, dw, dh)
        b = pyimg.resize_image(im, dw, dh)
        np.testing.assert_array_equal(a, b)


def test_letterbox_bit_exact():
    rng = np.random.default_rng(2)
    for (sh, sw) in [(576, 768), (768, 576), (100, 100)]:
        im = rng.random((3, sh, sw)).astype(np.float32)
        a = native.letterbox(im, 416, 416)
        b = pyimg.letterbox_image(im, 416, 416)
        np.testing.assert_array_equal(a, b)


def test_frame_to_input_fused():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (480, 640, 3), np.uint8)
    a = native.frame_to_input(rgb, 416, 416)
    chw = (rgb.astype(np.float32) / 255.0).transpose(2, 0, 1)
    b = pyimg.letterbox_image(chw, 416, 416)
    np.testing.assert_array_equal(a, b)


def test_yuyv_bit_exact():
    rng = np.random.default_rng(4)
    yuyv = rng.integers(0, 256, (64 * 32 * 2,), np.uint8)
    a = native.yuyv_to_rgb(yuyv, 64, 32)
    b = py_yuyv(yuyv, 64, 32)
    np.testing.assert_array_equal(a, b)


def test_quantize_int16_bit_exact():
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(10000) * 3).astype(np.float32)
    for q in (0, 7, 13, -2):
        a = native.quantize_int16(x, q)
        b = quantize_fp32_to_int16(x, q)
        np.testing.assert_array_equal(a, b)


def test_native_faster_than_numpy():
    import time
    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, (720, 1280, 3), np.uint8)
    native.frame_to_input(rgb, 416, 416)  # build+warm
    t0 = time.perf_counter()
    for _ in range(10):
        native.frame_to_input(rgb, 416, 416)
    t_native = (time.perf_counter() - t0) / 10
    t0 = time.perf_counter()
    for _ in range(10):
        chw = (rgb.astype(np.float32) / 255.0).transpose(2, 0, 1)
        pyimg.letterbox_image(chw, 416, 416)
    t_numpy = (time.perf_counter() - t0) / 10
    # informative more than gating; native must not be slower
    assert t_native < t_numpy * 1.5, (t_native, t_numpy)
