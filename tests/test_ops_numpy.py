"""Numpy primitive parity: reorg, resize/letterbox, maxpool, int16 helpers."""

import numpy as np

from yolotpu import golden
from yolotpu.graph import MaxPoolSpec
from yolotpu.image import letterbox_image, resize_image, resize_image_scalar


def test_reorg_matches_index_math():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 26, 26)).astype(np.float32)
    fast = golden.reorg_darknet(x, 2)
    # literal reference formula, called exactly as yolo2_model.cpp:370 does:
    # (w=26, h=32*13=416, c=4, stride=2) over the same flat buffer
    ref = golden.reorg_index_math(x, w=26, h=416, c=4, stride=2)
    np.testing.assert_array_equal(fast.reshape(-1), ref)


def test_reorg_darknet_view_equivalence():
    """The reference's (c=4,h=416) call and darknet's own (c=64,h=26) call
    are the same permutation for this shape."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((64, 26, 26)).astype(np.float32)
    a = golden.reorg_index_math(x, w=26, h=416, c=4, stride=2)
    b = golden.reorg_index_math(x, w=26, h=26, c=64, stride=2)
    np.testing.assert_array_equal(a, b)


def test_reorg_other_shapes():
    rng = np.random.default_rng(3)
    for (c, h, w, s) in [(16, 8, 8, 2), (36, 12, 6, 3), (4, 4, 4, 2)]:
        x = rng.standard_normal((c, h, w)).astype(np.float32)
        fast = golden.reorg_darknet(x, s)
        ref = golden.reorg_index_math(x, w=w, h=h, c=c, stride=s)
        np.testing.assert_array_equal(fast.reshape(-1), ref)
        assert fast.shape == (c * s * s, h // s, w // s)


def test_resize_vectorized_vs_scalar():
    rng = np.random.default_rng(4)
    for (sh, sw, th, tw) in [(7, 9, 13, 5), (20, 15, 32, 32), (1, 8, 4, 4),
                             (576, 768, 416, 312)]:
        im = rng.random((3, sh, sw)).astype(np.float32)
        a = resize_image(im, tw, th)
        b = resize_image_scalar(im, tw, th)
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_letterbox_geometry():
    im = np.ones((3, 576, 768), np.float32)  # dog.jpg dims
    boxed = letterbox_image(im, 416, 416)
    assert boxed.shape == (3, 416, 416)
    # integer math: new_h = (576*416)//768 = 312 -> 52px gray bands
    assert np.all(boxed[:, :52, :] == 0.5)
    assert np.all(boxed[:, -52:, :] == 0.5)
    assert np.all(boxed[:, 52:364, :] == 1.0)


def test_maxpool_even():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 8, 8)).astype(np.float32)
    spec = MaxPoolSpec(idx=0, h=8, w=8, c=2, out_h=4, out_w=4, out_c=2,
                       size=2, stride=2, padding=1)
    out = golden.maxpool(x, spec, -np.inf)
    assert out.shape == (2, 4, 4)
    assert out[0, 0, 0] == x[0, :2, :2].max()
    assert out[1, 3, 3] == x[1, 6:8, 6:8].max()


def test_maxpool_stride1_bottom_right_pad():
    """tiny-yolo's size=2/stride=1 pool: last row/col windows clip."""
    x = np.arange(9, dtype=np.float32).reshape(1, 3, 3)
    spec = MaxPoolSpec(idx=0, h=3, w=3, c=1, out_h=3, out_w=3, out_c=1,
                       size=2, stride=1, padding=1)
    out = golden.maxpool(x, spec, -np.inf)
    np.testing.assert_array_equal(out[0], [[4, 5, 5], [7, 8, 8], [7, 8, 8]])


def test_int16_helpers():
    # round-half-up shift (core_compute.cpp:49-63)
    v = np.array([5, -5, 6, -6, 7], np.int64)
    np.testing.assert_array_equal(golden.shift_round_half_up(v, 1), [3, -2, 3, -3, 4])
    np.testing.assert_array_equal(golden.shift_round_half_up(v, 0), v)
    np.testing.assert_array_equal(golden.shift_round_half_up(v, -2), v * 4)
    # integer leaky: trunc-toward-zero /10 (core_compute.cpp:192-198)
    lv = golden.leaky_int16(np.array([-7, -10, -19, 5, 0], np.int16))
    np.testing.assert_array_equal(lv, [0, -1, -1, 5, 0])
    # input quantization: llround = half away from zero (yolo2_model.cpp:264)
    q = golden.quantize_fp32_to_int16(np.array([0.5, -0.5, 1.5], np.float32), 0)
    np.testing.assert_array_equal(q, [1, -1, 2])
    q2 = golden.quantize_fp32_to_int16(np.array([1.0, -2.0], np.float32), 20)
    np.testing.assert_array_equal(q2, [32767, -32768])
