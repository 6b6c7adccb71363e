"""Drawing + alphabet-glyph label compositing.

Covers the darknet color wheel (``src/core/yolo_post.cpp:87-97``) and the
get_label/draw_label compositing flow (``yolo_post.cpp:248-307``,
``data/labels/make_labels.py`` alphabet role).
"""

import numpy as np

from yolotpu.postprocess import Detection
from yolotpu.runtime import alphabet as alpha
from yolotpu.runtime.drawing import class_rgb, draw_detections, get_color


def test_color_wheel_matches_darknet():
    # darknet get_color with the canonical 6-color table
    colors = [[1, 0, 1], [0, 0, 1], [0, 1, 1], [0, 1, 0], [1, 1, 0], [1, 0, 0]]

    def ref(c, x, mx):
        ratio = (x / mx) * 5
        i, j = int(np.floor(ratio)), int(np.ceil(ratio))
        ratio -= i
        return (1 - ratio) * colors[i][c] + ratio * colors[j][c]

    for cls in range(80):
        off = cls * 123457 % 80
        want = tuple(int(255 * ref(ch, off, 80)) for ch in (2, 1, 0))
        assert class_rgb(cls, 80) == want
    assert get_color(0, 0, 80) == 1.0


def test_alphabet_tiers_and_label():
    ab = alpha.load_alphabet()
    assert len(ab) == alpha.SIZES
    # tier glyph heights grow monotonically
    hs = [ab[i]["A"].shape[0] for i in range(alpha.SIZES)]
    assert hs == sorted(hs) and hs[0] < hs[-1]
    strip = alpha.get_label(ab, "dog: 0.81", 24)
    assert strip.ndim == 2 and 0.0 <= strip.min() and strip.max() <= 1.0
    assert strip.shape[1] > strip.shape[0]      # wider than tall
    # unknown chars fall back, empty text still yields a strip
    assert alpha.get_label(ab, "\x01", 12).size > 0
    assert alpha.get_label(ab, "", 12).size > 0


def test_draw_label_blends_in_place_and_clips():
    ab = alpha.load_alphabet()
    strip = alpha.get_label(ab, "x", 12)
    im = np.zeros((3, 32, 32), np.float32)
    alpha.draw_label(im, 1, 1, strip, (1.0, 0.5, 0.25))
    assert im[0].max() > 0
    # channel scaling: red >= green >= blue everywhere
    assert np.all(im[0] >= im[1] - 1e-6) and np.all(im[1] >= im[2] - 1e-6)
    # clipping: label larger than the image must not raise
    big = alpha.get_label(ab, "a very long label indeed", 60)
    alpha.draw_label(im, 30, 20, big, (1, 1, 1))


def test_draw_detections_alphabet_path():
    prob = np.zeros(80, np.float32)
    prob[16] = 0.9
    d = Detection(bbox=(0.5, 0.5, 0.4, 0.4), classes=80, prob=prob,
                  objectness=0.9)
    base = np.zeros((3, 128, 128), np.float32)
    names = [f"c{i}" for i in range(80)]
    out = draw_detections(base, [d], names, 0.5)
    assert out.shape == (3, 128, 128) and out.max() > 0
    out2 = draw_detections(base, [d], names, 0.5, use_alphabet=False)
    assert out2.shape == (3, 128, 128) and out2.max() > 0
    # below-threshold detection draws nothing
    out3 = draw_detections(base, [d], names, 0.95)
    assert out3.max() == 0
