"""Region decode + NMS behavior vs hand-computed darknet semantics."""

import numpy as np

from yolotpu.graph import RegionSpec
from yolotpu.postprocess import (Detection, box_iou, correct_region_boxes,
                                 do_nms_sort, forward_region,
                                 get_region_detections, logistic)


def _spec(w=2, h=2, num=2, classes=3):
    return RegionSpec(idx=0, h=h, w=w, c=num * (classes + 5), out_h=h,
                      out_w=w, out_c=num * (classes + 5), num=num,
                      classes=classes, coords=4, softmax=True,
                      biases=(1.0, 2.0, 3.0, 1.5))


def test_forward_region_activations():
    spec = _spec()
    rng = np.random.default_rng(0)
    raw = rng.standard_normal(spec.outputs).astype(np.float32)
    out = forward_region(raw, spec)
    stride = spec.w * spec.h
    per = (4 + spec.classes + 1) * stride
    r = raw.reshape(spec.num, -1)
    o = out.reshape(spec.num, -1)
    for a in range(spec.num):
        # x,y logistic
        np.testing.assert_allclose(o[a, :2 * stride], logistic(r[a, :2 * stride]), rtol=1e-6)
        # w,h untouched
        np.testing.assert_array_equal(o[a, 2 * stride:4 * stride], r[a, 2 * stride:4 * stride])
        # obj logistic
        np.testing.assert_allclose(o[a, 4 * stride:5 * stride],
                                   logistic(r[a, 4 * stride:5 * stride]), rtol=1e-6)
        # classes: softmax over class axis per cell, from RAW values
        cls_raw = r[a, 5 * stride:].reshape(spec.classes, stride)
        e = np.exp(cls_raw - cls_raw.max(axis=0))
        sm = e / e.sum(axis=0)
        np.testing.assert_allclose(o[a, 5 * stride:].reshape(spec.classes, stride),
                                   sm, rtol=1e-5)


def test_box_decode_and_probs():
    spec = _spec(w=2, h=2, num=1, classes=2)
    stride = 4
    raw = np.zeros(spec.outputs, np.float32)
    # cell (row=1, col=0) => i=2; obj raw value large => sigmoid ~1
    i = 2
    raw[0 * stride + i] = 0.0        # x -> sigmoid = .5
    raw[1 * stride + i] = 0.0        # y
    raw[2 * stride + i] = np.log(2.0)  # w: exp = 2
    raw[3 * stride + i] = 0.0          # h: exp = 1
    raw[4 * stride + i] = 10.0         # obj
    raw[5 * stride + i] = 5.0          # class0 dominates
    out = forward_region(raw, spec)
    dets = get_region_detections(out, spec, im_w=416, im_h=416,
                                 net_w=416, net_h=416, thresh=0.5)
    assert len(dets) == 1
    d = dets[0]
    # b.x=(0+.5)/2=.25, b.y=(1+.5)/2=.75, b.w=2*bias0/2=1.0, b.h=1*2.0/2=1.0
    np.testing.assert_allclose(d.bbox, (0.25, 0.75, 1.0, 1.0), atol=1e-6)
    assert d.objectness > 0.99
    assert d.prob[0] > 0.5 and d.prob[1] == 0.0  # below-thresh probs zeroed


def test_correct_region_boxes_wide_image():
    # 768x576 image into 416x416: new_w=416, new_h=312, 52px bands
    boxes = np.array([[0.5, 0.5, 0.2, 0.3]], np.float32)
    out = correct_region_boxes(boxes, im_w=768, im_h=576, net_w=416, net_h=416)
    np.testing.assert_allclose(out[0, 0], 0.5, atol=1e-6)
    # y: (0.5 - 52/416) / (312/416) = 0.5
    np.testing.assert_allclose(out[0, 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(out[0, 2], 0.2, atol=1e-6)          # w unchanged
    np.testing.assert_allclose(out[0, 3], 0.3 * 416 / 312, atol=1e-6)


def test_box_iou():
    a = (0.5, 0.5, 0.4, 0.4)
    assert abs(box_iou(a, a) - 1.0) < 1e-9
    b = (10.0, 10.0, 0.1, 0.1)
    assert box_iou(a, b) == 0.0
    c = (0.7, 0.5, 0.4, 0.4)  # half horizontal overlap
    iou = box_iou(a, c)
    assert abs(iou - (0.2 * 0.4) / (2 * 0.16 - 0.08)) < 1e-9


def _det(x, y, w, h, obj, probs):
    return Detection(bbox=(x, y, w, h), objectness=obj,
                     prob=np.asarray(probs, np.float32), classes=len(probs))


def test_nms_classwise_suppression():
    d1 = _det(0.5, 0.5, 0.4, 0.4, 0.9, [0.9, 0.0])
    d2 = _det(0.52, 0.5, 0.4, 0.4, 0.8, [0.8, 0.0])   # overlaps d1, same class
    d3 = _det(0.52, 0.5, 0.4, 0.4, 0.8, [0.0, 0.7])   # overlaps, other class
    d4 = _det(0.0, 0.0, 0.1, 0.1, 0.0, [0.5, 0.5])    # zero objectness: dropped
    dets = do_nms_sort([d1, d2, d3, d4], classes=2, thresh=0.45)
    assert len(dets) == 3
    by_box = {d.bbox: d for d in dets}
    assert by_box[(0.5, 0.5, 0.4, 0.4)].prob[0] == np.float32(0.9)
    assert by_box[(0.52, 0.5, 0.4, 0.4)].prob[0] == 0.0 or \
        by_box[(0.52, 0.5, 0.4, 0.4)].prob[1] > 0  # d2 suppressed on class 0
    # class-1 detection survives (no higher-scoring class-1 box)
    assert any(d.prob[1] == np.float32(0.7) for d in dets)
