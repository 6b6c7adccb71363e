"""End-to-end accuracy: train -> detect -> mAP, fp32 vs int16.

Exercises the full loop the reference validates only by eye on dog.jpg
(yolov2_main.cpp:234-335): a micro region-head detector is trained on
generated scenes with known boxes, then ``eval.evaluate_engine`` scores
fp32 and int16 engines on held-out image+label FILES, asserting the
BASELINE criterion (int16 mAP within 0.1 of fp32) and nonzero learning.
"""

import os

import numpy as np
import pytest

from yolotpu import eval as yeval
from yolotpu.graph import NetworkSpec
from yolotpu.quant import calibrate_activations, quantize_weights
from yolotpu.runtime.engine import Engine
from yolotpu.train import LossConfig, make_train_step, zeros_like_velocity
from yolotpu.weights import WeightStore

pytestmark = pytest.mark.slow

MICRO_CFG = """
[net]
height=96
width=96
channels=3

[convolutional]
filters=16
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=32
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=64
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=14
size=1
stride=1
pad=1
activation=linear

[region]
anchors=4.5,4.5, 4.5,4.5
num=2
classes=2
coords=4
softmax=1
"""

CLASS_COLORS = {0: (210, 40, 40), 1: (40, 60, 210)}   # red / blue


def make_scene(rng, w=96, h=96, n_obj=2):
    """Gray canvas with colored axis-aligned boxes; labels in darknet
    normalized center format."""
    img = np.full((h, w, 3), 128, np.uint8)
    img += rng.integers(-8, 8, img.shape).astype(np.uint8)
    boxes, classes = [], []
    for _ in range(n_obj):
        cls = int(rng.integers(0, 2))
        bw = int(rng.integers(28, 44))
        bh = int(rng.integers(28, 44))
        x0 = int(rng.integers(2, w - bw - 2))
        y0 = int(rng.integers(2, h - bh - 2))
        img[y0:y0 + bh, x0:x0 + bw] = CLASS_COLORS[cls]
        boxes.append(((x0 + bw / 2) / w, (y0 + bh / 2) / h, bw / w, bh / h))
        classes.append(cls)
    return img, np.asarray(boxes, np.float32), np.asarray(classes, np.int32)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    spec_dir = tmp_path_factory.mktemp("acc")
    cfg = spec_dir / "micro.cfg"
    cfg.write_text(MICRO_CFG)
    spec = NetworkSpec.from_cfg(str(cfg))
    rng = np.random.default_rng(0)

    # fixed training set of 24 scenes
    scenes = [make_scene(rng) for _ in range(24)]
    max_boxes = 8

    def batch_from(idxs):
        B = len(idxs)
        imgs = np.zeros((B, 96, 96, 3), np.float32)
        bx = np.zeros((B, max_boxes, 4), np.float32)
        cl = np.zeros((B, max_boxes), np.int32)
        mk = np.zeros((B, max_boxes), np.float32)
        for k, i in enumerate(idxs):
            img, boxes, classes = scenes[i]
            imgs[k] = img.astype(np.float32) / 255.0
            n = len(classes)
            bx[k, :n], cl[k, :n], mk[k, :n] = boxes, classes, 1.0
        return {"images": imgs, "boxes": bx, "classes": cl, "mask": mk}

    from yolotpu.models import yolov2 as m
    store0 = WeightStore.synthetic(spec, seed=3)
    params = m.params_fp32(spec, store0)
    step = make_train_step(spec, lr=5e-4, momentum=0.9,
                           cfg=LossConfig(rescore=False))
    import jax
    step = jax.jit(step)
    vel = zeros_like_velocity(params)
    order = np.arange(24)
    losses = []
    for it in range(500):
        rng.shuffle(order)
        params, vel, loss = step(params, vel, batch_from(order[:8]))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # trained params -> WeightStore (darknet (n,c,k,k) order)
    store = WeightStore(spec=spec)
    for l in spec.conv_layers():
        p = params[f"conv{l.idx}"]
        store.fp32[l.idx] = (
            np.ascontiguousarray(np.asarray(p["w"]).transpose(3, 2, 0, 1),
                                 dtype=np.float32),
            np.asarray(p["b"], np.float32))

    # held-out eval files (real image + darknet label files on disk)
    from PIL import Image
    eval_rng = np.random.default_rng(99)
    pairs = []
    for i in range(8):
        img, boxes, classes = make_scene(eval_rng)
        ip = str(spec_dir / f"eval{i}.png")
        lp = str(spec_dir / f"eval{i}.txt")
        Image.fromarray(img).save(ip)
        with open(lp, "w") as f:
            for b, c in zip(boxes, classes):
                f.write(f"{c} {b[0]} {b[1]} {b[2]} {b[3]}\n")
        pairs.append((ip, lp))
    return spec, store, pairs


def test_fp32_learns_and_int16_matches(trained):
    spec, store, pairs = trained
    eng32 = Engine(spec, store, precision="fp32", backend="xla")
    r32 = yeval.evaluate_engine(eng32, pairs, num_classes=2,
                                thresh=0.05)
    assert r32["images"] == 8
    # the task is near-trivial; trained fp32 must actually detect
    # (nontrivial-mAP criterion: measured 0.539 deterministic at seed 3)
    assert r32["mAP_50"] >= 0.5, r32

    calib = [s[0].astype(np.float32).transpose(2, 0, 1) / 255.0
             for s in [(np.full((96, 96, 3), 128, np.uint8),)]]
    # calibrate on training-like data (uniform gray + one real scene)
    from yolotpu.image import load_image
    calib.append(load_image(pairs[0][0]))
    act_q = calibrate_activations(spec, store, calib)
    quantize_weights(store, act_q)
    eng16 = Engine(spec, store, precision="int16", backend="xla")
    r16 = yeval.evaluate_engine(eng16, pairs, num_classes=2,
                                thresh=0.05)

    # BASELINE criterion: int16 within 0.1 mAP of fp32
    assert abs(r32["mAP_50"] - r16["mAP_50"]) <= 0.1, (r32, r16)
    assert r16["mAP_50"] > 0.4, r16


def test_pallas_tier_map_identical_to_int16(trained):
    """The exact-int16 Pallas tier is bit-identical to the int32 tier, so
    its detections — and therefore mAP — must match EXACTLY (VERDICT r2
    item 7: |mAP(pallas) - mAP(int16)| = 0)."""
    spec, store, pairs = trained
    from yolotpu.image import load_image
    calib = [np.full((3, 96, 96), 0.5, np.float32),
             load_image(pairs[0][0])]
    act_q = calibrate_activations(spec, store, calib)
    quantize_weights(store, act_q)

    eng16 = Engine(spec, store, precision="int16", backend="xla",
                   compute="int32")
    r16 = yeval.evaluate_engine(eng16, pairs, num_classes=2, thresh=0.05)
    engp = Engine(spec, store, precision="int16", backend="xla",
                  compute="pallas")
    rp = yeval.evaluate_engine(engp, pairs, num_classes=2, thresh=0.05)
    assert rp["mAP_50"] == r16["mAP_50"], (rp, r16)
    assert rp["images"] == r16["images"] == 8
