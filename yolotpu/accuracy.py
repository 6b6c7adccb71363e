"""Accuracy protocol v2: synthetic detection scenes with statistical power.

The round-4 protocol (16 scenes, 2 classes, fixed-scale rectangles) was
noise-dominated: a quantized tier "beat" its own fp32 oracle by +0.16 mAP,
which is only possible when per-scene variance swamps the tier deltas
(VERDICT r4 weak #2). This module is the rebuilt protocol:

- >=8 classes (distinct colors), >=64 eval scenes,
- object diversity: relative scale 0.12-0.45, aspect 0.5-2.0, 1-4 objects
  per scene, partial occlusion (later objects may overlap earlier ones),
- RELATIVE geometry throughout, so the same distribution renders at any
  resolution (128^2 for the CPU slow suite, 416^2 for the TPU evidence runs
  feeding plans/accuracy_<tier>.json),
- >=3 training seeds with mean +/- CI95 via tools/accuracy_protocol.py,
- a protocol hash stamped into every evidence file so bench.py can detect
  stale evidence instead of asserting an unmeasured constant
  (VERDICT r4 weak #3).

The reference's accuracy intent is real-weights detections on dog.jpg
(linux_app/src/main.c:808-839); with the real blob absent, this synthetic
protocol is the strongest available stand-in: trained flagship-depth
weights, full graph incl. reorg/route realignment, scored by mAP.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

# ---------------------------------------------------------------------------
# Protocol definition (versioned, hashed)
# ---------------------------------------------------------------------------

PROTOCOL = {
    "name": "scenes-v2",
    "classes": 8,
    # 64 train scenes memorize: r5 measured TRAIN-scene mAP 0.9755 vs
    # EVAL-scene 0.0068 after 500 epochs (the net swallows 64 rectangles
    # verbatim and generalizes nothing); 512 scenes peaked at eval mAP
    # 0.22 and DROPPED to 0.14 with longer training (memorization again).
    # 2048 scenes + flip augmentation make held-out mAP track train mAP.
    "train_scenes": 2048,
    "eval_scenes": 64,
    "objects_per_scene": [1, 4],
    "rel_size": [0.12, 0.45],
    "aspect": [0.5, 2.0],
    "max_occlusion_iou": 0.4,
    "background": 128,
    "noise": 8,
    "eval_seed": 99,
    "train_scene_seed": 7,
}

# 8 visually distinct class colors (RGB)
CLASS_COLORS = {
    0: (210, 40, 40),    # red
    1: (40, 60, 210),    # blue
    2: (40, 180, 60),    # green
    3: (230, 200, 40),   # yellow
    4: (160, 40, 200),   # purple
    5: (40, 200, 200),   # cyan
    6: (240, 130, 30),   # orange
    7: (250, 250, 250),  # white
}


def protocol_hash() -> str:
    """Stable hash of the protocol parameters; evidence files carry it so
    consumers (bench.py) can reject stale evidence."""
    blob = json.dumps(PROTOCOL, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


# Training-recipe tag: bump whenever the loss/optimizer semantics change
# so cached trained-weight files (tools/accuracy_protocol.py --scratch)
# keyed on (seed, size, steps) are invalidated. "bce1" = BCE objectness
# (darknet logit-delta semantics) replacing the saturating MSE-on-sigmoid.
# "bce2" = bce1 + warmup/cosine lr schedule (constant 2e-4 converged in
# loss but plateaued at mAP~0 at 416²: classes stayed diffuse and boxes
# never tightened past IoU 0.5 — measured r5, 2000 steps seed 0).
# "bce3" = bce2 + per-sample horizontal-flip augmentation inside the
# jitted gather step (with cx mirroring), against scene memorization.
TRAIN_RECIPE = "bce3"


# ---------------------------------------------------------------------------
# Scene generation (relative geometry; renders at any resolution)
# ---------------------------------------------------------------------------

def _box_iou_rel(a, b) -> float:
    ax0, ay0, ax1, ay1 = a[0] - a[2] / 2, a[1] - a[3] / 2, \
        a[0] + a[2] / 2, a[1] + a[3] / 2
    bx0, by0, bx1, by1 = b[0] - b[2] / 2, b[1] - b[3] / 2, \
        b[0] + b[2] / 2, b[1] + b[3] / 2
    iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = iw * ih
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / max(union, 1e-12)


def sample_scene_geometry(rng: np.random.Generator):
    """One scene's object list in RELATIVE coords: [(cls, cx, cy, w, h)].
    Diversity knobs per PROTOCOL; occlusion bounded by max_occlusion_iou."""
    lo_n, hi_n = PROTOCOL["objects_per_scene"]
    n = int(rng.integers(lo_n, hi_n + 1))
    lo_s, hi_s = PROTOCOL["rel_size"]
    lo_a, hi_a = PROTOCOL["aspect"]
    objs: list[tuple] = []
    for _ in range(n):
        for _try in range(20):
            cls = int(rng.integers(0, PROTOCOL["classes"]))
            area_side = float(rng.uniform(lo_s, hi_s))
            aspect = float(np.exp(rng.uniform(np.log(lo_a), np.log(hi_a))))
            w = min(0.94, area_side * np.sqrt(aspect))
            h = min(0.94, area_side / np.sqrt(aspect))
            cx = float(rng.uniform(w / 2 + 0.02, 1.0 - w / 2 - 0.02))
            cy = float(rng.uniform(h / 2 + 0.02, 1.0 - h / 2 - 0.02))
            box = (cx, cy, w, h)
            if all(_box_iou_rel(box, o[1:]) <= PROTOCOL["max_occlusion_iou"]
                   for o in objs):
                objs.append((cls,) + box)
                break
    return objs


def render_scene(objs, size: int, rng: np.random.Generator):
    """Render a geometry list at ``size`` x ``size`` -> (img_u8, boxes, cls).
    Later objects draw over earlier ones (partial occlusion); ground truth
    keeps the FULL box of every object, as real datasets do."""
    img = np.full((size, size, 3), PROTOCOL["background"], np.int16)
    img += rng.integers(-PROTOCOL["noise"], PROTOCOL["noise"],
                        img.shape).astype(np.int16)
    boxes, classes = [], []
    for cls, cx, cy, w, h in objs:
        x0 = max(0, int(round((cx - w / 2) * size)))
        y0 = max(0, int(round((cy - h / 2) * size)))
        x1 = min(size, int(round((cx + w / 2) * size)))
        y1 = min(size, int(round((cy + h / 2) * size)))
        img[y0:y1, x0:x1] = np.asarray(CLASS_COLORS[cls], np.int16)
        boxes.append((cx, cy, w, h))
        classes.append(cls)
    return (np.clip(img, 0, 255).astype(np.uint8),
            np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(classes, np.int32))


def make_scenes(n: int, size: int, seed: int):
    """n rendered scenes: [(img_u8, boxes_rel, classes)]."""
    rng = np.random.default_rng(seed)
    return [render_scene(sample_scene_geometry(rng), size, rng)
            for _ in range(n)]


def write_eval_set(out_dir: str, size: int):
    """PROTOCOL's eval set rendered at ``size``, written as PNG + darknet
    label pairs (the evaluate_engine input format). Deterministic across
    runs/resolutions (fixed eval_seed; geometry sampled before rendering)."""
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    pairs = []
    scenes = make_scenes(PROTOCOL["eval_scenes"], size, PROTOCOL["eval_seed"])
    for i, (img, boxes, classes) in enumerate(scenes):
        ip = os.path.join(out_dir, f"eval{i:03d}.png")
        lp = os.path.join(out_dir, f"eval{i:03d}.txt")
        Image.fromarray(img).save(ip)
        with open(lp, "w") as f:
            for b, c in zip(boxes, classes):
                f.write(f"{c} {b[0]} {b[1]} {b[2]} {b[3]}\n")
        pairs.append((ip, lp))
    return pairs


# ---------------------------------------------------------------------------
# Flagship training on the protocol (shared by the slow test and the tool)
# ---------------------------------------------------------------------------

MAX_BOXES = 8


def batch_builder(scenes, size: int):
    """Closure building train batches from rendered scenes."""
    def batch_from(idxs):
        B = len(idxs)
        imgs = np.zeros((B, size, size, 3), np.float32)
        bx = np.zeros((B, MAX_BOXES, 4), np.float32)
        cl = np.zeros((B, MAX_BOXES), np.int32)
        mk = np.zeros((B, MAX_BOXES), np.float32)
        for k, i in enumerate(idxs):
            img, boxes, classes = scenes[i]
            imgs[k] = img.astype(np.float32) / 255.0
            n = min(len(classes), MAX_BOXES)
            bx[k, :n], cl[k, :n], mk[k, :n] = boxes[:n], classes[:n], 1.0
        return {"images": imgs, "boxes": bx, "classes": cl, "mask": mk}
    return batch_from


def train_flagship_store(spec, seed: int, size: int, steps: int = 400,
                         batch: int = 4, lr: float = 1e-3,
                         warmup: int = 200, log=None):
    """Train the full graph on PROTOCOL scenes from He init (seeded) and
    return (WeightStore with trained fp32 weights, losses). The training
    scene set is shared across seeds (only the init + shuffling vary), so
    seed-to-seed mAP spread measures TRAINING variance, the quantity the
    CI must cover.

    The whole train set is staged on device ONCE and batches are gathered
    inside the jitted step from host-chosen indices: at 416² the per-step
    host->device image transfer (8 MB over the dev tunnel) dominated the
    step (~0.85 s/step measured r5) and made protocol-strength step counts
    impractical. The staged sets are jit ARGUMENTS, not closed-over
    constants, so the program (and its persistent-cache entry) stays
    weight-sized."""
    import jax
    import jax.numpy as jnp
    from .models import yolov2 as m
    from .train import LossConfig, make_train_step, zeros_like_velocity
    from .weights import WeightStore

    scenes = make_scenes(PROTOCOL["train_scenes"], size,
                         PROTOCOL["train_scene_seed"])
    n = len(scenes)
    # stage uint8 (512 scenes at 416² = 266 MB vs 1.06 GB as f32 — the
    # host->device staging crosses the dev tunnel once); /255 runs inside
    # the jitted step on the gathered batch only
    imgs = np.stack([s[0] for s in scenes])
    bx = np.zeros((n, MAX_BOXES, 4), np.float32)
    cl = np.zeros((n, MAX_BOXES), np.int32)
    mk = np.zeros((n, MAX_BOXES), np.float32)
    for i, (_, boxes, classes) in enumerate(scenes):
        k = min(len(classes), MAX_BOXES)
        bx[i, :k], cl[i, :k], mk[i, :k] = boxes[:k], classes[:k], 1.0
    staged = tuple(jax.device_put(a) for a in (imgs, bx, cl, mk))
    rng = np.random.default_rng(seed)

    store0 = WeightStore.synthetic(spec, seed=seed)
    params = m.params_fp32(spec, store0)
    base_step = make_train_step(spec, lr=lr, momentum=0.9,
                                cfg=LossConfig(rescore=False),
                                clip_norm=1.0)

    def gather_step(params, vel, idxs, key, imgs, bx, cl, mk, lr_scale):
        ims = imgs[idxs].astype(jnp.float32) / 255.0
        boxes = bx[idxs]
        # per-sample horizontal flip ("bce3"): mirrors the image on W and
        # cx -> 1-cx; padded truth slots are masked in the loss, so
        # flipping their zero boxes is harmless
        flip = jax.random.bernoulli(key, 0.5, (ims.shape[0],))
        ims = jnp.where(flip[:, None, None, None], ims[:, :, ::-1, :], ims)
        boxes = jnp.concatenate(
            [jnp.where(flip[:, None, None], 1.0 - boxes[..., 0:1],
                       boxes[..., 0:1]), boxes[..., 1:]], axis=-1)
        batch = {"images": ims, "boxes": boxes,
                 "classes": cl[idxs], "mask": mk[idxs]}
        return base_step(params, vel, batch, lr_scale)

    step = jax.jit(gather_step)
    base_key = jax.random.PRNGKey(seed + 1000)
    vel = zeros_like_velocity(params)
    order = np.arange(n)
    losses = []
    every = max(1, steps // 8)
    wu = min(warmup, max(steps // 10, 1))
    for it in range(steps):
        rng.shuffle(order)
        idxs = jnp.asarray(order[:batch], jnp.int32)
        # linear warmup then cosine decay to a 5% floor ("bce2"): constant
        # lr leaves class logits diffuse and box IoU < 0.5 at 416²
        if it < wu:
            lr_scale = (it + 1) / wu
        else:
            t = (it - wu) / max(steps - wu, 1)
            lr_scale = 0.05 + 0.95 * 0.5 * (1.0 + np.cos(np.pi * t))
        params, vel, loss = step(params, vel, idxs,
                                 jax.random.fold_in(base_key, it), *staged,
                                 np.float32(lr_scale))
        if it % every == 0 or it == steps - 1:
            losses.append(float(loss))
            if log:
                log(f"seed={seed} it={it} loss={losses[-1]:.3f}")
    store = WeightStore(spec=spec)
    for l in spec.conv_layers():
        p = params[f"conv{l.idx}"]
        store.fp32[l.idx] = (
            np.ascontiguousarray(np.asarray(p["w"]).transpose(3, 2, 0, 1),
                                 dtype=np.float32),
            np.asarray(p["b"], np.float32))
    return store, losses


def calib_images(size: int):
    """The protocol's calibration set: mid-gray plus one rendered scene
    (matches what the runtime's synthetic calibration sees)."""
    scene = make_scenes(1, size, PROTOCOL["eval_seed"])[0][0]
    return [np.full((3, size, size), 0.5, np.float32),
            scene.astype(np.float32).transpose(2, 0, 1) / 255.0]
