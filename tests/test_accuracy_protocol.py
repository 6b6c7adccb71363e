"""Protocol v2 unit tests (fast gate): determinism, diversity, hashing."""

import numpy as np

from yolotpu import accuracy as acc


def test_protocol_hash_stable_and_param_sensitive(monkeypatch):
    h = acc.protocol_hash()
    assert h == acc.protocol_hash()
    monkeypatch.setitem(acc.PROTOCOL, "eval_scenes", 65)
    assert acc.protocol_hash() != h


def test_eval_set_deterministic_and_diverse(tmp_path):
    pairs = acc.write_eval_set(str(tmp_path / "a"), 64)
    assert len(pairs) == acc.PROTOCOL["eval_scenes"]
    pairs2 = acc.write_eval_set(str(tmp_path / "b"), 64)
    a = np.asarray(__import__("PIL.Image", fromlist=["Image"])
                   .open(pairs[3][0]))
    b = np.asarray(__import__("PIL.Image", fromlist=["Image"])
                   .open(pairs2[3][0]))
    np.testing.assert_array_equal(a, b)

    # diversity across the set: all 8 classes present, sizes span the range
    classes, sizes, aspects, counts = set(), [], [], []
    for _, lp in pairs:
        lines = [l.split() for l in open(lp)]
        counts.append(len(lines))
        for parts in lines:
            classes.add(int(parts[0]))
            w, h = float(parts[3]), float(parts[4])
            sizes.append(np.sqrt(w * h))
            aspects.append(w / h)
    assert classes == set(range(acc.PROTOCOL["classes"]))
    assert min(sizes) < 0.2 and max(sizes) > 0.35      # scale diversity
    assert min(aspects) < 0.8 and max(aspects) > 1.25  # aspect diversity
    assert min(counts) >= 1 and max(counts) >= 3       # count diversity


def test_scene_geometry_occlusion_bounded():
    rng = np.random.default_rng(0)
    for _ in range(50):
        objs = acc.sample_scene_geometry(rng)
        for i in range(len(objs)):
            for j in range(i):
                iou = acc._box_iou_rel(objs[i][1:], objs[j][1:])
                assert iou <= acc.PROTOCOL["max_occlusion_iou"] + 1e-6


def test_render_scales_with_resolution():
    rng = np.random.default_rng(1)
    objs = acc.sample_scene_geometry(rng)
    img128, b128, c128 = acc.render_scene(objs, 128, np.random.default_rng(2))
    img416, b416, c416 = acc.render_scene(objs, 416, np.random.default_rng(2))
    assert img128.shape == (128, 128, 3) and img416.shape == (416, 416, 3)
    np.testing.assert_allclose(b128, b416)     # relative GT is identical
    np.testing.assert_array_equal(c128, c416)
