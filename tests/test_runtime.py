"""Streaming runtime: JSONL, MJPEG, video reader, stream loop, CLIs."""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

from yolotpu.models import zoo
from yolotpu.postprocess import Detection
from yolotpu.runtime.jsonl import JsonlWriter
from yolotpu.runtime.camera import yuyv_to_rgb


def _det(x, y, w, h, obj, probs):
    return Detection(bbox=(x, y, w, h), objectness=obj,
                     prob=np.asarray(probs, np.float32), classes=len(probs))


def test_jsonl_record_format(tmp_path):
    p = tmp_path / "out.jsonl"
    w = JsonlWriter(str(p))
    dets = [_det(0.5, 0.5, 0.25, 0.5, 0.9, [0.8, 0.1]),
            _det(0.1, 0.1, 0.05, 0.05, 0.3, [0.0, 0.1])]  # below thresh
    w.write_record("video", "clip.mp4", 7, 3, 640, 480, dets,
                   ["dog", "cat"], thresh=0.25)
    w.close()
    rec = json.loads(p.read_text().strip())
    assert rec["mode"] == "video" and rec["source"] == "clip.mp4"
    assert rec["frame_index"] == 7 and rec["inference_index"] == 3
    assert rec["width"] == 640 and rec["height"] == 480
    assert len(rec["detections"]) == 1
    d = rec["detections"][0]
    assert d["class_id"] == 0 and d["label"] == "dog"
    assert d["bbox_px"] == {"x0": int(0.375 * 640), "y0": int(0.25 * 480),
                            "x1": int(0.625 * 640), "y1": int(0.75 * 480)}


def test_yuyv_to_rgb_bt601():
    # white pixel: Y=235 U=V=128 -> ~(255,255,255); black: Y=16 -> (0,0,0)
    yuyv = np.array([235, 128, 16, 128], np.uint8)
    rgb = yuyv_to_rgb(yuyv, 2, 1)
    assert rgb.shape == (1, 2, 3)
    assert (rgb[0, 0] > 250).all()
    assert (rgb[0, 1] < 5).all()
    # pure-ish red: Y=81 U=90 V=240 (BT.601)
    rgb = yuyv_to_rgb(np.array([81, 90, 81, 240], np.uint8), 2, 1)
    r, g, b = rgb[0, 0]
    assert r > 200 and g < 60 and b < 110


def test_mjpeg_streamer_serves_frames():
    from yolotpu.runtime.mjpeg import MjpegStreamer, BOUNDARY
    s = MjpegStreamer(port=0, bind="127.0.0.1", fps=30, quality=70)
    try:
        frame = np.zeros((32, 32, 3), np.uint8)
        frame[:, :, 0] = 255
        s.update_rgb(frame)
        conn = socket.create_connection(("127.0.0.1", s.port), timeout=5)
        conn.sendall(b"GET / HTTP/1.0\r\n\r\n")
        data = b""
        t0 = time.time()
        while b"\xff\xd9" not in data and time.time() - t0 < 5:
            data += conn.recv(65536)
        conn.close()
        assert b"multipart/x-mixed-replace" in data
        assert BOUNDARY.encode() in data
        assert b"\xff\xd8" in data  # JPEG SOI present
    finally:
        s.stop()


@pytest.fixture
def tiny_video(tmp_path):
    import cv2
    path = str(tmp_path / "clip.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    if not wr.isOpened():
        pytest.skip("cv2 VideoWriter unavailable")
    rng = np.random.default_rng(0)
    for i in range(8):
        frame = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        wr.write(frame)
    wr.release()
    return path


def test_opencv_video_reader(tiny_video):
    from yolotpu.runtime.video import open_video
    rd = open_video(tiny_video, width=64, height=64)
    n = 0
    while True:
        f = rd.read()
        if f is None:
            break
        assert f.shape == (64, 64, 3) and f.dtype == np.uint8
        n += 1
    rd.close()
    assert n == 8


@pytest.mark.slow
def test_stream_runner_end_to_end(tiny_video, tmp_path):
    """Golden-backend streaming on a tiny net: JSONL + annotated PNGs out."""
    from yolotpu.runtime.engine import Engine, load_or_synthesize
    from yolotpu.runtime.stream import StreamConfig, StreamRunner
    from yolotpu.runtime.video import open_video

    spec = zoo.build("yolov2", width=64, height=64)
    store = load_or_synthesize(spec, None, "fp32", synthetic=True)
    eng = Engine(spec, store, precision="fp32", backend="golden")
    cfg = StreamConfig(thresh=0.25, nms=0.45, infer_every=2, max_frames=3,
                       save_annotated_dir=str(tmp_path / "ann"),
                       output_json=str(tmp_path / "dets.jsonl"),
                       mode="video", source=tiny_video,
                       labels=[str(i) for i in range(80)])
    src = open_video(tiny_video, 64, 64)
    summary = StreamRunner(eng, cfg).run(src)
    src.close()
    assert summary["count"] == 3            # 8 frames, every 2nd, capped at 3
    recs = [json.loads(l) for l in open(tmp_path / "dets.jsonl")]
    assert len(recs) == 3
    assert recs[0]["frame_index"] == 0 and recs[1]["frame_index"] == 2
    pngs = os.listdir(tmp_path / "ann")
    assert len(pngs) == 3


def test_weight_gen_cli_roundtrip(tmp_path):
    from yolotpu.cli.weight_gen import main as wg
    from yolotpu.weights import WeightStore
    spec = zoo.build("yolov2-tiny")
    store = WeightStore.synthetic(spec, seed=1)
    store.save_fp32(str(tmp_path))
    rc = wg(["--model", "yolov2-tiny",
             "--weights", str(tmp_path / "weights.bin"),
             "--out", str(tmp_path / "weights_reorg.bin")])
    assert rc == 0
    rc = wg(["--model", "yolov2-tiny", "--unreorg",
             "--weights", str(tmp_path / "weights_reorg.bin"),
             "--out", str(tmp_path / "weights_back.bin")])
    assert rc == 0
    a = np.fromfile(tmp_path / "weights.bin", np.float32)
    b = np.fromfile(tmp_path / "weights_back.bin", np.float32)
    np.testing.assert_array_equal(a, b)
    # in-place guard
    rc = wg(["--model", "yolov2-tiny",
             "--weights", str(tmp_path / "weights.bin"),
             "--out", str(tmp_path / "weights.bin")])
    assert rc == 1


def test_detect_cli_golden(tmp_path, monkeypatch):
    from yolotpu.cli.detect import main as detect
    from yolotpu.image import save_image
    img = np.random.default_rng(0).random((3, 96, 128)).astype(np.float32)
    save_image(img, str(tmp_path / "in.png"))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("YOLO2_NO_DUMP", "1")
    rc = detect(["--backend", "golden", "--synthetic-weights",
                 "--input", str(tmp_path / "in.png"),
                 "--output", str(tmp_path / "pred")])
    assert rc == 0
    assert (tmp_path / "pred.png").exists()


def test_profiler_tiny():
    from yolotpu.runtime.profiler import profile_layers
    from yolotpu.weights import WeightStore
    spec = zoo.build("yolov2-tiny", width=64, height=64)
    store = WeightStore.synthetic(spec, seed=0)
    rep = profile_layers(spec, store, "fp32", repeats=1)
    assert len(rep.timings) == spec.n
    txt = rep.render()
    assert "Top 10 slowest layers" in txt
    assert "TOPS" in txt and "GB/s" in txt   # utilization columns
    assert rep.total_ms > 0
    # conv rows carry achieved-TOPS/BW; structured export is json-ready
    conv_rows = [t for t in rep.timings if t.type == "convolutional"]
    assert any(t.tops > 0 for t in conv_rows)
    d = rep.as_dicts()
    assert len(d) == spec.n and {"idx", "ms", "tops", "gbs"} <= set(d[0])


def test_prefix_attribution_dce_aware():
    """Prefix-bisection deltas around a route must not re-bill the
    dead-code-eliminated branch to the rejoining route (the r5 roofline
    artifact: +24 ms on route 28, total 118 vs the real 91 ms)."""
    from yolotpu.runtime.profiler import (attribute_prefix_delta,
                                          prefix_alive_sets)

    spec = zoo.build("yolov2", width=64, height=64)
    alive = prefix_alive_sets(spec)
    # route 25 pulls layer 16 only; route 28 rejoins both branches
    assert 16 in alive[25] and 24 not in alive[25]
    assert alive[28] == set(range(29))

    # synthetic device model: layer idx costs idx+1 "ms"; prefix cum =
    # sum over its alive set — exactly what a DCE-ing compiler reports
    cost = {l.idx: float(l.idx + 1) for l in spec.layers}
    cums: dict[int, float] = {}
    deltas: dict[int, float] = {}
    for l in spec.layers:
        cur = sum(cost[k] for k in alive[l.idx])
        ms = attribute_prefix_delta(alive, cums, deltas, l.idx, cur)
        cums[l.idx] = cur
        deltas[l.idx] = ms
    # every layer's attributed delta recovers its true cost — including
    # the route-25 prefix (cum DROPS there) and the rejoining route 28
    for l in spec.layers:
        assert deltas[l.idx] == pytest.approx(cost[l.idx]), l.idx
    assert sum(deltas.values()) == pytest.approx(cums[spec.layers[-1].idx])


@pytest.mark.slow
def test_stream_runner_batched(tiny_video, tmp_path):
    """Batched double-buffered feed produces the same records as single."""
    from yolotpu.runtime.engine import Engine, load_or_synthesize
    from yolotpu.runtime.stream import StreamConfig, StreamRunner
    from yolotpu.runtime.video import open_video

    spec = zoo.build("yolov2", width=64, height=64)
    store = load_or_synthesize(spec, None, "fp32", synthetic=True)
    eng = Engine(spec, store, precision="fp32", backend="xla")

    def run(batch, out):
        cfg = StreamConfig(thresh=0.25, nms=0.45, max_frames=6,
                           batch_size=batch, output_json=str(tmp_path / out),
                           mode="video", source=tiny_video,
                           labels=[str(i) for i in range(80)])
        src = open_video(tiny_video, 64, 64)
        s = StreamRunner(eng, cfg).run(src)
        src.close()
        return s

    run(1, "single.jsonl")
    run(4, "batched.jsonl")
    a = [json.loads(l) for l in open(tmp_path / "single.jsonl")]
    b = [json.loads(l) for l in open(tmp_path / "batched.jsonl")]
    assert len(a) == len(b) == 6
    for ra, rb in zip(a, b):
        assert ra["frame_index"] == rb["frame_index"]
        assert ra["detections"] == rb["detections"]


@pytest.mark.slow
def test_stream_runner_batched_device_nms(tiny_video, tmp_path):
    """Device-NMS batched streaming produces the same best-class records."""
    from yolotpu.runtime.engine import Engine, load_or_synthesize
    from yolotpu.runtime.stream import StreamConfig, StreamRunner
    from yolotpu.runtime.video import open_video

    spec = zoo.build("yolov2", width=64, height=64)
    store = load_or_synthesize(spec, None, "fp32", synthetic=True)
    host_eng = Engine(spec, store, "fp32", backend="xla")
    dev_eng = Engine(spec, store, "fp32", backend="xla", device_nms=True,
                     thresh=0.25, nms=0.45)

    def run(eng, out):
        cfg = StreamConfig(thresh=0.25, nms=0.45, max_frames=4, batch_size=2,
                           output_json=str(tmp_path / out),
                           mode="video", source=tiny_video,
                           labels=[str(i) for i in range(80)])
        src = open_video(tiny_video, 64, 64)
        StreamRunner(eng, cfg).run(src)
        src.close()

    run(host_eng, "host.jsonl")
    run(dev_eng, "dev.jsonl")
    a = [json.loads(l) for l in open(tmp_path / "host.jsonl")]
    b = [json.loads(l) for l in open(tmp_path / "dev.jsonl")]
    assert len(a) == len(b) == 4
    for ra, rb in zip(a, b):
        da = sorted([(d["class_id"], d["prob"]) for d in ra["detections"]])
        db = sorted([(d["class_id"], d["prob"]) for d in rb["detections"]])
        assert da == db


def test_stream_flaky_camera_skips_frames(tmp_path, monkeypatch):
    """Camera mode skips failed reads (main.c:972-974 semantics) instead of
    treating None as EOF; a bounded run of consecutive failures ends it."""
    from yolotpu.runtime.engine import Engine, load_or_synthesize
    from yolotpu.runtime.stream import StreamConfig, StreamRunner

    class FlakySource:
        """6 frames, with a None (decode failure) before every real one."""
        def __init__(self):
            self.n = 0
        def read(self):
            self.n += 1
            if self.n > 12:
                return None            # then fail forever (dead camera)
            if self.n % 2 == 1:
                return None            # transient decode failure
            return np.full((64, 64, 3), self.n, np.uint8)
        def close(self):
            pass

    monkeypatch.setenv("YOLO2_READ_RETRIES", "3")
    spec = zoo.build("yolov2", width=64, height=64)
    store = load_or_synthesize(spec, None, "fp32", synthetic=True)
    eng = Engine(spec, store, precision="fp32", backend="golden")
    cfg = StreamConfig(max_frames=0, mode="camera", source="/dev/video0",
                       output_json=str(tmp_path / "d.jsonl"),
                       labels=[str(i) for i in range(80)])
    summary = StreamRunner(eng, cfg).run(FlakySource())
    assert summary["count"] == 6      # every real frame inferred, Nones skipped

    class DeadSource:
        def read(self):
            return None
        def close(self):
            pass

    summary = StreamRunner(eng, cfg).run(DeadSource())   # budget exhausts
    assert summary.get("count", 0) == 0


def test_watchdog_recovery_redispatch(monkeypatch):
    """A single hung step recovers via one re-dispatch (the reference's
    clear-START recovery attempt, yolo2_accel_linux.c:350-377); two
    consecutive hangs raise."""
    import time as _time
    from yolotpu.runtime.engine import Engine, load_or_synthesize

    spec = zoo.build("yolov2", width=64, height=64)
    store = load_or_synthesize(spec, None, "fp32", synthetic=True)
    eng = Engine(spec, store, precision="fp32", backend="golden")

    monkeypatch.setenv("YOLO2_LAYER_TIMEOUT_MS", "300")
    eng._seen_shapes = {("t", (1,))}     # shape already seen: no compile grace
    eng._guard_pool_init = True
    import concurrent.futures as cf
    eng._guard_pool = cf.ThreadPoolExecutor(max_workers=1)

    calls = {"n": 0}
    def hang_once(x):
        calls["n"] += 1
        if calls["n"] == 1:
            _time.sleep(1.2)
        return x * 2

    out = eng._guarded(hang_once, np.ones(1), tag="t")
    assert out[0] == 2 and calls["n"] == 2

    def hang_always(x):
        _time.sleep(1.2)
        return x

    eng._seen_shapes.add(("t2", (1,)))
    try:
        eng._guarded(hang_always, np.ones(1), tag="t2")
        raise AssertionError("watchdog did not raise")
    except TimeoutError as e:
        assert "twice" in str(e)


def test_watchdog_abandoned_thread_cap(monkeypatch):
    """A flapping device link cannot stack abandoned daemon threads
    silently: once WATCHDOG_MAX_ABANDONED workers are still parked, the
    next dispatch fails fast instead of adding another (VERDICT r4 #10)."""
    import threading as _threading
    from yolotpu.runtime.engine import Engine, load_or_synthesize

    spec = zoo.build("yolov2", width=64, height=64)
    store = load_or_synthesize(spec, None, "fp32", synthetic=True)
    eng = Engine(spec, store, precision="fp32", backend="golden")

    monkeypatch.setenv("YOLO2_LAYER_TIMEOUT_MS", "100")
    release = _threading.Event()

    def hang_until_released(x):
        release.wait(timeout=30)
        return x

    # each timed-out call abandons TWO workers (initial + recovery
    # re-dispatch), so cap//2 calls reach the cap
    for i in range(Engine.WATCHDOG_MAX_ABANDONED // 2):
        eng._seen_shapes = getattr(eng, "_seen_shapes", set())
        eng._seen_shapes.add((f"c{i}", (1,)))
        try:
            eng._guarded(hang_until_released, np.ones(1), tag=f"c{i}")
            raise AssertionError("watchdog did not time out")
        except TimeoutError:
            pass
    assert len(eng._abandoned_threads) == Engine.WATCHDOG_MAX_ABANDONED

    eng._seen_shapes.add(("cap", (1,)))
    try:
        eng._guarded(hang_until_released, np.ones(1), tag="cap")
        raise AssertionError("cap did not fail fast")
    except RuntimeError as e:
        assert "abandoned" in str(e)

    # once the parked workers drain, dispatch works again
    release.set()
    for t in list(eng._abandoned_threads):
        t.join(timeout=10)
    out = eng._guarded(lambda x: x * 3, np.ones(1), tag="cap")
    assert out[0] == 3
