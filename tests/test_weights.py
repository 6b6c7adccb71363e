"""Weight artifact IO: reorg transform, file roundtrips, odd-count padding."""

import numpy as np
import pytest

from yolotpu.models import zoo
from yolotpu.quant import calibrate_activations, quantize_weights
from yolotpu.weights import (QTables, WeightStore, weight_reorg,
                             weight_unreorg)


def test_reorg_roundtrip_exact_blocks():
    rng = np.random.default_rng(0)
    for (n, c, k) in [(32, 4, 3), (64, 12, 3), (35, 7, 1), (425, 1024, 1)]:
        w = rng.standard_normal((n, c, k, k)).astype(np.float32)
        flat = weight_reorg(w)
        assert flat.shape == (w.size,)
        back = weight_unreorg(flat, n, c, k)
        np.testing.assert_array_equal(back, w)


def test_reorg_streaming_order():
    """First Tm*Tn*K*K block is kk-major/tm/tn of the first tile — the order
    weight_load_reorg consumes (core_io.cpp:140-199)."""
    n, c, k = 64, 8, 3
    w = np.arange(n * c * k * k, dtype=np.float32).reshape(n, c, k, k)
    flat = weight_reorg(w, tm=32, tn=4)
    # element 0 of the stream = tap (0,0), tm=0, tn=0 -> w[0,0,0,0]
    assert flat[0] == w[0, 0, 0, 0]
    # element 1 -> tn=1 -> w[0,1,0,0]
    assert flat[1] == w[0, 1, 0, 0]
    # element 4 (tn wraps) -> tm=1 -> w[1,0,0,0]
    assert flat[4] == w[1, 0, 0, 0]
    # after 32*4 = one tap plane, tap (0,1) -> w[0,0,0,1]
    assert flat[128] == w[0, 0, 0, 1]


def _tiny_spec():
    """Small custom net for fast IO tests (odd bias counts included)."""
    import yolotpu.cfg as cfg
    from yolotpu.graph import NetworkSpec
    sections = [
        cfg.Section("net", 0, {"batch": "1", "width": "32", "height": "32", "channels": "3"}),
        cfg.Section("convolutional", 1, {"filters": "7", "size": "3", "stride": "1",
                                         "pad": "1", "activation": "leaky"}),
        cfg.Section("maxpool", 2, {"size": "2", "stride": "2"}),
        cfg.Section("convolutional", 3, {"filters": "5", "size": "1", "stride": "1",
                                         "pad": "1", "activation": "linear"}),
    ]
    return NetworkSpec.from_sections(sections)


def test_fp32_save_load_roundtrip(tmp_path):
    spec = _tiny_spec()
    store = WeightStore.synthetic(spec, seed=3)
    store.save_fp32(str(tmp_path))
    loaded = WeightStore.load_fp32(spec, str(tmp_path / "weights.bin"),
                                   str(tmp_path / "bias.bin"))
    for idx in store.fp32:
        np.testing.assert_array_equal(loaded.fp32[idx][0], store.fp32[idx][0])
        np.testing.assert_array_equal(loaded.fp32[idx][1], store.fp32[idx][1])


def test_fp32_reorg_save_load_roundtrip(tmp_path):
    spec = _tiny_spec()
    store = WeightStore.synthetic(spec, seed=4)
    store.save_fp32(str(tmp_path), reorg=True)
    loaded = WeightStore.load_fp32(spec, str(tmp_path / "weights_reorg.bin"),
                                   str(tmp_path / "bias.bin"), reorg=True)
    for idx in store.fp32:
        np.testing.assert_array_equal(loaded.fp32[idx][0], store.fp32[idx][0])


def test_int16_save_load_with_odd_padding(tmp_path):
    """conv0 has 7*3*3*3=189 weights (odd) and 7 biases (odd): the file must
    carry 1 pad element each, exactly like yolo2_model.cpp:216-223 expects."""
    spec = _tiny_spec()
    store = WeightStore.synthetic(spec, seed=5)
    act_q = [10, 9, 8]
    quantize_weights(store, act_q)
    store.save_int16(str(tmp_path))

    wfile = np.fromfile(tmp_path / "weight_int16.bin", np.int16)
    n0 = spec.conv_layers()[0].nweights
    assert n0 % 2 == 1
    total = sum(l.nweights + (l.nweights & 1) for l in spec.conv_layers())
    assert wfile.size == total

    loaded = WeightStore.load_int16(spec, str(tmp_path / "weight_int16.bin"),
                                    str(tmp_path / "bias_int16.bin"), str(tmp_path))
    for idx in store.int16:
        np.testing.assert_array_equal(loaded.int16[idx][0], store.int16[idx][0])
        np.testing.assert_array_equal(loaded.int16[idx][1], store.int16[idx][1])
    assert loaded.qtables.act_q == act_q
    assert loaded.qtables.weight_q == store.qtables.weight_q


@pytest.mark.slow
def test_calibration_produces_consistent_qs():
    spec = zoo.build("yolov2", width=416, height=416)
    store = WeightStore.synthetic(spec, seed=0)
    rng = np.random.default_rng(7)
    img = rng.random((3, 416, 416)).astype(np.float32)
    act_q = calibrate_activations(spec, store, [img])
    assert len(act_q) == len(spec.conv_layers()) + 1
    assert all(-15 <= q <= 15 for q in act_q)
    quantize_weights(store, act_q)
    assert store.qtables is not None
    # quantized weights must dequantize back within half a step
    for ci, l in enumerate(spec.conv_layers()):
        w, _ = store.fp32[l.idx]
        wq, _ = store.int16[l.idx]
        qw = store.qtables.weight_q[ci]
        err = np.abs(wq.astype(np.float64) * np.ldexp(1.0, -qw) - w)
        assert err.max() <= np.ldexp(1.0, -qw) * 0.5 + 1e-12
