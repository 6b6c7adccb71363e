"""cfg parsing + shape inference vs. the darknet factory math."""

import numpy as np
import pytest

from conftest import reference_path
from yolotpu.graph import (ConvSpec, MaxPoolSpec, NetworkSpec, RegionSpec,
                           ReorgSpec, RouteSpec)
from yolotpu.models import zoo


def check_yolov2_spec(spec: NetworkSpec):
    assert spec.n == 32
    kinds = [l.type for l in spec.layers]
    assert kinds.count("convolutional") == 23
    assert kinds.count("maxpool") == 5
    assert kinds.count("route") == 2
    assert kinds.count("reorg") == 1
    assert kinds.count("region") == 1

    l0 = spec.layers[0]
    assert isinstance(l0, ConvSpec)
    assert (l0.h, l0.w, l0.c) == (416, 416, 3)
    assert (l0.out_h, l0.out_w, l0.out_c) == (416, 416, 32)
    assert l0.pad == 1 and l0.activation == "leaky" and l0.batch_normalize

    mp = spec.layers[1]
    assert isinstance(mp, MaxPoolSpec)
    assert (mp.out_h, mp.out_w, mp.out_c) == (208, 208, 32)
    assert mp.padding == 1  # darknet default size-1

    # route -9 at layer 25 resolves to 16 (conv 512 out 26x26)
    r25 = spec.layers[25]
    assert isinstance(r25, RouteSpec) and r25.layers == (16,)
    assert (r25.out_h, r25.out_w, r25.out_c) == (26, 26, 512)

    rg = spec.layers[27]
    assert isinstance(rg, ReorgSpec)
    assert (rg.h, rg.w, rg.c) == (26, 26, 64)
    assert (rg.out_h, rg.out_w, rg.out_c) == (13, 13, 256)

    r28 = spec.layers[28]
    assert isinstance(r28, RouteSpec) and r28.layers == (27, 24)
    assert r28.out_c == 256 + 1024

    last_conv = spec.layers[30]
    assert isinstance(last_conv, ConvSpec)
    assert (last_conv.out_h, last_conv.out_w, last_conv.out_c) == (13, 13, 425)

    region = spec.layers[31]
    assert isinstance(region, RegionSpec)
    assert region.classes == 80 and region.num == 5 and region.softmax
    assert region.outputs == 13 * 13 * 425
    assert abs(region.biases[0] - 0.57273) < 1e-9

    # total weight words must match the reference accelerator's AXI depth
    # (50,941,792 weight words, 10,761 biases: yolo2_accel.cpp:41-46)
    total_w = sum(l.nweights for l in spec.conv_layers())
    total_b = sum(l.nbiases for l in spec.conv_layers())
    assert total_w == 50_941_792
    assert total_b == 10_761


def test_zoo_yolov2():
    check_yolov2_spec(zoo.build("yolov2"))


def test_zoo_cfg_roundtrip(tmp_path):
    """zoo-emitted cfg parses back to an identical graph."""
    p = tmp_path / "yolov2.cfg"
    p.write_text(zoo.to_cfg("yolov2"))
    spec = NetworkSpec.from_cfg(str(p))
    check_yolov2_spec(spec)
    zspec = zoo.build("yolov2")
    for a, b in zip(spec.layers, zspec.layers):
        assert type(a) is type(b)
        assert (a.out_h, a.out_w, a.out_c) == (b.out_h, b.out_w, b.out_c)


@pytest.mark.skipif(reference_path("config", "yolov2.cfg") is None,
                    reason="reference checkout unavailable")
def test_reference_cfg_matches_zoo():
    """The upstream cfg file and the native zoo definition are the same net."""
    ref = NetworkSpec.from_cfg(reference_path("config", "yolov2.cfg"))
    check_yolov2_spec(ref)
    z = zoo.build("yolov2")
    for a, b in zip(ref.layers, z.layers):
        assert type(a) is type(b), (a.idx, a.type, b.type)
        assert (a.out_h, a.out_w, a.out_c) == (b.out_h, b.out_w, b.out_c)
        if isinstance(a, ConvSpec):
            assert (a.n, a.size, a.stride, a.pad, a.activation,
                    a.batch_normalize) == (b.n, b.size, b.stride, b.pad,
                                           b.activation, b.batch_normalize)
        if isinstance(a, RegionSpec):
            assert np.allclose(a.biases, b.biases)


@pytest.mark.skipif(reference_path("config", "yolov2-voc.cfg") is None,
                    reason="reference checkout unavailable")
def test_reference_voc_cfg_matches_zoo():
    ref = NetworkSpec.from_cfg(reference_path("config", "yolov2-voc.cfg"))
    z = zoo.build("yolov2-voc")
    assert ref.n == z.n
    for a, b in zip(ref.layers, z.layers):
        assert type(a) is type(b)
        assert (a.out_h, a.out_w, a.out_c) == (b.out_h, b.out_w, b.out_c)
        if isinstance(a, RegionSpec):
            assert a.classes == b.classes == 20
            assert np.allclose(a.biases, b.biases)


def test_tiny_shapes():
    spec = zoo.build("yolov2-tiny")
    # stride-1 maxpool keeps 13x13 (padding=size-1=1, darknet formula)
    mp = [l for l in spec.layers if isinstance(l, MaxPoolSpec)][-1]
    assert mp.stride == 1 and (mp.out_h, mp.out_w) == (13, 13)
    assert spec.layers[-2].out_c == 425


def test_total_weight_count_yolov2():
    """Weight/bias word totals vs the reference accelerator's AXI depths
    (hls/models/yolov2/yolo2_accel.cpp:41-46)."""
    spec = zoo.build("yolov2")
    assert sum(l.nweights for l in spec.conv_layers()) == 50_941_792
    assert sum(l.nbiases for l in spec.conv_layers()) == 10_761
    assert abs(sum(l.bflops for l in spec.conv_layers()) - 29.47) < 0.2


def test_zoo_cfg_roundtrip_all_models(tmp_path):
    """Every zoo model's emitted cfg parses back to an identical graph."""
    for name in ("yolov2", "yolov2-voc", "yolov2-tiny"):
        p = tmp_path / f"{name}.cfg"
        p.write_text(zoo.to_cfg(name))
        spec = NetworkSpec.from_cfg(str(p))
        z = zoo.build(name)
        assert spec.n == z.n
        for a, b in zip(spec.layers, z.layers):
            assert type(a) is type(b)
            assert (a.out_h, a.out_w, a.out_c) == (b.out_h, b.out_w, b.out_c)
            if isinstance(a, RegionSpec):
                assert np.allclose(a.biases, b.biases)
                assert a.classes == b.classes


def test_names_module():
    from yolotpu.names import COCO_NAMES, VOC_NAMES, names_for, write_names, load_names
    assert len(COCO_NAMES) == 80 and COCO_NAMES[0] == "person"
    assert len(VOC_NAMES) == 20 and "dog" in VOC_NAMES
    assert names_for(80) is COCO_NAMES and names_for(20) is VOC_NAMES
    assert names_for(7) is None
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.names")
        write_names(VOC_NAMES, p)
        assert load_names(p) == VOC_NAMES
