"""Engine plan: selection table, per-layer override, illegal-kind guard.

Selection logic is tested against the REAL yolov2 graph through the pure
``select_engine`` (no weight prep); the params/prep path runs on a micro
cfg so the module stays in the fast gate (full-graph prep is covered by
the slow full-net bit-exact tests)."""

import numpy as np
import pytest

from yolotpu.graph import NetworkSpec
from yolotpu.models import engine_plan as ep
from yolotpu.models import yolov2 as m
from yolotpu.models import zoo
from yolotpu.quant import quantize_weights
from yolotpu.weights import WeightStore

MICRO_CFG = """
[net]
height=64
width=64
channels=3

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
filters=128
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=64
size=1
stride=1
pad=0
activation=leaky

[convolutional]
filters=128
size=3
stride=1
pad=1
activation=leaky

[region]
anchors=1.0,1.0, 2.0,2.0
num=2
classes=4
coords=4
softmax=1
"""


@pytest.fixture(scope="module")
def micro(tmp_path_factory):
    d = tmp_path_factory.mktemp("plan")
    cfg = d / "micro.cfg"
    cfg.write_text(MICRO_CFG)
    spec = NetworkSpec.from_cfg(str(cfg))
    store = WeightStore.synthetic(spec, seed=0)
    act_q = [8] * (len(list(spec.conv_layers())) + 1)
    quantize_weights(store, act_q)
    return spec, store


def test_default_plan_kinds_real_yolov2():
    """The measured default plan over the REAL flagship graph: mm for all
    1x1, conv3/xla split by MAX_HW for 3x3, entry via the entry lever."""
    spec = zoo.build("yolov2")
    knobs = ep.resolve_knobs()
    max_hw = knobs["max_hw"]
    for l in spec.conv_layers():
        kind = ep.select_engine(l, spec, entry=knobs["entry"],
                                max_hw=max_hw)
        if l.size == 1:
            assert kind == "mm", (l.idx, kind)
        elif l.c < 8:
            assert kind in ("xla", "entry_sd"), (l.idx, kind)
        else:
            want = "xla" if l.out_h * l.out_w > max_hw else "conv3"
            assert kind == want, (l.idx, kind, want)


def test_chip_plan_loaded_by_device_kind(tmp_path, monkeypatch):
    """plans/<device_kind>.json drives the knobs for that chip; env levers
    still win; an unknown chip falls back to the v5e table (VERDICT r4 #7)."""
    monkeypatch.setenv("YOLO2_PLAN_DIR", str(tmp_path))
    (tmp_path / "tpu_v9_mega.json").write_text(
        '{"device_kind": "TPU v9 mega", "entry": "xla", "max_hw": 10816,'
        ' "plan": {"4": "xla8"}}')

    knobs = ep.resolve_knobs("TPU v9 mega")
    assert knobs["entry"] == "xla"
    assert knobs["max_hw"] == 10816
    assert knobs["plan"] == {4: "xla8"}
    assert knobs["xla_min_c"] == ep.V5E_DEFAULTS["xla_min_c"]

    # env levers are bisection overrides on top of the chip plan
    monkeypatch.setenv("YOLO2_Q16_PALLAS_MAX_HW", "676")
    monkeypatch.setenv("YOLO2_Q16_PLAN", "4:xla,7:mm_patches")
    knobs = ep.resolve_knobs("TPU v9 mega")
    assert knobs["max_hw"] == 676
    assert knobs["plan"] == {4: "xla", 7: "mm_patches"}
    monkeypatch.delenv("YOLO2_Q16_PALLAS_MAX_HW")
    monkeypatch.delenv("YOLO2_Q16_PLAN")

    # unmeasured chip: v5e fallback
    knobs = ep.resolve_knobs("TPU v99 imaginary")
    assert knobs["entry"] == ep.V5E_DEFAULTS["entry"]
    assert knobs["max_hw"] == ep.V5E_DEFAULTS["max_hw"]

    # a plan file naming an unknown engine kind fails loudly
    (tmp_path / "tpu_v9_bad.json").write_text('{"plan": {"0": "warp9"}}')
    with pytest.raises(ValueError, match="unknown engine kind"):
        ep.resolve_knobs("TPU v9 bad")


def test_chip_plan_checked_in_for_v5e():
    """The real chip's plan file exists in-tree and matches the measured
    defaults the rounds-2..4 campaign converged on."""
    knobs = ep.resolve_knobs("TPU v5 lite")
    assert knobs["entry"] == "sd"
    assert knobs["max_hw"] == 2704
    assert ep.load_chip_plan("TPU v5 lite") is not None


def test_entry_sd_selected_with_entry_lever():
    spec = zoo.build("yolov2")
    l0 = next(l for l in spec.conv_layers())
    assert ep.select_engine(l0, spec, entry="sd", max_hw=676) == "entry_sd"
    assert ep.select_engine(l0, spec, entry="xla", max_hw=676) == "xla"


def test_plan_override_reroutes_layer(micro, monkeypatch):
    spec, store = micro
    convs = list(spec.conv_layers())
    c3 = next(l.idx for l in convs if l.size == 3 and l.c >= 8)
    monkeypatch.setenv("YOLO2_Q16_PLAN", f"{c3}:xla8")
    params = m.params_q16(spec, store)
    assert params[f"conv{c3}"]["kind"] == "xla8"
    monkeypatch.setenv("YOLO2_Q16_PLAN", f"{c3}:mm_patches")
    params = m.params_q16(spec, store)
    assert params[f"conv{c3}"]["kind"] == "mm_patches"


def test_plan_override_illegal_kind_raises(micro, monkeypatch):
    spec, store = micro
    one_by_one = next(l.idx for l in spec.conv_layers() if l.size == 1)
    # a 1x1 layer cannot run the 3x3 flat-band kernel: must raise, not
    # silently re-route (VERDICT r3 weak #4)
    monkeypatch.setenv("YOLO2_Q16_PLAN", f"{one_by_one}:conv3")
    with pytest.raises(ValueError, match="not applicable"):
        m.params_q16(spec, store)


def test_plan_unknown_kind_rejected(monkeypatch):
    monkeypatch.setenv("YOLO2_Q16_PLAN", "0:warp9")
    with pytest.raises(ValueError, match="unknown engine kind"):
        ep.plan_overrides()


@pytest.mark.slow
def test_evidence_kind_bitexact_via_override(micro, monkeypatch):
    """An evidence-only kind (mm_patches) selected through the override
    still produces bit-identical results — overrides change performance,
    never bits."""
    import jax.numpy as jnp
    spec, store = micro
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))

    fwd = m.build_forward(spec, "int16", store.qtables, compute="pallas",
                          outputs=("head",))
    base = np.asarray(fwd(m.params_q16(spec, store), x)["head"])

    tgt = next(l.idx for l in spec.conv_layers()
               if l.size == 3 and l.c >= 8)
    monkeypatch.setenv("YOLO2_Q16_PLAN", f"{tgt}:mm_patches")
    got = np.asarray(fwd(m.params_q16(spec, store), x)["head"])
    np.testing.assert_array_equal(got, base)
