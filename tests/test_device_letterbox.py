"""On-device letterbox: bit-exact vs the host darknet implementation."""

import numpy as np
import pytest
import jax.numpy as jnp

from yolotpu.image import letterbox_image
from yolotpu.ops.letterbox import device_letterbox


def _check(h, w, net=416):
    rng = np.random.default_rng(h * 1000 + w)
    u8 = rng.integers(0, 256, (2, h, w, 3), np.uint8)
    got = np.asarray(device_letterbox(jnp.asarray(u8), net, net))
    for i in range(2):
        chw = (u8[i].astype(np.float32) / 255.0).transpose(2, 0, 1)
        want = letterbox_image(chw, net, net)
        np.testing.assert_array_equal(got[i].transpose(2, 0, 1), want)


def test_device_letterbox_wide():
    _check(480, 640)


def test_device_letterbox_tall():
    _check(640, 360)


def test_device_letterbox_upscale():
    _check(216, 216)


def test_device_letterbox_exact_fit():
    _check(416, 416)


def test_device_letterbox_small_net():
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, (1, 48, 64, 3), np.uint8)
    got = np.asarray(device_letterbox(jnp.asarray(u8), 64, 64))[0]
    chw = (u8[0].astype(np.float32) / 255.0).transpose(2, 0, 1)
    want = letterbox_image(chw, 64, 64)
    np.testing.assert_array_equal(got.transpose(2, 0, 1), want)


@pytest.mark.slow
def test_engine_raw_frames_match_host_letterbox():
    """predict_batch_raw_frames (device letterbox) == host letterbox path."""
    from yolotpu.models import zoo
    from yolotpu.runtime.engine import Engine, load_or_synthesize
    spec = zoo.build("yolov2", width=64, height=64)
    store = load_or_synthesize(spec, None, "fp32", synthetic=True)
    eng = Engine(spec, store, "fp32", backend="xla")
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (2, 48, 80, 3), np.uint8)
    got = eng.predict_batch_raw_frames(frames)
    boxed = np.stack([
        letterbox_image((f.astype(np.float32) / 255.0).transpose(2, 0, 1),
                        64, 64) for f in frames])
    want = eng.predict_batch(boxed)
    # inside the fused program XLA may FMA-contract the letterbox lerp
    # (~1 ulp on the boxed tensor); standalone device_letterbox is bit-exact
    # (tests above) and quantized tiers absorb the ulp in input rounding
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
