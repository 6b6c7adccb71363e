"""Raw V4L2 layer: format negotiation + mmap streaming state machine.

Drives ``runtime.v4l2.RawV4L2Camera`` against a fake kernel implementing
the V4L2 ioctl contract, covering the behaviors of the reference's
yolo2_v4l2.c that can only be board-tested there: MJPEG->YUYV fallback
(:112-119), driver-adjusted dimensions (:66-69), REQBUFS/QUERYBUF/QBUF
bookkeeping (:140-201), EAGAIN dequeue (:254-258), out-of-range index
guard (:266-270), and the BT.601 YUYV decode (:328-369).
"""

import ctypes
import errno
import io

import numpy as np
import pytest

from yolotpu.runtime import v4l2 as V
from yolotpu.runtime.camera import yuyv_to_rgb


class FakeSys(V.V4L2Sys):
    """In-memory V4L2 device: supports YUYV always; MJPEG only when
    ``mjpeg_ok``. Maintains a real queued/dequeued buffer state machine."""

    def __init__(self, mjpeg_ok=False, width=32, height=8, adjust=None,
                 caps=V.CAP_VIDEO_CAPTURE | V.CAP_STREAMING,
                 substitute_fmt=False, n_buffers=4):
        self.mjpeg_ok = mjpeg_ok
        self.w, self.h = width, height
        self.adjust = adjust          # (w, h) the "driver" forces
        self.caps = caps
        self.substitute_fmt = substitute_fmt
        self.n_buffers = n_buffers
        self.fmt = None
        self.queued: list[int] = []
        self.pending: list[tuple[int, bytes]] = []   # (index, payload)
        self.streaming = False
        self.mem = {}
        self.log: list[str] = []

    # --- seam implementation ------------------------------------------
    def open(self, device):
        self.log.append(f"open {device}")
        return 42

    def close(self, fd):
        self.log.append("close")

    def mmap(self, fd, length, offset):
        buf = bytearray(length)
        self.mem[offset] = buf
        return memoryview(buf)

    def ioctl(self, fd, request, arg):
        if request == V.VIDIOC_QUERYCAP:
            arg.capabilities = self.caps
            return
        if request == V.VIDIOC_S_FMT:
            pix = arg.fmt.pix
            want = pix.pixelformat
            if want == V.PIX_FMT_MJPEG and not self.mjpeg_ok:
                if self.substitute_fmt:
                    pix.pixelformat = V.PIX_FMT_YUYV  # silent substitution
                    return
                raise OSError(errno.EINVAL, "fmt")
            if self.adjust:
                pix.width, pix.height = self.adjust
            else:
                pix.width, pix.height = self.w, self.h
            self.fmt = want
            return
        if request == V.VIDIOC_S_PARM:
            self.fps = arg.parm.capture.timeperframe.denominator
            return
        if request == V.VIDIOC_REQBUFS:
            arg.count = self.n_buffers
            return
        if request == V.VIDIOC_QUERYBUF:
            # MJPEG payloads can exceed w*h*2; real drivers size buffers
            # from sizeimage — give them headroom
            arg.length = max(self.w * self.h * 2, 1 << 16)
            arg.m.offset = 65536 * arg.index
            return
        if request == V.VIDIOC_QBUF:
            assert arg.index not in self.queued, "double QBUF"
            self.queued.append(arg.index)
            return
        if request == V.VIDIOC_STREAMON:
            self.streaming = True
            return
        if request == V.VIDIOC_STREAMOFF:
            self.streaming = False
            return
        if request == V.VIDIOC_DQBUF:
            assert self.streaming, "DQBUF before STREAMON"
            if not self.pending:
                raise OSError(errno.EAGAIN, "no frame")
            idx, payload = self.pending.pop(0)
            self.queued.remove(idx)
            self.mem[65536 * idx][:len(payload)] = payload
            arg.index = idx
            arg.bytesused = len(payload)
            return
        raise OSError(errno.ENOTTY, f"unexpected ioctl {request:#x}")

    # --- test helpers ---------------------------------------------------
    def push_frame(self, payload: bytes, index: int | None = None):
        idx = index if index is not None else self.queued[0]
        self.pending.append((idx, payload))


def test_mjpeg_to_yuyv_fallback_negotiation():
    sys_ = FakeSys(mjpeg_ok=False)
    cam = V.RawV4L2Camera("/dev/video9", 32, 8, 15, "mjpeg", sys=sys_)
    assert cam.format == "yuyv"             # fell back
    assert (cam.width, cam.height) == (32, 8)
    assert sys_.streaming and len(sys_.queued) == 4
    cam.close()
    assert not sys_.streaming and "close" in sys_.log


def test_silent_format_substitution_rejected():
    # a driver that "accepts" S_FMT but swaps the pixelformat must be
    # treated as not supporting the format (yolo2_v4l2.c:62-64)
    sys_ = FakeSys(mjpeg_ok=False, substitute_fmt=True)
    cam = V.RawV4L2Camera("/dev/video9", 32, 8, 15, "mjpeg", sys=sys_)
    assert cam.format == "yuyv"


def test_driver_adjusted_dimensions_accepted():
    sys_ = FakeSys(mjpeg_ok=False, adjust=(64, 16))
    cam = V.RawV4L2Camera("/dev/video9", 32, 8, 15, "yuyv", sys=sys_)
    assert (cam.width, cam.height) == (64, 16)


def test_capability_checks():
    with pytest.raises(V.V4L2Error, match="capture"):
        V.RawV4L2Camera(sys=FakeSys(caps=V.CAP_STREAMING))
    with pytest.raises(V.V4L2Error, match="streaming"):
        V.RawV4L2Camera(sys=FakeSys(caps=V.CAP_VIDEO_CAPTURE))


def test_insufficient_buffers():
    with pytest.raises(V.V4L2Error, match="nsufficient"):
        V.RawV4L2Camera(sys=FakeSys(n_buffers=1))


def test_yuyv_frame_roundtrip_bt601():
    sys_ = FakeSys(mjpeg_ok=False, width=32, height=8)
    cam = V.RawV4L2Camera("/dev/video9", 32, 8, 15, "yuyv", sys=sys_)
    rng = np.random.default_rng(0)
    yuyv = rng.integers(0, 256, 32 * 8 * 2, dtype=np.uint8)
    sys_.push_frame(yuyv.tobytes())
    frame = cam.read(eagain_spins=3)
    want = yuyv_to_rgb(yuyv, 32, 8)
    np.testing.assert_array_equal(frame, want)
    # the dequeued buffer was re-queued: all 4 back in the queue
    assert sorted(sys_.queued) == [0, 1, 2, 3]


def test_eagain_returns_none_without_error():
    sys_ = FakeSys(mjpeg_ok=False)
    cam = V.RawV4L2Camera("/dev/video9", 32, 8, 15, "yuyv", sys=sys_)
    assert cam.read(eagain_spins=2) is None   # no frame pushed
    assert sys_.streaming                     # stream not torn down


def test_mjpeg_decode_and_size_check():
    from PIL import Image
    sys_ = FakeSys(mjpeg_ok=True, width=32, height=8)
    cam = V.RawV4L2Camera("/dev/video9", 32, 8, 15, "mjpeg", sys=sys_)
    assert cam.format == "mjpeg"
    rgb = np.zeros((8, 32, 3), np.uint8)
    rgb[:, :16] = (255, 0, 0)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=95)
    sys_.push_frame(buf.getvalue())
    frame = cam.read(eagain_spins=3)
    assert frame.shape == (8, 32, 3)
    assert frame[:, :8, 0].mean() > 200       # red half survived decode
    # wrong-size payload is a decode failure -> skipped frame (None), and
    # the buffer is still re-queued
    rgb2 = np.zeros((4, 16, 3), np.uint8)
    buf2 = io.BytesIO()
    Image.fromarray(rgb2).save(buf2, "JPEG")
    sys_.push_frame(buf2.getvalue())
    assert cam.read(eagain_spins=3) is None
    assert sorted(sys_.queued) == [0, 1, 2, 3]


def test_out_of_range_index_guard():
    sys_ = FakeSys(mjpeg_ok=False)
    cam = V.RawV4L2Camera("/dev/video9", 32, 8, 15, "yuyv", sys=sys_)
    sys_.queued.append(9)
    sys_.mem[65536 * 9] = bytearray(32 * 8 * 2)
    sys_.push_frame(b"x" * 64, index=9)
    assert cam.read(eagain_spins=2) is None   # guarded, surfaced as error


def test_struct_layouts_match_abi():
    """ioctl codes embed sizeof(struct): pin the 64-bit ABI sizes so a
    field-order mistake cannot silently corrupt the kernel interface."""
    assert ctypes.sizeof(V.Capability) == 104
    assert ctypes.sizeof(V.Format) == 208
    assert ctypes.sizeof(V.RequestBuffers) == 20
    assert ctypes.sizeof(V.Buffer) == 88
    assert ctypes.sizeof(V.StreamParm) == 204
    assert V.VIDIOC_QUERYCAP == 0x80685600
    assert V.VIDIOC_S_FMT == 0xC0D05605
    assert V.VIDIOC_DQBUF == 0xC0585611
