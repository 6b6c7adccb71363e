"""Raw V4L2 capture: ioctl format negotiation + mmap streaming I/O.

A from-scratch Python twin of the reference's minimal V4L2 layer
(``linux_app/src/yolo2_v4l2.c``) — the one reference behavior round 3 had
only approximated through cv2. The full state machine is reproduced:

- EINTR-retrying ioctl wrapper            (yolo2_v4l2.c:23-30)
- QUERYCAP: must be VIDEO_CAPTURE + STREAMING capable  (:93-110)
- S_FMT with exact-pixelformat verification; the driver may adjust
  width/height (accepted) but not the format (:43-70)
- MJPEG-preferred with YUYV fallback (or the reverse when YUYV is
  requested)                               (:112-119)
- S_PARM fps hint, failure is a warning    (:133-141)
- REQBUFS count=4 MMAP, >=2 required; QUERYBUF + mmap each; QBUF all
  (:140-201)
- STREAMON/STREAMOFF                       (:207-227)
- DQBUF with EAGAIN -> "no frame yet" and out-of-range index guard;
  zero-copy view handed to the decoder, then re-QBUF (:247-291)

Decoding: MJPEG frames through PIL (the stb_image analog,
yolo2_v4l2.c:292-319), YUYV through the exact integer BT.601 converter
shared with ``runtime.camera`` (:328-369).

Everything kernel-facing goes through a small ``V4L2Sys`` seam so the whole
negotiation/streaming machine is unit-testable without a camera (the
reference can only test this path on the board).
"""

from __future__ import annotations

import ctypes
import errno
import mmap as _mmap
import os
import struct as _struct

import numpy as np

from . import logging as ylog
from .camera import yuyv_to_rgb

# --- fourccs -----------------------------------------------------------

def fourcc(a: str) -> int:
    return (ord(a[0]) | (ord(a[1]) << 8) | (ord(a[2]) << 16)
            | (ord(a[3]) << 24))


PIX_FMT_MJPEG = fourcc("MJPG")
PIX_FMT_YUYV = fourcc("YUYV")

BUF_TYPE_VIDEO_CAPTURE = 1
MEMORY_MMAP = 1
CAP_VIDEO_CAPTURE = 0x00000001
CAP_STREAMING = 0x04000000
FIELD_ANY = 0


def pixfmt_name(fmt: int) -> str:
    if fmt == PIX_FMT_MJPEG:
        return "mjpeg"
    if fmt == PIX_FMT_YUYV:
        return "yuyv"
    return "unknown"


# --- videodev2.h structs (64-bit layouts, ctypes-derived sizes) --------

class _timeval(ctypes.Structure):
    _fields_ = [("tv_sec", ctypes.c_long), ("tv_usec", ctypes.c_long)]


class _timecode(ctypes.Structure):
    _fields_ = [("type", ctypes.c_uint32), ("flags", ctypes.c_uint32),
                ("frames", ctypes.c_uint8), ("seconds", ctypes.c_uint8),
                ("minutes", ctypes.c_uint8), ("hours", ctypes.c_uint8),
                ("userbits", ctypes.c_uint8 * 4)]


class Capability(ctypes.Structure):
    _fields_ = [("driver", ctypes.c_uint8 * 16),
                ("card", ctypes.c_uint8 * 32),
                ("bus_info", ctypes.c_uint8 * 32),
                ("version", ctypes.c_uint32),
                ("capabilities", ctypes.c_uint32),
                ("device_caps", ctypes.c_uint32),
                ("reserved", ctypes.c_uint32 * 3)]


class PixFormat(ctypes.Structure):
    _fields_ = [("width", ctypes.c_uint32), ("height", ctypes.c_uint32),
                ("pixelformat", ctypes.c_uint32), ("field", ctypes.c_uint32),
                ("bytesperline", ctypes.c_uint32),
                ("sizeimage", ctypes.c_uint32),
                ("colorspace", ctypes.c_uint32), ("priv", ctypes.c_uint32),
                ("flags", ctypes.c_uint32), ("ycbcr_enc", ctypes.c_uint32),
                ("quantization", ctypes.c_uint32),
                ("xfer_func", ctypes.c_uint32)]


class _format_union(ctypes.Union):
    _fields_ = [("pix", PixFormat), ("raw_data", ctypes.c_uint8 * 200)]


class Format(ctypes.Structure):
    # the union holds pointer-bearing alternatives in C, forcing 8-byte
    # alignment of the union (sizeof == 208 on 64-bit)
    _fields_ = [("type", ctypes.c_uint32), ("_pad", ctypes.c_uint32),
                ("fmt", _format_union)]


class RequestBuffers(ctypes.Structure):
    _fields_ = [("count", ctypes.c_uint32), ("type", ctypes.c_uint32),
                ("memory", ctypes.c_uint32),
                ("capabilities", ctypes.c_uint32),
                ("flags", ctypes.c_uint8), ("reserved", ctypes.c_uint8 * 3)]


class _buffer_m(ctypes.Union):
    _fields_ = [("offset", ctypes.c_uint32),
                ("userptr", ctypes.c_ulong),
                ("fd", ctypes.c_int32)]


class Buffer(ctypes.Structure):
    _fields_ = [("index", ctypes.c_uint32), ("type", ctypes.c_uint32),
                ("bytesused", ctypes.c_uint32), ("flags", ctypes.c_uint32),
                ("field", ctypes.c_uint32),
                ("timestamp", _timeval), ("timecode", _timecode),
                ("sequence", ctypes.c_uint32), ("memory", ctypes.c_uint32),
                ("m", _buffer_m), ("length", ctypes.c_uint32),
                ("reserved2", ctypes.c_uint32),
                ("request_fd", ctypes.c_int32)]


class _fract(ctypes.Structure):
    _fields_ = [("numerator", ctypes.c_uint32),
                ("denominator", ctypes.c_uint32)]


class CaptureParm(ctypes.Structure):
    _fields_ = [("capability", ctypes.c_uint32),
                ("capturemode", ctypes.c_uint32),
                ("timeperframe", _fract),
                ("extendedmode", ctypes.c_uint32),
                ("readbuffers", ctypes.c_uint32),
                ("reserved", ctypes.c_uint32 * 4)]


class _parm_union(ctypes.Union):
    _fields_ = [("capture", CaptureParm), ("raw_data", ctypes.c_uint8 * 200)]


class StreamParm(ctypes.Structure):
    _fields_ = [("type", ctypes.c_uint32), ("parm", _parm_union)]


# --- ioctl request codes (computed from struct sizes, like _IOWR) ------

_IOC_WRITE, _IOC_READ = 1, 2


def _ioc(dirn: int, nr: int, size: int) -> int:
    return (dirn << 30) | (size << 16) | (ord("V") << 8) | nr


VIDIOC_QUERYCAP = _ioc(_IOC_READ, 0, ctypes.sizeof(Capability))
VIDIOC_S_FMT = _ioc(_IOC_READ | _IOC_WRITE, 5, ctypes.sizeof(Format))
VIDIOC_REQBUFS = _ioc(_IOC_READ | _IOC_WRITE, 8,
                      ctypes.sizeof(RequestBuffers))
VIDIOC_QUERYBUF = _ioc(_IOC_READ | _IOC_WRITE, 9, ctypes.sizeof(Buffer))
VIDIOC_QBUF = _ioc(_IOC_READ | _IOC_WRITE, 15, ctypes.sizeof(Buffer))
VIDIOC_DQBUF = _ioc(_IOC_READ | _IOC_WRITE, 17, ctypes.sizeof(Buffer))
VIDIOC_STREAMON = _ioc(_IOC_WRITE, 18, 4)
VIDIOC_STREAMOFF = _ioc(_IOC_WRITE, 19, 4)
VIDIOC_S_PARM = _ioc(_IOC_READ | _IOC_WRITE, 22, ctypes.sizeof(StreamParm))


class V4L2Error(OSError):
    pass


class V4L2Sys:
    """Kernel seam: open/ioctl/mmap/close. Tests inject a fake."""

    def open(self, device: str) -> int:
        return os.open(device, os.O_RDWR)

    def close(self, fd: int) -> None:
        os.close(fd)

    def ioctl(self, fd: int, request: int, arg) -> None:
        """EINTR-retrying ioctl (yolo2_v4l2.c:23-30). ``arg`` is a ctypes
        struct (mutated in place) or an int packed as c_int."""
        import fcntl
        while True:
            try:
                fcntl.ioctl(fd, request, arg)
                return
            except InterruptedError:
                continue

    def mmap(self, fd: int, length: int, offset: int):
        return _mmap.mmap(fd, length, flags=_mmap.MAP_SHARED,
                          prot=_mmap.PROT_READ | _mmap.PROT_WRITE,
                          offset=offset)


class RawV4L2Camera:
    """MJPEG/YUYV V4L2 capture with mmap streaming, reference semantics.

    ``read()`` returns an RGB24 HWC uint8 frame, None on EOF-equivalent
    errors, and retries EAGAIN internally up to ``eagain_spins`` polls
    (the reference's caller loops at frame cadence; main.c:944-976 skips
    on decode failure, which here surfaces as a skipped frame too).
    """

    N_BUFFERS = 4

    def __init__(self, device: str = "/dev/video0", width: int = 640,
                 height: int = 480, fps: int = 30, fmt: str = "mjpeg",
                 sys: V4L2Sys | None = None):
        self._sys = sys or V4L2Sys()
        self._fd = self._sys.open(device)
        self._maps: list = []
        self._streaming = False
        try:
            self._open(device, width, height, fps, fmt)
            self.start()
        except Exception:
            self.close()
            raise

    # -- negotiation state machine (yolo2_v4l2.c:73-205) ---------------
    def _open(self, device, width, height, fps, fmt):
        cap = Capability()
        self._sys.ioctl(self._fd, VIDIOC_QUERYCAP, cap)
        if not cap.capabilities & CAP_VIDEO_CAPTURE:
            raise V4L2Error(f"{device} is not a V4L2 video capture device")
        if not cap.capabilities & CAP_STREAMING:
            raise V4L2Error(f"{device} does not support V4L2 streaming I/O")

        primary = PIX_FMT_YUYV if fmt == "yuyv" else PIX_FMT_MJPEG
        fallback = (PIX_FMT_YUYV if primary == PIX_FMT_MJPEG
                    else PIX_FMT_MJPEG)
        if not self._try_set_format(width, height, primary):
            ylog.info(f"camera format {pixfmt_name(primary)} not supported,"
                      f" trying {pixfmt_name(fallback)}...")
            if not self._try_set_format(width, height, fallback):
                raise V4L2Error(
                    f"failed to set camera format ({pixfmt_name(primary)} "
                    f"or {pixfmt_name(fallback)}) at {width}x{height}")

        self.fps = fps
        parm = StreamParm()
        parm.type = BUF_TYPE_VIDEO_CAPTURE
        parm.parm.capture.timeperframe.numerator = 1
        parm.parm.capture.timeperframe.denominator = fps if fps > 0 else 30
        try:
            self._sys.ioctl(self._fd, VIDIOC_S_PARM, parm)
        except OSError as e:
            ylog.info(f"WARNING: failed to set FPS to {fps}: {e}")

        req = RequestBuffers()
        req.count = self.N_BUFFERS
        req.type = BUF_TYPE_VIDEO_CAPTURE
        req.memory = MEMORY_MMAP
        self._sys.ioctl(self._fd, VIDIOC_REQBUFS, req)
        if req.count < 2:
            raise V4L2Error(f"insufficient V4L2 buffers (count={req.count})")
        self._n_buffers = int(req.count)

        for i in range(self._n_buffers):
            buf = Buffer()
            buf.type = BUF_TYPE_VIDEO_CAPTURE
            buf.memory = MEMORY_MMAP
            buf.index = i
            self._sys.ioctl(self._fd, VIDIOC_QUERYBUF, buf)
            self._maps.append(self._sys.mmap(self._fd, buf.length,
                                             buf.m.offset))
        for i in range(self._n_buffers):
            self._qbuf(i)
        ylog.info(f"camera opened: {device} ({self.width}x{self.height} "
                  f"@ ~{fps}fps, fmt={pixfmt_name(self.pixfmt)})")

    def _try_set_format(self, width, height, pixfmt) -> bool:
        f = Format()
        f.type = BUF_TYPE_VIDEO_CAPTURE
        f.fmt.pix.width = width
        f.fmt.pix.height = height
        f.fmt.pix.pixelformat = pixfmt
        f.fmt.pix.field = FIELD_ANY
        try:
            self._sys.ioctl(self._fd, VIDIOC_S_FMT, f)
        except OSError:
            return False
        if f.fmt.pix.pixelformat != pixfmt:
            return False    # driver silently substituted another format
        # the driver may adjust dims; accept its values (yolo2_v4l2.c:66-69)
        self.width = int(f.fmt.pix.width)
        self.height = int(f.fmt.pix.height)
        self.pixfmt = int(f.fmt.pix.pixelformat)
        return True

    @property
    def format(self) -> str:
        return pixfmt_name(self.pixfmt)

    # -- streaming ------------------------------------------------------
    def start(self) -> None:
        self._sys.ioctl(self._fd, VIDIOC_STREAMON,
                        ctypes.c_int(BUF_TYPE_VIDEO_CAPTURE))
        self._streaming = True

    def stop(self) -> None:
        if self._streaming:
            try:
                self._sys.ioctl(self._fd, VIDIOC_STREAMOFF,
                                ctypes.c_int(BUF_TYPE_VIDEO_CAPTURE))
            except OSError as e:
                ylog.info(f"WARNING: VIDIOC_STREAMOFF failed: {e}")
            self._streaming = False

    def _qbuf(self, index: int) -> None:
        buf = Buffer()
        buf.type = BUF_TYPE_VIDEO_CAPTURE
        buf.memory = MEMORY_MMAP
        buf.index = index
        self._sys.ioctl(self._fd, VIDIOC_QBUF, buf)

    def _dqbuf(self):
        """-> (index, bytes payload) | None when no frame is ready
        (EAGAIN, yolo2_v4l2.c:254-258)."""
        buf = Buffer()
        buf.type = BUF_TYPE_VIDEO_CAPTURE
        buf.memory = MEMORY_MMAP
        try:
            self._sys.ioctl(self._fd, VIDIOC_DQBUF, buf)
        except OSError as e:
            if e.errno == errno.EAGAIN:
                return None
            raise
        if buf.index >= self._n_buffers:
            raise V4L2Error(
                f"V4L2 returned out-of-range buffer index {buf.index}")
        m = self._maps[buf.index]
        return int(buf.index), m[:int(buf.bytesused)]

    # -- frame API (matches runtime.camera.Camera) ----------------------
    def read(self, eagain_spins: int = 1000) -> np.ndarray | None:
        import time
        for _ in range(eagain_spins):
            try:
                got = self._dqbuf()
            except OSError as e:
                ylog.info(f"ERROR: VIDIOC_DQBUF failed: {e}")
                return None
            if got is not None:
                break
            time.sleep(0.001)
        else:
            return None
        idx, payload = got
        try:
            return self._decode(payload)
        finally:
            self._qbuf(idx)   # requeue promptly, even on decode failure

    def _decode(self, payload: bytes) -> np.ndarray | None:
        if self.pixfmt == PIX_FMT_YUYV:
            need = self.width * self.height * 2
            if len(payload) < need:
                ylog.info(f"short YUYV frame ({len(payload)} < {need})")
                return None
            arr = np.frombuffer(payload, np.uint8, count=need)
            return yuyv_to_rgb(arr, self.width, self.height)
        # MJPEG: stb_image analog (yolo2_v4l2.c:292-319); size must match
        try:
            import io
            from PIL import Image
            img = Image.open(io.BytesIO(payload)).convert("RGB")
        except Exception as e:
            ylog.info(f"ERROR: MJPEG decode failed: {e}")
            return None
        if img.size != (self.width, self.height):
            ylog.info(f"ERROR: MJPEG decoded size {img.size[0]}x"
                      f"{img.size[1]} != expected {self.width}x{self.height}")
            return None
        return np.asarray(img, np.uint8)

    def close(self) -> None:
        self.stop()
        for m in self._maps:
            try:
                m.close()
            except Exception:
                pass
        self._maps = []
        if self._fd is not None and self._fd >= 0:
            try:
                self._sys.close(self._fd)
            except OSError:
                pass
            self._fd = -1


def open_camera(device: str = "/dev/video0", width: int = 640,
                height: int = 480, fps: int = 30, fmt: str = "mjpeg"):
    """Raw-V4L2 first (the reference's exact path), cv2 fallback — the
    backend is selectable with YOLO2_CAMERA_BACKEND=raw|cv2."""
    backend = os.environ.get("YOLO2_CAMERA_BACKEND", "auto")
    if backend in ("auto", "raw"):
        try:
            return RawV4L2Camera(device, width, height, fps, fmt)
        except Exception as e:
            if backend == "raw":
                raise
            ylog.debug(f"raw V4L2 open failed ({e}); trying cv2")
    from .camera import Camera
    return Camera(device, width, height, fps, fmt)
