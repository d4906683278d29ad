"""Misc IO units: V4L2 enumeration (no camera in CI), interleaved formats."""

import os

import numpy as np
import pytest

from smelter_tpu.io.v4l2 import V4l2Input, V4l2InputOptions, list_v4l2_devices


def test_list_v4l2_devices_no_crash():
    devices = list_v4l2_devices()
    assert isinstance(devices, list)  # usually empty in CI


def test_v4l2_open_missing_device_raises():
    with pytest.raises(OSError):
        V4l2Input(V4l2InputOptions(device_path="/dev/video99"))


class _FakeV4l2Driver:
    """Monkeypatched os.open/fcntl.ioctl pair simulating a capture device's
    format negotiation (reference v4l2_input.rs:try_set_format semantics:
    the driver may configure a different fourcc than requested)."""

    def __init__(self, monkeypatch, negotiate_to=None):
        from smelter_tpu.io import v4l2 as m

        self.negotiate_to = negotiate_to  # None = accept whatever is asked

        # DELEGATING fakes: `m.os` is the global os module, so blanket
        # stubs would break every other file/subprocess operation in the
        # process for the duration of the test (a no-op os.close deadlocks
        # subprocess.Popen's errpipe read — found the hard way when a lazy
        # numpy.testing import spawned a child mid-test)
        FAKE_FD = 987654
        real_open, real_close, real_ioctl = os.open, os.close, __import__(
            "fcntl").ioctl

        def fake_open(path, flags, *a, **kw):
            if isinstance(path, str) and path.startswith("/dev/video"):
                return FAKE_FD
            return real_open(path, flags, *a, **kw)

        def fake_close(fd):
            if fd != FAKE_FD:
                real_close(fd)

        def fake_ioctl(fd, code, arg=0, mutate=True):
            if fd != FAKE_FD:
                return real_ioctl(fd, code, arg, mutate)
            if code == m.VIDIOC_QUERYCAP:
                arg.device_caps = m.V4L2_CAP_VIDEO_CAPTURE | m.V4L2_CAP_STREAMING
                return 0
            if code == m.VIDIOC_S_FMT:
                if self.negotiate_to is not None:
                    arg.fmt.pix.pixelformat = self.negotiate_to
                # driver fills derived fields; leave a padded stride so the
                # de-stride path is exercised
                w = arg.fmt.pix.width
                if arg.fmt.pix.pixelformat == m.V4L2_PIX_FMT_NV12:
                    arg.fmt.pix.bytesperline = w + 64
                else:
                    arg.fmt.pix.bytesperline = w * 2 + 64
                return 0
            if code == m.VIDIOC_S_PARM:
                return 0
            raise AssertionError(f"unexpected ioctl 0x{code:x}")

        monkeypatch.setattr(m.os, "open", fake_open)
        monkeypatch.setattr(m.os, "close", fake_close)
        monkeypatch.setattr(m.fcntl, "ioctl", fake_ioctl)


def test_v4l2_nv12_negotiation(monkeypatch):
    """format: nv12 requested and granted -> NV12 capture configured."""
    _FakeV4l2Driver(monkeypatch)
    inp = V4l2Input(V4l2InputOptions(width=64, height=48, format="nv12"))
    assert inp.format == "nv12"
    assert (inp.width, inp.height) == (64, 48)


def test_v4l2_driver_downgrades_format(monkeypatch):
    """Driver negotiates YUYV when NV12 was asked: accepted with a warning
    (v4l2_input.rs:188-204), capture proceeds in the negotiated format."""
    from smelter_tpu.io import v4l2 as m

    _FakeV4l2Driver(monkeypatch, negotiate_to=m.V4L2_PIX_FMT_YUYV)
    inp = V4l2Input(V4l2InputOptions(width=64, height=48, format="nv12"))
    assert inp.format == "yuyv"


def test_v4l2_unsupported_negotiated_format_raises(monkeypatch):
    _FakeV4l2Driver(monkeypatch, negotiate_to=0x47504A4D)  # 'MJPG'
    with pytest.raises(OSError, match="MJPG"):
        V4l2Input(V4l2InputOptions(width=64, height=48, format="yuyv"))


def test_v4l2_unknown_requested_format_raises(monkeypatch):
    _FakeV4l2Driver(monkeypatch)
    with pytest.raises(OSError, match="rgb24"):
        V4l2Input(V4l2InputOptions(width=64, height=48, format="rgb24"))


def test_v4l2_nv12_frame_destride(monkeypatch):
    """NV12 buffers with padded bytesperline unpack into (y, uv) planes of
    the visible size, matching PixelFormat.NV12's (H,W)/(H/2,W/2,2) layout."""
    from smelter_tpu.core.types import PixelFormat

    _FakeV4l2Driver(monkeypatch)
    inp = V4l2Input(V4l2InputOptions(width=64, height=48, format="nv12"))
    stride = 64 + 64
    raw = np.zeros(stride * 48 + stride * 24, np.uint8)
    y_src = np.arange(48 * stride, dtype=np.uint64).astype(np.uint8)
    raw[: 48 * stride] = y_src
    raw[48 * stride :] = 200
    data, fmt = inp._frame_data(raw)
    assert fmt == PixelFormat.NV12
    y, uv = data
    assert y.shape == (48, 64) and uv.shape == (24, 32, 2)
    np.testing.assert_array_equal(y, y_src.reshape(48, stride)[:, :64])
    assert (uv == 200).all()


def test_v4l2_yuyv_frame_destride(monkeypatch):
    from smelter_tpu.core.types import PixelFormat

    _FakeV4l2Driver(monkeypatch)
    inp = V4l2Input(V4l2InputOptions(width=64, height=48, format="yuyv"))
    stride = 64 * 2 + 64
    raw = np.full(stride * 48, 128, np.uint8)
    data, fmt = inp._frame_data(raw)
    assert fmt == PixelFormat.INTERLEAVED_YUYV422
    assert data.shape == (48, 32, 4)


def test_v4l2_nv12_schema_roundtrip():
    """The wire schema accepts format=nv12 and round-trips it."""
    from smelter_tpu.api import schema as api

    spec = api.V4l2Input.model_validate(
        {"type": "v4l2", "path": "/dev/video0", "format": "nv12",
         "resolution": {"width": 640, "height": 480}}
    )
    assert spec.format == "nv12"
    assert api.V4l2Input.model_validate(spec.model_dump(exclude_none=True)).format == "nv12"


def test_interleaved_yuyv_conversion():
    """YUYV frames (the V4L2 capture format) convert through the renderer's
    format dispatch."""
    from smelter_tpu.ops.color_convert import interleaved_yuyv_to_rgba

    # gray (Y=128, U=V=128) frame 4x4
    data = np.full((4, 2, 4), 128, np.uint8)
    rgba = np.asarray(interleaved_yuyv_to_rgba(data))
    assert rgba.shape == (4, 4, 4)
    assert abs(float(rgba[0, 0, 0]) - 0.51) < 0.05  # mid gray
