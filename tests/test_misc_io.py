"""Misc IO units: V4L2 enumeration (no camera in CI), interleaved formats."""

import numpy as np
import pytest

from smelter_tpu.io.v4l2 import V4l2Input, V4l2InputOptions, list_v4l2_devices


def test_list_v4l2_devices_no_crash():
    devices = list_v4l2_devices()
    assert isinstance(devices, list)  # usually empty in CI


def test_v4l2_open_missing_device_raises():
    with pytest.raises(OSError):
        V4l2Input(V4l2InputOptions(device_path="/dev/video99"))


def test_interleaved_yuyv_conversion():
    """YUYV frames (the V4L2 capture format) convert through the renderer's
    format dispatch."""
    from smelter_tpu.ops.color_convert import interleaved_yuyv_to_rgba

    # gray (Y=128, U=V=128) frame 4x4
    data = np.full((4, 2, 4), 128, np.uint8)
    rgba = np.asarray(interleaved_yuyv_to_rgba(data))
    assert rgba.shape == (4, 4, 4)
    assert abs(float(rgba[0, 0, 0]) - 0.51) < 0.05  # mid gray
