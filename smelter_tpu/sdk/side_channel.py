"""Side-channel consumers: stream decoded RGBA frames / PCM into Python.

Parses the binary wire format from `pipeline/side_channel.py` (identical to
the reference `queue/side_channel/serialize.rs`):

video: u32 width | u32 height | u64 pts_nanos | RGBA bytes
audio: u64 start_pts_nanos | u32 sample_rate | u8 channels | u32 count | f64[]

Sync iterators here; asyncio variants in `smelter_tpu.sdk.aio`.
"""

from __future__ import annotations

import socket
import struct
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np


@dataclass
class VideoFrame:
    width: int
    height: int
    pts_s: float
    rgba: np.ndarray  # (H, W, 4) uint8


@dataclass
class AudioBatch:
    start_pts_s: float
    sample_rate: int
    channels: int
    samples: np.ndarray  # (n, channels) float64


def _read_exact(sock: socket.socket, n: int) -> Optional[bytes]:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf.extend(chunk)
    return bytes(buf)


class VideoSideChannelReader:
    """Sync iterator over RGBA frames from a video side-channel socket."""

    def __init__(self, socket_path: str, timeout: Optional[float] = None) -> None:
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        if timeout is not None:
            self._sock.settimeout(timeout)
        self._sock.connect(socket_path)

    def read(self) -> Optional[VideoFrame]:
        header = _read_exact(self._sock, 16)
        if header is None:
            return None
        width, height, pts_ns = struct.unpack("!IIQ", header)
        body = _read_exact(self._sock, width * height * 4)
        if body is None:
            return None
        rgba = np.frombuffer(body, dtype=np.uint8).reshape(height, width, 4)
        return VideoFrame(width, height, pts_ns / 1e9, rgba)

    def __iter__(self) -> Iterator[VideoFrame]:
        while True:
            frame = self.read()
            if frame is None:
                return
            yield frame

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


class AudioSideChannelReader:
    """Sync iterator over PCM batches from an audio side-channel socket."""

    def __init__(self, socket_path: str, timeout: Optional[float] = None) -> None:
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        if timeout is not None:
            self._sock.settimeout(timeout)
        self._sock.connect(socket_path)

    def read(self) -> Optional[AudioBatch]:
        header = _read_exact(self._sock, 17)
        if header is None:
            return None
        pts_ns, rate, channels, count = struct.unpack("!QIBI", header)
        body = _read_exact(self._sock, count * channels * 8)
        if body is None:
            return None
        samples = np.frombuffer(body, dtype=">f8").reshape(count, channels)
        return AudioBatch(pts_ns / 1e9, rate, channels, samples)

    def __iter__(self) -> Iterator[AudioBatch]:
        while True:
            batch = self.read()
            if batch is None:
                return
            yield batch

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass
