"""Asyncio side-channel consumers (reference `sdks/python/lib/smelter/aio.py`)."""

from __future__ import annotations

import asyncio
import struct
from typing import AsyncIterator, Optional

import numpy as np

from smelter_tpu.sdk.side_channel import AudioBatch, VideoFrame


async def _read_exact(reader: asyncio.StreamReader, n: int) -> Optional[bytes]:
    try:
        return await reader.readexactly(n)
    except (asyncio.IncompleteReadError, ConnectionResetError):
        return None


class AsyncVideoSideChannelReader:
    def __init__(self, socket_path: str) -> None:
        self._path = socket_path
        self._reader: Optional[asyncio.StreamReader] = None
        self._writer = None

    async def connect(self) -> "AsyncVideoSideChannelReader":
        self._reader, self._writer = await asyncio.open_unix_connection(self._path)
        return self

    async def read(self) -> Optional[VideoFrame]:
        assert self._reader is not None, "call connect() first"
        header = await _read_exact(self._reader, 16)
        if header is None:
            return None
        width, height, pts_ns = struct.unpack("!IIQ", header)
        body = await _read_exact(self._reader, width * height * 4)
        if body is None:
            return None
        rgba = np.frombuffer(body, dtype=np.uint8).reshape(height, width, 4)
        return VideoFrame(width, height, pts_ns / 1e9, rgba)

    async def __aiter__(self) -> AsyncIterator[VideoFrame]:
        while True:
            frame = await self.read()
            if frame is None:
                return
            yield frame

    async def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


class AsyncAudioSideChannelReader:
    def __init__(self, socket_path: str) -> None:
        self._path = socket_path
        self._reader: Optional[asyncio.StreamReader] = None
        self._writer = None

    async def connect(self) -> "AsyncAudioSideChannelReader":
        self._reader, self._writer = await asyncio.open_unix_connection(self._path)
        return self

    async def read(self) -> Optional[AudioBatch]:
        assert self._reader is not None, "call connect() first"
        header = await _read_exact(self._reader, 17)
        if header is None:
            return None
        pts_ns, rate, channels, count = struct.unpack("!QIBI", header)
        body = await _read_exact(self._reader, count * channels * 8)
        if body is None:
            return None
        samples = np.frombuffer(body, dtype=">f8").reshape(count, channels)
        return AudioBatch(pts_ns / 1e9, rate, channels, samples)

    async def __aiter__(self) -> AsyncIterator[AudioBatch]:
        while True:
            batch = await self.read()
            if batch is None:
                return
            yield batch

    async def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
