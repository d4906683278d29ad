"""Python SDK: HTTP client + side-channel consumers.

The TPU-stack equivalent of the reference Python SDK
(`sdks/python/lib/smelter/`): discover side-channel Unix sockets, stream
decoded RGBA frames / PCM into Python (sync + asyncio), and drive the HTTP
API — the YOLO/Whisper pattern is: consume frames from the side channel, run
inference, push scene updates back over HTTP.
"""

from smelter_tpu.sdk._discovery import discover_side_channels
from smelter_tpu.sdk.http import SmelterClient
from smelter_tpu.sdk.side_channel import (
    AudioBatch,
    AudioSideChannelReader,
    VideoFrame,
    VideoSideChannelReader,
)

__all__ = [
    "SmelterClient",
    "discover_side_channels",
    "VideoFrame",
    "AudioBatch",
    "VideoSideChannelReader",
    "AudioSideChannelReader",
]
