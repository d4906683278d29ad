"""Pipeline statistics for the /stats endpoint.

Scaled-down analogue of the reference stats monitor
(`smelter-core/src/stats/mod.rs:28-58`): the reference runs a dedicated
thread aggregating per-protocol input/output event streams; here the hot
loops bump atomic counters on a shared `PipelineStats` and `/stats` reads a
snapshot. Latency percentiles come from a fixed-size ring of recent frame
compose times.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Dict, Optional


class RollingLatency:
    """Keeps the last N samples; reports p50/p95/p99 in milliseconds."""

    def __init__(self, size: int = 600) -> None:
        self._samples: deque = deque(maxlen=size)
        self._lock = threading.Lock()

    def record(self, seconds: float) -> None:
        with self._lock:
            self._samples.append(seconds)

    def percentiles(self) -> Dict[str, Optional[float]]:
        with self._lock:
            data = sorted(self._samples)
        if not data:
            return {"p50_ms": None, "p95_ms": None, "p99_ms": None}

        def pct(p: float) -> float:
            idx = min(int(len(data) * p), len(data) - 1)
            return round(data[idx] * 1000.0, 3)

        return {"p50_ms": pct(0.50), "p95_ms": pct(0.95), "p99_ms": pct(0.99)}


@dataclass
class PipelineStats:
    started_at: Optional[float] = None
    video_frames_rendered: int = 0
    video_frames_dropped: int = 0
    audio_chunks_mixed: int = 0
    render_latency: RollingLatency = field(default_factory=RollingLatency)
    input_frames: Dict[str, int] = field(default_factory=dict)
    output_frames: Dict[str, int] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def on_render(self, seconds: float, n_inputs: int) -> None:
        with self._lock:
            self.video_frames_rendered += 1
        self.render_latency.record(seconds)

    def on_output_frame(self, output_id: str) -> None:
        with self._lock:
            self.output_frames[output_id] = self.output_frames.get(output_id, 0) + 1

    def on_input_frame(self, input_id: str) -> None:
        with self._lock:
            self.input_frames[input_id] = self.input_frames.get(input_id, 0) + 1

    def on_audio_chunk(self) -> None:
        with self._lock:
            self.audio_chunks_mixed += 1


def collect_stats(pipeline) -> dict:
    """Builds the /stats JSON report."""
    stats: PipelineStats = pipeline.stats
    with stats._lock:
        report = {
            "uptime_s": round(time.time() - stats.started_at, 3)
            if stats.started_at
            else None,
            "video_frames_rendered": stats.video_frames_rendered,
            "video_frames_dropped": stats.video_frames_dropped,
            "audio_chunks_mixed": stats.audio_chunks_mixed,
            "compose_latency": stats.render_latency.percentiles(),
            "inputs": {
                iid: {"frames_delivered": n} for iid, n in stats.input_frames.items()
            },
            "outputs": {
                oid: {
                    "frames_rendered": n,
                    "encoded_packets": getattr(
                        pipeline._outputs.get(oid), "encoded_video_packets", 0
                    )
                    if oid in pipeline._outputs
                    else 0,
                }
                for oid, n in stats.output_frames.items()
            },
        }
    return report
