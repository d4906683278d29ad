#!/usr/bin/env python
"""The BASELINE north-star live config: 16×1080p inputs → one 4K60 output.

TPU compose handles this at >600 fps; the end-to-end rate is bounded by the
host's decode/encode cores (16×1080p decode + 4K encode wants a real
multi-core TPU-VM host, not a 1-vCPU sandbox).

Usage: python examples/flagship_live.py source_1080p.mp4 out.mp4 [seconds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Compose on CPU by default: over a remote TPU tunnel the per-frame
# device->host fetches dominate; on a real TPU-VM set SMELTER_DEVICE=tpu.
if os.environ.get("SMELTER_DEVICE", "cpu") == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

from smelter_tpu.core.types import Framerate, Resolution, RGBAColor
from smelter_tpu.pipeline import (
    EndCondition,
    Mp4Input,
    Mp4InputOptions,
    Mp4OutputSink,
    OutputVideoOptions,
    Pipeline,
    PipelineOptions,
    RegisterInputOptions,
    VideoEncoderOptions,
)
from smelter_tpu.scene import components as comp


def main() -> None:
    src = sys.argv[1]
    out_path = sys.argv[2]
    duration = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

    pipeline = Pipeline(PipelineOptions(output_framerate=Framerate(60)))
    ids = [f"cam_{i}" for i in range(16)]
    for iid in ids:
        pipeline.register_input(
            iid, Mp4Input(Mp4InputOptions(path=src, loop=True)),
            RegisterInputOptions(),
        )
    pipeline.register_output(
        "out", Mp4OutputSink(out_path),
        video=OutputVideoOptions(
            resolution=Resolution(3840, 2160),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Tiles(
                children=[comp.InputStream(input_id=i) for i in ids],
                background_color=RGBAColor(8, 8, 8),
            ),
            end_condition=EndCondition(),
        ),
    )
    pipeline.start()
    time.sleep(duration)
    stats = pipeline.stats
    print(f"rendered={stats.video_frames_rendered} "
          f"dropped={stats.video_frames_dropped} "
          f"compose latency={stats.render_latency.percentiles()}")
    pipeline.close()


if __name__ == "__main__":
    main()
