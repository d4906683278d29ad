#!/usr/bin/env python
"""Offline MP4 composition: N files → one tiled output with audio mix.

Usage: python examples/offline_compose.py out.mp4 in1.mp4 [in2.mp4 ...]
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

from smelter_tpu.audio.mixer import AudioMixerConfig, AudioMixerInputConfig
from smelter_tpu.core.types import Framerate, Resolution, RGBAColor
from smelter_tpu.pipeline import (
    EndCondition,
    Mp4Input,
    Mp4InputOptions,
    Mp4OutputSink,
    OutputAudioOptions,
    OutputVideoOptions,
    Pipeline,
    PipelineOptions,
    RegisterInputOptions,
    VideoEncoderOptions,
    AudioEncoderOptions,
)
from smelter_tpu.scene import components as comp


def main() -> None:
    out_path, *inputs = sys.argv[1:]
    pipeline = Pipeline(PipelineOptions(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,   # offline: process as fast as possible
        never_drop_output_frames=True,
    ))
    ids = []
    for i, path in enumerate(inputs):
        iid = f"in_{i}"
        ids.append(iid)
        pipeline.register_input(
            iid, Mp4Input(Mp4InputOptions(path=path)),
            RegisterInputOptions(required=True, offset=0.0),
        )
    scene = comp.Tiles(
        children=[comp.InputStream(input_id=i) for i in ids],
        background_color=RGBAColor(16, 16, 24),
        margin=4.0,
    )
    pipeline.register_output(
        "out", Mp4OutputSink(out_path),
        video=OutputVideoOptions(
            resolution=Resolution(1920, 1080),
            encoder=VideoEncoderOptions(codec="h264", preset="veryfast"),
            initial_root=scene,
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(
                inputs=[AudioMixerInputConfig(i) for i in ids]
            ),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    t0 = time.time()
    pipeline.start()
    pipeline.wait_for_outputs_done()
    pipeline.close()
    print(f"wrote {out_path} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
