#!/usr/bin/env python
"""MoQ (Media over QUIC) round trip: publish an MP4 over MoQ into a
smelter-tpu MoQ server input, re-compose, record to MP4.

Two pipelines in one process, connected by a real QUIC v1 connection
(the from-scratch stack in smelter_tpu/io/quic):

  tx: MP4 file → h264/aac encode → MoqClientOutput == QUIC/MoQT ==>
  rx: MoQ server input → decode → Tiles compose → MP4

Usage: python examples/moq_relay.py in.mp4 out.mp4 [container]
       container: cmaf (default) | legacy | loc
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SMELTER_DEVICE", "cpu") == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

from smelter_tpu.audio.mixer import AudioMixerConfig, AudioMixerInputConfig
from smelter_tpu.core.types import Framerate, Resolution, RGBAColor
from smelter_tpu.io.moq.input import MoqServerInput, MoqServerInputOptions
from smelter_tpu.io.moq.output import MoqClientOutput
from smelter_tpu.io.moq.server import MoqServer, MoqServerState
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
)
from smelter_tpu.pipeline.output import AudioEncoderOptions, VideoEncoderOptions
from smelter_tpu.scene import components as comp


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    src, dst = sys.argv[1], sys.argv[2]
    container = sys.argv[3] if len(sys.argv) > 3 else "cmaf"
    opts = PipelineOptions(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    )

    rx = Pipeline(opts)
    state = MoqServerState()
    moq_in = MoqServerInput(MoqServerInputOptions(auth_token="demo"))
    rx.register_input("moq", moq_in, RegisterInputOptions(required=True, offset=0.0))
    state.register("moq", moq_in)
    server = MoqServer(0, state)
    rx.register_output(
        "rec", Mp4OutputSink(dst),
        video=OutputVideoOptions(
            resolution=Resolution(1280, 720),
            encoder=VideoEncoderOptions(codec="h264", preset="veryfast"),
            initial_root=comp.View(
                background_color=RGBAColor(16, 16, 24, 255),
                children=[comp.Rescaler(child=comp.InputStream(input_id="moq"))],
            ),
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(
                inputs=[AudioMixerInputConfig("moq")]
            ),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    rx.start()

    tx = Pipeline(opts)
    tx.register_input("file", Mp4Input(Mp4InputOptions(path=src)),
                      RegisterInputOptions(required=True, offset=0.0))
    sink = MoqClientOutput(
        f"moql://127.0.0.1:{server.port}/moq?token=demo",
        "demo-broadcast", container=container,
    )
    tx.register_output(
        "pub", sink,
        video=OutputVideoOptions(
            resolution=Resolution(1280, 720),
            encoder=VideoEncoderOptions(codec="h264", preset="veryfast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="file")),
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(
                inputs=[AudioMixerInputConfig("file")]
            ),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    tx.start()

    t0 = time.time()
    tx.wait_for_outputs_done(timeout=3600)
    rx.wait_for_outputs_done(timeout=3600)
    tx.close()
    rx.close()
    server.close()
    print(f"done in {time.time() - t0:.1f}s → {dst}")


if __name__ == "__main__":
    main()
