#!/usr/bin/env python
"""The side-channel ML pattern (reference `sdks/python/examples/yolo_whisper.py`):

Consume decoded frames from a running server's side channel, run inference
(any model — here a trivial brightness detector stands in), and push scene
updates back over the HTTP API (e.g. draw a label when the scene is dark).

1. start the server:  SMELTER_SIDE_CHANNEL_SOCKET_DIR=/tmp/sc python -m smelter_tpu.server
2. register an input with {"side_channel": {"video": true}} and an output
3. run:  python examples/side_channel_ml.py /tmp/sc <input_id> <output_id>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smelter_tpu.sdk import (
    SmelterClient,
    VideoSideChannelReader,
    discover_side_channels,
)


def main() -> None:
    socket_dir, input_id, output_id = sys.argv[1:4]
    channels = discover_side_channels(socket_dir)
    reader = VideoSideChannelReader(channels[input_id]["video"])
    client = SmelterClient()

    dark = None
    for frame in reader:
        brightness = float(frame.rgba[..., :3].mean())
        now_dark = brightness < 40.0
        if now_dark != dark:  # only update the scene on state changes
            dark = now_dark
            children = [
                {"type": "rescaler",
                 "child": {"type": "input_stream", "input_id": input_id}},
            ]
            if dark:
                children.append({
                    "type": "text", "text": "LOW LIGHT", "font_size": 48.0,
                    "color": "#FF4040FF",
                })
            client.update_output(output_id, video={
                "root": {"type": "view", "children": children,
                         "background_color": "#000000FF"}
            })
            print(f"pts={frame.pts_s:.2f}s brightness={brightness:.0f} dark={dark}")


if __name__ == "__main__":
    main()
