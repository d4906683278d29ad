"""TS SDK wire-compatibility replay.

Node.js is not available in this image, so the TS SDK under ts/ cannot be
executed live; instead this replays the EXACT request sequence its
serializers emit against a real server:

- routes + bodies: `ts/smelter-core/src/api.ts` (ApiClient) — statically
  cross-checked against the server route table by test_ts_sdk_source.py
- component JSON: the sceneBuilder of each component
  (`ts/smelter/src/components/*.ts`) — snake_case keys, hex-string colors,
  undefined keys dropped by JSON.stringify; every emitted key statically
  verified against the deny-unknown-fields schema by test_ts_sdk_source.py
- output-specific input ids: `ts/smelter/src/types/refs/inputRef.ts`
  (`__output_specific_input:{n}:{outputId}` raw ids registered by
  components like <Mp4 />)
- update shape: `ts/smelter-core/src/live/output.ts` Output.scene()
  ({video: {root}, audio})
"""

import time

import numpy as np
import httpx
import pytest

from tests.test_pipeline import _decode_output, _make_source_mp4
from tests.test_server import server  # noqa: F401 (fixture)


def test_ts_sdk_request_replay(server, tmp_path):  # noqa: F811
    src = str(tmp_path / "clip.mp4")
    _make_source_mp4(src, "red", 440.0)
    out_path = str(tmp_path / "out.mp4")

    with httpx.Client(base_url=server.base, timeout=120) as c:
        # <Mp4 source=...> inside the scene registers an output-specific
        # input with the SDK's raw id format (inputRef.ts:22-28)
        raw_id = "__output_specific_input:0:output_1"
        r = c.post(
            f"/api/input/{raw_id}/register",
            json={"type": "mp4", "path": src, "required": True,
                  "offset_ms": 0},
        )
        assert r.status_code == 200, r.text

        # registerOutput: the SDK serializes the initial React tree via the
        # reconciler; this is the exact JSON for
        #   <View style={{backgroundColor: '#101010FF'}}>
        #     <Rescaler><InputStream inputId={ref}/></Rescaler>
        #     <Text style={{fontSize: 24, color: '#FFFFFFFF'}}>hi</Text>
        #   </View>
        scene = {
            "type": "view",
            "children": [
                {
                    "type": "rescaler",
                    "child": {"type": "input_stream", "input_id": raw_id},
                },
                {
                    "type": "text",
                    "text": "hi",
                    "font_size": 24,
                    "color": "#FFFFFFFF",
                },
            ],
            "background_color": "#101010FF",
        }
        r = c.post(
            "/api/output/output_1/register",
            json={
                "type": "mp4",
                "path": out_path,
                "video": {
                    "resolution": {"width": 320, "height": 240},
                    "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                    "initial": {"root": scene},
                    "send_eos_when": {"all_inputs": True},
                },
                "audio": {
                    "encoder": {"type": "aac"},
                    "initial": {"inputs": [{"input_id": raw_id}]},
                    "send_eos_when": {"all_inputs": True},
                },
            },
        )
        assert r.status_code == 200, r.text

        assert c.post("/api/start", json={}).status_code == 200

        # updateScene (live/output.ts scene()): {video: {root}, audio}
        scene2 = dict(scene)
        scene2["background_color"] = "#202080FF"
        r = c.post(
            "/api/output/output_1/update",
            json={
                "video": {"root": scene2},
                "audio": {"inputs": [{"input_id": raw_id, "volume": 0.5}]},
            },
        )
        assert r.status_code == 200, r.text

        deadline = time.time() + 180
        while time.time() < deadline:
            kinds = {(e.kind, e.entity_id)
                     for e in server.state.pipeline.events.history()}
            if ("OUTPUT_DONE", "output_1") in kinds:
                break
            time.sleep(0.2)
        else:
            pytest.fail("OUTPUT_DONE not observed")

        # unregister with the raw id, like Output.close() does
        assert c.post(f"/api/input/{raw_id}/unregister",
                      json={}).status_code == 200

    frames, audio, _ = _decode_output(out_path)
    assert len(frames) >= 40
    assert audio.shape[0] > 40000
    # red input content still present after the update
    assert float(np.mean([float(f[2].mean()) for f in frames])) > 120


def test_ts_sdk_offline_render_replay(server, tmp_path):  # noqa: F811
    """The OfflineSmelter.render flow (`ts/smelter-core/src/facade.ts`):
    register the offline output with the captured scene, schedule its
    unregister at durationMs, start, wait for OUTPUT_DONE — the output file
    must carry ~durationMs of frames (the scheduled unregister is what ends
    an input-less offline render)."""
    out_path = str(tmp_path / "offline.mp4")
    duration_ms = 1500.0
    with httpx.Client(base_url=server.base, timeout=120) as c:
        r = c.post(
            "/api/output/output_1/register",
            json={
                "type": "mp4",
                "path": out_path,
                "video": {
                    "resolution": {"width": 256, "height": 144},
                    "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                    "initial": {"root": {
                        "type": "view",
                        "background_color": "#AA3355FF",
                    }},
                },
            },
        )
        assert r.status_code == 200, r.text
        # facade.ts:242-245 — unregisterOutput(id, {schedule_time_ms})
        r = c.post("/api/output/output_1/unregister",
                   json={"schedule_time_ms": duration_ms})
        assert r.status_code == 200, r.text
        assert c.post("/api/start", json={}).status_code == 200

        deadline = time.time() + 60
        while time.time() < deadline:
            done = {
                (e.kind, e.entity_id)
                for e in server.state.pipeline.events.history()
            }
            if ("OUTPUT_DONE", "output_1") in done:
                break
            time.sleep(0.2)
        else:
            pytest.fail("offline render did not finish")

    from smelter_tpu.io.codec import Demuxer

    d = Demuxer(out_path)
    n = 0
    first_pts = None
    while True:
        pkt = d.read()
        if pkt is None:
            break
        if first_pts is None:
            first_pts = pkt.pts_s
        n += 1
    assert abs(n - 45) <= 1  # 1.5 s at 30 fps
    assert (first_pts or 0.0) < 0.05  # file starts at pts 0 (rebased)
