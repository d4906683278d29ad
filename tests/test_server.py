"""HTTP API server tests: drive the wire-compatible JSON API end-to-end.

Mirrors how reference clients use the server (`src/routes.rs`): register MP4
inputs + an MP4 output with an initial scene over HTTP, start, wait for the
OUTPUT_DONE event on /ws, then check the produced file.
"""

import asyncio
import json
import threading
import time

import numpy as np
import pytest
import httpx

from smelter_tpu.config import Config, LoggerConfig
from smelter_tpu.core.types import Framerate
from smelter_tpu.server.app import ApiState, build_app

from tests.test_pipeline import _decode_output, _make_source_mp4


class ServerThread:
    """Runs the aiohttp app in a dedicated thread with its own event loop."""

    def __init__(self, config: Config) -> None:
        self.state = ApiState(config)
        self.port = None
        self._loop = None
        self._started = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        assert self._started.wait(timeout=30)

    def _run(self) -> None:
        from aiohttp import web

        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)

        async def start():
            app = build_app(self.state)
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            self.port = runner.addresses[0][1]
            self._started.set()

        self._loop.run_until_complete(start())
        self._loop.run_forever()

    def stop(self) -> None:
        if self._loop:
            self._loop.call_soon_threadsafe(self._loop.stop)
        self._thread.join(timeout=5)

    @property
    def base(self) -> str:
        return f"http://127.0.0.1:{self.port}"


@pytest.fixture()
def server():
    cfg = Config(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
        logger=LoggerConfig(level="warning"),
    )
    s = ServerThread(cfg)
    yield s
    try:
        s.state.pipeline.close()
    finally:
        s.stop()


def _scene_json():
    return {
        "root": {
            "type": "view",
            "background_color": "#000000FF",
            "direction": "row",
            "children": [
                {"type": "rescaler", "child": {"type": "input_stream", "input_id": "in_a"}},
                {"type": "rescaler", "child": {"type": "input_stream", "input_id": "in_b"}},
            ],
        }
    }


def test_server_mp4_end_to_end(server, tmp_path):
    src_a = str(tmp_path / "a.mp4")
    src_b = str(tmp_path / "b.mp4")
    out_path = str(tmp_path / "out.mp4")
    _make_source_mp4(src_a, "red", 440.0)
    _make_source_mp4(src_b, "blue", 880.0)

    with httpx.Client(base_url=server.base, timeout=120) as c:
        r = c.post(
            "/api/input/in_a/register",
            json={"type": "mp4", "path": src_a, "required": True, "offset_ms": 0},
        )
        assert r.status_code == 200, r.text
        body = r.json()
        assert body.get("video_duration_ms") == 2000

        r = c.post(
            "/api/input/in_b/register",
            json={"type": "mp4", "path": src_b, "required": True, "offset_ms": 0},
        )
        assert r.status_code == 200, r.text

        r = c.post(
            "/api/output/out/register",
            json={
                "type": "mp4",
                "path": out_path,
                "video": {
                    "resolution": {"width": 640, "height": 240},
                    "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                    "initial": _scene_json(),
                    "send_eos_when": {"all_inputs": True},
                },
                "audio": {
                    "encoder": {"type": "aac"},
                    "initial": {
                        "inputs": [{"input_id": "in_a"}, {"input_id": "in_b", "volume": 0.5}]
                    },
                    "send_eos_when": {"all_inputs": True},
                },
            },
        )
        assert r.status_code == 200, r.text

        # status reflects registrations
        st = c.get("/status").json()
        assert {i["input_id"] for i in st["inputs"]} == {"in_a", "in_b"}
        assert [o["output_id"] for o in st["outputs"]] == ["out"]
        assert st["outputs"][0]["output_type"] == "mp4"

        r = c.post("/api/start", json={})
        assert r.status_code == 200, r.text

        # wait for OUTPUT_DONE via event history (ws covered separately)
        deadline = time.time() + 120
        while time.time() < deadline:
            kinds = {
                (e.kind, e.entity_id)
                for e in server.state.pipeline.events.history()
            }
            if ("OUTPUT_DONE", "out") in kinds:
                break
            time.sleep(0.2)
        else:
            pytest.fail("OUTPUT_DONE not observed")

        stats = c.get("/stats").json()
        assert stats["video_frames_rendered"] >= 55
        assert stats["compose_latency"]["p95_ms"] is not None

    frames, audio, infos = _decode_output(out_path)
    assert abs(len(frames) - 60) <= 1
    assert infos["video"].width == 640


def test_server_validation_errors(server, tmp_path):
    with httpx.Client(base_url=server.base, timeout=30) as c:
        # unknown field rejected (deny_unknown_fields)
        r = c.post(
            "/api/input/x/register",
            json={"type": "mp4", "path": "/nonexistent.mp4", "bogus": 1},
        )
        assert r.status_code == 400
        assert r.json()["error_code"] == "MALFORMED_REQUEST"

        # both url and path → invalid
        r = c.post(
            "/api/input/x/register",
            json={"type": "mp4", "path": "/a.mp4", "url": "http://x/a.mp4"},
        )
        assert r.status_code == 400

        # moq_server is implemented; a register without the required
        # auth_token is a schema violation → 400 (deny-unknown/missing
        # fields, reference smelter-api contract)
        r = c.post(
            "/api/input/x/register",
            json={"type": "moq_server"},
        )
        assert r.status_code == 400

        # unregister unknown output → 404
        r = c.post("/api/output/nope/unregister", json={})
        assert r.status_code == 404
        assert r.json()["error_code"] == "OUTPUT_STREAM_NOT_FOUND"

        # bad color string
        r = c.post(
            "/api/output/o/register",
            json={
                "type": "mp4",
                "path": str(tmp_path / "o.mp4"),
                "video": {
                    "resolution": {"width": 64, "height": 64},
                    "encoder": {"type": "ffmpeg_h264"},
                    "initial": {
                        "root": {"type": "view", "background_color": "#zzz"}
                    },
                },
            },
        )
        assert r.status_code == 400


def test_server_ws_events(server, tmp_path):
    """Subscribe to /ws and observe pipeline events."""
    import websockets.sync.client as ws_client

    src = str(tmp_path / "a.mp4")
    _make_source_mp4(src, "red", 440.0)
    out_path = str(tmp_path / "out.mp4")

    with httpx.Client(base_url=server.base, timeout=60) as c:
        ws = ws_client.connect(f"ws://127.0.0.1:{server.port}/ws")
        try:
            r = c.post(
                "/api/input/a/register",
                json={"type": "mp4", "path": src, "required": True, "offset_ms": 0},
            )
            assert r.status_code == 200
            r = c.post(
                "/api/output/out/register",
                json={
                    "type": "mp4",
                    "path": out_path,
                    "video": {
                        "resolution": {"width": 320, "height": 240},
                        "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                        "initial": {
                            "root": {
                                "type": "rescaler",
                                "child": {"type": "input_stream", "input_id": "a"},
                            }
                        },
                        "send_eos_when": {"all_inputs": True},
                    },
                },
            )
            assert r.status_code == 200, r.text
            assert c.post("/api/start", json={}).status_code == 200

            got = set()
            deadline = time.time() + 90
            while time.time() < deadline:
                try:
                    msg = json.loads(ws.recv(timeout=5))
                except TimeoutError:
                    continue
                got.add(msg["type"])
                if "OUTPUT_DONE" in got:
                    break
            assert "VIDEO_INPUT_EOS" in got or "VIDEO_INPUT_PLAYING" in got, got
            assert "OUTPUT_DONE" in got, got
        finally:
            ws.close()


def test_server_hls_output(server, tmp_path):
    """MP4 in → HLS out through the HTTP API (reference hls_output.rs)."""
    src = str(tmp_path / "a.mp4")
    _make_source_mp4(src, "blue", 440.0)
    playlist = str(tmp_path / "out.m3u8")

    with httpx.Client(base_url=server.base, timeout=120) as c:
        r = c.post(
            "/api/input/a/register",
            json={"type": "mp4", "path": src, "required": True, "offset_ms": 0},
        )
        assert r.status_code == 200, r.text
        r = c.post(
            "/api/output/hls/register",
            json={
                "type": "hls",
                "path": playlist,
                "video": {
                    "resolution": {"width": 320, "height": 240},
                    "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                    "initial": {
                        "root": {
                            "type": "rescaler",
                            "child": {"type": "input_stream", "input_id": "a"},
                        }
                    },
                    "send_eos_when": {"all_inputs": True},
                },
                "audio": {
                    "encoder": {"type": "aac"},
                    "initial": {"inputs": [{"input_id": "a"}]},
                    "send_eos_when": {"all_inputs": True},
                },
            },
        )
        assert r.status_code == 200, r.text
        assert c.post("/api/start", json={}).status_code == 200
        deadline = time.time() + 120
        while time.time() < deadline:
            kinds = {(e.kind, e.entity_id) for e in server.state.pipeline.events.history()}
            if ("OUTPUT_DONE", "hls") in kinds:
                break
            time.sleep(0.2)
        else:
            pytest.fail("OUTPUT_DONE not observed")

    with open(playlist) as f:
        content = f.read()
    assert "#EXTM3U" in content and "#EXT-X-ENDLIST" in content
    import glob

    segs = glob.glob(str(tmp_path / "*.ts"))
    assert segs, "no HLS segments written"


def test_server_reset_and_decklink(server, tmp_path):
    with httpx.Client(base_url=server.base, timeout=30) as c:
        src = str(tmp_path / "a.mp4")
        _make_source_mp4(src, "red", 440.0)
        assert c.post("/api/input/a/register",
                      json={"type": "mp4", "path": src}).status_code == 200
        st = c.get("/status").json()
        assert [i["input_id"] for i in st["inputs"]] == ["a"]
        # reset swaps in a fresh pipeline
        assert c.post("/api/reset", json={}).status_code == 200
        st = c.get("/status").json()
        assert st["inputs"] == [] and st["outputs"] == []
        # registering again after reset works
        assert c.post("/api/input/a/register",
                      json={"type": "mp4", "path": src}).status_code == 200
        # decklink without the vendor SDK fails cleanly (400-class)
        r = c.post("/api/input/sdi/register", json={"type": "decklink"})
        assert r.status_code in (400, 500)
        assert "DeckLink" in r.json()["message"]


def test_server_scheduled_unregister(server, tmp_path):
    """`schedule_time_ms` on unregister routes defers the action to a queue
    PTS (unregister_request.rs:18-37): an input-less output scheduled to
    unregister at 1 s produces ~30 frames at 30 fps and emits OUTPUT_DONE."""
    out_path = str(tmp_path / "out.mp4")
    with httpx.Client(base_url=server.base, timeout=60) as c:
        r = c.post(
            "/api/output/out/register",
            json={
                "type": "mp4",
                "path": out_path,
                "video": {
                    "resolution": {"width": 320, "height": 240},
                    "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                    "initial": {
                        "root": {"type": "view",
                                 "background_color": "#336699FF"}
                    },
                },
            },
        )
        assert r.status_code == 200, r.text

        # unknown body fields must still be rejected (deny-unknown parity)
        r = c.post("/api/output/out/unregister", json={"schedule_ms": 1})
        assert r.status_code == 400

        r = c.post("/api/output/out/unregister",
                   json={"schedule_time_ms": 1000})
        assert r.status_code == 200, r.text
        assert c.post("/api/start", json={}).status_code == 200

        deadline = time.time() + 60
        while time.time() < deadline:
            kinds = {
                (e.kind, e.entity_id)
                for e in server.state.pipeline.events.history()
            }
            if ("OUTPUT_DONE", "out") in kinds:
                break
            time.sleep(0.2)
        else:
            pytest.fail("OUTPUT_DONE not observed for scheduled unregister")

        # the output is gone from /status after the scheduled event fired
        st = c.get("/status").json()
        assert st["outputs"] == []

    from smelter_tpu.io.codec import Demuxer, VideoDecoder

    d = Demuxer(out_path)
    info = {s.media_type: s for s in d.streams()}["video"]
    assert info.width == 320
    vdec = VideoDecoder(info.codec, info.extradata)
    n = 0
    while True:
        pkt = d.read()
        if pkt is None:
            break
        vdec.send(pkt.data, pkt.pts_s or 0.0)
        while True:
            f = vdec.receive()
            if f is None or f == "eof":
                break
            n += 1
    vdec.send_eof()
    while True:
        f = vdec.receive()
        if f is None or f == "eof":
            break
        n += 1
    assert abs(n - 30) <= 1


def test_server_moq_roundtrip(server, tmp_path):
    """MoQ through the HTTP API (reference moq/server.rs + client_output.rs):
    the fixture server registers a moq_server input and records it to MP4;
    a second server instance publishes an MP4 source into it over QUIC."""
    src = str(tmp_path / "src.mp4")
    _make_source_mp4(src, "blue", 440.0)
    out_path = str(tmp_path / "rec.mp4")

    tx = ServerThread(Config(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
        logger=LoggerConfig(level="warning"),
        api_port=0,
        # the loopback MoQ server uses a self-signed cert; real chain
        # verification (now actually performed) must be disabled, exactly
        # like reference deployments set SMELTER_MOQ_DISABLE_TLS_VERIFICATION
        moq_disable_tls_verification=True,
    ))
    try:
        with httpx.Client(base_url=server.base, timeout=180) as c:
            r = c.post("/api/input/moq-in/register",
                       json={"type": "moq_server", "auth_token": "tok",
                             "required": True})
            assert r.status_code == 200, r.text
            moq_port = r.json()["port"]
            r = c.post(
                "/api/output/rec/register",
                json={
                    "type": "mp4",
                    "path": out_path,
                    "video": {
                        "resolution": {"width": 320, "height": 240},
                        "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                        "initial": {"root": {
                            "type": "rescaler",
                            "child": {"type": "input_stream", "input_id": "moq-in"},
                        }},
                        "send_eos_when": {"any_of": ["moq-in"]},
                    },
                    "audio": {
                        "encoder": {"type": "aac"},
                        "initial": {"inputs": [{"input_id": "moq-in"}]},
                        "send_eos_when": {"any_of": ["moq-in"]},
                    },
                },
            )
            assert r.status_code == 200, r.text
            assert c.post("/api/start", json={}).status_code == 200

        with httpx.Client(base_url=tx.base, timeout=180) as c:
            assert c.post(
                "/api/input/src/register",
                json={"type": "mp4", "path": src, "required": True,
                      "offset_ms": 0},
            ).status_code == 200
            r = c.post(
                "/api/output/pub/register",
                json={
                    "type": "moq_client",
                    "endpoint_url":
                        f"moql://127.0.0.1:{moq_port}/moq-in?token=tok",
                    "broadcast_path": "bcast",
                    "container": "cmaf",
                    "video": {
                        "resolution": {"width": 320, "height": 240},
                        "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                        "initial": {"root": {
                            "type": "rescaler",
                            "child": {"type": "input_stream", "input_id": "src"},
                        }},
                        "send_eos_when": {"any_of": ["src"]},
                    },
                    "audio": {
                        "encoder": {"type": "aac"},
                        "initial": {"inputs": [{"input_id": "src"}]},
                        "send_eos_when": {"any_of": ["src"]},
                    },
                },
            )
            assert r.status_code == 200, r.text
            assert c.post("/api/start", json={}).status_code == 200

        deadline = time.time() + 240
        while time.time() < deadline:
            kinds = {(e.kind, e.entity_id)
                     for e in server.state.pipeline.events.history()}
            if ("OUTPUT_DONE", "rec") in kinds:
                break
            time.sleep(0.3)
        else:
            pytest.fail("OUTPUT_DONE(rec) not observed")

        # per-protocol stats: the moq_server input reports track bitrates
        # (reference MoqServerInputTrackStatsEvent)
        with httpx.Client(base_url=server.base, timeout=30) as c:
            stats = c.get("/stats").json()
        rep = stats["inputs"]["moq-in"]["stats"]
        assert rep["type"] == "moq_server"
        assert rep["video"]["bitrate_1_minute"] > 0
        assert rep["audio"]["bitrate_1_minute"] > 0
    finally:
        try:
            tx.state.pipeline.close()
        finally:
            tx.stop()

    frames, audio, _infos = _decode_output(out_path)
    assert len(frames) >= 40, len(frames)
    # blue content → high U plane; without offset_ms (the reference
    # MoqServerInput has none) the stream aligns on arrival, so judge the
    # steady state AT EOS: on a loaded 1-vCPU box the handshake can land
    # deep into the recording, but the final frames must always be blue
    tail = [float(f[1].mean()) for f in frames[-10:]]
    assert float(np.mean(tail)) > 180, float(np.mean(tail))
    assert audio.shape[0] > 40000


def test_ws_replay_buffer(server, tmp_path):
    """/ws?replay=1 sends the event history before live events, so a late
    subscriber catches up on INPUT_EOS/OUTPUT_DONE it missed."""
    import websockets.sync.client as ws_client

    src = str(tmp_path / "a.mp4")
    _make_source_mp4(src, "red", 440.0)
    out_path = str(tmp_path / "o.mp4")
    with httpx.Client(base_url=server.base, timeout=120) as c:
        assert c.post("/api/input/a/register",
                      json={"type": "mp4", "path": src, "required": True,
                            "offset_ms": 0}).status_code == 200
        assert c.post(
            "/api/output/o/register",
            json={"type": "mp4", "path": out_path,
                  "video": {"resolution": {"width": 160, "height": 120},
                            "encoder": {"type": "ffmpeg_h264",
                                        "preset": "ultrafast"},
                            "initial": {"root": {"type": "rescaler",
                                                 "child": {"type": "input_stream",
                                                           "input_id": "a"}}},
                            "send_eos_when": {"all_inputs": True}}},
        ).status_code == 200
        assert c.post("/api/start", json={}).status_code == 200
        deadline = time.time() + 120
        while time.time() < deadline:
            kinds = {(e.kind, e.entity_id)
                     for e in server.state.pipeline.events.history()}
            if ("OUTPUT_DONE", "o") in kinds:
                break
            time.sleep(0.2)
        else:
            pytest.fail("OUTPUT_DONE not observed")

    # connect AFTER everything happened: replay must deliver the history
    ws = ws_client.connect(f"ws://127.0.0.1:{server.port}/ws?replay=1")
    try:
        got = set()
        deadline = time.time() + 10
        while time.time() < deadline:
            try:
                msg = json.loads(ws.recv(timeout=2))
            except TimeoutError:
                break
            if msg.get("replayed"):
                got.add(msg["type"])
            if "OUTPUT_DONE" in got:
                break
        assert "OUTPUT_DONE" in got, got
    finally:
        ws.close()


def test_status_includes_configuration_block():
    """Reference routes/status.rs InstanceStatus carries a `configuration`
    object (api_port, output_framerate, AOT flags, whip/whep, stun...)."""
    import httpx

    from smelter_tpu.config import Config, LoggerConfig
    from smelter_tpu.core.types import Framerate

    cfg = Config(output_framerate=Framerate(30),
                 logger=LoggerConfig(level="warning"))
    s = ServerThread(cfg)
    try:
        with httpx.Client(base_url=s.base, timeout=30) as c:
            body = c.get("/status").json()
            assert "instance_id" in body
            conf = body["configuration"]
            assert conf["output_framerate"] == 30.0
            assert conf["mixing_sample_rate"] == 48000
            assert conf["rendering_mode"] == "gpu_optimized"
            for key in ("api_port", "ahead_of_time_processing",
                        "never_drop_output_frames", "whip_whep_enable",
                        "webrtc_stun_servers", "download_root"):
                assert key in conf, key
    finally:
        s.stop()


def test_preview_page_served(server):
    """GET /preview/{id} serves the self-contained WHEP preview client
    (docs/BROWSER_RENDERING.md — the browser-side replacement for the
    reference's WASM rendering layer) with the output id substituted and
    HTML-escaped."""
    r = httpx.get(f"{server.base}/preview/out_1")
    assert r.status_code == 200
    assert r.headers["content-type"].startswith("text/html")
    assert "/whep/" in r.text and "RTCPeerConnection" in r.text
    assert "output <b>out_1</b>" in r.text
    assert "__OUTPUT_ID__" not in r.text
    # injection attempt is escaped, never interpolated as markup
    r = httpx.get(f"{server.base}/preview/<script>alert(1)<%2fscript>")
    assert r.status_code == 200
    assert "<script>alert(1)" not in r.text


def test_server_font_register_and_render(server, tmp_path):
    """/api/font/register with a file path makes the family usable in Text
    components (routes.rs font register + reference font registration)."""
    r = None
    with httpx.Client(base_url=server.base, timeout=120) as c:
        r = c.post("/api/font/register", json={
            "path": "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
        })
        assert r.status_code == 200, r.text
        out_path = str(tmp_path / "font.mp4")
        r = c.post("/api/output/out/register", json={
            "type": "mp4", "path": out_path,
            "video": {
                "resolution": {"width": 192, "height": 64},
                "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                "initial": {"root": {
                    "type": "view", "background_color": "#000000FF",
                    "children": [{"type": "text", "text": "Serif",
                                   "font_size": 36.0,
                                   "font_family": "DejaVu Serif",
                                   "weight": "bold",
                                   "color": "#FFFFFFFF"}],
                }},
            },
        })
        assert r.status_code == 200, r.text
        r = c.post("/api/output/out/unregister",
                   json={"schedule_time_ms": 500})
        assert r.status_code == 200
        assert c.post("/api/start", json={}).status_code == 200
        deadline = time.time() + 60
        while time.time() < deadline:
            kinds = {(e.kind, e.entity_id)
                     for e in server.state.pipeline.events.history()}
            if ("OUTPUT_DONE", "out") in kinds:
                break
            time.sleep(0.2)
        else:
            pytest.fail("font render did not finish")

    from smelter_tpu.io.codec import Demuxer, VideoDecoder

    d = Demuxer(out_path)
    info = {s.media_type: s for s in d.streams()}["video"]
    vdec = VideoDecoder(info.codec, info.extradata)
    bright = 0
    while True:
        pkt = d.read()
        if pkt is None:
            break
        vdec.send(pkt.data, pkt.pts_s or 0.0)
        while True:
            f = vdec.receive()
            if f is None or f == "eof":
                break
            bright = max(bright, int((np.asarray(f[0]) > 180).sum()))
    assert bright > 50, "text glyphs missing from output"


def test_server_reset_during_active_render(server, tmp_path):
    """/api/reset while the pipeline is actively rendering must close the
    old pipeline cleanly (no hang on channels/threads) and the fresh
    pipeline must run a full job afterwards."""
    src = str(tmp_path / "a.mp4")
    _make_source_mp4(src, "red", 440.0)
    with httpx.Client(base_url=server.base, timeout=60) as c:
        assert c.post("/api/input/a/register",
                      json={"type": "mp4", "path": src, "loop": True}
                      ).status_code == 200
        assert c.post("/api/output/out/register", json={
            "type": "mp4", "path": str(tmp_path / "out1.mp4"),
            "video": {"resolution": {"width": 160, "height": 120},
                      "encoder": {"type": "ffmpeg_h264",
                                   "preset": "ultrafast"},
                      "initial": {"root": {
                          "type": "rescaler",
                          "child": {"type": "input_stream",
                                     "input_id": "a"}}}},
        }).status_code == 200
        assert c.post("/api/start", json={}).status_code == 200
        # let it render a bit, then reset mid-run (bounded: a hang here
        # means close() deadlocked against the render/queue threads)
        deadline = time.time() + 30
        while time.time() < deadline:
            if server.state.pipeline.stats.video_frames_rendered > 5:
                break
            time.sleep(0.1)
        t0 = time.time()
        assert c.post("/api/reset", json={}).status_code == 200
        assert time.time() - t0 < 15.0, "reset hung against live threads"
        st = c.get("/status").json()
        assert st["inputs"] == [] and st["outputs"] == []

        # a full job on the fresh pipeline
        out2 = str(tmp_path / "out2.mp4")
        assert c.post("/api/input/a/register",
                      json={"type": "mp4", "path": src, "required": True,
                            "offset_ms": 0}).status_code == 200
        assert c.post("/api/output/out/register", json={
            "type": "mp4", "path": out2,
            "video": {"resolution": {"width": 160, "height": 120},
                      "encoder": {"type": "ffmpeg_h264",
                                   "preset": "ultrafast"},
                      "initial": {"root": {
                          "type": "rescaler",
                          "child": {"type": "input_stream",
                                     "input_id": "a"}}},
                      "send_eos_when": {"all_inputs": True}},
        }).status_code == 200
        assert c.post("/api/start", json={}).status_code == 200
        deadline = time.time() + 60
        while time.time() < deadline:
            kinds = {(e.kind, e.entity_id)
                     for e in server.state.pipeline.events.history()}
            if ("OUTPUT_DONE", "out") in kinds:
                break
            time.sleep(0.2)
        else:
            pytest.fail("post-reset run did not finish")

    from smelter_tpu.io.codec import Demuxer

    d = Demuxer(out2)
    n = 0
    while True:
        if d.read() is None:
            break
        n += 1
    assert abs(n - 60) <= 2, n  # 2 s source at 30 fps, AOT never-drop
