"""Web renderer sidecar (reference web_renderer.rs + chromium_context.rs):
the CDP client, screencast frame path, and the WebView component are
driven against a MOCK DevTools endpoint (no browser ships in this image;
with one present the same code attaches to the real thing). The
transparent fallback (web_renderer_fallback.rs) is covered too."""

import base64
import io
import json
import threading

import numpy as np
import pytest

from smelter_tpu.core.types import FrameSet, PixelFormat, Resolution, RGBAColor
from smelter_tpu.render.renderer import Renderer
from smelter_tpu.render.web import WebRendererSpec
from smelter_tpu.scene import components as comp


def _orange_png(w=64, h=48) -> str:
    from PIL import Image

    img = Image.new("RGBA", (w, h), (255, 128, 0, 255))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class MockCdpServer:
    """Implements just enough CDP for WebRendererInstance: target create/
    attach, page enable/navigate, screencast start -> frame events."""

    def __init__(self) -> None:
        import websockets.sync.server as ws_server

        self.navigated = []
        self.evaluations = []          # Runtime.evaluate expressions
        self.evaluated = threading.Event()
        self.acked = threading.Event()
        self._server = ws_server.serve(self._handle, "127.0.0.1", 0)
        self.port = self._server.socket.getsockname()[1]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()

    @property
    def url(self) -> str:
        return f"ws://127.0.0.1:{self.port}/devtools/browser/mock"

    def _handle(self, ws) -> None:
        for raw in ws:
            msg = json.loads(raw)
            method = msg["method"]
            if method == "Runtime.evaluate":
                self.evaluations.append(msg["params"]["expression"])
                self.evaluated.set()
            if "id" not in msg:
                continue  # notification (fire-and-forget)
            result = {}
            if method == "Target.createTarget":
                result = {"targetId": "t1"}
            elif method == "Target.attachToTarget":
                result = {"sessionId": "s1"}
            elif method == "Page.navigate":
                self.navigated.append(msg["params"]["url"])
                result = {"frameId": "f1"}
            elif method == "Page.startScreencast":
                ws.send(json.dumps(
                    {"id": msg["id"], "result": {},
                     "sessionId": msg.get("sessionId")}))
                # one screencast frame
                ws.send(json.dumps({
                    "method": "Page.screencastFrame",
                    "sessionId": "s1",
                    "params": {"data": _orange_png(),
                               "metadata": {}, "sessionId": 7},
                }))
                continue
            elif method == "Page.screencastFrameAck":
                self.acked.set()
            ws.send(json.dumps({"id": msg["id"], "result": result,
                                "sessionId": msg.get("sessionId")}))

    def close(self) -> None:
        self._server.shutdown()


def test_webview_renders_page_via_cdp(monkeypatch):
    mock = MockCdpServer()
    monkeypatch.setenv("SMELTER_WEB_RENDERER_CDP_URL", mock.url)
    try:
        r = Renderer()
        inst = r.web.register(WebRendererSpec(
            instance_id="page", url="https://example.com/", resolution=(64, 48)
        ))
        assert inst.active, "sidecar path did not attach to the CDP endpoint"
        assert mock.navigated == ["https://example.com/"]
        assert mock.acked.wait(10), "screencast frame never acknowledged"
        assert inst.wait_for_frame(10), "first screencast frame never landed"

        r.update_scene(
            "out",
            comp.View(background_color=RGBAColor(0, 0, 0, 255),
                      children=[comp.WebView(instance_id="page")]),
            Resolution(64, 48), PixelFormat.RGBA,
        )
        out = np.asarray(r.render(FrameSet(pts=0.0, frames={})).frames["out"].data)
        # the mock page is solid orange
        px = out[24, 32]
        assert px[0] > 200 and 100 < px[1] < 160 and px[2] < 50, px.tolist()
        r.web.unregister("page")
    finally:
        mock.close()


def test_webview_transparent_fallback(monkeypatch):
    """No browser, no CDP endpoint: registration succeeds and the WebView
    renders transparent (reference web_renderer_fallback.rs)."""
    monkeypatch.delenv("SMELTER_WEB_RENDERER_CDP_URL", raising=False)
    monkeypatch.setenv("SMELTER_WEB_RENDERER_BROWSER", "/nonexistent/browser")
    r = Renderer()
    inst = r.web.register(WebRendererSpec(
        instance_id="page", url="https://example.com/", resolution=(64, 48)
    ))
    assert not inst.active
    r.update_scene(
        "out",
        comp.View(background_color=RGBAColor(10, 20, 30, 255),
                  children=[comp.WebView(instance_id="page")]),
        Resolution(64, 48), PixelFormat.RGBA,
    )
    out = np.asarray(r.render(FrameSet(pts=0.0, frames={})).frames["out"].data)
    assert abs(int(out[10, 10, 0]) - 10) <= 2
    assert abs(int(out[10, 10, 2]) - 30) <= 2


def _red_input_frame(w=32, h=24):
    from smelter_tpu.core.types import Frame

    rgba = np.zeros((h, w, 4), np.uint8)
    rgba[..., 0] = 200
    rgba[..., 3] = 255
    return Frame(data=rgba, format=PixelFormat.RGBA,
                 resolution=Resolution(w, h), pts=0.0)


def test_webview_chromium_embedding_pushes_child_frames(monkeypatch):
    """chromium_embedding (embedder.rs embed_sources / chromium_embedding):
    InputStream children of a WebView are pushed INTO the page as canvas
    blits over CDP, and the page frame alone is the node's output."""
    mock = MockCdpServer()
    monkeypatch.setenv("SMELTER_WEB_RENDERER_CDP_URL", mock.url)
    try:
        r = Renderer()
        r.register_input("cam")
        inst = r.web.register(WebRendererSpec(
            instance_id="page", url="https://example.com/",
            resolution=(64, 48), embedding_method="chromium_embedding",
        ))
        assert inst.active
        assert inst.wait_for_frame(10), "first screencast frame never landed"
        r.update_scene(
            "out",
            comp.View(background_color=RGBAColor(0, 0, 0, 255),
                      children=[comp.WebView(
                          instance_id="page",
                          children=[comp.InputStream(input_id="cam")])]),
            Resolution(64, 48), PixelFormat.RGBA,
        )
        frame = _red_input_frame()
        out = np.asarray(
            r.render(FrameSet(pts=0.0, frames={"cam": frame})).frames["out"].data
        )
        assert mock.evaluated.wait(10), "no Runtime.evaluate reached the page"
        script = mock.evaluations[0]
        assert "smelter_source_0" in script
        assert ", 32, 24," in script  # child frame dimensions
        # the canvas payload is the child's RGBA bytes
        b64 = script.rsplit("'", 2)[-2]
        pixels = np.frombuffer(base64.b64decode(b64), np.uint8).reshape(24, 32, 4)
        assert pixels[12, 16, 0] == 200 and pixels[12, 16, 3] == 255
        # output shows the PAGE (children composite inside the page)
        px = out[24, 32]
        assert px[0] > 200 and 100 < px[1] < 160, px.tolist()
        # same pts again: deduped, no second blit
        n_before = len(mock.evaluations)
        r.render(FrameSet(pts=0.0, frames={"cam": frame}))
        assert len(mock.evaluations) == n_before
        r.web.unregister("page")
    finally:
        mock.close()


def test_webview_chromium_embedding_renders_non_input_subtree(monkeypatch):
    """chromium_embedding with a NON-InputStream child: the reference pushes
    every child's rendered texture into the page (embedder.rs:83,
    web_renderer.rs:24-26) — not just input streams. The child subtree must
    render through a cached sub-program, be read back as straight-alpha
    RGBA, and be re-pushed only when its content changes."""
    mock = MockCdpServer()
    monkeypatch.setenv("SMELTER_WEB_RENDERER_CDP_URL", mock.url)
    try:
        r = Renderer()
        r.register_input("cam")
        inst = r.web.register(WebRendererSpec(
            instance_id="page", url="https://example.com/",
            resolution=(64, 48), embedding_method="chromium_embedding",
        ))
        assert inst.active
        assert inst.wait_for_frame(10), "first screencast frame never landed"
        r.update_scene(
            "out",
            comp.View(background_color=RGBAColor(0, 0, 0, 255),
                      children=[comp.WebView(
                          instance_id="page",
                          children=[comp.View(
                              position=comp.StaticPosition(width=32, height=24),
                              background_color=RGBAColor(0, 0, 200, 255),
                              children=[comp.InputStream(input_id="cam")],
                          )])]),
            Resolution(64, 48), PixelFormat.RGBA,
        )
        frame = _red_input_frame(16, 12)
        out = np.asarray(
            r.render(FrameSet(pts=0.0, frames={"cam": frame})).frames["out"].data
        )
        assert mock.evaluated.wait(10), "no Runtime.evaluate reached the page"
        script = mock.evaluations[0]
        assert "smelter_source_0" in script
        assert ", 32, 24," in script  # the subtree's own resolution
        b64 = script.rsplit("'", 2)[-2]
        pixels = np.frombuffer(base64.b64decode(b64), np.uint8).reshape(24, 32, 4)
        # the RENDERED subtree was pushed: the red input occupies its
        # 16x12 top-left region, the view's blue background shows elsewhere
        assert pixels[6, 8, 0] > 150 and pixels[6, 8, 2] < 80, (
            pixels[6, 8].tolist()
        )
        assert pixels[6, 8, 3] == 255
        assert pixels[18, 28, 2] > 150, pixels[18, 28].tolist()
        # native output shows the PAGE, not the child (children live inside
        # the page in this mode)
        px = out[24, 32]
        assert px[0] > 200 and 100 < px[1] < 160, px.tolist()

        # unchanged content at a LATER pts: signature-deduped, no re-render
        n_before = len(mock.evaluations)
        r.render(FrameSet(pts=0.1, frames={"cam": frame}))
        assert len(mock.evaluations) == n_before

        # content change (new input frame) re-renders and re-pushes
        from smelter_tpu.core.types import Frame

        green = np.zeros((12, 16, 4), np.uint8)
        green[..., 1] = 220
        green[..., 3] = 255
        frame2 = Frame(data=green, format=PixelFormat.RGBA,
                       resolution=Resolution(16, 12), pts=0.2)
        r.render(FrameSet(pts=0.2, frames={"cam": frame2}))
        assert len(mock.evaluations) == n_before + 1
        b64 = mock.evaluations[-1].rsplit("'", 2)[-2]
        pixels = np.frombuffer(base64.b64decode(b64), np.uint8).reshape(24, 32, 4)
        assert pixels[6, 8, 1] > 150 and pixels[6, 8, 0] < 80, (
            pixels[6, 8].tolist()
        )
        r.web.unregister("page")
    finally:
        mock.close()


def test_webview_native_embedding_over_content(monkeypatch):
    """native_embedding_over_content ("overlay inputs OVER the website
    content", web_renderer.rs:30-34): children composite natively above
    the page, so the red child must be visible over the opaque orange
    mock page."""
    mock = MockCdpServer()
    monkeypatch.setenv("SMELTER_WEB_RENDERER_CDP_URL", mock.url)
    try:
        r = Renderer()
        r.register_input("cam")
        inst = r.web.register(WebRendererSpec(
            instance_id="page", url="https://example.com/",
            resolution=(64, 48),
            embedding_method="native_embedding_over_content",
        ))
        assert inst.active
        assert inst.wait_for_frame(10), "first screencast frame never landed"
        r.update_scene(
            "out",
            comp.View(background_color=RGBAColor(0, 0, 0, 255),
                      children=[comp.WebView(
                          instance_id="page",
                          children=[comp.InputStream(input_id="cam")])]),
            Resolution(64, 48), PixelFormat.RGBA,
        )
        out = np.asarray(
            r.render(FrameSet(pts=0.0, frames={"cam": _red_input_frame()}))
            .frames["out"].data
        )
        # child is red and covers the page in this mode
        px = out[24, 32]
        assert px[0] > 150 and px[1] < 80, px.tolist()
        # no uplink in native mode
        assert not mock.evaluations
        r.web.unregister("page")
    finally:
        mock.close()
