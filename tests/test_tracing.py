"""Per-subsystem span tracing (SURVEY §5) — aggregates, decorator, /stats
integration, and the instrumented render path."""

import time

import numpy as np

from smelter_tpu.utils import tracing


def test_span_aggregates_and_percentiles():
    tracing.reset()
    for _ in range(20):
        with tracing.span("test.op"):
            time.sleep(0.001)
    rep = tracing.report()["test.op"]
    assert rep["count"] == 20
    assert rep["avg_ms"] >= 1.0
    assert rep["max_ms"] >= rep["p95_ms"] >= rep["p50_ms"] > 0.0
    tracing.reset()
    assert tracing.report() == {}


def test_traced_decorator():
    tracing.reset()

    @tracing.traced("test.fn")
    def fn(x):
        return x * 2

    assert fn(21) == 42
    assert tracing.report()["test.fn"]["count"] == 1
    tracing.reset()


def test_render_path_emits_spans():
    from smelter_tpu.core.types import (
        Frame, FrameSet, PixelFormat, Resolution, RGBAColor,
    )
    from smelter_tpu.render.renderer import Renderer
    from smelter_tpu.scene import components as comp

    tracing.reset()
    r = Renderer()
    try:
        r.register_input("input_0")
        r.update_scene(
            "out",
            comp.View(background_color=RGBAColor(0, 0, 64, 255),
                      children=[comp.InputStream(input_id="input_0")]),
            Resolution(64, 48), PixelFormat.RGBA,
        )
        rgba = np.zeros((24, 32, 4), np.uint8)
        rgba[..., 3] = 255
        frame = Frame(data=rgba, format=PixelFormat.RGBA,
                      resolution=Resolution(32, 24), pts=0.0)
        r.render(FrameSet(pts=0.0, frames={"input_0": frame}))
        rep = tracing.report()
        assert rep["render.frame"]["count"] >= 1
        assert rep["render.build_program"]["count"] >= 1
        assert rep["render.build_program"]["max_ms"] > 0
    finally:
        r.close()
        tracing.reset()


def test_stats_report_carries_spans(tmp_path):
    from smelter_tpu.pipeline.instance import Pipeline
    from smelter_tpu.pipeline.stats import collect_stats

    tracing.reset()
    with tracing.span("probe.section"):
        pass
    p = Pipeline()
    try:
        report = collect_stats(p)
        assert "probe.section" in report["spans"]
        assert report["spans"]["probe.section"]["count"] == 1
    finally:
        p.close()
        tracing.reset()
