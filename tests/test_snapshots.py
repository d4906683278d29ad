"""Golden-snapshot matrix mirroring the reference render-test scene set
(`integration-tests/src/render_tests/{view,tiles,rescaler,transition,text,
image,shader,yuv_tests,pixel_input_format_tests,simple}.rs`): every
component family, transitions mid-flight, both YUV color ranges, and the
input pixel-format set, compared per-pixel against committed PNGs
(tolerance = harness.ALLOWED_ERROR, matching harness/test_case.rs:35).

Regenerate with SMELTER_UPDATE_SNAPSHOTS=1.
"""

import numpy as np
import pytest

from harness import assert_snapshot, make_test_input
from smelter_tpu.core.types import (
    Frame,
    FrameSet,
    PixelFormat,
    Resolution,
    RGBAColor,
)
from smelter_tpu.ops import color_convert as cc
from smelter_tpu.render.renderer import Renderer
from smelter_tpu.scene import components as comp
from smelter_tpu.scene.components import (
    AbsolutePosition,
    BoxShadow,
    Easing,
    Overflow,
    Padding,
    RescaleMode,
    StaticPosition,
    Transition,
    ViewDirection,
)
from smelter_tpu.scene.layout_types import BorderRadius

RES = Resolution(320, 180)
IN_RES = Resolution(160, 90)


def _renderer(n_inputs: int) -> Renderer:
    r = Renderer()
    for i in range(n_inputs):
        r.register_input(f"input_{i}")
    return r


def _render(r: Renderer, root, name: str, n_inputs: int = 0, pts: float = 0.0,
            res: Resolution = RES):
    r.update_scene("out", root, res, PixelFormat.RGBA)
    frames = {
        f"input_{i}": make_test_input(i, IN_RES, pts) for i in range(n_inputs)
    }
    out = r.render(FrameSet(pts=pts, frames=frames)).frames["out"]
    assert_snapshot(name, out)


def _inputs(n):
    return [comp.InputStream(input_id=f"input_{i}") for i in range(n)]


BLUE = RGBAColor(0, 0, 128, 255)
RED = RGBAColor(180, 30, 30, 255)
GREEN = RGBAColor(30, 160, 60, 255)
WHITE = RGBAColor(255, 255, 255, 255)


# ------------------------------------------------------------------ view.rs


def test_view_row_layout():
    r = _renderer(3)
    try:
        _render(r, comp.View(background_color=BLUE, children=_inputs(3)),
                "view_row_3_inputs", 3)
    finally:
        r.close()


def test_view_column_layout():
    r = _renderer(3)
    try:
        _render(
            r,
            comp.View(background_color=BLUE, direction=ViewDirection.COLUMN,
                      children=_inputs(3)),
            "view_column_3_inputs", 3,
        )
    finally:
        r.close()


def test_view_fixed_and_dynamic_widths():
    r = _renderer(0)
    try:
        _render(
            r,
            comp.View(
                background_color=BLUE,
                children=[
                    comp.View(position=StaticPosition(width=60.0),
                              background_color=RED),
                    comp.View(background_color=GREEN),  # fills the rest
                    comp.View(position=StaticPosition(width=80.0),
                              background_color=WHITE),
                ],
            ),
            "view_fixed_and_dynamic_widths",
        )
    finally:
        r.close()


def test_view_absolute_positioning():
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(
                background_color=BLUE,
                children=[
                    comp.View(
                        position=AbsolutePosition(width=120.0, height=70.0,
                                                  top=20.0, left=30.0),
                        background_color=RED,
                        children=_inputs(1),
                    ),
                    comp.View(
                        position=AbsolutePosition(width=90.0, height=50.0,
                                                  bottom=10.0, right=15.0),
                        background_color=GREEN,
                    ),
                ],
            ),
            "view_absolute_positioning", 1,
        )
    finally:
        r.close()


def test_view_rotation():
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(
                background_color=BLUE,
                children=[comp.View(
                    position=AbsolutePosition(width=120.0, height=70.0,
                                              top=50.0, left=90.0,
                                              rotation_degrees=30.0),
                    background_color=RED,
                    children=_inputs(1),
                )],
            ),
            "view_rotation_30deg", 1,
        )
    finally:
        r.close()


def test_view_overflow_hidden():
    r = _renderer(0)
    try:
        _render(
            r,
            comp.View(
                background_color=BLUE,
                overflow=Overflow.HIDDEN,
                children=[comp.View(position=StaticPosition(width=500.0),
                                    background_color=RED)],
            ),
            "view_overflow_hidden",
        )
    finally:
        r.close()


def test_view_overflow_fit():
    r = _renderer(0)
    try:
        _render(
            r,
            comp.View(
                background_color=BLUE,
                overflow=Overflow.FIT,
                children=[
                    comp.View(position=StaticPosition(width=400.0, height=200.0),
                              background_color=RED),
                    comp.View(position=StaticPosition(width=200.0, height=100.0),
                              background_color=GREEN),
                ],
            ),
            "view_overflow_fit",
        )
    finally:
        r.close()


def test_view_padding_and_border():
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(
                background_color=BLUE,
                padding=Padding(top=12.0, right=20.0, bottom=12.0, left=20.0),
                border_width=6.0,
                border_color=WHITE,
                children=_inputs(1),
            ),
            "view_padding_border", 1,
        )
    finally:
        r.close()


def test_view_border_radius_clips_content():
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(
                background_color=BLUE,
                children=[comp.View(
                    position=AbsolutePosition(width=160.0, height=120.0,
                                              top=30.0, left=80.0),
                    background_color=RED,
                    border_radius=BorderRadius(40.0, 40.0, 40.0, 40.0),
                    children=_inputs(1),
                )],
            ),
            "view_border_radius_clip", 1,
        )
    finally:
        r.close()


def test_view_box_shadow():
    r = _renderer(0)
    try:
        _render(
            r,
            comp.View(
                background_color=WHITE,
                children=[comp.View(
                    position=AbsolutePosition(width=140.0, height=90.0,
                                              top=40.0, left=90.0),
                    background_color=RED,
                    border_radius=BorderRadius(12.0, 12.0, 12.0, 12.0),
                    box_shadow=[BoxShadow(offset_x=10.0, offset_y=10.0,
                                          blur_radius=16.0,
                                          color=RGBAColor(0, 0, 0, 160))],
                )],
            ),
            "view_box_shadow",
        )
    finally:
        r.close()


def test_view_nested_layouts():
    r = _renderer(2)
    try:
        _render(
            r,
            comp.View(
                background_color=BLUE,
                direction=ViewDirection.COLUMN,
                children=[
                    comp.View(children=_inputs(2)),
                    comp.View(
                        background_color=GREEN,
                        children=[comp.View(
                            position=StaticPosition(width=100.0),
                            background_color=RED,
                        )],
                    ),
                ],
            ),
            "view_nested_layouts", 2,
        )
    finally:
        r.close()


# ----------------------------------------------------------------- tiles.rs


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
def test_tiles_n_inputs(n):
    r = _renderer(n)
    try:
        _render(
            r,
            comp.Tiles(background_color=RGBAColor(16, 16, 16, 255),
                       children=_inputs(n)),
            f"tiles_{n:02d}_inputs", n,
        )
    finally:
        r.close()


def test_tiles_margin_padding():
    r = _renderer(4)
    try:
        _render(
            r,
            comp.Tiles(background_color=RGBAColor(16, 16, 16, 255),
                       margin=8.0, padding=6.0, children=_inputs(4)),
            "tiles_margin_padding", 4,
        )
    finally:
        r.close()


def test_tiles_aspect_ratio_and_align():
    from smelter_tpu.scene.components import HorizontalAlign, VerticalAlign

    r = _renderer(3)
    try:
        _render(
            r,
            comp.Tiles(
                background_color=RGBAColor(16, 16, 16, 255),
                tile_aspect_ratio=(1, 1),
                horizontal_align=HorizontalAlign.LEFT,
                vertical_align=VerticalAlign.TOP,
                children=_inputs(3),
            ),
            "tiles_square_align_topleft", 3,
        )
    finally:
        r.close()


# -------------------------------------------------------------- rescaler.rs


@pytest.mark.parametrize("mode", [RescaleMode.FIT, RescaleMode.FILL])
def test_rescaler_modes(mode):
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(
                background_color=BLUE,
                children=[comp.Rescaler(child=_inputs(1)[0], mode=mode)],
            ),
            f"rescaler_{mode.value}", 1,
        )
    finally:
        r.close()


def test_rescaler_align_in_tall_slot():
    from smelter_tpu.scene.components import HorizontalAlign, VerticalAlign

    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(
                background_color=BLUE,
                children=[comp.Rescaler(
                    child=_inputs(1)[0],
                    position=StaticPosition(width=100.0),
                    mode=RescaleMode.FIT,
                    horizontal_align=HorizontalAlign.RIGHT,
                    vertical_align=VerticalAlign.BOTTOM,
                )],
            ),
            "rescaler_fit_align_bottom_right", 1,
        )
    finally:
        r.close()


def test_rescaler_border_radius():
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(
                background_color=WHITE,
                children=[comp.Rescaler(
                    child=_inputs(1)[0],
                    border_radius=BorderRadius(24.0, 24.0, 24.0, 24.0),
                    border_width=4.0,
                    border_color=RED,
                )],
            ),
            "rescaler_border_radius", 1,
        )
    finally:
        r.close()


# ------------------------------------------------------------ transition.rs


def test_transition_width_midpoint():
    r = _renderer(0)
    try:
        root0 = comp.View(
            background_color=BLUE,
            children=[comp.View(id="box", position=StaticPosition(width=40.0),
                                background_color=RED)],
        )
        r.update_scene("out", root0, RES, PixelFormat.RGBA)
        r.render(FrameSet(pts=0.0))
        root1 = comp.View(
            background_color=BLUE,
            children=[comp.View(
                id="box", position=StaticPosition(width=240.0),
                background_color=RED,
                transition=Transition(duration=2.0),
            )],
        )
        r.update_scene("out", root1, RES, PixelFormat.RGBA)
        out = r.render(FrameSet(pts=1.0)).frames["out"]  # t = 0.5
        assert_snapshot("transition_width_midpoint", out)
    finally:
        r.close()


def test_transition_bounce_late():
    r = _renderer(0)
    try:
        root0 = comp.View(
            background_color=BLUE,
            children=[comp.View(
                id="box",
                position=AbsolutePosition(width=60.0, height=60.0,
                                          top=60.0, left=0.0),
                background_color=GREEN,
            )],
        )
        r.update_scene("out", root0, RES, PixelFormat.RGBA)
        r.render(FrameSet(pts=0.0))
        root1 = comp.View(
            background_color=BLUE,
            children=[comp.View(
                id="box",
                position=AbsolutePosition(width=60.0, height=60.0,
                                          top=60.0, left=240.0),
                background_color=GREEN,
                transition=Transition(duration=2.0, easing=Easing.BOUNCE),
            )],
        )
        r.update_scene("out", root1, RES, PixelFormat.RGBA)
        out = r.render(FrameSet(pts=1.6)).frames["out"]  # t = 0.8, bouncing
        assert_snapshot("transition_bounce_late", out)
    finally:
        r.close()


def test_tiles_transition_midpoint():
    """tiles_transitions.rs: tile grid re-layout animates when a child is
    added."""
    r = _renderer(3)
    try:
        r.update_scene(
            "out",
            comp.Tiles(id="t", background_color=RGBAColor(16, 16, 16, 255),
                       children=_inputs(2),
                       transition=Transition(duration=2.0)),
            RES, PixelFormat.RGBA,
        )
        r.render(FrameSet(
            pts=0.0,
            frames={f"input_{i}": make_test_input(i, IN_RES) for i in range(2)},
        ))
        r.update_scene(
            "out",
            comp.Tiles(id="t", background_color=RGBAColor(16, 16, 16, 255),
                       children=_inputs(3),
                       transition=Transition(duration=2.0)),
            RES, PixelFormat.RGBA,
        )
        out = r.render(FrameSet(
            pts=1.0,
            frames={f"input_{i}": make_test_input(i, IN_RES, 1.0)
                    for i in range(3)},
        )).frames["out"]
        assert_snapshot("tiles_transition_midpoint", out)
    finally:
        r.close()


# ------------------------------------------------------------------ text.rs


def test_text_align_center_fixed():
    r = _renderer(0)
    try:
        from smelter_tpu.scene.components import (
            HorizontalAlign,
            TextDimensions,
        )

        _render(
            r,
            comp.View(
                background_color=BLUE,
                children=[comp.Text(
                    text="Hello TPU",
                    font_size=32.0,
                    color=WHITE,
                    align=HorizontalAlign.CENTER,
                    dimensions=TextDimensions(mode="fixed", width=320.0,
                                              height=180.0),
                )],
            ),
            "text_align_center_fixed",
        )
    finally:
        r.close()


def test_text_wrap_word():
    r = _renderer(0)
    try:
        from smelter_tpu.scene.components import TextDimensions, TextWrap

        _render(
            r,
            comp.View(
                background_color=RGBAColor(24, 24, 24, 255),
                children=[comp.Text(
                    text="the quick brown fox jumps over the lazy dog",
                    font_size=26.0,
                    color=RGBAColor(255, 220, 80, 255),
                    wrap=TextWrap.WORD,
                    dimensions=TextDimensions(mode="fitted_column",
                                              width=200.0),
                )],
            ),
            "text_wrap_word",
        )
    finally:
        r.close()


def test_text_background_and_weight():
    r = _renderer(0)
    try:
        from smelter_tpu.scene.components import TextWeight

        _render(
            r,
            comp.View(
                background_color=BLUE,
                children=[comp.Text(
                    text="BOLD",
                    font_size=48.0,
                    weight=TextWeight.BOLD,
                    color=RGBAColor(20, 20, 20, 255),
                    background_color=RGBAColor(240, 240, 240, 255),
                )],
            ),
            "text_background_bold",
        )
    finally:
        r.close()


def test_text_over_input():
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(
                background_color=BLUE,
                children=[
                    comp.Rescaler(child=_inputs(1)[0]),
                    comp.View(
                        position=AbsolutePosition(width=320.0, height=40.0,
                                                  bottom=0.0, left=0.0),
                        background_color=RGBAColor(0, 0, 0, 150),
                        children=[comp.Text(text="lower third",
                                            font_size=24.0, color=WHITE)],
                    ),
                ],
            ),
            "text_lower_third_overlay", 1,
        )
    finally:
        r.close()


# ----------------------------------------------------------------- image.rs


def _png_bytes(w, h, rgba):
    from io import BytesIO

    from PIL import Image as PILImage

    arr = np.zeros((h, w, 4), np.uint8)
    arr[:] = rgba
    # diagonal marker
    for i in range(min(w, h)):
        arr[i, i] = (255, 255, 255, 255)
    buf = BytesIO()
    PILImage.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_image_png_fit():
    r = _renderer(0)
    try:
        r.register_image("logo", data=_png_bytes(64, 64, (200, 40, 40, 255)),
                         kind="png")
        _render(
            r,
            comp.View(
                background_color=BLUE,
                children=[comp.Rescaler(child=comp.Image(image_id="logo"))],
            ),
            "image_png_fit",
        )
    finally:
        r.close()


def test_image_natural_size_absolute():
    r = _renderer(0)
    try:
        r.register_image("badge", data=_png_bytes(48, 32, (40, 200, 90, 255)),
                         kind="png")
        _render(
            r,
            comp.View(
                background_color=RGBAColor(32, 32, 48, 255),
                children=[comp.View(
                    position=AbsolutePosition(width=48.0, height=32.0,
                                              top=20.0, left=250.0),
                    children=[comp.Image(image_id="badge")],
                )],
            ),
            "image_natural_size_absolute",
        )
    finally:
        r.close()


def test_image_svg():
    r = _renderer(0)
    try:
        svg = (
            '<svg xmlns="http://www.w3.org/2000/svg" width="100" height="100">'
            '<circle cx="50" cy="50" r="40" fill="red"/>'
            '<rect x="10" y="10" width="30" height="30" fill="#00ff00"/>'
            "</svg>"
        ).encode()
        r.register_image("vector", data=svg, kind="svg")
        _render(
            r,
            comp.View(
                background_color=WHITE,
                children=[comp.Rescaler(child=comp.Image(image_id="vector"))],
            ),
            "image_svg_circle",
        )
    finally:
        r.close()


# ---------------------------------------------------------------- shader.rs


def test_shader_invert_snapshot():
    r = _renderer(1)
    try:
        r.register_shader(
            "invert",
            "def main(inputs, params, resolution, time):\n"
            "    tex = inputs[0]\n"
            "    rgb = 1.0 - tex[..., :3]\n"
            "    return jnp.concatenate([rgb, tex[..., 3:4]], axis=-1)\n",
        )
        _render(
            r,
            comp.Shader(shader_id="invert", children=_inputs(1),
                        width=float(RES.width), height=float(RES.height)),
            "shader_invert", 1,
        )
    finally:
        r.close()


def test_shader_param_gradient():
    r = _renderer(0)
    try:
        r.register_shader(
            "gradient",
            "def main(inputs, params, resolution, time):\n"
            "    w, h = resolution[0], resolution[1]\n"
            "    gain = params['gain'] if params else 1.0\n"
            "    x = jnp.linspace(0.0, gain, w)\n"
            "    y = jnp.linspace(0.0, 1.0, h)\n"
            "    g = jnp.outer(y, x)\n"
            "    rgba = jnp.stack([g, g * 0.5, 1.0 - g,"
            " jnp.ones_like(g)], axis=-1)\n"
            "    return rgba.astype(jnp.float32)\n",
        )
        _render(
            r,
            comp.Shader(shader_id="gradient", shader_param={"gain": 1.0},
                        width=float(RES.width), height=float(RES.height)),
            "shader_param_gradient",
        )
    finally:
        r.close()


# ------------------------------------- yuv_tests.rs + pixel_input_format_tests.rs


def _rgb_test_pattern(res: Resolution) -> np.ndarray:
    h, w = res.height, res.width
    rgba = np.zeros((h, w, 4), np.uint8)
    rgba[:, : w // 3] = (230, 40, 40, 255)
    rgba[:, w // 3 : 2 * w // 3] = (40, 230, 40, 255)
    rgba[:, 2 * w // 3 :] = (40, 40, 230, 255)
    rgba[: h // 6, :] = (255, 255, 255, 255)
    rgba[-h // 6 :, :] = (0, 0, 0, 255)
    return rgba


def _frame_from_rgba(rgba: np.ndarray, fmt: PixelFormat,
                     res: Resolution) -> Frame:
    import jax.numpy as jnp

    rgba_f = jnp.asarray(rgba.astype(np.float32) / 255.0)
    if fmt == PixelFormat.RGBA:
        return Frame(data=rgba, format=fmt, resolution=res, pts=0.0)
    if fmt == PixelFormat.BGRA:
        return Frame(data=rgba[..., [2, 1, 0, 3]], format=fmt,
                     resolution=res, pts=0.0)
    if fmt == PixelFormat.PLANAR_YUV420:
        y, u, v = cc.rgba_to_planar_yuv420(rgba_f)
        return Frame(data=(np.asarray(y), np.asarray(u), np.asarray(v)),
                     format=fmt, resolution=res, pts=0.0)
    if fmt == PixelFormat.PLANAR_YUVJ420:
        y, u, v = cc.rgba_to_planar_yuv420(rgba_f, full_range=True)
        return Frame(data=(np.asarray(y), np.asarray(u), np.asarray(v)),
                     format=fmt, resolution=res, pts=0.0)
    raise ValueError(fmt)


@pytest.mark.parametrize(
    "fmt",
    [PixelFormat.PLANAR_YUV420, PixelFormat.PLANAR_YUVJ420,
     PixelFormat.RGBA, PixelFormat.BGRA],
)
def test_pixel_format_roundtrip_snapshot(fmt):
    """Same RGB bar pattern through limited-range YUV, full-range YUV
    (yuv_tests.rs), RGBA and BGRA upload paths — all four snapshots should
    be visually identical bars (within YUV quantization)."""
    r = Renderer()
    try:
        r.register_input("input_0")
        rgba = _rgb_test_pattern(IN_RES)
        frame = _frame_from_rgba(rgba, fmt, IN_RES)
        r.update_scene(
            "out",
            comp.View(background_color=BLUE,
                      children=[comp.Rescaler(child=_inputs(1)[0])]),
            RES, PixelFormat.RGBA,
        )
        out = r.render(FrameSet(pts=0.0, frames={"input_0": frame})).frames["out"]
        assert_snapshot(f"pixel_format_{fmt.value}", out)
    finally:
        r.close()


# ---------------------------------------------------------------- simple.rs


def test_simple_passthrough():
    r = _renderer(1)
    try:
        _render(r, comp.Rescaler(child=_inputs(1)[0]),
                "simple_passthrough", 1)
    finally:
        r.close()


def test_view_rotation_masked_opaque_bg():
    """Rotated view WITH an opaque background: the child is clipped by the
    parent mask (region-local masked fast path — was a general-path cliff)."""
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(
                background_color=BLUE,
                children=[comp.View(
                    position=AbsolutePosition(width=200.0, height=110.0,
                                              top=35.0, left=60.0,
                                              rotation_degrees=25.0),
                    background_color=WHITE,
                    children=[comp.InputStream(input_id="input_0")],
                )],
            ),
            "view_rotation_masked_opaque_bg", 1,
        )
    finally:
        r.close()


def _transition_midpoint(r, scene0, scene1, name, n_inputs=1, mid_pts=1.0):
    r.update_scene("out", scene0, RES, PixelFormat.RGBA)
    r.render(FrameSet(pts=0.0, frames={
        f"input_{i}": make_test_input(i, IN_RES) for i in range(n_inputs)
    }))
    r.update_scene("out", scene1, RES, PixelFormat.RGBA)
    # warm the planner so the traced fast path engages (two moving frames)
    for pts in (0.2, 0.4):
        r.render(FrameSet(pts=pts, frames={
            f"input_{i}": make_test_input(i, IN_RES, pts) for i in range(n_inputs)
        }))
    out = r.render(FrameSet(pts=mid_pts, frames={
        f"input_{i}": make_test_input(i, IN_RES, mid_pts) for i in range(n_inputs)
    })).frames["out"]
    assert_snapshot(name, out)


def test_transition_spin_midpoint():
    r = _renderer(1)
    try:
        def scene(angle, tr=None):
            return comp.View(background_color=BLUE, children=[comp.View(
                id="card",
                position=AbsolutePosition(width=180.0, height=100.0,
                                          top=40.0, left=70.0,
                                          rotation_degrees=angle),
                background_color=WHITE, transition=tr,
                children=[comp.InputStream(input_id="input_0")])])

        _transition_midpoint(
            r, scene(0.0), scene(80.0, Transition(duration=2.0)),
            "transition_spin_midpoint",
        )
    finally:
        r.close()


def test_transition_zoom_midpoint():
    r = _renderer(1)
    try:
        def scene(w, h, top, left, tr=None):
            return comp.View(background_color=BLUE, children=[comp.View(
                id="card",
                position=AbsolutePosition(width=w, height=h, top=top, left=left),
                background_color=WHITE, transition=tr,
                children=[comp.InputStream(input_id="input_0")])])

        _transition_midpoint(
            r, scene(80.0, 45.0, 70.0, 120.0),
            scene(280.0, 158.0, 10.0, 20.0, Transition(duration=2.0)),
            "transition_zoom_midpoint",
        )
    finally:
        r.close()
