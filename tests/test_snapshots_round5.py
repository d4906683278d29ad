"""Round-5 golden-snapshot extensions (VERDICT r4 item 7): multi-PTS
sequences for the transition/easing types still covered only at single
PTSes, the EXACT 16-input general_4k bench scene at 4K output (ties the
perf work to pixels), glyph/none text wrap + style/bidi permutations,
JPEG + animated-GIF image assets, a time-driven shader, the missing
yuvj422 input format, and high-angle rotation / odd tile counts.

Reference matrix: `integration-tests/src/render_tests/{transition,text,
image,shader,tiles,view}.rs` + `pixel_input_format_tests.rs`.
Regenerate with SMELTER_UPDATE_SNAPSHOTS=1 and visually diff.
"""

import numpy as np
import pytest

from harness import assert_snapshot, make_test_input
from test_snapshots_extended import _frame_from_rgba, _rgb_test_pattern
from smelter_tpu.core.types import (
    FrameSet,
    PixelFormat,
    Resolution,
    RGBAColor,
)
from smelter_tpu.render.renderer import Renderer
from smelter_tpu.scene import components as comp
from smelter_tpu.scene.components import (
    AbsolutePosition,
    BoxShadow,
    Easing,
    RescaleMode,
    StaticPosition,
    TextDimensions,
    TextStyle,
    TextWeight,
    TextWrap,
    Transition,
)
from smelter_tpu.scene.layout_types import BorderRadius

RES = Resolution(320, 180)
IN_RES = Resolution(160, 90)

BLUE = RGBAColor(0, 0, 128, 255)
RED = RGBAColor(180, 30, 30, 255)
GREEN = RGBAColor(30, 160, 60, 255)
WHITE = RGBAColor(255, 255, 255, 255)
DARK = RGBAColor(24, 24, 24, 255)


def _renderer(n_inputs: int) -> Renderer:
    r = Renderer()
    for i in range(n_inputs):
        r.register_input(f"input_{i}")
    return r


def _inputs(n):
    return [comp.InputStream(input_id=f"input_{i}") for i in range(n)]


def _render(r, root, name, n_inputs=0, pts=0.0, res=RES):
    r.update_scene("out", root, res, PixelFormat.RGBA)
    frames = {
        f"input_{i}": make_test_input(i, IN_RES, pts) for i in range(n_inputs)
    }
    out = r.render(FrameSet(pts=pts, frames=frames)).frames["out"]
    assert_snapshot(name, out)


def _sequence(r, scene0, scene1, name, n_inputs=0, pts_list=(0.5, 1.0, 1.5)):
    r.update_scene("out", scene0, RES, PixelFormat.RGBA)
    r.render(FrameSet(pts=0.0, frames={
        f"input_{i}": make_test_input(i, IN_RES) for i in range(n_inputs)
    }))
    r.update_scene("out", scene1, RES, PixelFormat.RGBA)
    for pts in (0.1, 0.2):  # warm the planner onto the traced fast paths
        r.render(FrameSet(pts=pts, frames={
            f"input_{i}": make_test_input(i, IN_RES, pts)
            for i in range(n_inputs)
        }))
    for pts in pts_list:
        out = r.render(FrameSet(pts=pts, frames={
            f"input_{i}": make_test_input(i, IN_RES, pts)
            for i in range(n_inputs)
        })).frames["out"]
        assert_snapshot(f"{name}_t{str(pts).replace('.', '')}", out)


# --------------------------------------------- remaining transition types


def test_transition_width_sequence():
    """Size transition through the flexbox (StaticPosition) path at three
    PTSes — transition.rs width tests record whole sequences."""
    r = _renderer(0)
    try:
        def scene(wv, tr=None):
            return comp.View(background_color=BLUE, children=[comp.View(
                id="box", position=StaticPosition(width=wv),
                background_color=RED, transition=tr)])

        _sequence(r, scene(40.0), scene(280.0, Transition(duration=2.0)),
                  "seq_width")
    finally:
        r.close()


def test_transition_bounce_sequence():
    """Bounce easing over an absolute-position slide at three PTSes (the
    bounce curve's overshoot phases all look different)."""
    r = _renderer(0)
    try:
        def scene(left, tr=None):
            return comp.View(background_color=BLUE, children=[comp.View(
                id="box",
                position=AbsolutePosition(width=60.0, height=60.0,
                                          top=60.0, left=left),
                background_color=GREEN, transition=tr)])

        _sequence(
            r, scene(0.0),
            scene(240.0, Transition(duration=2.0, easing=Easing.BOUNCE)),
            "seq_bounce",
        )
    finally:
        r.close()


def test_tiles_add_child_sequence():
    """Tiles re-layout when a NEW child arrives (vs the reorder sequence
    already covered): existing tiles shrink/slide to make room."""
    r = _renderer(3)
    try:
        def scene(n):
            return comp.Tiles(
                id="grid", background_color=DARK, children=_inputs(n),
                transition=Transition(duration=2.0),
            )

        _sequence(r, scene(2), scene(3), "seq_tiles_add", n_inputs=3)
    finally:
        r.close()


# ------------------------------------------ the bench scene itself, at 4K


def test_4k_general_bench16():
    """The EXACT general_4k bench geometry (parallel/flagship.py
    make_flagship_general_compose: 4x4 grid of 960x540 slots, 30 px
    margins, radius 24, borders on odd tiles, shadows on every third,
    tiles 5/10 rotated 30/-15 deg) rendered through the production
    Renderer at full 3840x2160 — pins the pixels the perf ladder runs on
    (incl. the round-5 aligned group unions)."""
    r = _renderer(16)
    try:
        children = []
        for i in range(16):
            row, col = divmod(i, 4)
            rot = 30.0 if i == 5 else (-15.0 if i == 10 else 0.0)
            shadow = (
                [BoxShadow(offset_x=10.0, offset_y=10.0, blur_radius=24.0,
                           color=RGBAColor(0, 0, 0, 160))]
                if i % 3 == 0 else []
            )
            children.append(comp.Rescaler(
                child=comp.InputStream(input_id=f"input_{i}"),
                border_radius=BorderRadius(24.0, 24.0, 24.0, 24.0),
                border_width=4.0 if i % 2 else 0.0,
                border_color=RGBAColor(255, 255, 255, 220),
                box_shadow=shadow,
                position=AbsolutePosition(
                    width=900.0, height=480.0,
                    top=float(row * 540 + 30), left=float(col * 960 + 30),
                    rotation_degrees=rot,
                ),
            ))
        _render(
            r,
            comp.View(background_color=RGBAColor(8, 8, 8), children=children),
            "res4k_general_bench16", 16, res=Resolution(3840, 2160),
        )
    finally:
        r.close()


# ------------------------------------------------------ text permutations


def test_text_wrap_glyph():
    r = _renderer(0)
    try:
        _render(
            r,
            comp.View(background_color=DARK, children=[comp.Text(
                text="unbreakablesupercalifragilistic glyph wrap",
                font_size=26.0, color=RGBAColor(255, 220, 80, 255),
                wrap=TextWrap.GLYPH,
                dimensions=TextDimensions(mode="fitted_column", width=180.0),
            )]),
            "text_wrap_glyph",
        )
    finally:
        r.close()


def test_text_wrap_none_clips():
    r = _renderer(0)
    try:
        _render(
            r,
            comp.View(background_color=DARK, children=[comp.Text(
                text="this long single line never wraps and simply clips",
                font_size=26.0, color=WHITE, wrap=TextWrap.NONE,
                dimensions=TextDimensions(mode="fixed", width=320.0,
                                          height=180.0),
            )]),
            "text_wrap_none_clips",
        )
    finally:
        r.close()


def test_text_style_italic_light():
    r = _renderer(0)
    try:
        _render(
            r,
            comp.View(background_color=BLUE, children=[comp.Text(
                text="Italic Light 28",
                font_size=28.0, color=WHITE, style=TextStyle.ITALIC,
                weight=TextWeight.LIGHT,
                dimensions=TextDimensions(mode="fixed", width=320.0,
                                          height=180.0),
            )]),
            "text_style_italic_light",
        )
    finally:
        r.close()


def test_text_rtl_bidi():
    """Mixed RTL/LTR run through FriBidi (DejaVu Sans carries Arabic
    coverage in this image): the Arabic segment must lay out right-to-left
    with the Latin word embedded."""
    r = _renderer(0)
    try:
        _render(
            r,
            comp.View(background_color=DARK, children=[comp.Text(
                text="مرحبا TPU بك",
                font_size=30.0, color=WHITE, font_family="DejaVu Sans",
                dimensions=TextDimensions(mode="fixed", width=320.0,
                                          height=180.0),
            )]),
            "text_rtl_bidi",
        )
    finally:
        r.close()


# --------------------------------------------------------- image formats


def test_image_jpeg_fill():
    from io import BytesIO

    from PIL import Image as PILImage

    r = _renderer(0)
    try:
        arr = np.zeros((60, 80, 3), np.uint8)
        arr[:, :, 0] = np.linspace(0, 255, 80, dtype=np.uint8)[None, :]
        arr[:30, :, 1] = 200
        buf = BytesIO()
        PILImage.fromarray(arr).save(buf, format="JPEG", quality=90)
        r.register_image("photo", data=buf.getvalue(), kind="jpeg")
        _render(
            r,
            comp.View(background_color=BLUE, children=[comp.Rescaler(
                child=comp.Image(image_id="photo"), mode=RescaleMode.FILL,
            )]),
            "image_jpeg_fill",
        )
    finally:
        r.close()


def test_image_gif_animated_by_pts():
    """Animated GIF frames resolve by output PTS (image.rs animated
    assets): frame 0 at pts 0, a later frame at pts 0.35."""
    from io import BytesIO

    from PIL import Image as PILImage

    r = _renderer(0)
    try:
        frames = []
        for i, color in enumerate([(255, 40, 40), (40, 255, 40),
                                   (40, 40, 255), (255, 255, 40)]):
            a = np.zeros((40, 40, 3), np.uint8)
            a[:] = color
            a[:10, : 10 * (i + 1)] = 255
            frames.append(PILImage.fromarray(a))
        buf = BytesIO()
        frames[0].save(buf, format="GIF", save_all=True,
                       append_images=frames[1:], duration=100, loop=0)
        r.register_image("anim", data=buf.getvalue(), kind="gif")
        scene = comp.View(background_color=DARK, children=[comp.View(
            position=AbsolutePosition(width=40.0, height=40.0, top=70.0,
                                      left=140.0),
            children=[comp.Image(image_id="anim")],
        )])
        r.update_scene("out", scene, RES, PixelFormat.RGBA)
        out0 = r.render(FrameSet(pts=0.0)).frames["out"]
        assert_snapshot("image_gif_t00", out0)
        out1 = r.render(FrameSet(pts=0.35)).frames["out"]
        assert_snapshot("image_gif_t035", out1)
    finally:
        r.close()


# ------------------------------------------------------------ shader time


def test_shader_time_driven():
    r = _renderer(0)
    try:
        r.register_shader(
            "wave",
            "def main(inputs, params, resolution, time):\n"
            "    w, h = resolution[0], resolution[1]\n"
            "    x = jnp.linspace(0.0, 6.28, w)\n"
            "    y = jnp.linspace(0.0, 6.28, h)\n"
            "    g = 0.5 + 0.5 * jnp.sin(jnp.outer(y, x) * 0.5 + time * 4.0)\n"
            "    rgba = jnp.stack([g, 0.2 + 0.0 * g, 1.0 - g,"
            " jnp.ones_like(g)], axis=-1)\n"
            "    return rgba.astype(jnp.float32)\n",
        )
        _render(
            r,
            comp.Shader(shader_id="wave", width=float(RES.width),
                        height=float(RES.height)),
            "shader_time_t08", pts=0.8,
        )
    finally:
        r.close()


# --------------------------------------------------- remaining format/geo


def test_pixel_format_planar_yuvj422():
    r = Renderer()
    try:
        r.register_input("input_0")
        rgba = _rgb_test_pattern(IN_RES)
        import jax.numpy as jnp

        from smelter_tpu.ops import color_convert as cc
        from smelter_tpu.core.types import Frame

        rgba_f = jnp.asarray(rgba.astype(np.float32) / 255.0)
        y, u, v = (np.asarray(p) for p in
                   cc.rgba_to_planar_yuv422(rgba_f, full_range=True))
        frame = Frame(data=(y, u, v), format=PixelFormat.PLANAR_YUVJ422,
                      resolution=IN_RES, pts=0.0)
        r.update_scene(
            "out",
            comp.View(background_color=BLUE,
                      children=[comp.Rescaler(child=_inputs(1)[0])]),
            RES, PixelFormat.RGBA,
        )
        out = r.render(
            FrameSet(pts=0.0, frames={"input_0": frame})
        ).frames["out"]
        assert_snapshot("pixel_format_planar_yuvj422", out)
    finally:
        r.close()


def test_view_rotation_75deg_bordered():
    """High residual angle through the barrel-shear path (three shears at
    near-worst-case |tan(theta/2)|) with a border."""
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(background_color=BLUE, children=[comp.View(
                position=AbsolutePosition(width=160.0, height=90.0,
                                          top=45.0, left=80.0,
                                          rotation_degrees=75.0),
                background_color=WHITE,
                children=_inputs(1),
            )]),
            "view_rotation_75deg", 1,
        )
    finally:
        r.close()


def test_tiles_13_inputs():
    """Odd non-square count: the optimal-grid algorithm balances 13 tiles
    into mixed-length rows (tiles.rs:59-100 behavior)."""
    r = _renderer(13)
    try:
        _render(
            r,
            comp.Tiles(background_color=DARK, children=_inputs(13)),
            "tiles_13_inputs", 13,
        )
    finally:
        r.close()


def test_rescaler_fill_wide_slot_crops_top_bottom():
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(background_color=BLUE, children=[comp.View(
                position=AbsolutePosition(width=300.0, height=60.0,
                                          top=60.0, left=10.0),
                children=[comp.Rescaler(child=_inputs(1)[0],
                                        mode=RescaleMode.FILL)],
            )]),
            "rescaler_fill_wide_slot", 1,
        )
    finally:
        r.close()


def test_view_border_radius_circle():
    """Radius >= half the side: the rounded rect degenerates toward a
    circle/capsule; the SDF must clamp radii like border_radius.rs."""
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(background_color=BLUE, children=[comp.View(
                position=AbsolutePosition(width=120.0, height=120.0,
                                          top=30.0, left=100.0),
                border_radius=BorderRadius(200.0, 200.0, 200.0, 200.0),
                background_color=WHITE,
                children=_inputs(1),
            )]),
            "view_border_radius_circle", 1,
        )
    finally:
        r.close()
