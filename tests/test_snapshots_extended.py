"""Extended golden-snapshot corpus (round 4): multi-step transition
sequences, the full input pixel-format set through the PRODUCTION renderer,
4K outputs at the flagship shape, fitted text modes, multi-texture shaders,
and rotated layouts with shadows/borders (the analytic rotated-SDF and
rot-shear fast paths).

Mirrors the breadth of the reference snapshot repo
(`integration-tests/src/render_tests/` + snapshot_tests.rs sequences, which
snapshot several PTSes per transition). Regenerate with
SMELTER_UPDATE_SNAPSHOTS=1 and VISUALLY diff before committing.
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
    RescaleMode,
    TextDimensions,
    Transition,
)
from smelter_tpu.scene.layout_types import BorderRadius

RES = Resolution(320, 180)
IN_RES = Resolution(160, 90)

BLUE = RGBAColor(0, 0, 128, 255)
WHITE = RGBAColor(255, 255, 255, 255)
DARK = RGBAColor(16, 16, 16, 255)


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


def _transition_sequence(r, scene0, scene1, name, n_inputs=1,
                         pts_list=(0.5, 1.0, 1.5)):
    """Snapshot a transition at several PTSes — the reference snapshot repo
    records whole sequences, not just midpoints (snapshot_tests.rs)."""
    r.update_scene("out", scene0, RES, PixelFormat.RGBA)
    r.render(FrameSet(pts=0.0, frames={
        f"input_{i}": make_test_input(i, IN_RES) for i in range(n_inputs)
    }))
    r.update_scene("out", scene1, RES, PixelFormat.RGBA)
    # two warm frames so the planner engages the traced fast paths
    for pts in (0.1, 0.2):
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


# --------------------------------------------------- transition sequences


def test_transition_spin_sequence():
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

        _transition_sequence(
            r, scene(0.0), scene(80.0, Transition(duration=2.0)),
            "seq_spin",
        )
    finally:
        r.close()


def test_transition_zoom_sequence():
    r = _renderer(1)
    try:
        def scene(w, h, top, left, tr=None):
            return comp.View(background_color=BLUE, children=[comp.View(
                id="card",
                position=AbsolutePosition(width=w, height=h, top=top,
                                          left=left),
                background_color=WHITE, transition=tr,
                children=[comp.InputStream(input_id="input_0")])])

        _transition_sequence(
            r, scene(80.0, 45.0, 70.0, 120.0),
            scene(280.0, 158.0, 10.0, 20.0, Transition(duration=2.0)),
            "seq_zoom",
        )
    finally:
        r.close()


def test_transition_slide_sequence():
    """Position-only animation (stable size/crop): the traced-position
    moving fast path."""
    r = _renderer(1)
    try:
        def scene(top, left, tr=None):
            return comp.View(background_color=BLUE, children=[comp.View(
                id="card",
                position=AbsolutePosition(width=120.0, height=68.0,
                                          top=top, left=left),
                background_color=WHITE, transition=tr,
                children=[comp.InputStream(input_id="input_0")])])

        _transition_sequence(
            r, scene(10.0, 10.0),
            scene(100.0, 190.0, Transition(duration=2.0)),
            "seq_slide",
        )
    finally:
        r.close()


def test_transition_tiles_reorder_sequence():
    """Tile reorder: id-tracked tiles swap slots and animate between them
    (tiles_transitions.rs)."""
    r = _renderer(3)
    try:
        def tiles(order, tr=None):
            return comp.Tiles(
                id="t", background_color=DARK, transition=tr,
                children=[
                    comp.InputStream(id=f"tile_{i}", input_id=f"input_{i}")
                    for i in order
                ],
            )

        _transition_sequence(
            r, tiles([0, 1, 2]),
            tiles([2, 0, 1], Transition(duration=2.0)),
            "seq_tiles_reorder", n_inputs=3,
        )
    finally:
        r.close()


def test_transition_rotozoom_midpoint():
    """Rotation AND size AND position animating simultaneously — the
    rotozoom traced fast path (barrel shears + traced resize)."""
    r = _renderer(1)
    try:
        def scene(w, h, top, left, angle, tr=None):
            return comp.View(background_color=BLUE, children=[comp.View(
                id="card",
                position=AbsolutePosition(width=w, height=h, top=top,
                                          left=left,
                                          rotation_degrees=angle),
                background_color=WHITE, transition=tr,
                children=[comp.InputStream(input_id="input_0")])])

        _transition_sequence(
            r, scene(80.0, 45.0, 20.0, 30.0, 0.0),
            scene(240.0, 135.0, 30.0, 60.0, 70.0, Transition(duration=2.0)),
            "seq_rotozoom", pts_list=(1.0,),
        )
    finally:
        r.close()


def test_transition_cubic_bezier_midpoint():
    r = _renderer(1)
    try:
        def scene(left, tr=None):
            return comp.View(background_color=BLUE, children=[comp.View(
                id="card",
                position=AbsolutePosition(width=100.0, height=60.0,
                                          top=60.0, left=left),
                background_color=WHITE, transition=tr,
                children=[comp.InputStream(input_id="input_0")])])

        _transition_sequence(
            r, scene(10.0),
            scene(210.0, Transition(
                duration=2.0,
                easing=Easing.cubic_bezier(0.65, 0.0, 0.35, 1.0),
            )),
            "seq_cubic_bezier", pts_list=(1.0,),
        )
    finally:
        r.close()


# --------------------------------------------- input pixel formats (full)


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

    def _np3(t):
        return tuple(np.asarray(p) for p in t)

    if fmt == PixelFormat.ARGB:
        return Frame(data=rgba[..., [3, 0, 1, 2]], format=fmt,
                     resolution=res, pts=0.0)
    if fmt == PixelFormat.NV12:
        y, uv = cc.rgba_to_nv12(rgba_f)
        return Frame(data=(np.asarray(y), np.asarray(uv)), format=fmt,
                     resolution=res, pts=0.0)
    if fmt == PixelFormat.PLANAR_YUV422:
        return Frame(data=_np3(cc.rgba_to_planar_yuv422(rgba_f)), format=fmt,
                     resolution=res, pts=0.0)
    if fmt == PixelFormat.PLANAR_YUV444:
        return Frame(data=_np3(cc.rgba_to_planar_yuv444(rgba_f)), format=fmt,
                     resolution=res, pts=0.0)
    if fmt == PixelFormat.PLANAR_YUVJ444:
        return Frame(
            data=_np3(cc.rgba_to_planar_yuv444(rgba_f, full_range=True)),
            format=fmt, resolution=res, pts=0.0,
        )
    if fmt in (PixelFormat.INTERLEAVED_YUYV422,
               PixelFormat.INTERLEAVED_UYVY422):
        y, u, v = (np.asarray(p)
                   for p in cc.rgba_to_planar_yuv422(rgba_f))
        h, w = y.shape
        data = np.zeros((h, w // 2, 4), np.uint8)
        if fmt == PixelFormat.INTERLEAVED_YUYV422:
            data[..., 0] = y[:, 0::2]
            data[..., 1] = u
            data[..., 2] = y[:, 1::2]
            data[..., 3] = v
        else:
            data[..., 0] = u
            data[..., 1] = y[:, 0::2]
            data[..., 2] = v
            data[..., 3] = y[:, 1::2]
        return Frame(data=data, format=fmt, resolution=res, pts=0.0)
    raise ValueError(fmt)


@pytest.mark.parametrize(
    "fmt",
    [PixelFormat.NV12, PixelFormat.ARGB, PixelFormat.PLANAR_YUV422,
     PixelFormat.PLANAR_YUV444, PixelFormat.PLANAR_YUVJ444,
     PixelFormat.INTERLEAVED_YUYV422, PixelFormat.INTERLEAVED_UYVY422],
)
def test_pixel_format_full_renderer(fmt):
    """The remaining input formats through the FULL production renderer
    (pixel_input_format_tests.rs breadth) — all snapshots are the same bar
    pattern within chroma-subsampling loss."""
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
        out = r.render(
            FrameSet(pts=0.0, frames={"input_0": frame})
        ).frames["out"]
        assert_snapshot(f"pixel_format_{fmt.value}", out)
    finally:
        r.close()


# ------------------------------------------------------------- 4K outputs


def test_4k_tiles_grid_16():
    """The flagship shape: 16 inputs tiled to a 4K canvas (the opaque
    YUV-grid program at full output scale)."""
    r = _renderer(16)
    try:
        _render(
            r,
            comp.Tiles(background_color=DARK, children=_inputs(16)),
            "res4k_tiles_16", 16, res=Resolution(3840, 2160),
        )
    finally:
        r.close()


def test_4k_general_rotated_tiles():
    """The general-compose 4K scene from bench.py's general_4k metric:
    rounded + bordered + shadowed grid with two statically rotated tiles
    (region-local groups, analytic rotated backdrops, rot-shear textures)."""
    r = _renderer(8)
    try:
        children = []
        for i in range(8):
            row, col = divmod(i, 4)
            rot = 30.0 if i == 2 else (-15.0 if i == 5 else 0.0)
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
                    width=900.0, height=1020.0,
                    top=float(row * 1080 + 30), left=float(col * 960 + 30),
                    rotation_degrees=rot,
                ),
            ))
        _render(
            r,
            comp.View(background_color=RGBAColor(8, 8, 8), children=children),
            "res4k_general_rotated", 8, res=Resolution(3840, 2160),
        )
    finally:
        r.close()


# ------------------------------------------------------------ fitted text


def test_text_fitted_trims_to_content():
    r = _renderer(0)
    try:
        _render(
            r,
            comp.View(background_color=BLUE, children=[comp.View(
                position=AbsolutePosition(width=320.0, height=60.0,
                                          top=50.0, left=0.0),
                background_color=RGBAColor(0, 0, 0, 0),
                children=[comp.Text(
                    text="fitted box",
                    font_size=28.0,
                    background_color=RGBAColor(160, 30, 30, 255),
                    dimensions=TextDimensions(mode="fitted"),
                )],
            )]),
            "text_fitted_trim",
        )
    finally:
        r.close()


def test_text_fitted_column_wraps():
    r = _renderer(0)
    try:
        _render(
            r,
            comp.View(background_color=BLUE, children=[comp.Text(
                text="fitted column wraps this long sentence into the "
                     "fixed width",
                font_size=20.0,
                wrap=comp.TextWrap.WORD,
                background_color=RGBAColor(30, 30, 30, 255),
                dimensions=TextDimensions(mode="fitted_column", width=180.0),
            )]),
            "text_fitted_column",
        )
    finally:
        r.close()


def test_text_align_right_fixed():
    r = _renderer(0)
    try:
        _render(
            r,
            comp.View(background_color=BLUE, children=[comp.Text(
                text="right aligned",
                font_size=24.0,
                align=comp.HorizontalAlign.RIGHT,
                background_color=RGBAColor(30, 30, 30, 255),
                dimensions=TextDimensions(mode="fixed", width=320.0,
                                          height=180.0),
            )]),
            "text_align_right_fixed",
        )
    finally:
        r.close()


# ------------------------------------------------------ shaders / layouts


def test_shader_two_textures_blend():
    """A shader consuming TWO input textures (multi-texture binding path,
    MAX_TEXTURES contract)."""
    r = _renderer(2)
    try:
        r.register_shader(
            "blend2",
            "def main(inputs, params, resolution, time):\n"
            "    a, b = inputs[0], inputs[1]\n"
            "    rgb = a[..., :3] * 0.5 + b[..., :3] * 0.5\n"
            "    return jnp.concatenate([rgb, a[..., 3:4]], axis=-1)\n",
        )
        _render(
            r,
            comp.Shader(shader_id="blend2", children=_inputs(2),
                        width=float(RES.width), height=float(RES.height)),
            "shader_two_textures", 2,
        )
    finally:
        r.close()


def test_rescaler_rotated_with_shadow_border():
    """Static rotation + border + radius + box shadow on one Rescaler: the
    analytic rotated color/shadow region paths plus the rot-shear texture
    path, coalesced into one union blend group."""
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(background_color=BLUE, children=[comp.Rescaler(
                child=comp.InputStream(input_id="input_0"),
                border_radius=BorderRadius(14.0, 14.0, 14.0, 14.0),
                border_width=3.0,
                border_color=RGBAColor(255, 255, 255, 220),
                box_shadow=[BoxShadow(offset_x=8.0, offset_y=8.0,
                                      blur_radius=18.0,
                                      color=RGBAColor(0, 0, 0, 170))],
                position=AbsolutePosition(width=200.0, height=110.0,
                                          top=35.0, left=60.0,
                                          rotation_degrees=20.0),
            )]),
            "rescaler_rotated_shadow_border", 1,
        )
    finally:
        r.close()


def test_rescaler_rotated_negative_no_border():
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(background_color=BLUE, children=[comp.Rescaler(
                child=comp.InputStream(input_id="input_0"),
                border_radius=BorderRadius(10.0, 10.0, 10.0, 10.0),
                position=AbsolutePosition(width=200.0, height=110.0,
                                          top=35.0, left=60.0,
                                          rotation_degrees=-25.0),
            )]),
            "rescaler_rotated_negative", 1,
        )
    finally:
        r.close()


def test_view_border_radius_asymmetric():
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(background_color=BLUE, children=[comp.View(
                position=AbsolutePosition(width=220.0, height=120.0,
                                          top=30.0, left=50.0),
                background_color=WHITE,
                border_radius=BorderRadius(40.0, 0.0, 24.0, 8.0),
                overflow=comp.Overflow.HIDDEN,
                children=[comp.InputStream(input_id="input_0")],
            )]),
            "view_border_radius_asymmetric", 1,
        )
    finally:
        r.close()


def test_view_box_shadow_large_blur():
    r = _renderer(0)
    try:
        _render(
            r,
            comp.View(background_color=BLUE, children=[comp.View(
                position=AbsolutePosition(width=140.0, height=80.0,
                                          top=50.0, left=90.0),
                background_color=WHITE,
                border_radius=BorderRadius(12.0, 12.0, 12.0, 12.0),
                box_shadow=[BoxShadow(offset_x=0.0, offset_y=0.0,
                                      blur_radius=48.0,
                                      color=RGBAColor(0, 0, 0, 220))],
            )]),
            "view_box_shadow_large_blur",
        )
    finally:
        r.close()


def test_absolute_overlap_stacking():
    """Three overlapping absolute children: later children paint on top."""
    r = _renderer(3)
    try:
        children = [
            comp.View(
                position=AbsolutePosition(width=160.0, height=90.0,
                                          top=10.0 + 25.0 * i,
                                          left=20.0 + 45.0 * i),
                background_color=WHITE,
                children=[comp.InputStream(input_id=f"input_{i}")],
            )
            for i in range(3)
        ]
        _render(r, comp.View(background_color=BLUE, children=children),
                "absolute_overlap_stacking", 3)
    finally:
        r.close()


def test_tiles_07_inputs():
    r = _renderer(7)
    try:
        _render(r, comp.Tiles(background_color=DARK, children=_inputs(7)),
                "tiles_07_inputs", 7)
    finally:
        r.close()


def test_rescaler_fill_tall_input_crops_sides():
    r = _renderer(1)
    try:
        _render(
            r,
            comp.View(background_color=BLUE, children=[comp.Rescaler(
                child=comp.InputStream(input_id="input_0"),
                mode=RescaleMode.FILL,
                position=AbsolutePosition(width=90.0, height=160.0,
                                          top=10.0, left=115.0),
            )]),
            "rescaler_fill_tall_slot", 1,
        )
    finally:
        r.close()
