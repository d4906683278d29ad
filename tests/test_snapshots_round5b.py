"""Final-round golden-snapshot extensions: the reference render-test
behaviors still uncovered after round 5's first pass — portrait-aspect
tiles (both the portrait-INPUT and portrait-OUTPUT branches of the
optimal-grid search, `tiles.rs:59-100`), overflow=visible rows
(`view.rs:constant_width_views_row_with_overflow_visible`), box-shadow
offsets and shadow-over-sibling stacking (`view.rs:box_shadow_offset_30`,
`box_shadow_sibling`), border-radius clipping under a large border width
(`view.rs:border_radius_clipping_large_border_width`), a fit rescale into
a much smaller slot (`rescaler.rs:fit_input_stream_higher_aspect_ratio_
small_resolution`), and the composite video-call-with-labels scene
(`tiles.rs:video_call_with_labels`).

Regenerate with SMELTER_UPDATE_SNAPSHOTS=1 and visually diff.
"""

from harness import assert_snapshot, make_test_input
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
    Overflow,
    RescaleMode,
    StaticPosition,
    TextDimensions,
)
from smelter_tpu.scene.layout_types import BorderRadius, BoxShadow

RES = Resolution(320, 180)
IN_RES = Resolution(160, 90)
PORTRAIT_IN = Resolution(90, 160)

BLUE = RGBAColor(0, 0, 128, 255)
RED = RGBAColor(180, 30, 30, 255)
GREEN = RGBAColor(30, 160, 60, 255)
WHITE = RGBAColor(255, 255, 255, 255)
DARK = RGBAColor(24, 24, 24, 255)
SHADOW = RGBAColor(0, 0, 0, 200)


def _render(root, name, n_inputs=0, res=RES, in_res=IN_RES):
    r = Renderer()
    try:
        for i in range(n_inputs):
            r.register_input(f"input_{i}")
        r.update_scene("out", root, res, PixelFormat.RGBA)
        frames = {
            f"input_{i}": make_test_input(i, in_res)
            for i in range(n_inputs)
        }
        out = r.render(FrameSet(pts=0.0, frames=frames)).frames["out"]
        assert_snapshot(name, out)
    finally:
        r.close()


def _inputs(n):
    return [comp.InputStream(input_id=f"input_{i}") for i in range(n)]


# ------------------------------------------------------- portrait tiles


def test_tiles_portrait_inputs():
    """Portrait-aspect INPUTS in a landscape grid: fit letterboxes each
    tile horizontally (tiles.rs:tiles_03_portrait_inputs)."""
    _render(
        comp.Tiles(children=_inputs(3), background_color=DARK, margin=4.0),
        "tiles_03_portrait_inputs",
        n_inputs=3,
        in_res=PORTRAIT_IN,
    )


def test_tiles_on_portrait_output():
    """Landscape inputs on a portrait OUTPUT canvas: the optimal-grid
    search flips to a single column (tiles.rs:tiles_03_inputs_on_
    portrait_output)."""
    _render(
        comp.Tiles(children=_inputs(3), background_color=DARK, margin=4.0),
        "tiles_03_on_portrait_output",
        n_inputs=3,
        res=Resolution(180, 320),
    )


# ---------------------------------------------------- overflow visible


def test_view_overflow_visible_row():
    """Constant-width children exceeding the parent row stay unscaled and
    spill past the parent bounds (view.rs:constant_width_views_row_with_
    overflow_visible)."""
    children = [
        comp.View(
            position=StaticPosition(width=100.0),
            background_color=c,
        )
        for c in (RED, GREEN, BLUE, WHITE)
    ]
    _render(
        comp.View(
            background_color=DARK,
            children=[
                comp.View(
                    position=AbsolutePosition(
                        width=240.0, height=100.0, top=40.0, left=20.0
                    ),
                    background_color=RGBAColor(60, 60, 60, 255),
                    overflow=Overflow.VISIBLE,
                    children=children,
                )
            ],
        ),
        "view_overflow_visible_row",
    )


# -------------------------------------------------------- shadow cases


def test_box_shadow_offset():
    """Shadow displaced by (offset_x, offset_y)=(18, 12): visible only
    below-right of the box (view.rs:box_shadow_offset_30)."""
    _render(
        comp.View(
            background_color=BLUE,
            children=[
                comp.View(
                    position=AbsolutePosition(
                        width=140.0, height=80.0, top=40.0, left=70.0
                    ),
                    background_color=WHITE,
                    border_radius=BorderRadius(12.0, 12.0, 12.0, 12.0),
                    box_shadow=[
                        BoxShadow(
                            offset_x=18.0,
                            offset_y=12.0,
                            blur_radius=14.0,
                            color=SHADOW,
                        )
                    ],
                )
            ],
        ),
        "view_box_shadow_offset",
    )


def test_box_shadow_over_sibling():
    """A later sibling's shadow falls ON TOP of an earlier sibling's
    surface (paint order; view.rs:box_shadow_sibling)."""
    _render(
        comp.View(
            background_color=DARK,
            children=[
                comp.View(
                    position=AbsolutePosition(
                        width=160.0, height=120.0, top=20.0, left=20.0
                    ),
                    background_color=GREEN,
                ),
                comp.View(
                    position=AbsolutePosition(
                        width=120.0, height=80.0, top=50.0, left=130.0
                    ),
                    background_color=WHITE,
                    border_radius=BorderRadius(10.0, 10.0, 10.0, 10.0),
                    box_shadow=[
                        BoxShadow(blur_radius=24.0, color=SHADOW)
                    ],
                ),
            ],
        ),
        "view_box_shadow_over_sibling",
    )


# ----------------------------------------- radius clipping, big border


def test_border_radius_large_border_clip():
    """Children clip to the parent's rounded content box even when the
    border eats most of the radius (view.rs:border_radius_clipping_
    large_border_width)."""
    _render(
        comp.View(
            background_color=DARK,
            children=[
                comp.View(
                    position=AbsolutePosition(
                        width=240.0, height=140.0, top=20.0, left=40.0
                    ),
                    background_color=BLUE,
                    border_radius=BorderRadius(40.0, 40.0, 40.0, 40.0),
                    border_width=18.0,
                    border_color=WHITE,
                    children=[comp.InputStream(input_id="input_0")],
                )
            ],
        ),
        "view_radius_large_border_clip",
        n_inputs=1,
    )


def test_border_radius_degenerate_clamp():
    """radius=500 on a 100x100 box: the radius clamps to half the BORDERED
    rect (reference with_border grows the rect by 2x border_width, then
    clip_to_size caps each corner — view.rs:border_radius_clipping)."""
    _render(
        comp.View(
            background_color=RGBAColor(255, 255, 0, 255),
            children=[
                comp.View(
                    position=AbsolutePosition(
                        width=100.0, height=50.0, top=25.0, left=25.0
                    ),
                    background_color=RED,
                    border_radius=BorderRadius(500.0, 500.0, 500.0, 500.0),
                )
            ],
        ),
        "view_radius_degenerate_clamp",
    )


def test_border_radius_degenerate_clamp_large_border():
    """radius=500 AND border_width=100 on a 100x100 box: the border eats
    the whole interior; the drawn rect is the grown 300x300 box (reference
    view.rs:border_radius_clipping_large_border_width semantics —
    position.rs:with_border + types.rs:clip_to_size)."""
    _render(
        comp.View(
            background_color=RGBAColor(255, 255, 0, 255),
            children=[
                comp.View(
                    position=AbsolutePosition(
                        width=100.0, height=100.0, top=25.0, left=25.0
                    ),
                    background_color=RED,
                    border_radius=BorderRadius(500.0, 500.0, 500.0, 500.0),
                    border_width=100.0,
                    border_color=BLUE,
                )
            ],
        ),
        "view_radius_degenerate_clamp_large_border",
    )


# -------------------------------------------------- rescaler small slot


def test_rescaler_fit_small_resolution():
    """Wide input fitted into a much smaller slot than its natural size
    (rescaler.rs:fit_input_stream_higher_aspect_ratio_small_resolution)."""
    _render(
        comp.View(
            background_color=DARK,
            children=[
                comp.Rescaler(
                    child=comp.InputStream(input_id="input_0"),
                    position=AbsolutePosition(
                        width=64.0, height=64.0, top=58.0, left=128.0
                    ),
                    mode=RescaleMode.FIT,
                )
            ],
        ),
        "rescaler_fit_small_resolution",
        n_inputs=1,
        in_res=Resolution(320, 90),
    )


# --------------------------------------------- shader struct/list params


def test_shader_circle_layout_params():
    """User shader laying out its input textures on a circle driven by a
    nested struct/list param (shader.rs reference test
    user_params_circle_layout: params select per-texture placement)."""
    r = Renderer()
    try:
        for i in range(4):
            r.register_input(f"input_{i}")
        r.register_shader(
            "circle_layout",
            "def main(inputs, params, resolution, time):\n"
            "    w, h = resolution[0], resolution[1]\n"
            "    canvas = jnp.zeros((h, w, 4), jnp.float32)\n"
            "    cx, cy = params['center']['x'], params['center']['y']\n"
            "    radius = params['radius']\n"
            "    for i, ang in enumerate(params['angles_deg']):\n"
            "        tile = inputs[i][::2, ::2]\n"
            "        th, tw = tile.shape[0], tile.shape[1]\n"
            "        a = ang * math.pi / 180.0\n"
            "        x = jnp.round(cx + radius * jnp.cos(a) - tw / 2)\n"
            "        y = jnp.round(cy + radius * jnp.sin(a) - th / 2)\n"
            "        canvas = lax.dynamic_update_slice(\n"
            "            canvas, tile,\n"
            "            (y.astype(jnp.int32), x.astype(jnp.int32),\n"
            "             jnp.zeros((), jnp.int32)))\n"
            "    return canvas\n",
        )
        root = comp.Shader(
            shader_id="circle_layout",
            children=_inputs(4),
            shader_param={
                "center": {"x": 160.0, "y": 90.0},
                "radius": 55.0,
                "angles_deg": [0.0, 90.0, 180.0, 270.0],
            },
            width=float(RES.width),
            height=float(RES.height),
        )
        r.update_scene("out", root, RES, PixelFormat.RGBA)
        frames = {
            f"input_{i}": make_test_input(i, IN_RES) for i in range(4)
        }
        out = r.render(FrameSet(pts=0.0, frames=frames)).frames["out"]
        assert_snapshot("shader_circle_layout", out)
    finally:
        r.close()


# ------------------------------------------------ composite video call


def test_video_call_with_labels():
    """Two feeds side by side, each with a name-tag overlay anchored to
    the bottom-left of its tile (tiles.rs:video_call_with_labels)."""

    def feed(i, label):
        return comp.View(
            children=[
                comp.Rescaler(
                    child=comp.InputStream(input_id=f"input_{i}"),
                    position=AbsolutePosition(
                        width=152.0, height=164.0, top=0.0, left=0.0
                    ),
                    mode=RescaleMode.FILL,
                ),
                comp.View(
                    position=AbsolutePosition(
                        width=70.0, height=20.0, top=138.0, left=6.0
                    ),
                    background_color=RGBAColor(0, 0, 0, 160),
                    border_radius=BorderRadius(4.0, 4.0, 4.0, 4.0),
                    children=[
                        comp.Text(
                            text=label,
                            font_size=12.0,
                            color=WHITE,
                            dimensions=TextDimensions(mode="fitted"),
                        )
                    ],
                ),
            ],
            position=StaticPosition(width=152.0),
            background_color=RGBAColor(40, 40, 40, 255),
        )

    _render(
        comp.View(
            background_color=DARK,
            padding=comp.Padding(top=8.0, left=8.0, right=8.0, bottom=8.0),
            children=[
                feed(0, "Alice"),
                comp.View(position=StaticPosition(width=8.0)),
                feed(1, "Bob"),
            ],
        ),
        "video_call_with_labels",
        n_inputs=2,
    )
