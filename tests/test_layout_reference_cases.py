"""Layout-geometry mirrors of the reference's render_tests scene matrix.

Each case reproduces a scene from `integration-tests/src/render_tests/`
(view.rs / rescaler.rs / tiles.rs) at the reference's default 640x360
canvas and asserts the flattened layout geometry the reference snapshot
encodes (positions, sizes, clip masks, paint order). The reference's
committed PNGs live in an un-vendored git submodule, so geometry — not
pixels — is the comparable artifact; the pixel side (SDF edges, borders,
shadows, resampling) is covered by tests/test_renderer.py goldens.
"""

import pytest

from smelter_tpu.core.types import RGBAColor, Resolution
from smelter_tpu.scene import components as comp
from smelter_tpu.scene.layout_types import RenderChildNode, RenderColor

from tests.test_layout import _flatten

CANVAS = (640.0, 360.0)

RED = RGBAColor(255, 0, 0)
GREEN = RGBAColor(0, 255, 0)
BLUE = RGBAColor(0, 0, 255)
YELLOW = RGBAColor(255, 255, 0)
CYAN = RGBAColor(0, 255, 255)
MAGENTA = RGBAColor(255, 0, 255)
WHITE = RGBAColor(255, 255, 255)


def _rects(layouts):
    return [(l.left, l.top, l.width, l.height) for l in layouts]


def _colors(layouts):
    return [
        l.content.color if isinstance(l.content, RenderColor) else None
        for l in layouts
    ]


# ---------------------------------------------------------------------------
# view.rs
# ---------------------------------------------------------------------------


def test_constant_width_views_row():
    """view.rs:193 constant_width_views_row: 3x 300-wide children overflow
    a 640 canvas; widths are kept (no shrinking in hidden mode)."""
    scene = comp.View(
        background_color=WHITE,
        children=[
            comp.View(background_color=c,
                      position=comp.StaticPosition(width=300.0))
            for c in (RED, GREEN, BLUE)
        ],
    )
    layouts = _flatten(scene, CANVAS)
    root, c1, c2, c3 = layouts
    assert (c1.left, c1.width) == (0, 300)
    assert (c2.left, c2.width) == (300, 300)
    assert (c3.left, c3.width) == (600, 300)  # extends past 640: clipped
    for c in (c1, c2, c3):
        assert c.height == 360


def test_overflow_hidden_masks_escaping_absolute_child():
    """view.rs:229 constant_width_views_row_with_overflow_hidden: a 500-wide
    absolute child at left=-100 inside a 300-wide middle sibling is clipped
    to the sibling's rect."""
    scene = comp.View(children=[
        comp.View(background_color=RED, position=comp.StaticPosition(width=300.0)),
        comp.View(
            background_color=GREEN, position=comp.StaticPosition(width=300.0),
            overflow=comp.Overflow.HIDDEN,
            children=[comp.View(
                background_color=YELLOW,
                position=comp.AbsolutePosition(
                    width=500.0, height=100.0, left=-100.0, top=100.0,
                ),
            )],
        ),
        comp.View(background_color=BLUE, position=comp.StaticPosition(width=300.0)),
    ])
    layouts = _flatten(scene, CANVAS)
    yellow = [l for l in layouts
              if isinstance(l.content, RenderColor)
              and l.content.color == YELLOW][0]
    # absolute placement is relative to the middle sibling at x=300
    assert (yellow.left, yellow.top, yellow.width, yellow.height) \
        == (200, 100, 500, 100)
    # clipped by the parent's rect (300..600)
    assert any(
        m.left == 300 and m.width == 300 and m.top == 0 and m.height == 360
        for m in yellow.masks
    ), yellow.masks


def test_overflow_visible_does_not_mask():
    """view.rs:276 ..._with_overflow_visible: same scene, overflow visible —
    the escaping child carries no parent clip mask."""
    scene = comp.View(children=[
        comp.View(background_color=RED, position=comp.StaticPosition(width=300.0)),
        comp.View(
            background_color=GREEN, position=comp.StaticPosition(width=300.0),
            overflow=comp.Overflow.VISIBLE,
            children=[comp.View(
                background_color=YELLOW,
                position=comp.AbsolutePosition(
                    width=500.0, height=100.0, left=-100.0, top=100.0,
                ),
            )],
        ),
        comp.View(background_color=BLUE, position=comp.StaticPosition(width=300.0)),
    ])
    layouts = _flatten(scene, CANVAS)
    yellow = [l for l in layouts
              if isinstance(l.content, RenderColor)
              and l.content.color == YELLOW][0]
    assert (yellow.left, yellow.top) == (200, 100)
    assert not any(
        m.left == 300 and m.width == 300 for m in yellow.masks
    ), yellow.masks


def test_overflow_fit_scales_static_children():
    """view.rs:324 ..._with_overflow_fit: 3x 200x200 static children in a
    300-wide fit parent scale by 300/600 = 0.5 (uniform)."""
    scene = comp.View(children=[
        comp.View(background_color=RED),
        comp.View(
            background_color=GREEN, position=comp.StaticPosition(width=300.0),
            overflow=comp.Overflow.FIT,
            children=[
                comp.View(background_color=c,
                          position=comp.StaticPosition(width=200.0, height=200.0))
                for c in (CYAN, YELLOW, MAGENTA)
            ],
        ),
        comp.View(background_color=BLUE),
    ])
    layouts = _flatten(scene, CANVAS)
    by_color = {l.content.color: l for l in layouts
                if isinstance(l.content, RenderColor)}
    # parent starts after the RED dynamic child: (640-300)/2 = 170 wide
    green_left = by_color[GREEN].left
    cyan = by_color[CYAN]
    assert cyan.width == pytest.approx(100.0)
    assert cyan.height == pytest.approx(100.0)
    assert cyan.left == pytest.approx(green_left)
    assert by_color[YELLOW].left == pytest.approx(green_left + 100.0)
    assert by_color[MAGENTA].left == pytest.approx(green_left + 200.0)


def test_dynamic_and_constant_width_views_row():
    """view.rs:414 dynamic_and_constant_width_views_row: dynamic children
    share the leftover after constant-width siblings."""
    scene = comp.View(
        background_color=WHITE,
        children=[
            comp.View(background_color=RED),
            comp.View(background_color=GREEN,
                      position=comp.StaticPosition(width=300.0)),
            comp.View(background_color=BLUE),
        ],
    )
    layouts = _flatten(scene, CANVAS)
    _, c1, c2, c3 = layouts
    assert (c1.left, c1.width) == (0, 170)
    assert (c2.left, c2.width) == (170, 300)
    assert (c3.left, c3.width) == (470, 170)


def test_absolute_right_bottom_offsets():
    """view.rs:514/545: RightOffset(50)/TopOffset(50) with a 400x200 child
    on 640x360 → left = 640-400-50 = 190."""
    scene = comp.View(children=[
        comp.View(background_color=RED),
        comp.View(
            background_color=GREEN,
            position=comp.AbsolutePosition(width=400.0, height=200.0,
                                           right=50.0, top=50.0),
        ),
        comp.View(background_color=BLUE),
    ])
    layouts = _flatten(scene, CANVAS)
    green = [l for l in layouts
             if isinstance(l.content, RenderColor)
             and l.content.color == GREEN][0]
    assert (green.left, green.top, green.width, green.height) \
        == (190, 50, 400, 200)


def test_absolute_child_paint_order_follows_child_index():
    """view.rs:514 vs :545: an absolute child placed mid-list paints UNDER
    later static siblings; placed last it paints over them."""
    mid = comp.View(children=[
        comp.View(background_color=RED),
        comp.View(background_color=GREEN,
                  position=comp.AbsolutePosition(width=400.0, height=200.0,
                                                 right=50.0, top=50.0)),
        comp.View(background_color=BLUE),
    ])
    layouts = _flatten(mid, CANVAS)
    colors = [l.content.color for l in layouts
              if isinstance(l.content, RenderColor)]
    assert colors.index(GREEN) < colors.index(BLUE)

    last = comp.View(children=[
        comp.View(background_color=RED),
        comp.View(background_color=BLUE),
        comp.View(background_color=GREEN,
                  position=comp.AbsolutePosition(width=400.0, height=200.0,
                                                 right=50.0, top=50.0)),
    ])
    layouts = _flatten(last, CANVAS)
    colors = [l.content.color for l in layouts
              if isinstance(l.content, RenderColor)]
    assert colors.index(GREEN) > colors.index(BLUE)


def test_static_children_ignore_absolute_sibling_space():
    """view.rs:514: static siblings split the full canvas as if the
    absolute sibling were absent (RED and BLUE get 320 each)."""
    scene = comp.View(children=[
        comp.View(background_color=RED),
        comp.View(background_color=GREEN,
                  position=comp.AbsolutePosition(width=400.0, height=200.0,
                                                 right=50.0, top=50.0)),
        comp.View(background_color=BLUE),
    ])
    layouts = _flatten(scene, CANVAS)
    by_color = {l.content.color: l for l in layouts
                if isinstance(l.content, RenderColor)}
    assert (by_color[RED].left, by_color[RED].width) == (0, 320)
    assert (by_color[BLUE].left, by_color[BLUE].width) == (320, 320)


# ---------------------------------------------------------------------------
# rescaler.rs
# ---------------------------------------------------------------------------


def _rescaler_child(layouts):
    return [l for l in layouts if isinstance(l.content, RenderChildNode)][0]


def test_fit_inverted_aspect_ratio_centers():
    """rescaler.rs:416 fit_input_stream_inverted_aspect_ratio: 360x640
    portrait into 640x360 → height-bound, 202.5x360 centered."""
    scene = comp.Rescaler(child=comp.InputStream(input_id="a"))
    layouts = _flatten(scene, CANVAS, inputs={"a": Resolution(360, 640)})
    c = _rescaler_child(layouts)
    assert c.height == pytest.approx(360.0)
    assert c.width == pytest.approx(360.0 * 360.0 / 640.0)
    assert c.left == pytest.approx((640.0 - c.width) / 2.0)
    assert c.top == pytest.approx(0.0)


def test_fit_align_bottom_right():
    """rescaler.rs:380 fit_input_stream_inverted_aspect_ratio_align_bottom_right."""
    scene = comp.Rescaler(
        child=comp.InputStream(input_id="a"),
        horizontal_align=comp.HorizontalAlign.RIGHT,
        vertical_align=comp.VerticalAlign.BOTTOM,
    )
    layouts = _flatten(scene, CANVAS, inputs={"a": Resolution(360, 640)})
    c = _rescaler_child(layouts)
    assert c.left + c.width == pytest.approx(640.0)
    assert c.top + c.height == pytest.approx(360.0)


def test_fill_inverted_aspect_ratio_align_top_left():
    """rescaler.rs:189 fill_input_stream_inverted_aspect_ratio_align_top_left:
    360x640 into 640x360 fill → width-bound scale 640/360, top-left pinned,
    bottom cropped by mask."""
    scene = comp.Rescaler(
        child=comp.InputStream(input_id="a"), mode=comp.RescaleMode.FILL,
        horizontal_align=comp.HorizontalAlign.LEFT,
        vertical_align=comp.VerticalAlign.TOP,
    )
    layouts = _flatten(scene, CANVAS, inputs={"a": Resolution(360, 640)})
    c = _rescaler_child(layouts)
    scale = 640.0 / 360.0
    assert (c.left, c.top) == (0, 0)
    assert c.width == pytest.approx(640.0)
    assert c.height == pytest.approx(640.0 * scale)
    assert c.masks, "fill overflow must be clipped"


def test_fill_matching_aspect_ratio_is_exact():
    """rescaler.rs:297 fill_input_stream_matching_aspect_ratio."""
    scene = comp.Rescaler(child=comp.InputStream(input_id="a"),
                          mode=comp.RescaleMode.FILL)
    layouts = _flatten(scene, CANVAS, inputs={"a": Resolution(1280, 720)})
    c = _rescaler_child(layouts)
    assert (c.left, c.top, c.width, c.height) == (0, 0, 640, 360)


# ---------------------------------------------------------------------------
# tiles.rs
# ---------------------------------------------------------------------------


def _tiles(n, canvas=CANVAS, aspect=(16, 9), in_res=Resolution(640, 360)):
    scene = comp.Tiles(
        children=[comp.InputStream(input_id=f"i{k}") for k in range(n)],
        tile_aspect_ratio=aspect,
    )
    inputs = {f"i{k}": in_res for k in range(n)}
    layouts = _flatten(scene, canvas, inputs=inputs)
    return [l for l in layouts if isinstance(l.content, RenderChildNode)]


def test_tiles_01_fills_canvas():
    """tiles.rs:74 tiles_01_inputs: one 16:9 tile fills a 16:9 canvas."""
    (c,) = _tiles(1)
    assert (c.left, c.top, c.width, c.height) == (0, 0, 640, 360)


def test_tiles_02_side_by_side_vertically_centered():
    """tiles.rs:86 tiles_02_inputs: two tiles side by side, 320x180,
    vertically centered."""
    tiles = _tiles(2)
    assert sorted((c.left, c.top, c.width, c.height) for c in tiles) == [
        (0, 90, 320, 180),
        (320, 90, 320, 180),
    ]


def test_tiles_03_grid_with_centered_last_row():
    """tiles.rs:98 tiles_03_inputs: 2x2 grid, 3rd tile centered in the
    bottom row (reference centers partial rows)."""
    tiles = _tiles(3)
    rects = sorted((c.left, c.top, c.width, c.height) for c in tiles)
    assert rects == [
        (0, 0, 320, 180),
        (160, 180, 320, 180),
        (320, 0, 320, 180),
    ]


def test_tiles_05_inputs_grid():
    """tiles.rs:122 tiles_05_inputs: 5 tiles → 3x2 grid (213.33x120 tiles
    beat 2x3's 160x90), partial last row centered."""
    tiles = _tiles(5)
    w = 640.0 / 3.0
    h = w * 9.0 / 16.0
    top_off = (360.0 - 2 * h) / 2.0
    xs = sorted(round(c.left, 2) for c in tiles if abs(c.top - top_off) < 1e-6)
    assert xs == [0.0, round(w, 2), round(2 * w, 2)]
    bottom = [c for c in tiles if c.top > top_off + 1]
    assert len(bottom) == 2
    bx = sorted(round(c.left, 2) for c in bottom)
    assert bx == [round((640 - 2 * w) / 2, 2),
                  round((640 - 2 * w) / 2 + w, 2)]


def test_tiles_portrait_aspect_ratio():
    """tiles.rs:146 tiles_01_portrait_inputs: tile_aspect_ratio (1,2) on a
    landscape canvas → one 180x360 tile centered; the 360x640 input FITS
    inside it at 180x320 (fit scale min(180/360, 360/640) = 0.5)."""
    (c,) = _tiles(1, aspect=(1, 2), in_res=Resolution(360, 640))
    assert (c.width, c.height) == (180, 320)
    assert c.left == pytest.approx((640 - 180) / 2.0)
    assert c.top == pytest.approx((360 - 320) / 2.0)


# ---------------------------------------------------------------------------
# transition.rs
# ---------------------------------------------------------------------------


def _transition_flatten(scene1, scene2, pts_list, canvas=CANVAS):
    """update_scene twice (reference TestRunner pattern) and flatten the
    second scene at each pts."""
    from smelter_tpu.scene.scene_state import OutputScene, SceneState

    state = SceneState()
    res = Resolution(int(canvas[0]), int(canvas[1]))
    n1 = state.update_scene(
        OutputScene("out", scene1, res), lambda t: (0, 0), lambda i: (0, 0)
    )
    n1.node.params.layouts(0.0, [])
    state.register_render_event(0.0, {})
    n2 = state.update_scene(
        OutputScene("out", scene2, res), lambda t: (0, 0), lambda i: (0, 0)
    )
    out = []
    for pts in pts_list:
        nested = n2.node.params.layouts(pts, [])
        out.append(nested.flatten([], res))
    return out


def _width_scene(width, transition=None):
    """transition.rs:173 change_view_width scene builder."""
    return comp.View(
        background_color=WHITE,
        children=[
            comp.View(background_color=RED,
                      position=comp.StaticPosition(width=50.0)),
            comp.View(id="resize_1", background_color=GREEN,
                      position=comp.StaticPosition(width=width),
                      transition=transition),
            comp.View(background_color=BLUE),
        ],
    )


def test_change_view_width_linear_midpoints():
    """transition.rs:173 change_view_width: 50→250 over a linear 10s
    transition; the reference snapshots at 0/2.5/5/7.5/10s encode widths
    50/100/150/200/250, with the BLUE sibling reflowing."""
    flats = _transition_flatten(
        _width_scene(50.0),
        _width_scene(250.0, comp.Transition(duration=10.0)),
        [0.0, 2.5, 5.0, 7.5, 10.0],
    )
    expected = [50.0, 100.0, 150.0, 200.0, 250.0]
    for layouts, want in zip(flats, expected):
        by_color = {l.content.color: l for l in layouts
                    if isinstance(l.content, RenderColor)}
        green = by_color[GREEN]
        blue = by_color[BLUE]
        assert green.width == pytest.approx(want), want
        assert green.left == pytest.approx(50.0)
        # BLUE takes the remainder of the row
        assert blue.left == pytest.approx(50.0 + want)
        assert blue.width == pytest.approx(640.0 - 50.0 - want)


def _absolute_scene(width, height, top, right, transition=None):
    """transition.rs:249 absolute_view scene builder."""
    return comp.View(
        background_color=WHITE,
        children=[comp.View(
            id="resize_1", background_color=GREEN,
            position=comp.AbsolutePosition(width=width, height=height,
                                           top=top, right=right),
            transition=transition,
        )],
    )


def test_change_view_absolute_linear():
    """transition.rs:275 change_view_absolute: 200x200@(top 20, right 20) →
    640x360@(0,0) over linear 10s; at 5s everything is halfway."""
    flats = _transition_flatten(
        _absolute_scene(200.0, 200.0, 20.0, 20.0),
        _absolute_scene(640.0, 360.0, 0.0, 0.0,
                        comp.Transition(duration=10.0)),
        [5.0, 10.0],
    )
    mid = [l for l in flats[0]
           if isinstance(l.content, RenderColor) and l.content.color == GREEN][0]
    assert mid.width == pytest.approx(420.0)
    assert mid.height == pytest.approx(280.0)
    assert mid.top == pytest.approx(10.0)
    # right offset 20→0 halves to 10: left = 640 - width - right
    assert mid.left == pytest.approx(640.0 - 420.0 - 10.0)
    end = [l for l in flats[1]
           if isinstance(l.content, RenderColor) and l.content.color == GREEN][0]
    assert (end.left, end.top, end.width, end.height) == (0, 0, 640, 360)


def test_change_view_absolute_cubic_bezier_differs_from_linear():
    """transition.rs:290 change_view_absolute_cubic_bezier: the (0.83, 0.4,
    0.17, 1.0) ease must be monotonic, land exactly at the target, and
    differ from linear at the midpoint."""
    mk = lambda tr: _absolute_scene(200.0, 200.0, 0.0, 0.0 if tr is None else 440.0,
                                    tr)
    bezier = comp.Transition(
        duration=5.0, easing=comp.Easing.cubic_bezier(0.83, 0.4, 0.17, 1.0)
    )
    flats = _transition_flatten(
        _absolute_scene(200.0, 200.0, 0.0, 0.0),
        _absolute_scene(200.0, 200.0, 0.0, 440.0, bezier),
        [1.25, 2.5, 3.75, 5.0],
    )
    lefts = []
    for layouts in flats:
        g = [l for l in layouts
             if isinstance(l.content, RenderColor) and l.content.color == GREEN][0]
        lefts.append(g.left)
    # right offset grows 0→440 so left shrinks 440→0, monotonically
    assert lefts[0] > lefts[1] > lefts[2] > lefts[3]
    assert lefts[3] == pytest.approx(0.0)
    # midpoint must differ from the linear midpoint (220 offset → left 220)
    assert abs(lefts[1] - 220.0) > 5.0


def test_transition_interrupt_restarts_from_current_position():
    """transition.rs:377 update_scene_with_transition_interrupt: a
    should_interrupt update mid-flight starts from the CURRENT interpolated
    value, not the original target."""
    state_scenes = _transition_flatten  # alias for clarity

    from smelter_tpu.scene.scene_state import OutputScene, SceneState

    state = SceneState()
    res = Resolution(640, 360)
    tr = comp.Transition(duration=10.0, should_interrupt=True)
    n1 = state.update_scene(
        OutputScene("out", _width_scene(50.0), res),
        lambda t: (0, 0), lambda i: (0, 0))
    n1.node.params.layouts(0.0, [])
    state.register_render_event(0.0, {})
    n2 = state.update_scene(
        OutputScene("out", _width_scene(250.0, tr), res),
        lambda t: (0, 0), lambda i: (0, 0))
    n2.node.params.layouts(5.0, [])          # halfway: width 150
    state.register_render_event(5.0, {})
    # interrupt: new target 50 — must start from ~150, not jump
    n3 = state.update_scene(
        OutputScene("out", _width_scene(50.0, tr), res),
        lambda t: (0, 0), lambda i: (0, 0))
    just_after = n3.node.params.layouts(5.0, []).flatten([], res)
    green = [l for l in just_after
             if isinstance(l.content, RenderColor) and l.content.color == GREEN][0]
    assert green.width == pytest.approx(150.0, abs=2.0)
    end = n3.node.params.layouts(15.0, []).flatten([], res)
    green_end = [l for l in end
                 if isinstance(l.content, RenderColor)
                 and l.content.color == GREEN][0]
    assert green_end.width == pytest.approx(50.0)


# ---------------------------------------------------------------------------
# tiles_transitions.rs
# ---------------------------------------------------------------------------


def test_change_order_of_3_inputs_with_id():
    """tiles_transitions.rs:173 change_order_of_3_inputs_with_id: id-tracked
    tiles animate from their old grid slot to the new one over linear 500ms;
    snapshots at 0/100/300/500ms encode straight-line interpolation."""
    from smelter_tpu.scene.scene_state import OutputScene, SceneState

    state = SceneState()
    res = Resolution(640, 360)
    in_res = [Resolution(640, 360)] * 3

    def tiles(order, transition=None):
        return comp.Tiles(
            id="tiles", transition=transition,
            children=[comp.InputStream(input_id=f"input_{k}", id=f"input_{k}")
                      for k in order],
        )

    n1 = state.update_scene(
        OutputScene("out", tiles([1, 2, 3]), res),
        lambda t: (0, 0), lambda i: (0, 0))
    n1.node.params.layouts(0.0, in_res)
    state.register_render_event(
        0.0, {f"input_{k}": Resolution(640, 360) for k in (1, 2, 3)})
    n2 = state.update_scene(
        OutputScene("out", tiles([3, 1, 2], comp.Transition(duration=0.5)), res),
        lambda t: (0, 0), lambda i: (0, 0))

    # grid slots for 3 tiles on 640x360 (test_tiles_03): (0,0) (320,0)
    # (160,180); input order maps inputs→slots.
    start = {"input_1": (0.0, 0.0), "input_2": (320.0, 0.0),
             "input_3": (160.0, 180.0)}
    end = {"input_3": (0.0, 0.0), "input_1": (320.0, 0.0),
           "input_2": (160.0, 180.0)}

    def tile_positions(pts):
        flat = n2.node.params.layouts(pts, in_res).flatten(in_res, res)
        kids = [l for l in flat if isinstance(l.content, RenderChildNode)]
        # children are emitted in the NEW order [3, 1, 2]
        order = ["input_3", "input_1", "input_2"]
        return {name: (k.left, k.top) for name, k in zip(order, kids)}

    for pts, frac in ((0.0, 0.0), (0.1, 0.2), (0.3, 0.6), (0.5, 1.0)):
        got = tile_positions(pts)
        for name in start:
            sx, sy = start[name]
            ex, ey = end[name]
            want = (sx + (ex - sx) * frac, sy + (ey - sy) * frac)
            assert got[name][0] == pytest.approx(want[0], abs=1e-3), (pts, name)
            assert got[name][1] == pytest.approx(want[1], abs=1e-3), (pts, name)


# ---------------------------------------------------------------------------
# text.rs — TextDimensions behavioral cases
# ---------------------------------------------------------------------------


def _text(text, mode, **kw):
    dims_kw = {k: kw.pop(k) for k in ("width", "height", "max_width",
                                      "max_height") if k in kw}
    return comp.Text(text=text, font_size=24.0,
                     dimensions=comp.TextDimensions(mode=mode, **dims_kw),
                     **kw)


def test_text_dimensions_fitted_column_grows_with_content():
    """text.rs:100/118 dimensions_fitted_column_with_{long,short}_text:
    fixed width, height fitted to wrapped content — more text, more rows."""
    from smelter_tpu.render.text import TextRenderer

    tr = TextRenderer()
    short = tr.render(_text("Example text", "fitted_column", width=300.0,
                            wrap=comp.TextWrap.WORD))
    long_ = tr.render(_text(
        "Example text with a lot of content that has to wrap into several "
        "lines to fit the column width", "fitted_column", width=300.0,
        wrap=comp.TextWrap.WORD))
    assert short.width == long_.width == 300
    assert long_.height > short.height * 2


def test_text_dimensions_fitted_trims_to_content():
    """text.rs:136 dimensions_fitted: the box is exactly the shaped content
    size (no trailing dead space)."""
    from smelter_tpu.render.text import TextRenderer

    tr = TextRenderer()
    a = tr.render(_text("hi", "fitted"))
    b = tr.render(_text("hi there, much longer line", "fitted"))
    assert b.width > a.width * 3
    assert a.height == b.height  # single line each
    # rendered raster matches the declared box
    assert a.rgba.shape[1] == int(round(a.width)) or a.rgba.shape[1] >= a.width - 1


def test_text_dimensions_fixed_clips_overflow():
    """text.rs:151/169 dimensions_fixed(+with_overflow): box stays at the
    declared size regardless of content."""
    from smelter_tpu.render.text import TextRenderer

    tr = TextRenderer()
    r = tr.render(_text(
        "this content is far too long to fit in a tiny fixed box and must "
        "be clipped", "fixed", width=120.0, height=40.0))
    assert (r.width, r.height) == (120, 40)
    assert r.rgba.shape[0] == 40 and r.rgba.shape[1] == 120


def test_text_wrap_none_single_line():
    """text.rs:227 wrap_none: no wrapping — one line regardless of width."""
    from smelter_tpu.render.text import TextRenderer

    tr = TextRenderer()
    base = tr.render(_text("word", "fitted_column", width=150.0, wrap=comp.TextWrap.NONE))
    none_ = tr.render(_text(
        "many words that would wrap if wrapping were on", "fitted_column",
        width=150.0, wrap=comp.TextWrap.NONE))
    assert none_.height == base.height  # still one line


def test_text_wrap_glyph_breaks_inside_words():
    """text.rs:208 wrap_glyph vs :246 wrap_word: glyph wrap fills lines
    tighter (breaks inside words), so it needs no more lines than word
    wrap, and an unbreakable-by-word string still wraps."""
    from smelter_tpu.render.text import TextRenderer

    tr = TextRenderer()
    word = tr.render(_text("Averyveryverylongsingleword", "fitted_column",
                           width=120.0, wrap=comp.TextWrap.WORD))
    glyph = tr.render(_text("Averyveryverylongsingleword", "fitted_column",
                            width=120.0, wrap=comp.TextWrap.GLYPH))
    # glyph wrap must break the single long word into multiple lines
    assert glyph.height > word.height or glyph.height > 30


def test_border_radius_clipping_mask():
    """view.rs:621 border_radius_clipping: a child escaping a rounded,
    overflow-hidden parent carries the parent's ROUNDED clip mask (radius
    propagates into the mask, not just the rect)."""
    from smelter_tpu.scene.layout_types import BorderRadius

    scene = comp.View(children=[
        comp.View(
            background_color=GREEN,
            position=comp.StaticPosition(width=300.0),
            border_radius=BorderRadius(40, 40, 40, 40),
            overflow=comp.Overflow.HIDDEN,
            children=[comp.View(
                background_color=YELLOW,
                position=comp.AbsolutePosition(
                    width=500.0, height=100.0, left=-100.0, top=100.0),
            )],
        ),
    ])
    layouts = _flatten(scene, CANVAS)
    yellow = [l for l in layouts
              if isinstance(l.content, RenderColor)
              and l.content.color == YELLOW][0]
    rounded = [m for m in yellow.masks
               if m.width == 300 and m.radius.top_left == 40.0]
    assert rounded, yellow.masks


def test_overflow_hidden_with_input_stream_children():
    """view.rs:103 overflow_hidden_with_input_stream_children: input
    streams in a View take their NATURAL resolution as static size
    (reference scene.rs:104 `StatefulComponent::InputStream => input.size`);
    three 180x200 inputs overflow the 300-wide parent and are clipped to
    its rect."""
    scene = comp.View(children=[
        comp.View(background_color=RED,
                  position=comp.StaticPosition(width=100.0)),
        comp.View(
            background_color=GREEN,
            position=comp.StaticPosition(width=300.0),
            children=[comp.InputStream(input_id=f"i{k}") for k in range(3)],
        ),
    ])
    inputs = {f"i{k}": Resolution(180, 200) for k in range(3)}
    layouts = _flatten(scene, CANVAS, inputs=inputs)
    kids = [l for l in layouts if isinstance(l.content, RenderChildNode)]
    assert len(kids) == 3
    # natural 180x200 each, laid out in a row from the parent's x=100
    assert sorted((k.left, k.top, k.width, k.height) for k in kids) == [
        (100, 0, 180, 200),
        (280, 0, 180, 200),
        (460, 0, 180, 200),
    ]
    # the parent rect (100..400) clips the ESCAPING children; the first
    # (fully inside) needs no mask and the flatten elides it
    by_left = {k.left: k for k in kids}
    assert by_left[100.0].masks == ()
    for left in (280.0, 460.0):
        assert any(m.left == 100 and m.width == 300
                   for m in by_left[left].masks), by_left[left].masks


def test_replace_component_by_adding_id_mid_transition():
    """tiles_transitions.rs:198 replace_component_by_adding_id: anonymous
    tiles track by position index; swapping input_3 for an id-tagged
    input_4 makes slot 1 a NEW tile (hidden while its old occupant is
    still animating away), while anonymous input_2 animates from slot 1's
    old position to slot 2."""
    from smelter_tpu.scene.scene_state import OutputScene, SceneState

    state = SceneState()
    res = Resolution(640, 360)
    in_res = [Resolution(640, 360)] * 3

    def tiles(children, transition=None):
        return comp.Tiles(id="tiles", transition=transition, children=children)

    anon = lambda k: comp.InputStream(input_id=f"input_{k}")
    tagged = lambda k: comp.InputStream(input_id=f"input_{k}", id=f"input_{k}")

    n1 = state.update_scene(
        OutputScene("out", tiles([anon(1), anon(2), anon(3)]), res),
        lambda t: (0, 0), lambda i: (0, 0))
    n1.node.params.layouts(0.0, in_res)
    state.register_render_event(0.0, {f"input_{k}": Resolution(640, 360)
                                      for k in (1, 2, 3, 4)})
    n2 = state.update_scene(
        OutputScene("out",
                    tiles([anon(1), tagged(4), anon(2)],
                          comp.Transition(duration=0.5)), res),
        lambda t: (0, 0), lambda i: (0, 0))

    def kids_at(pts):
        flat = n2.node.params.layouts(pts, in_res).flatten(in_res, res)
        return [l for l in flat if isinstance(l.content, RenderChildNode)]

    mid = kids_at(0.25)
    # input_4's tile is suppressed mid-flight (slot still occupied by the
    # departing input_2): only 2 child tiles render
    assert len(mid) == 2, [(k.left, k.top) for k in mid]
    # input_2 (3rd child) is halfway from slot1 (320,0) to slot2 (160,180)
    moving = [k for k in mid if (k.left, k.top) not in ((0.0, 0.0),)]
    assert len(moving) == 1
    assert moving[0].left == pytest.approx(240.0)
    assert moving[0].top == pytest.approx(90.0)

    end = kids_at(0.6)
    assert len(end) == 3
    assert sorted((k.left, k.top) for k in end) == [
        (0.0, 0.0), (160.0, 180.0), (320.0, 0.0)]
