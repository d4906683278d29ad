"""Property/hand-computed tests for View/Tiles/Rescaler layout + flatten
(reference: scene/view_component/layout.rs, tiles_component/tiles.rs,
rescaler_component/layout.rs, transformations/layout/flatten.rs)."""

import numpy as np

from smelter_tpu.core.types import RGBAColor, Resolution
from smelter_tpu.scene import components as comp
from smelter_tpu.scene.layout_types import (
    BorderRadius,
    ChildNodeContent,
    ColorContent,
    RenderChildNode,
    RenderColor,
)
from smelter_tpu.scene.scene_state import (
    BuildCtx,
    LayoutNode,
    OutputScene,
    SceneState,
    build_stateful,
)


def _ctx(inputs=None, prev=None, pts=0.0):
    return BuildCtx(
        prev_state=prev or {},
        last_render_pts=pts,
        input_resolutions=inputs or {},
        text_measurer=lambda t: (100.0, 20.0),
        image_store=lambda i: (64.0, 64.0),
    )


def _flatten(root_component, size, inputs=None, pts=0.0):
    ctx = _ctx(inputs=inputs, pts=pts)
    stateful = build_stateful(root_component, ctx)
    node = LayoutNode(root=stateful, size=size)
    resolutions = [inputs[k] for k in inputs] if inputs else []
    nested = node.layouts(pts, resolutions)
    return nested.flatten(resolutions, Resolution(int(size[0]), int(size[1])))


def test_view_row_two_children_split():
    scene = comp.View(
        children=[comp.View(background_color=RGBAColor(255, 0, 0)),
                  comp.View(background_color=RGBAColor(0, 0, 255))],
        background_color=RGBAColor(0, 255, 0),
    )
    layouts = _flatten(scene, (100.0, 50.0))
    # root + 2 children
    assert len(layouts) == 3
    root, c1, c2 = layouts
    assert (root.left, root.top, root.width, root.height) == (0, 0, 100, 50)
    assert (c1.left, c1.top, c1.width, c1.height) == (0, 0, 50, 50)
    assert (c2.left, c2.top, c2.width, c2.height) == (50, 0, 50, 50)


def test_view_column_fixed_plus_dynamic():
    scene = comp.View(
        direction=comp.ViewDirection.COLUMN,
        children=[
            comp.View(position=comp.StaticPosition(height=20.0),
                      background_color=RGBAColor(10, 0, 0)),
            comp.View(background_color=RGBAColor(20, 0, 0)),
            comp.View(background_color=RGBAColor(30, 0, 0)),
        ],
        background_color=RGBAColor(1, 2, 3),
    )
    layouts = _flatten(scene, (100.0, 100.0))
    _, c1, c2, c3 = layouts
    assert (c1.top, c1.height) == (0, 20)
    assert (c2.top, c2.height) == (20, 40)
    assert (c3.top, c3.height) == (60, 40)


def test_view_padding_and_absolute_child():
    scene = comp.View(
        children=[
            comp.View(
                position=comp.AbsolutePosition(
                    width=30.0, height=20.0, bottom=5.0, right=10.0
                ),
                background_color=RGBAColor(10, 0, 0),
            )
        ],
        padding=comp.Padding(top=4, right=4, bottom=4, left=4),
        background_color=RGBAColor(0, 0, 0, 255),
    )
    layouts = _flatten(scene, (100.0, 50.0))
    child = layouts[1]
    assert (child.left, child.top) == (100 - 10 - 30, 50 - 5 - 20)


def test_view_border_offsets_children():
    scene = comp.View(
        border_width=10.0,
        children=[comp.View(background_color=RGBAColor(9, 9, 9))],
    )
    layouts = _flatten(scene, (100.0, 100.0))
    child = layouts[1]
    assert (child.left, child.top) == (10, 10)
    assert (child.width, child.height) == (80, 80)


def test_input_stream_in_view_gets_child_node():
    scene = comp.View(children=[comp.InputStream(input_id="a")],
                      background_color=RGBAColor(0, 0, 0, 255))
    layouts = _flatten(scene, (100.0, 100.0), inputs={"a": Resolution(200, 100)})
    child = layouts[1]
    assert isinstance(child.content, RenderChildNode)
    assert child.content.index == 0
    assert child.content.crop.width == 200
    assert child.content.crop.height == 100


def test_rescaler_fit_centers():
    scene = comp.Rescaler(child=comp.InputStream(input_id="a"))
    layouts = _flatten(scene, (100.0, 100.0), inputs={"a": Resolution(200, 100)})
    child = [l for l in layouts if isinstance(l.content, RenderChildNode)][0]
    # fit 200x100 into 100x100 -> scale 0.5 -> 100x50 centered
    assert (child.width, child.height) == (100, 50)
    assert (child.left, child.top) == (0, 25)


def test_rescaler_fill_crops():
    scene = comp.Rescaler(
        child=comp.InputStream(input_id="a"), mode=comp.RescaleMode.FILL
    )
    layouts = _flatten(scene, (100.0, 100.0), inputs={"a": Resolution(200, 100)})
    child = [l for l in layouts if isinstance(l.content, RenderChildNode)][0]
    # fill: scale = max(0.5, 1.0) = 1.0 -> 200x100 centered, masked to 100x100
    assert (child.width, child.height) == (200, 100)
    assert child.left == -50
    assert len(child.masks) == 1


def test_tiles_2x2_grid():
    scene = comp.Tiles(
        children=[comp.InputStream(input_id=f"i{k}") for k in range(4)],
        tile_aspect_ratio=(16, 9),
    )
    inputs = {f"i{k}": Resolution(160, 90) for k in range(4)}
    layouts = _flatten(scene, (320.0, 180.0), inputs=inputs)
    children = [l for l in layouts if isinstance(l.content, RenderChildNode)]
    assert len(children) == 4
    # 2x2 grid of 160x90 tiles
    assert {(c.left, c.top) for c in children} == {
        (0, 0),
        (160, 0),
        (0, 90),
        (160, 90),
    }
    for c in children:
        assert (c.width, c.height) == (160, 90)


def test_tiles_single_row_when_wide():
    scene = comp.Tiles(
        children=[comp.InputStream(input_id="a"), comp.InputStream(input_id="b")],
        tile_aspect_ratio=(1, 1),
    )
    inputs = {"a": Resolution(10, 10), "b": Resolution(10, 10)}
    layouts = _flatten(scene, (200.0, 100.0), inputs=inputs)
    children = [l for l in layouts if isinstance(l.content, RenderChildNode)]
    assert {(c.left, c.top) for c in children} == {(0, 0), (100, 0)}


def test_flatten_child_index_offsets():
    # two inputs under nested views: indices must be 0 and 1 in tree order
    scene = comp.View(
        children=[
            comp.View(children=[comp.InputStream(input_id="a")]),
            comp.InputStream(input_id="b"),
        ]
    )
    inputs = {"a": Resolution(10, 10), "b": Resolution(10, 10)}
    layouts = _flatten(scene, (100.0, 100.0), inputs=inputs)
    idx = [l.content.index for l in layouts if isinstance(l.content, RenderChildNode)]
    assert idx == [0, 1]


def test_overflow_fit_scales_down():
    scene = comp.View(
        children=[
            comp.View(position=comp.StaticPosition(width=300.0, height=50.0),
                      background_color=RGBAColor(10, 0, 0)),
        ],
        overflow=comp.Overflow.FIT,
        background_color=RGBAColor(0, 0, 0, 255),
    )
    layouts = _flatten(scene, (100.0, 100.0))
    child = layouts[1]
    # scale = min(1, 100/300, 100/50) = 1/3
    assert abs(child.width - 100.0) < 1e-4
    assert abs(child.height - 50.0 / 3.0) < 1e-4


def test_transition_interpolates_width():
    state = SceneState()

    def measurer(t):
        return (0.0, 0.0)

    def imgs(i):
        return (0.0, 0.0)

    res = Resolution(100, 100)
    scene1 = OutputScene(
        "out",
        comp.View(
            children=[
                comp.View(
                    id="x",
                    position=comp.StaticPosition(width=20.0),
                    transition=comp.Transition(duration=1.0),
                )
            ]
        ),
        res,
    )
    node1 = state.update_scene(scene1, measurer, imgs)
    # render at pts 0
    state.register_render_event(0.0, {})
    ln = node1.node.params
    nested = ln.layouts(0.0, [])
    assert nested.children[0].width == 20.0

    scene2 = OutputScene(
        "out",
        comp.View(
            children=[
                comp.View(
                    id="x",
                    position=comp.StaticPosition(width=80.0),
                    transition=comp.Transition(duration=1.0),
                )
            ]
        ),
        res,
    )
    node2 = state.update_scene(scene2, measurer, imgs)
    ln2 = node2.node.params
    w_mid = ln2.layouts(0.5, []).children[0].width
    assert abs(w_mid - 50.0) < 1e-3  # halfway through linear transition
    w_end = ln2.layouts(1.0, []).children[0].width
    assert abs(w_end - 80.0) < 1e-3


def test_tiles_transition_tracks_ids():
    state = SceneState()
    res = Resolution(320, 180)
    kids1 = [comp.InputStream(input_id="a", id="ta")]
    scene1 = OutputScene(
        "out",
        comp.Tiles(id="grid", children=kids1, transition=comp.Transition(duration=1.0)),
        res,
    )
    n1 = state.update_scene(scene1, lambda t: (0, 0), lambda i: (0, 0))
    resolutions = [Resolution(160, 90)]
    n1.node.params.layouts(0.0, resolutions)  # render once to set last_layout
    state.register_render_event(0.0, {"a": Resolution(160, 90)})

    kids2 = [
        comp.InputStream(input_id="a", id="ta"),
        comp.InputStream(input_id="b", id="tb"),
    ]
    scene2 = OutputScene(
        "out",
        comp.Tiles(id="grid", children=kids2, transition=comp.Transition(duration=1.0)),
        res,
    )
    n2 = state.update_scene(scene2, lambda t: (0, 0), lambda i: (0, 0))
    resolutions2 = [Resolution(160, 90), Resolution(160, 90)]
    mid = n2.node.params.layouts(0.5, resolutions2)
    # tile "ta" should be animating (not at its end position yet)
    end = n2.node.params.layouts(1.5, resolutions2)
    mid_first = mid.children[0]
    end_first = end.children[0]
    assert mid_first.width != end_first.width


def test_duplicate_id_rejected():
    import pytest

    state = SceneState()
    scene = OutputScene(
        "out",
        comp.View(children=[comp.View(id="dup"), comp.View(id="dup")]),
        Resolution(10, 10),
    )
    with pytest.raises(Exception):
        state.update_scene(scene, lambda t: (0, 0), lambda i: (0, 0))
