"""Regression tests for the render fast paths added for TPU perf:

- plan-time layout-tree collapse (Rescaler/View wrappers inline into the
  parent program; must be bit-exact vs the uncollapsed evaluation)
- packed frame/param buffers (transparent to results)
- gather-free 3-shear rotation for planner-stable angles (must match the
  general sampled path within resampling tolerance)
- YUV-grid program reachability through collapsed Rescaler wrappers
"""

import numpy as np
import pytest

import smelter_tpu.render.program as prog
from smelter_tpu.core.types import Frame, FrameSet, PixelFormat, Resolution, RGBAColor
from smelter_tpu.ops.color_convert import rgba_to_planar_yuv420
from smelter_tpu.render.renderer import Renderer
from smelter_tpu.scene import components as comp
from smelter_tpu.scene.layout_types import BorderRadius, BoxShadow


def _yuv_frame(seed: int, w: int = 320, h: int = 180) -> Frame:
    rgba = np.zeros((h, w, 4), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    rgba[..., 0] = ((xx + seed * 37) * 255 // w).astype(np.uint8)
    rgba[..., 1] = ((yy + seed * 19) * 255 // h).astype(np.uint8)
    rgba[..., 2] = 50 + seed * 60
    rgba[..., 3] = 255
    y, u, v = [
        np.asarray(p) for p in rgba_to_planar_yuv420(rgba.astype(np.float32) / 255.0)
    ]
    return Frame(
        data=(y, u, v),
        format=PixelFormat.PLANAR_YUV420,
        resolution=Resolution(w, h),
        pts=0.0,
    )


def _mixed_scene():
    return comp.View(
        background_color=RGBAColor(20, 20, 40),
        children=[
            comp.Rescaler(
                child=comp.InputStream(input_id="cam_0"),
                position=comp.AbsolutePosition(
                    width=300.0, height=170.0, top=20.0, left=20.0
                ),
            ),
            comp.Rescaler(
                child=comp.InputStream(input_id="cam_1"),
                position=comp.AbsolutePosition(
                    width=200.0, height=113.0, top=40.0, left=360.0
                ),
                border_radius=BorderRadius(18, 18, 18, 18),
                box_shadow=[
                    BoxShadow(
                        offset_x=6, offset_y=6, blur_radius=12,
                        color=RGBAColor(0, 0, 0, 200),
                    )
                ],
            ),
            comp.Rescaler(
                child=comp.InputStream(input_id="cam_2"),
                position=comp.AbsolutePosition(
                    width=240.0, height=135.0, top=200.0, left=60.0
                ),
                border_width=4.0,
                border_color=RGBAColor(255, 255, 255),
            ),
        ],
    )


def _render(scene, fmt, n_inputs=3, frames_pts=(0.0, 1 / 30)):
    r = Renderer()
    for i in range(n_inputs):
        r.register_input(f"cam_{i}")
    r.update_scene("out", scene, Resolution(640, 360), fmt)
    frames = {f"cam_{i}": _yuv_frame(i) for i in range(n_inputs)}
    out = None
    for pts in frames_pts:
        out = r.render(FrameSet(pts=pts, frames=frames)).frames["out"].data
    return out


@pytest.mark.parametrize("fmt", [PixelFormat.RGBA, PixelFormat.PLANAR_YUV420])
def test_collapse_is_bit_exact(fmt, monkeypatch):
    a = _render(_mixed_scene(), fmt)
    monkeypatch.setattr(prog, "_collapsible", lambda *args: False)
    b = _render(_mixed_scene(), fmt)
    planes_a = a if isinstance(a, tuple) else (a,)
    planes_b = b if isinstance(b, tuple) else (b,)
    for pa, pb in zip(planes_a, planes_b):
        assert np.array_equal(np.asarray(pa), np.asarray(pb))


def test_rescaler_scene_reaches_yuv_grid_program():
    r = Renderer()
    for i in range(2):
        r.register_input(f"cam_{i}")
    scene = comp.View(
        background_color=RGBAColor(10, 20, 30),
        children=[
            comp.Rescaler(
                child=comp.InputStream(input_id="cam_0"),
                position=comp.AbsolutePosition(
                    width=300.0, height=170.0, top=20.0, left=20.0
                ),
            ),
            comp.Rescaler(
                child=comp.InputStream(input_id="cam_1"),
                position=comp.AbsolutePosition(
                    width=200.0, height=112.0, top=220.0, left=360.0
                ),
            ),
        ],
    )
    r.update_scene("out", scene, Resolution(640, 360), PixelFormat.PLANAR_YUV420)
    frames = {f"cam_{i}": _yuv_frame(i) for i in range(2)}
    out = r.render(FrameSet(pts=0.0, frames=frames)).frames["out"]
    # grid program → plain function wrapper named "run", not a pjit callable
    p = r._programs["out"]
    fn = next(iter(p._jit_cache.values()))
    assert getattr(fn, "__name__", "") == "run"
    # background off-tile is the scene color in YUV
    y, u, v = [np.asarray(pl) for pl in out.data]
    assert y.shape == (360, 640)
    assert abs(int(y[355, 635]) - 32) <= 2  # BT.709 limited Y of (10,20,30) ≈ 32


@pytest.mark.parametrize("theta", [12.0, -30.0, 90.0])
def test_stable_rotation_matches_general_path(theta, monkeypatch):
    def scene():
        return comp.View(
            background_color=RGBAColor(20, 20, 40),
            children=[
                comp.Rescaler(
                    child=comp.InputStream(input_id="cam_0"),
                    position=comp.AbsolutePosition(
                        width=300.0, height=170.0, top=40.0, left=100.0,
                        rotation_degrees=theta,
                    ),
                ),
            ],
        )

    fast = np.asarray(_render(scene(), PixelFormat.RGBA, n_inputs=1))
    orig = prog.split_layout
    monkeypatch.setattr(
        prog, "split_layout",
        lambda layout, fast=False, **kw: orig(layout, fast=False),
    )
    gen = np.asarray(_render(scene(), PixelFormat.RGBA, n_inputs=1))
    d = np.abs(fast.astype(np.int16) - gen.astype(np.int16))
    # identical up to resampling differences at the rotated edge
    assert d.mean() < 1.0
    assert (d > 8).mean() < 0.02


def test_rotate_static_matches_inverse_sampling():
    import jax.numpy as jnp

    from smelter_tpu.ops.resample import sample_bilinear
    from smelter_tpu.ops.rotate import rotate_static, rotated_bbox

    yy, xx = np.mgrid[0:80, 0:120].astype(np.float32)
    tile = (
        np.stack(
            [np.sin(yy / 9) + 1, np.cos(xx / 13) + 1, (yy + xx) / 200,
             np.ones_like(yy)],
            -1,
        ).astype(np.float32)
        / 2
    )

    def ground_truth(theta_deg, out_h, out_w):
        h, w = tile.shape[:2]
        ang = np.deg2rad(theta_deg)
        py = (np.arange(out_h) + 0.5)[:, None] - out_h / 2
        px = (np.arange(out_w) + 0.5)[None, :] - out_w / 2
        rdx = np.cos(ang) * px + np.sin(ang) * py
        rdy = -np.sin(ang) * px + np.cos(ang) * py
        sx = rdx + w / 2 - 0.5
        sy = rdy + h / 2 - 0.5
        out = np.asarray(
            sample_bilinear(
                jnp.asarray(tile),
                jnp.asarray(np.broadcast_to(sy, (out_h, out_w))),
                jnp.asarray(np.broadcast_to(sx, (out_h, out_w))),
            )
        )
        mask = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)
        return out * mask[..., None]

    for theta in (3.0, 30.0, 90.0, 135.0, -30.0, 180.0):
        oh, ow = rotated_bbox(theta, 80, 120)
        a = np.asarray(rotate_static(jnp.asarray(tile), theta, oh, ow))
        b = ground_truth(theta, oh, ow)
        d = np.abs(a[3:-3, 3:-3] - b[3:-3, 3:-3])
        assert d.mean() < 0.02, theta


def test_animated_rotation_uses_traced_path_and_matches_general(monkeypatch):
    """Rect-stable angle animation must route to the traced barrel-shear path
    (no per-frame recompiles beyond quarter buckets) and match the general
    sampled path within ringing/resample tolerance."""
    def scene(theta, trans=None):
        return comp.View(
            background_color=RGBAColor(20, 20, 40),
            children=[
                comp.Rescaler(
                    id="spin", child=comp.InputStream(input_id="cam_0"),
                    position=comp.AbsolutePosition(
                        width=300.0, height=170.0, top=60.0, left=120.0,
                        rotation_degrees=theta,
                    ),
                    transition=trans,
                ),
            ],
        )

    used_traced = []
    orig_split = prog.split_layout

    def spy(layout, fast=False, **kw):
        st, pp = orig_split(layout, fast=fast, **kw)
        if st.content == "texture":
            used_traced.append(st.traced_rotation_q is not None)
        return st, pp

    def run(force_general):
        r = Renderer()
        r.register_input("cam_0")
        frames = {"cam_0": _yuv_frame(0)}
        r.update_scene("out", scene(0.0), Resolution(640, 360), PixelFormat.RGBA)
        r.render(FrameSet(pts=0.0, frames=frames))
        r.update_scene(
            "out", scene(170.0, comp.Transition(duration=2.0)),
            Resolution(640, 360), PixelFormat.RGBA,
        )
        outs = []
        for i in range(1, 9):
            out = r.render(FrameSet(pts=i * 0.25, frames=frames)).frames["out"]
            outs.append(np.asarray(out.data))
        return outs

    monkeypatch.setattr(prog, "split_layout", spy)
    a = run(False)
    assert sum(used_traced) >= 6, used_traced  # most frames on the traced path
    monkeypatch.setattr(
        prog, "split_layout",
        lambda layout, fast=False, **kw: orig_split(layout, fast=False),
    )
    b = run(True)
    for fa, fb in zip(a, b):
        d = np.abs(fa.astype(np.int16) - fb.astype(np.int16))
        assert d.mean() < 1.5
        assert (d > 25).mean() < 0.01


def test_moving_rect_uses_traced_position_and_matches_general(monkeypatch):
    """Slide transitions (size/crop stable, position animating) must route to
    the traced-position dynamic-slice path — including partially off-canvas
    positions — and match the general path within sub-pixel tolerance."""
    def scene(left, trans=None):
        return comp.View(
            background_color=RGBAColor(20, 20, 40),
            children=[
                comp.Rescaler(
                    id="mv", child=comp.InputStream(input_id="cam_0"),
                    position=comp.AbsolutePosition(
                        width=300.0, height=170.0, top=60.0, left=left,
                    ),
                    transition=trans,
                ),
            ],
        )

    used_moving = []
    orig_split = prog.split_layout

    def spy(layout, fast=False, **kw):
        st, pp = orig_split(layout, fast=fast, **kw)
        if st.content == "texture":
            used_moving.append(st.traced_position)
        return st, pp

    def run():
        r = Renderer()
        r.register_input("cam_0")
        frames = {"cam_0": _yuv_frame(0)}
        r.update_scene("out", scene(300.0), Resolution(640, 360), PixelFormat.RGBA)
        r.render(FrameSet(pts=0.0, frames=frames))
        # slides mostly off-canvas to exercise the clamp compensation
        r.update_scene(
            "out", scene(-251.0, comp.Transition(duration=2.0)),
            Resolution(640, 360), PixelFormat.RGBA,
        )
        outs = []
        for i in range(1, 8):
            out = r.render(FrameSet(pts=i * 0.23, frames=frames)).frames["out"]
            outs.append(np.asarray(out.data))
        return outs

    monkeypatch.setattr(prog, "split_layout", spy)
    a = run()
    # frames whose rect is clipped by the root View's overflow (crossing the
    # canvas edge) change size per frame and legitimately fall back to the
    # general path; fully-on-canvas slide frames must use the traced path
    assert sum(used_moving) >= 3, used_moving
    monkeypatch.setattr(
        prog, "split_layout",
        lambda layout, fast=False, **kw: orig_split(layout, fast=False),
    )
    b = run()
    for fa, fb in zip(a, b):
        d = np.abs(fa.astype(np.int16) - fb.astype(np.int16))
        assert d.mean() < 1.0
        assert (d > 12).mean() < 0.01


def test_zoom_uses_traced_size_and_matches_general(monkeypatch):
    """Size-animating transitions route to the traced-size resize path
    (in-graph weight matrices, 64px-bucketed buffer) and match the general
    sampled path closely."""
    def scene(w, h, trans=None):
        return comp.View(
            background_color=RGBAColor(20, 20, 40),
            children=[
                comp.Rescaler(
                    id="z", child=comp.InputStream(input_id="cam_0"),
                    position=comp.AbsolutePosition(
                        width=w, height=h, top=40.0, left=60.0,
                    ),
                    transition=trans,
                ),
            ],
        )

    used_scaling = []
    orig_split = prog.split_layout

    def spy(layout, fast=False, **kw):
        st, pp = orig_split(layout, fast=fast, **kw)
        if st.content == "texture":
            used_scaling.append(st.traced_size_buf is not None)
        return st, pp

    def run():
        r = Renderer()
        r.register_input("cam_0")
        frames = {"cam_0": _yuv_frame(0)}
        r.update_scene("out", scene(160.0, 90.0), Resolution(640, 360),
                       PixelFormat.RGBA)
        r.render(FrameSet(pts=0.0, frames=frames))
        r.update_scene(
            "out", scene(480.0, 270.0, comp.Transition(duration=2.0)),
            Resolution(640, 360), PixelFormat.RGBA,
        )
        outs = []
        for i in range(1, 8):
            out = r.render(FrameSet(pts=i * 0.22, frames=frames)).frames["out"]
            outs.append(np.asarray(out.data))
        return outs

    monkeypatch.setattr(prog, "split_layout", spy)
    a = run()
    assert sum(used_scaling) >= 4, used_scaling
    monkeypatch.setattr(
        prog, "split_layout",
        lambda layout, fast=False, **kw: orig_split(layout, fast=False),
    )
    b = run()
    for fa, fb in zip(a, b):
        d = np.abs(fa.astype(np.int16) - fb.astype(np.int16))
        assert d.mean() < 1.0
        assert (d > 16).mean() < 0.005


def test_rotozoom_combo_matches_general(monkeypatch):
    """Simultaneous move+grow+spin transitions route to the roto-zoom path
    (traced centered resize + traced barrel-shear rotation) and match the sampled
    path within tolerance — including bounding squares larger than the
    canvas height."""
    def scene(left, w, h, theta, trans=None):
        return comp.View(
            background_color=RGBAColor(20, 20, 40),
            children=[
                comp.Rescaler(
                    id="rz", child=comp.InputStream(input_id="cam_0"),
                    position=comp.AbsolutePosition(
                        width=w, height=h, top=60.0, left=left,
                        rotation_degrees=theta,
                    ),
                    transition=trans,
                ),
            ],
        )

    used = []
    orig_split = prog.split_layout

    def spy(layout, fast=False, **kw):
        st, pp = orig_split(layout, fast=fast, **kw)
        if st.content == "texture":
            used.append(
                st.traced_size_buf is not None
                and st.traced_rotation_q is not None
            )
        return st, pp

    def run():
        r = Renderer()
        r.register_input("cam_0")
        frames = {"cam_0": _yuv_frame(0)}
        r.update_scene("out", scene(80.0, 160.0, 90.0, 0.0),
                       Resolution(640, 360), PixelFormat.RGBA)
        r.render(FrameSet(pts=0.0, frames=frames))
        r.update_scene(
            "out", scene(260.0, 380.0, 214.0, 65.0, comp.Transition(duration=2.0)),
            Resolution(640, 360), PixelFormat.RGBA,
        )
        return [
            np.asarray(r.render(FrameSet(pts=i * 0.22, frames=frames))
                       .frames["out"].data)
            for i in range(1, 9)
        ]

    monkeypatch.setattr(prog, "split_layout", spy)
    a = run()
    assert sum(used) >= 5, used
    monkeypatch.setattr(
        prog, "split_layout",
        lambda layout, fast=False, **kw: orig_split(layout, fast=False),
    )
    b = run()
    for fa, fb in zip(a, b):
        d = np.abs(fa.astype(np.int16) - fb.astype(np.int16))
        assert d.mean() < 1.5
        assert (d > 16).mean() < 0.02


def test_masked_rotation_stays_on_fast_path():
    """A rotating view with an opaque background clips its child via a
    parent mask; the masked child must STILL take the rotation fast path
    (masks are canvas-axis-aligned -> elementwise on the region), not the
    full-canvas sampled pass (measured 128 ms vs 1 ms at 1080p on v5e)."""
    from harness import make_test_input
    from smelter_tpu.core.types import FrameSet, PixelFormat, Resolution, RGBAColor
    from smelter_tpu.render.renderer import Renderer
    from smelter_tpu.scene import components as comp
    from smelter_tpu.scene.components import AbsolutePosition, Transition

    OUT = Resolution(640, 360)
    IN = Resolution(320, 180)

    def scene(angle, transition=None):
        return comp.View(
            background_color=RGBAColor(10, 10, 30, 255),
            children=[comp.View(
                id="box",
                position=AbsolutePosition(width=300.0, height=160.0,
                                          top=80.0, left=150.0,
                                          rotation_degrees=angle),
                background_color=RGBAColor(0, 0, 0, 255),
                transition=transition,
                children=[comp.InputStream(input_id="cam")],
            )],
        )

    r = Renderer()
    try:
        r.register_input("cam")
        frame = make_test_input(0, IN)
        r.update_scene("out", scene(0.0), OUT, PixelFormat.RGBA)
        r.render(FrameSet(pts=0.0, frames={"cam": frame}))
        r.update_scene("out", scene(40.0, Transition(duration=4.0)), OUT,
                       PixelFormat.RGBA)
        # two mid-transition frames so the planner observes the angle moving
        r.render(FrameSet(pts=0.2, frames={"cam": make_test_input(0, IN, 0.2)}))
        r.render(FrameSet(pts=0.4, frames={"cam": make_test_input(0, IN, 0.4)}))
        prog = r._programs["out"]
        key, plan = prog.plan(1.0, {"cam": make_test_input(0, IN, 1.0)},
                              r.images, r.text)
        texture_layers = [
            st
            for part in key
            if isinstance(part, tuple) and len(part) >= 3 and part[1] == "layout"
            for st in part[2]
            if st.content == "texture"
        ]
        assert texture_layers, "no texture layer in the plan"
        st = texture_layers[0]
        assert st.n_masks >= 1, "expected the overflow clip mask"
        assert st.static_rect is not None and st.traced_rotation_q is not None, (
            "masked rotating texture fell off the traced-rotation fast path"
        )
        # and the rendered mid-transition frame is correct: child visible,
        # clipped to the box's axis-aligned rect
        out = r.render(FrameSet(
            pts=1.0, frames={"cam": make_test_input(0, IN, 1.0)}
        )).frames["out"]
        import numpy as np

        data = np.asarray(out.data)
        assert data[180, 320, 0] > 60  # child content at the center
        assert data[10, 10, 2] <= 40 and abs(int(data[10, 10, 2]) - 30) < 8
    finally:
        r.close()
