"""End-to-end renderer snapshot tests (reference model:
integration-tests/src/render_tests/)."""

import numpy as np
import pytest

from smelter_tpu.core.types import (
    Frame,
    FrameSet,
    PixelFormat,
    Resolution,
    RGBAColor,
)
from smelter_tpu.render.renderer import Renderer
from smelter_tpu.scene import components as comp
from smelter_tpu.scene.layout_types import BorderRadius, BoxShadow

from harness import assert_snapshot, frame_to_rgb_u8, make_test_input

OUT = Resolution(320, 180)


def _renderer(n_inputs=0):
    r = Renderer()
    for i in range(n_inputs):
        r.register_input(f"input_{i}")
    return r


def _frames(n, res=Resolution(160, 90), pts=0.0):
    return FrameSet(
        pts=pts,
        frames={f"input_{i}": make_test_input(i, res, pts) for i in range(n)},
    )


def test_solid_background():
    r = _renderer()
    r.update_scene(
        "out",
        comp.View(background_color=RGBAColor(255, 0, 0)),
        OUT,
        PixelFormat.RGBA,
    )
    out = r.render(FrameSet(pts=0.0)).frames["out"]
    rgb = frame_to_rgb_u8(out)
    assert rgb.shape == (180, 320, 3)
    assert np.allclose(rgb[90, 160], [255, 0, 0], atol=2)


def test_two_input_split_yuv_out():
    r = _renderer(2)
    r.update_scene(
        "out",
        comp.View(
            children=[
                comp.Rescaler(child=comp.InputStream(input_id="input_0")),
                comp.Rescaler(child=comp.InputStream(input_id="input_1")),
            ],
            background_color=RGBAColor(0, 0, 0, 255),
        ),
        OUT,
        PixelFormat.PLANAR_YUV420,
    )
    out = r.render(_frames(2)).frames["out"]
    assert out.format == PixelFormat.PLANAR_YUV420
    rgb = frame_to_rgb_u8(out)
    # left half ~red input, right half ~green input
    assert rgb[90, 80, 0] > 150 and rgb[90, 80, 2] < 110
    assert rgb[90, 240, 1] > 150 and rgb[90, 240, 0] < 110
    assert_snapshot("two_input_split", out)


def test_tiles_grid_snapshot():
    r = _renderer(4)
    r.update_scene(
        "out",
        comp.Tiles(
            children=[comp.InputStream(input_id=f"input_{i}") for i in range(4)],
            background_color=RGBAColor(16, 16, 16),
            margin=4.0,
        ),
        OUT,
        PixelFormat.RGBA,
    )
    out = r.render(_frames(4)).frames["out"]
    assert_snapshot("tiles_grid_4", out)


def test_rescaler_fit_black_bars():
    r = _renderer(1)
    r.update_scene(
        "out",
        comp.Rescaler(
            child=comp.InputStream(input_id="input_0"),
            mode=comp.RescaleMode.FIT,
        ),
        Resolution(180, 180),
        PixelFormat.RGBA,
    )
    out = r.render(_frames(1)).frames["out"]
    rgb = frame_to_rgb_u8(out)
    # 16:9 in square output: top/bottom bars transparent-black
    assert rgb[5, 90].sum() < 30
    assert rgb[90, 90, 0] > 150


def test_view_border_radius_shadow():
    r = _renderer(1)
    r.update_scene(
        "out",
        comp.View(
            background_color=RGBAColor(30, 30, 30),
            children=[
                comp.View(
                    position=comp.AbsolutePosition(
                        width=160.0, height=90.0, top=40.0, left=80.0
                    ),
                    background_color=RGBAColor(200, 60, 60),
                    border_radius=BorderRadius(20, 20, 20, 20),
                    border_width=4.0,
                    border_color=RGBAColor(255, 255, 255),
                    box_shadow=[
                        BoxShadow(offset_x=8, offset_y=8, blur_radius=12,
                                  color=RGBAColor(0, 0, 0, 180))
                    ],
                )
            ],
        ),
        OUT,
        PixelFormat.RGBA,
    )
    out = r.render(_frames(1)).frames["out"]
    rgb = frame_to_rgb_u8(out)
    assert np.allclose(rgb[85, 160], [200, 60, 60], atol=4)  # center content
    assert rgb[44, 84].mean() < 120  # corner is cut (radius)
    assert_snapshot("view_border_radius_shadow", out)


def test_text_overlay():
    r = _renderer(0)
    r.update_scene(
        "out",
        comp.View(
            background_color=RGBAColor(0, 0, 80),
            children=[
                comp.Text(
                    text="Hello TPU",
                    font_size=40.0,
                    color=RGBAColor(255, 255, 0),
                )
            ],
        ),
        OUT,
        PixelFormat.RGBA,
    )
    out = r.render(FrameSet(pts=0.0)).frames["out"]
    rgb = frame_to_rgb_u8(out)
    # some yellow pixels from text
    yellow = (rgb[..., 0] > 180) & (rgb[..., 1] > 180) & (rgb[..., 2] < 100)
    assert yellow.sum() > 50
    assert_snapshot("text_overlay", out)


def test_image_component(tmp_path):
    from PIL import Image as PILImage

    img = np.zeros((32, 32, 4), np.uint8)
    img[..., 1] = 255
    img[..., 3] = 255
    p = tmp_path / "img.png"
    PILImage.fromarray(img).save(p)
    r = _renderer()
    r.register_image("logo", path=str(p))
    r.update_scene(
        "out",
        comp.View(
            background_color=RGBAColor(0, 0, 0),
            children=[
                comp.Image(
                    image_id="logo",
                    width=64.0,
                    height=64.0,
                )
            ],
        ),
        OUT,
        PixelFormat.RGBA,
    )
    out = r.render(FrameSet(pts=0.0)).frames["out"]
    rgb = frame_to_rgb_u8(out)
    assert rgb[32, 32, 1] > 200  # green image upscaled 2x


def test_shader_component():
    r = _renderer(1)
    source = """
def main(inputs, params, resolution, time):
    # invert colors of the first input
    tex = inputs[0]
    rgb = 1.0 - tex[..., :3]
    return jnp.concatenate([rgb, tex[..., 3:4]], axis=-1)
"""
    r.register_shader("invert", source)
    r.update_scene(
        "out",
        comp.Shader(
            shader_id="invert",
            children=[comp.InputStream(input_id="input_0")],
            width=160.0,
            height=90.0,
        ),
        Resolution(160, 90),
        PixelFormat.RGBA,
    )
    out = r.render(_frames(1)).frames["out"]
    rgb = frame_to_rgb_u8(out)
    # input 0 is red-ish -> inverted is cyan-ish
    assert rgb[45, 80, 0] < 100 and rgb[45, 80, 1] > 150


def test_transition_animates_between_frames():
    r = _renderer(0)

    def scene(width):
        return comp.View(
            background_color=RGBAColor(0, 0, 0),
            children=[
                comp.View(
                    id="box",
                    position=comp.StaticPosition(width=width, height=180.0),
                    background_color=RGBAColor(255, 255, 255),
                    transition=comp.Transition(duration=1.0),
                )
            ],
        )

    r.update_scene("out", scene(40.0), OUT, PixelFormat.RGBA)
    out0 = r.render(FrameSet(pts=0.0)).frames["out"]
    r.update_scene("out", scene(240.0), OUT, PixelFormat.RGBA)
    mid = r.render(FrameSet(pts=0.5)).frames["out"]
    end = r.render(FrameSet(pts=1.0)).frames["out"]

    def white_width(frame):
        rgb = frame_to_rgb_u8(frame)
        return (rgb[90, :, 0] > 200).sum()

    assert abs(white_width(out0) - 40) <= 2
    assert abs(white_width(mid) - 140) <= 3  # halfway 40 -> 240
    assert abs(white_width(end) - 240) <= 2


def test_no_recompile_during_transition():
    r = _renderer(0)

    def scene(width):
        return comp.View(
            background_color=RGBAColor(0, 0, 0),
            children=[
                comp.View(
                    id="box",
                    position=comp.StaticPosition(width=width, height=180.0),
                    background_color=RGBAColor(255, 255, 255),
                    transition=comp.Transition(duration=1.0),
                )
            ],
        )

    r.update_scene("out", scene(40.0), OUT, PixelFormat.RGBA)
    r.render(FrameSet(pts=0.0))
    r.update_scene("out", scene(240.0), OUT, PixelFormat.RGBA)
    program = r._programs["out"]
    for i in range(1, 20):
        r.render(FrameSet(pts=i / 25.0))
    # animating rects hop to the shared general (traced-rect) program: the
    # 19 animation frames add at most ONE compile, not one per frame
    assert len(program._jit_cache) <= 2
    n_during = len(program._jit_cache)
    # after the transition settles the end geometry gets its own fast
    # program (one more compile), then every further frame is cache hits
    for i in range(30, 40):
        r.render(FrameSet(pts=i / 25.0))
    assert len(program._jit_cache) <= n_during + 1
    final = len(program._jit_cache)
    for i in range(40, 50):
        r.render(FrameSet(pts=i / 25.0))
    assert len(program._jit_cache) == final


def test_missing_input_renders_absent():
    r = _renderer(1)
    r.update_scene(
        "out",
        comp.View(
            background_color=RGBAColor(0, 0, 255),
            children=[comp.Rescaler(child=comp.InputStream(input_id="input_0"))],
        ),
        OUT,
        PixelFormat.RGBA,
    )
    out = r.render(FrameSet(pts=0.0)).frames["out"]
    rgb = frame_to_rgb_u8(out)
    assert np.allclose(rgb[90, 160], [0, 0, 255], atol=2)  # just background


def test_stream_fallback_then_timeout():
    r = _renderer(1)
    r.update_scene(
        "out",
        comp.Rescaler(child=comp.InputStream(input_id="input_0")),
        OUT,
        PixelFormat.RGBA,
    )
    r.render(_frames(1, pts=0.0))
    # frame missing at pts=0.2: fallback to last frame
    out = r.render(FrameSet(pts=0.2)).frames["out"]
    assert frame_to_rgb_u8(out)[90, 160, 0] > 150
    # frame missing at pts=2.0 (> fallback timeout): renders absent
    out = r.render(FrameSet(pts=2.0)).frames["out"]
    assert frame_to_rgb_u8(out)[90, 160].sum() < 30


def test_scene_update_does_not_stall_render_loop():
    """SURVEY §7 hard part (a): a scene update compiles in the background;
    frames keep flowing (frozen) until the new program is ready."""
    import time as _time

    from smelter_tpu.render.renderer import Renderer, RendererOptions

    r = Renderer(RendererOptions(async_compile=True))
    r.register_input("input_0")
    scene_a = comp.View(
        background_color=RGBAColor(255, 0, 0),
        children=[comp.Rescaler(child=comp.InputStream(input_id="input_0"))],
    )
    r.update_scene("out", scene_a, OUT, PixelFormat.RGBA)
    out0 = r.render(_frames(1)).frames["out"]  # first frame: sync compile
    assert frame_to_rgb_u8(out0)[5, 5, 0] > 200

    # structural update: different scene
    scene_b = comp.View(background_color=RGBAColor(0, 0, 255))
    r.update_scene("out", scene_b, OUT, PixelFormat.RGBA)
    t0 = _time.perf_counter()
    out1 = r.render(_frames(1, pts=0.1)).frames["out"]
    first_dt = _time.perf_counter() - t0
    # returned immediately with the frozen previous frame OR the compile was
    # instantaneous; either way no multi-second stall
    assert first_dt < 1.0, first_dt

    # eventually the new scene appears
    deadline = _time.time() + 60
    became_blue = False
    pts = 0.2
    while _time.time() < deadline:
        out = r.render(_frames(1, pts=pts)).frames["out"]
        rgb = frame_to_rgb_u8(out)
        if rgb[5, 5, 2] > 200 and rgb[5, 5, 0] < 60:
            became_blue = True
            break
        pts += 1 / 30
        _time.sleep(0.05)
    assert became_blue, "new scene never took effect"


def test_text_shaping_kerning_and_complex_scripts():
    """Shaped text fidelity (reference text_renderer.rs:53-110 cosmic-text
    shaping): kerning pairs tighten, Arabic joins contextually, and the
    fitted box sizes to the SHAPED width — all things a naive per-glyph
    raster demonstrably gets wrong."""
    from PIL import ImageFont

    from smelter_tpu.render.text import TextRenderer, shaping_active

    assert shaping_active(), "libraqm missing: complex-script shaping inactive"
    tr = TextRenderer()

    def fitted(text):
        return tr.render(comp.Text(text=text, font_size=32.0,
                                   color=RGBAColor(255, 255, 255)))

    basic = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 32,
        layout_engine=ImageFont.Layout.BASIC)

    # kerning: AVATAR must size tighter than the per-glyph advance sum
    out = fitted("AVATAR")
    assert out.width < basic.getlength("AVATAR") - 4, (
        out.width, basic.getlength("AVATAR"))

    # Arabic: joined (shaped) forms are much narrower than isolated glyphs
    arabic = "سلام عليكم"
    out_ar = fitted(arabic)
    assert out_ar.width < basic.getlength(arabic) - 30, (
        out_ar.width, basic.getlength(arabic))
    # and it actually rendered ink
    assert np.asarray(out_ar.rgba)[..., 3].max() > 0


def test_text_wrap_measures_shaped_runs():
    """Word wrap decisions use shaped widths, so a kerned word that fits
    shaped does not spuriously wrap."""
    from PIL import ImageFont

    from smelter_tpu.render.text import TextRenderer

    basic = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 32,
        layout_engine=ImageFont.Layout.BASIC)
    word = "AVATAR"
    shaped_w = None
    tr = TextRenderer()
    probe = tr.render(comp.Text(text=word, font_size=32.0,
                                color=RGBAColor(255, 255, 255)))
    shaped_w = probe.width
    assert shaped_w < basic.getlength(word)
    # max_width between shaped and unshaped width: must stay on ONE line
    limit = (shaped_w + basic.getlength(word)) / 2.0
    out = tr.render(comp.Text(
        text=word + " " + word, font_size=32.0, wrap=comp.TextWrap.WORD,
        color=RGBAColor(255, 255, 255),
        dimensions=comp.TextDimensions(mode="fitted_column", width=limit),
    ))
    # two lines exactly (one word per line), not three
    assert abs(out.height - 2 * 32.0) < 1.0, out.height


def test_svg_image_renders_in_scene():
    """SVG assets rasterize via librsvg (reference svg_image.rs / resvg)
    and composite like any image."""
    svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="64" height="48">'
           b'<rect x="0" y="0" width="64" height="48" fill="#00c000"/>'
           b'<circle cx="32" cy="24" r="10" fill="#ffffff"/></svg>')
    r = Renderer()
    r.images.register("logo", data=svg, kind="svg")
    assert r.images.natural_size("logo") == (64.0, 48.0)
    r.update_scene(
        "out",
        comp.View(background_color=RGBAColor(0, 0, 0, 255),
                  children=[comp.Image(image_id="logo")]),
        Resolution(64, 48), PixelFormat.RGBA,
    )
    out = np.asarray(r.render(FrameSet(pts=0.0, frames={})).frames["out"].data)
    # green field with a white disc in the center
    assert out[4, 4, 1] > 150 and out[4, 4, 0] < 60
    assert out[24, 32, 0] > 200 and out[24, 32, 1] > 200 and out[24, 32, 2] > 200


def test_svg_resolution_vector_scales():
    """ImageSpec::Svg.resolution (reference image.rs:30): SVG assets
    rasterize at the requested size via a cairo vector scale, not a
    raster resize."""
    from smelter_tpu.render.image import ImageStore

    svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="40" height="20">'
           b'<rect width="40" height="20" fill="#ff0000"/></svg>')
    store = ImageStore()
    nat = store.register("nat", data=svg, kind="svg")
    assert (nat.width, nat.height) == (40, 20)
    store2 = ImageStore()
    big = store2.register("big", data=svg, kind="svg", resolution=(400, 200))
    assert (big.width, big.height) == (400, 200)
    frame = big.frames[0]
    assert frame.shape[:2] == (200, 400)
    assert tuple(frame[100, 200][:3]) == (255, 0, 0)


def test_shader_base_params_contract():
    """Mirror of shader.rs base_params_* cases: the shader contract exposes
    output resolution, time, and texture count exactly (the reference's
    BaseShaderParameters push constants: time / output_resolution /
    texture_count; plane_id is a WGSL vertex-stage detail with no analogue
    in the JAX DSL)."""
    r = _renderer(2)
    source = """
def main(inputs, params, resolution, time):
    # encode the contract into the output color:
    #   R = texture_count / 8, G = time (s) / 4, B = resolution.width / 1024
    h, w = resolution[1], resolution[0]
    n = len(inputs)
    col = jnp.array([n / 8.0, time / 4.0, w / 1024.0, 1.0], jnp.float32)
    return jnp.broadcast_to(col, (h, w, 4))
"""
    r.register_shader("contract", source)
    r.update_scene(
        "out",
        comp.Shader(
            shader_id="contract",
            children=[comp.InputStream(input_id="input_0"),
                      comp.InputStream(input_id="input_1")],
            width=512.0, height=288.0,
        ),
        Resolution(512, 288),
        PixelFormat.RGBA,
    )
    out = r.render(_frames(2, pts=2.0)).frames["out"]
    rgb = frame_to_rgb_u8(out)
    px = rgb[144, 256]
    assert abs(int(px[0]) - round(2 / 8 * 255)) <= 2, px    # texture_count=2
    assert abs(int(px[1]) - round(2.0 / 4 * 255)) <= 2, px  # time=2.0s
    assert abs(int(px[2]) - round(512 / 1024 * 255)) <= 2, px  # width=512


def test_bgra_and_argb_pixel_format_inputs_render_exact():
    """Mirror of pixel_input_format_tests.rs: BGRA and ARGB inputs render
    through a View pass-through with an exact channel swizzle (opaque
    alpha — this build keeps premultiplied compositing internally and
    emits opaque video frames, program.py:1036)."""
    import numpy as np

    w, h = 8, 2
    base = np.arange(1, w * h * 4 + 1, dtype=np.uint8).reshape(h, w, 4)

    for fmt, to_rgb in (
        (PixelFormat.BGRA, lambda px: (px[2], px[1], px[0])),   # B G R A
        (PixelFormat.ARGB, lambda px: (px[1], px[2], px[3])),   # A R G B
    ):
        data = base.copy()
        # force opaque alpha at the format's alpha byte
        if fmt == PixelFormat.BGRA:
            data[..., 3] = 255
        else:
            data[..., 0] = 255
        r = Renderer()
        r.register_input("px")
        r.update_scene(
            "out",
            comp.View(children=[comp.InputStream(input_id="px")]),
            Resolution(w, h),
            PixelFormat.RGBA,
        )
        out = r.render(FrameSet(pts=0.0, frames={
            "px": Frame(data=data, format=fmt,
                        resolution=Resolution(w, h), pts=0.0),
        })).frames["out"]
        rgba = np.asarray(out.data)
        for y in range(h):
            for x in range(w):
                want = to_rgb(base[y, x])
                got = tuple(int(v) for v in rgba[y, x, :3])
                assert got == tuple(int(v) for v in want), (fmt, y, x, got, want)
                assert int(rgba[y, x, 3]) == 255
        r.close()


def test_yuyv_uyvy_interleaved_inputs_render():
    """Interleaved 4:2:2 camera formats (YUYV/UYVY — v4l2's native wire
    format) through a render pass: constant gray (Y=180, U=V=128) must
    come out as the matching RGB gray with both byte orders."""
    import numpy as np

    w, h = 16, 4
    # limited-range Y=180 -> (180-16)/219*255 ~= 191
    want = round((180 - 16) / 219 * 255)
    for fmt, quad in (
        (PixelFormat.INTERLEAVED_YUYV422, [180, 128, 180, 128]),
        (PixelFormat.INTERLEAVED_UYVY422, [128, 180, 128, 180]),
    ):
        data = np.tile(np.array(quad, np.uint8), (h, w // 2, 1))
        r = Renderer()
        r.register_input("cam")
        r.update_scene(
            "out",
            comp.View(children=[comp.InputStream(input_id="cam")]),
            Resolution(w, h),
            PixelFormat.RGBA,
        )
        out = r.render(FrameSet(pts=0.0, frames={
            "cam": Frame(data=data, format=fmt,
                         resolution=Resolution(w, h), pts=0.0),
        })).frames["out"]
        rgba = np.asarray(out.data)
        assert abs(int(rgba[2, 8, 0]) - want) <= 2, (fmt, rgba[2, 8])
        assert abs(int(rgba[2, 8, 1]) - want) <= 2, (fmt, rgba[2, 8])
        assert abs(int(rgba[2, 8, 2]) - want) <= 2, (fmt, rgba[2, 8])
        r.close()


def test_yuv_uniform_color_roundtrip_quantization():
    """Mirror of yuv_tests.rs yuv_test_uniform_color: a solid RGB(50,0,0)
    View rendered to YUV420 and converted back lands within 1-2 codes of
    the original (limited-range quantization), and the RGBA output path
    is exact."""
    import numpy as np

    from smelter_tpu.ops.color_convert import planar_yuv_to_rgba

    w, h = 8, 2
    scene = comp.View(background_color=RGBAColor(50, 0, 0, 255))

    r = Renderer()
    r.update_scene("yuv", scene, Resolution(w, h), PixelFormat.PLANAR_YUV420)
    r.update_scene("rgb", scene, Resolution(w, h), PixelFormat.RGBA)
    out = r.render(FrameSet(pts=0.0, frames={}))

    y, u, v = [np.asarray(p) for p in out.frames["yuv"].data]
    back = np.asarray(planar_yuv_to_rgba(y, u, v)) * 255.0
    assert np.all(np.abs(back[..., 0] - 50.0) <= 2.0), back[..., 0]
    assert np.all(back[..., 1] <= 2.0) and np.all(back[..., 2] <= 2.0)

    rgba = np.asarray(out.frames["rgb"].data)
    assert np.all(rgba[..., 0] == 50) and np.all(rgba[..., 1] == 0)
    assert np.all(rgba[..., 3] == 255)
    r.close()


def test_live_scene_survives_image_unregister(tmp_path):
    """Unregistering an image only gates FUTURE scene updates; the live
    scene keeps rendering its pinned asset (integration-tests
    unregistering.rs: the output keeps flowing after image_1/unregister)."""
    import numpy as np
    from PIL import Image as PILImage

    png = str(tmp_path / "logo.png")
    arr = np.zeros((16, 16, 4), np.uint8)
    arr[..., 0] = 255
    arr[..., 3] = 255
    PILImage.fromarray(arr).save(png)

    r = Renderer()
    try:
        r.register_image("logo", path=png)
        scene = comp.View(
            background_color=RGBAColor(0, 60, 0),
            children=[comp.Image(image_id="logo")],
        )
        r.update_scene("out", scene, Resolution(64, 64), PixelFormat.RGBA)
        r.render(FrameSet(pts=0.0))
        r.unregister_image("logo")
        out = r.render(FrameSet(pts=0.1)).frames["out"]
        rgb = np.asarray(out.data)
        assert (rgb[..., 0] > 200).any(), "pinned image gone from live scene"
        with pytest.raises(ValueError, match="not registered"):
            r.update_scene("out", scene, Resolution(64, 64), PixelFormat.RGBA)
    finally:
        r.close()


def test_image_unregister_before_first_frame(tmp_path):
    """The pre-first-frame window: unregister the image BEFORE any render of
    the new scene — the program pinned the asset at construction, so the
    first frame must still render it (no render-thread crash)."""
    import numpy as np
    from PIL import Image as PILImage

    png = str(tmp_path / "logo.png")
    arr = np.zeros((16, 16, 4), np.uint8)
    arr[..., 2] = 255
    arr[..., 3] = 255
    PILImage.fromarray(arr).save(png)

    r = Renderer()
    try:
        r.register_image("logo", path=png)
        scene = comp.View(
            background_color=RGBAColor(40, 0, 0),
            children=[comp.Image(image_id="logo")],
        )
        r.update_scene("out", scene, Resolution(64, 64), PixelFormat.RGBA)
        r.unregister_image("logo")  # before the first render
        out = r.render(FrameSet(pts=0.0)).frames["out"]
        rgb = np.asarray(out.data)
        assert (rgb[..., 2] > 200).any(), "pinned image missing on 1st frame"
    finally:
        r.close()
