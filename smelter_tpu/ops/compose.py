"""Layout compositing op: the TPU equivalent of the reference's
`apply_layouts.wgsl` (smelter-render/src/transformations/layout/shader.rs).

Instead of one draw call per RenderLayout into a wgpu render target, the whole
flattened layout list is traced into a single fused XLA program per
(structure, resolutions): a Python loop over layouts (static structure) where
every numeric parameter (rect, crop, radii, colors, rotation) is a *traced*
scalar, so scene transitions animate parameters frame-to-frame without
recompilation.

The working canvas is CHANNEL-MAJOR (4, H, W) premultiplied f32: the W axis
rides the VPU lanes, so region blend chains and SDF shading run at full
vector width (the (H, W, 4) interleaved layout wastes 124 of 128 lanes on
the size-4 minor dim — measured 2.4x slower on v5e for blend chains). The
(H, W, 4) contract survives at two boundaries only: source textures/mips
(gather sampling + the user-shader contract) and, when `planar=False`, the
returned canvas.

Per-layout semantics (mirroring apply_layouts.wgsl):
  - rounded-rect SDF for content edge antialiasing, borders and parent masks
  - content types: child texture (with crop + bilinear/mip sampling), solid
    color, box shadow (SDF-smoothstep blur approximation)
  - premultiplied alpha OVER blending in layout order
    (wgpu PREMULTIPLIED_ALPHA_BLENDING, common_pipeline.rs:125)

Corner-radius order is [top_left, top_right, bottom_right, bottom_left].
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from smelter_tpu.ops.color_convert import canvas_decode
from smelter_tpu.ops.resample import sample_bilinear, sample_bilinear_mip

MAX_MASKS_COUNT = 20


@dataclass(frozen=True)
class LayoutStatic:
    """Static (structure) part of one render layout; changing any of these
    retriggers program tracing (scene update - control path, not hot path)."""

    content: str  # "texture" | "color" | "box_shadow"
    source_index: int = -1  # node texture index for content == "texture"
    n_masks: int = 0
    # per-mask flag: mask introduced by a rotated ancestor (clips rotate
    # with the parent that owns them). Static so unrotated masks skip the
    # coordinate rotation entirely (bit-identical to the pre-rotation-mask
    # code); the angle itself stays traced (params.masks[:, 8]).
    rotated_masks: Tuple[bool, ...] = ()
    has_rotation: bool = False
    has_border: bool = False  # border_width can be > 0
    # fast path (rect not animating): integer placement rect + source crop.
    # When set, the layout renders region-local — a static-size separable
    # resize (MXU matmuls) placed with a static slice update — instead of a
    # full-canvas gather pass. Chosen per frame by the program planner, which
    # watches whether the rect is changing (transitions) frame to frame.
    static_rect: Optional[Tuple[int, int, int, int]] = None  # top, left, h, w
    static_crop: Optional[Tuple[int, int, int, int]] = None  # top, left, h, w
    static_blur: float = 0.0  # box-shadow blur (needs static render region)
    # true when every corner radius is 0 at plan time (enables the opaque
    # YUV-grid program; radius animation reroutes via the planner signature)
    no_radius: bool = False
    # constant fill color (r,g,b,a u8) for content == "color" in fast mode
    static_color: Optional[Tuple[int, int, int, int]] = None
    # planner-stable rotation angle (degrees): the layout renders via the
    # gather-free 3-shear path (ops/rotate.py) instead of full-canvas
    # inverse sampling. Animated rotations leave this None.
    static_rotation: Optional[float] = None
    # ANIMATED rotation with stable rect/crop: static quarter-turn bucket
    # (round(theta/90)); the residual angle is traced through FFT shears
    traced_rotation_q: Optional[int] = None
    # ANIMATED position with stable size/crop (slide transitions): the tile
    # renders at static size and is placed with traced-index dynamic slices
    # (static_rect holds (0, 0, h, w) in this mode)
    traced_position: bool = False
    # ANIMATED size (zoom transitions): static buffer dims; the resize and
    # SDF extents are traced (ops/resample.resize_matmul_traced)
    traced_size_buf: Optional[Tuple[int, int]] = None


@jax.tree_util.register_dataclass
@dataclass
class LayoutParams:
    """Traced numeric parameters of one render layout (all jnp f32 scalars /
    small vectors; animating these does NOT recompile)."""

    top: jnp.ndarray
    left: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    rotation_degrees: jnp.ndarray
    border_radius: jnp.ndarray  # (4,) [tl, tr, br, bl]
    border_width: jnp.ndarray
    border_color: jnp.ndarray  # (4,) straight alpha [0,1]
    color: jnp.ndarray  # (4,) straight alpha (color / shadow content)
    crop: jnp.ndarray  # (4,) [top, left, width, height] in source pixels
    blur_radius: jnp.ndarray
    # masks: (n_masks, 9):
    # [radius_tl, tr, br, bl, top, left, width, height, rotation_rad]
    # (rotation applied only for masks statically flagged rotated —
    # LayoutStatic.rotated_masks; legacy 8-wide rows remain valid for them)
    masks: jnp.ndarray


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / jnp.maximum(e1 - e0, 1e-6), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def rounded_rect_sdf(dx, dy, half_w, half_h, radius):
    """Signed distance to a rounded rect centered at origin.

    dx, dy: (H, W) offsets from rect center, x right / y down, pixels.
    radius: (4,) corner radii [tl, tr, br, bl].
    Negative inside, positive outside (same convention as the reference).
    """
    r_top = jnp.where(dx < 0.0, radius[0], radius[1])
    r_bottom = jnp.where(dx < 0.0, radius[3], radius[2])
    r = jnp.where(dy < 0.0, r_top, r_bottom)
    qx = jnp.abs(dx) - half_w + r
    qy = jnp.abs(dy) - half_h + r
    qx_pos = jnp.maximum(qx, 0.0)
    qy_pos = jnp.maximum(qy, 0.0)
    return (
        jnp.minimum(jnp.maximum(qx, qy), 0.0)
        + jnp.sqrt(qx_pos * qx_pos + qy_pos * qy_pos)
        - r
    )


def _premultiply(color: jnp.ndarray) -> jnp.ndarray:
    """(4,) straight-alpha -> (4, 1, 1) premultiplied, broadcast-ready
    against (4, h, w) channel-major layers."""
    return jnp.concatenate([color[:3] * color[3], color[3:4]])[:, None, None]


def _mask_alpha(px, py, params: LayoutParams, n_masks: int,
                rotated: Tuple[bool, ...] = ()) -> jnp.ndarray:
    alpha = jnp.ones(px.shape, jnp.float32)
    for i in range(n_masks):
        m = params.masks[i]
        radius, top, left, w, h = m[0:4], m[4], m[5], m[6], m[7]
        cx = left + w * 0.5
        cy = top + h * 0.5
        dx, dy = px - cx, py - cy
        if i < len(rotated) and rotated[i]:
            # the mask rotates with the parent that introduced it: rotate
            # the offset into the mask's local frame (same convention as
            # render_single_layout's rotated rects; angle stays traced)
            ang = m[8]
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            dx, dy = ca * dx + sa * dy, -sa * dx + ca * dy
        d = rounded_rect_sdf(dx, dy, w * 0.5, h * 0.5, radius)
        alpha = alpha * smoothstep(-0.5, 0.5, -d)
    return alpha


def _over(layer: jnp.ndarray, under: jnp.ndarray) -> jnp.ndarray:
    """Premultiplied OVER for channel-major (4, h, w) layers."""
    return layer + under * (1.0 - layer[3:4])


def _src_mips(src) -> Sequence:
    """Full-resolution RGBA mip list of a source (converting a deferred
    planar-YUV source on first use within the trace)."""
    if hasattr(src, "mips"):
        return src.mips()
    return src if isinstance(src, (list, tuple)) else [src]


def _src_tile_cm(src, crop, out_h: int, out_w: int) -> jnp.ndarray:
    """Channel-major (4, out_h, out_w) f32 tile: the source's `crop` window
    resized via MXU matmuls. Deferred planar-YUV sources crop+resize their
    subsampled planes directly (color_convert.yuv_tile_rgba_cm) — no
    full-res RGBA materialization.

    NOTE (round-5 device A/B, bench_artifacts/banding_ab_r05.json): a
    cross-source batched variant that stacked same-shape sources into one
    6-einsum batch measured +0.57 ms on the 4K flagship scene — the
    jnp.stack of 16 full input planes costs copies the per-source einsums
    never pay, and the small einsums were already MXU-bound. Deleted; each
    source resizes independently."""
    if hasattr(src, "tile_cm"):
        return src.tile_cm(crop, out_h, out_w)
    from smelter_tpu.ops.resample import resize_matmul

    img = src[0] if isinstance(src, (list, tuple)) else src
    ct, cl, chh, cww = crop
    patch = img[ct : ct + chh, cl : cl + cww]
    return resize_matmul(jnp.moveaxis(patch, -1, 0), out_h, out_w).astype(
        jnp.float32
    )


def render_single_layout(
    static: LayoutStatic,
    params: LayoutParams,
    sources: Sequence,  # list of source mip pyramids (lists of (H,W,4) f32)
    px: jnp.ndarray,  # (H, W) output pixel-center x coords
    py: jnp.ndarray,  # (H, W) output pixel-center y coords
) -> jnp.ndarray:
    """Returns the layout's premultiplied RGBA contribution (4, H, W)."""
    w = params.width
    h = params.height
    cx = params.left + w * 0.5
    cy = params.top + h * 0.5
    dx = px - cx
    dy = py - cy
    if static.has_rotation:
        ang = params.rotation_degrees * (jnp.pi / 180.0)
        cos_a = jnp.cos(ang)
        sin_a = jnp.sin(ang)
        # rotate the offset into the rect's local (unrotated) frame
        rdx = cos_a * dx + sin_a * dy
        rdy = -sin_a * dx + cos_a * dy
        dx, dy = rdx, rdy

    mask_alpha = _mask_alpha(px, py, params, static.n_masks, static.rotated_masks)

    if static.content == "box_shadow":
        edge = -rounded_rect_sdf(dx, dy, w * 0.5, h * 0.5, params.border_radius)
        blur = jnp.maximum(params.blur_radius, 1.0)
        a = smoothstep(-blur * 0.5, blur * 0.5, edge) * mask_alpha
        return _premultiply(params.color) * a[None]

    edge = -rounded_rect_sdf(dx, dy, w * 0.5, h * 0.5, params.border_radius)

    if static.content == "color":
        content = jnp.broadcast_to(_premultiply(params.color), (4,) + px.shape)
    else:  # texture
        mips = _src_mips(sources[static.source_index])
        crop_top, crop_left = params.crop[0], params.crop[1]
        crop_w, crop_h = params.crop[2], params.crop[3]
        # local rect coords in [0, w) x [0, h) -> source pixels inside crop
        u = (dx + w * 0.5) / jnp.maximum(w, 1e-6)
        v = (dy + h * 0.5) / jnp.maximum(h, 1e-6)
        sx = crop_left + u * crop_w - 0.5
        sy = crop_top + v * crop_h - 0.5
        if isinstance(mips, (list, tuple)) and len(mips) > 1:
            scale = jnp.maximum(
                crop_w / jnp.maximum(w, 1e-6), crop_h / jnp.maximum(h, 1e-6)
            )
            content = sample_bilinear_mip(list(mips), sy, sx, scale)
        else:
            img = mips[0] if isinstance(mips, (list, tuple)) else mips
            content = sample_bilinear(img, sy, sx)
        content = jnp.moveaxis(content, -1, 0)  # gather path is (H, W, 4)

    if not static.has_border:
        a = smoothstep(-0.5, 0.5, edge) * mask_alpha
        return content * a[None]

    bw = params.border_width
    border_color = _premultiply(params.border_color)
    if static.content == "color":
        border_alpha = smoothstep(bw, bw + 1.0, edge)
    else:
        border_alpha = smoothstep(bw - 0.5, bw + 0.5, edge)
    inner = border_color + (content - border_color) * border_alpha[None]
    content_alpha = smoothstep(-0.5, 0.5, edge)
    outer = border_color * content_alpha[None]
    out = jnp.where((edge > bw * 0.5)[None], inner, outer)
    return out * mask_alpha[None]


def _layer_region(static: LayoutStatic) -> Tuple[int, int, int, int]:
    """Unclipped canvas region (top, left, h, w) a region-local layout can
    touch: its static rect, expanded to the rotated bbox for stable-rotation
    layers and by the blur pad for box shadows."""
    top, left, h, w = static.static_rect  # type: ignore[misc]
    if static.static_rotation is not None and abs(static.static_rotation) > 1e-9:
        if static.content == "texture":
            from smelter_tpu.ops.rotate import rotated_bbox

            bh, bw_ = rotated_bbox(float(static.static_rotation), h, w)
        else:
            th = math.radians(float(static.static_rotation))
            bh = int(math.ceil(h * abs(math.cos(th)) + w * abs(math.sin(th)))) + 2
            bw_ = int(math.ceil(h * abs(math.sin(th)) + w * abs(math.cos(th)))) + 2
        top, left = top + (h - bh) // 2, left + (w - bw_) // 2
        h, w = bh, bw_
    if static.content == "box_shadow":
        pad = int(math.ceil(static.static_blur)) + 1
        top, left, h, w = top - pad, left - pad, h + 2 * pad, w + 2 * pad
    return top, left, h, w


def _pad_into(
    layer: jnp.ndarray, otop: int, oleft: int, Y0: int, X0: int, vh: int, vw: int
) -> jnp.ndarray:
    """Place a (4, h, w) layer whose absolute origin is (otop, oleft) inside
    a (4, vh, vw) zero region whose absolute origin is (Y0, X0), clipped.
    Static pad — fuses into the consuming blend chain."""
    h, w = layer.shape[1], layer.shape[2]
    y0, y1 = max(otop, Y0), min(otop + h, Y0 + vh)
    x0, x1 = max(oleft, X0), min(oleft + w, X0 + vw)
    if y0 >= y1 or x0 >= x1:
        return jnp.zeros((4, vh, vw), jnp.float32)
    vis = layer[:, y0 - otop : y1 - otop, x0 - oleft : x1 - oleft]
    return jnp.pad(
        vis, [(0, 0), (y0 - Y0, Y0 + vh - y1), (x0 - X0, X0 + vw - x1)]
    )


def _region_layer(
    static: LayoutStatic,
    params: LayoutParams,
    sources: Sequence,
    Y0: int,
    X0: int,
    vh: int,
    vw: int,
) -> jnp.ndarray:
    """Premultiplied (4, vh, vw) contribution of one region-local layout over
    the absolute canvas region [Y0, Y0+vh) x [X0, X0+vw) — a superset of the
    layout's own `_layer_region` (a union region when layers coalesce).
    Outside the layout's footprint the contribution is exactly zero, so
    blending over a larger region is identical to blending over its own.
    Rect placement is integer; colors/radii/masks/angles stay traced."""
    top, left, h, w = static.static_rect  # type: ignore[misc]

    if static.content == "texture" and static.static_rotation is not None:
        # stable-rotation texture: upright tile + gather-free 3-shear
        # rotation (static angle, banded slices), padded into the region
        from smelter_tpu.ops.rotate import rotate_static_cm, rotated_bbox

        theta = float(static.static_rotation)
        tile = _prepare_rect_tile(static, params, sources)
        bh, bw_ = rotated_bbox(theta, h, w)
        rotated = rotate_static_cm(tile, theta, bh, bw_)
        oy = top + (h - bh) // 2
        ox = left + (w - bw_) // 2
        rotated = _apply_masks_region(rotated, static, params, oy, ox)
        return _pad_into(rotated, oy, ox, Y0, X0, vh, vw)

    # absolute pixel-center coords of the region (static)
    py = (jnp.arange(Y0, Y0 + vh, dtype=jnp.float32) + 0.5)[:, None]
    px = (jnp.arange(X0, X0 + vw, dtype=jnp.float32) + 0.5)[None, :]
    py = jnp.broadcast_to(py, (vh, vw))
    px = jnp.broadcast_to(px, (vh, vw))

    if static.content in ("color", "box_shadow"):
        # rounded-rect SDF is analytic: handles stable AND traced rotation
        # as a coordinate rotation (render_single_layout), elementwise
        return render_single_layout(static, params, sources, px, py)

    # non-rotated texture: region-local MXU resize of the source crop
    rw, rh = params.width, params.height
    cx = params.left + rw * 0.5
    cy = params.top + rh * 0.5
    dx = px - cx
    dy = py - cy
    mask_alpha = _mask_alpha(px, py, params, static.n_masks, static.rotated_masks)
    edge = -rounded_rect_sdf(dx, dy, rw * 0.5, rh * 0.5, params.border_radius)

    # (4, h, w) resize via MXU — already channel-major
    tile = _src_tile_cm(sources[static.source_index], static.static_crop, h, w)
    content = _pad_into(tile, top, left, Y0, X0, vh, vw)

    if static.has_border:
        bw = params.border_width
        border_color = _premultiply(params.border_color)
        border_alpha = smoothstep(bw - 0.5, bw + 0.5, edge)
        inner = border_color + (content - border_color) * border_alpha[None]
        content_alpha = smoothstep(-0.5, 0.5, edge)
        outer = border_color * content_alpha[None]
        layer = jnp.where((edge > bw * 0.5)[None], inner, outer)
        return layer * mask_alpha[None]
    a = smoothstep(-0.5, 0.5, edge) * mask_alpha
    return content * a[None]


def _prepare_rect_tile(
    static: LayoutStatic, params: LayoutParams, sources: Sequence
) -> jnp.ndarray:
    """Resize the source crop upright (MXU matmuls) and apply edge/border
    SDF alpha in the rect's LOCAL axis-aligned frame. Shared by both
    rotation fast paths. Returns channel-major (4, h, w)."""
    top, left, h, w = static.static_rect  # type: ignore[misc]
    tile = _src_tile_cm(
        sources[static.source_index], static.static_crop, h, w
    )

    rw, rh = params.width, params.height
    ly = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None] - h * 0.5
    lx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :] - w * 0.5
    dy = jnp.broadcast_to(ly, (h, w))
    dx = jnp.broadcast_to(lx, (h, w))
    edge = -rounded_rect_sdf(dx, dy, rw * 0.5, rh * 0.5, params.border_radius)
    if static.has_border:
        bw = params.border_width
        border_color = _premultiply(params.border_color)
        border_alpha = smoothstep(bw - 0.5, bw + 0.5, edge)
        inner = border_color + (tile - border_color) * border_alpha[None]
        content_alpha = smoothstep(-0.5, 0.5, edge)
        outer = border_color * content_alpha[None]
        tile = jnp.where((edge > bw * 0.5)[None], inner, outer)
    else:
        tile = tile * smoothstep(-0.5, 0.5, edge)[None]
    return tile


def _blend_region(canvas, layer, otop: int, oleft: int) -> jnp.ndarray:
    """OVER-blend a premultiplied (4, h, w) layer at an integer origin,
    clipped."""
    H, W = canvas.shape[1], canvas.shape[2]
    bh, bw_ = layer.shape[1], layer.shape[2]
    y0, y1 = max(otop, 0), min(otop + bh, H)
    x0, x1 = max(oleft, 0), min(oleft + bw_, W)
    if y0 >= y1 or x0 >= x1:
        return canvas
    vis = layer[:, y0 - otop : y1 - otop, x0 - oleft : x1 - oleft]
    region = canvas_decode(canvas[:, y0:y1, x0:x1])
    return canvas.at[:, y0:y1, x0:x1].set(
        _canvas_encode(_over(vis, region), canvas.dtype)
    )


def _render_rotated_rect_layout_traced(
    static: LayoutStatic,
    params: LayoutParams,
    sources: Sequence,
    canvas: jnp.ndarray,
) -> jnp.ndarray:
    """ANIMATED-rotation fast path: the rect/crop are planner-stable but the
    angle changes per frame, so the rotation runs with a TRACED angle via
    barrel-shifter shears (ops/rotate.py rotate_traced) over a static
    bounding-circle square — no gathers, no per-frame recompile. The static
    quarter-turn bucket keeps the traced residual in [-45, 45]."""
    from smelter_tpu.ops.rotate import rotate_traced_cm, traced_work_size

    top, left, h, w = static.static_rect  # type: ignore[misc]
    tile = _prepare_rect_tile(static, params, sources)
    rotated = rotate_traced_cm(
        tile, params.rotation_degrees, static.traced_rotation_q  # type: ignore[arg-type]
    )
    S = traced_work_size(h, w)
    oy = top + (h - S) // 2
    ox = left + (w - S) // 2
    rotated = _apply_masks_region(rotated, static, params, oy, ox)
    return _blend_region(canvas, rotated, oy, ox)


def _render_moving_rect_layout(
    static: LayoutStatic,
    params: LayoutParams,
    sources: Sequence,
    canvas: jnp.ndarray,
) -> jnp.ndarray:
    """ANIMATED-position fast path (slide transitions): size and crop are
    planner-stable, so the tile is prepared at a static size (MXU resize +
    local SDF) and placed at a TRACED integer position with
    `lax.dynamic_update_slice` into a zero layer padded by the tile size
    (padding absorbs the clamp semantics at canvas edges), then blended
    full-canvas. No gathers, no per-frame recompile; sub-pixel motion
    rounds to the nearest pixel while animating."""
    tile = _prepare_rect_tile(static, params, sources)
    tile = _apply_masks_local(tile, static, params)
    return _place_tile_traced(canvas, tile, params.top, params.left)


def _apply_masks_region(tile, static: LayoutStatic, params: LayoutParams,
                        origin_y: int, origin_x: int):
    """Apply parent masks to a region-local (4, h, w) tile at a STATIC
    integer origin (masks are canvas-axis-aligned rounded rects, so this is
    elementwise — the reason rotated layers with overflow clips can stay on
    the region-local fast paths instead of the full-canvas sampled pass)."""
    if not static.n_masks:
        return tile
    h, w = tile.shape[1], tile.shape[2]
    py = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None] + origin_y
    px = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :] + origin_x
    py = jnp.broadcast_to(py, (h, w))
    px = jnp.broadcast_to(px, (h, w))
    return tile * _mask_alpha(px, py, params, static.n_masks, static.rotated_masks)[None]


def _apply_masks_local(tile, static: LayoutStatic, params: LayoutParams):
    """Apply parent masks to a (4, h, w) tile in canvas-space coordinates
    derived from the traced position (masks animate freely — e.g. the clip
    rect a fill-mode Rescaler emits while zooming)."""
    if not static.n_masks:
        return tile
    h, w = tile.shape[1], tile.shape[2]
    py = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None] + params.top
    px = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :] + params.left
    py = jnp.broadcast_to(py, (h, w))
    px = jnp.broadcast_to(px, (h, w))
    return tile * _mask_alpha(px, py, params, static.n_masks, static.rotated_masks)[None]


def _place_tile_traced(canvas, tile, top, left) -> jnp.ndarray:
    """OVER-blend a premultiplied (4, h, w) tile at a TRACED
    (rounded-to-pixel) position. dynamic_slice clamps starts into bounds;
    the clamp delta is compensated by shifting the tile inside a zero-padded
    copy, so partially off-canvas positions stay correct. Traffic is
    O(tile + region), not O(canvas + tile-sized halo)."""
    import jax.lax as lax

    H, W = canvas.shape[1], canvas.shape[2]
    h, w = tile.shape[1], tile.shape[2]
    ty = jnp.clip(jnp.round(top).astype(jnp.int32), -h, H)
    tx = jnp.clip(jnp.round(left).astype(jnp.int32), -w, W)
    if h > H or w > W:
        # tile larger than the canvas (e.g. a roto-zoom bounding square on a
        # short canvas): write into a halo-padded zero layer, slice the
        # canvas window statically, blend full-canvas
        layer = jnp.zeros((4, H + 2 * h, W + 2 * w), jnp.float32)
        layer = lax.dynamic_update_slice(layer, tile, (jnp.int32(0), ty + h, tx + w))
        layer = layer[:, h : h + H, w : w + W]
        return _canvas_encode(_over(layer, canvas_decode(canvas)), canvas.dtype)
    sy = jnp.clip(ty, 0, max(H - h, 0))
    sx = jnp.clip(tx, 0, max(W - w, 0))
    padded_tile = jnp.pad(tile, [(0, 0), (h, h), (w, w)])
    shifted = lax.dynamic_slice(
        padded_tile, (jnp.int32(0), h - (ty - sy), w - (tx - sx)), (4, h, w)
    )
    region = canvas_decode(
        lax.dynamic_slice(canvas, (jnp.int32(0), sy, sx), (4, h, w))
    )
    return lax.dynamic_update_slice(
        canvas,
        _canvas_encode(_over(shifted, region), canvas.dtype),
        (jnp.int32(0), sy, sx),
    )


def _render_scaling_rect_layout(
    static: LayoutStatic,
    params: LayoutParams,
    sources: Sequence,
    canvas: jnp.ndarray,
) -> jnp.ndarray:
    """ANIMATED-size fast path (zoom transitions): the tile resizes to a
    TRACED size inside a statically-bucketed buffer — the resize weight
    matrices are computed in-graph from the traced scale
    (ops/resample.resize_matmul_traced), so size animation neither gathers
    nor recompiles within a bucket. Edge AA/border/radius run in the local
    frame with traced extents (which also masks the unused buffer region),
    then the tile places via the traced-position machinery."""
    from smelter_tpu.ops.resample import resize_matmul_traced

    bh, bw_ = static.traced_size_buf  # type: ignore[misc]
    mips = _src_mips(sources[static.source_index])
    img = mips[0]
    # crop is traced (folded into the resize weights), so fill-mode zooms
    # and crop animations share this path
    tile = resize_matmul_traced(
        jnp.moveaxis(img, -1, 0), bh, bw_, params.height, params.width,
        crop=(params.crop[0], params.crop[1], params.crop[2], params.crop[3]),
    ).astype(jnp.float32)

    rw, rh = params.width, params.height
    dy = (jnp.arange(bh, dtype=jnp.float32) + 0.5)[:, None] - rh * 0.5
    dx = (jnp.arange(bw_, dtype=jnp.float32) + 0.5)[None, :] - rw * 0.5
    dy = jnp.broadcast_to(dy, (bh, bw_))
    dx = jnp.broadcast_to(dx, (bh, bw_))
    edge = -rounded_rect_sdf(dx, dy, rw * 0.5, rh * 0.5, params.border_radius)
    if static.has_border:
        bwidth = params.border_width
        border_color = _premultiply(params.border_color)
        border_alpha = smoothstep(bwidth - 0.5, bwidth + 0.5, edge)
        inner = border_color + (tile - border_color) * border_alpha[None]
        content_alpha = smoothstep(-0.5, 0.5, edge)
        outer = border_color * content_alpha[None]
        tile = jnp.where((edge > bwidth * 0.5)[None], inner, outer)
    else:
        tile = tile * smoothstep(-0.5, 0.5, edge)[None]
    tile = _apply_masks_local(tile, static, params)
    return _place_tile_traced(canvas, tile, params.top, params.left)


def _render_rotozoom_layout(
    static: LayoutStatic,
    params: LayoutParams,
    sources: Sequence,
    canvas: jnp.ndarray,
) -> jnp.ndarray:
    """Simultaneous rotation+size(+position+crop) animation: traced centered
    resize into the bucketed buffer, local SDF with traced extents, traced
    barrel-shear rotation about the buffer center (static quarter bucket),
    then axis-aligned masks in canvas space and traced placement. Completes
    the gather-free coverage of every transition type."""
    from smelter_tpu.ops.resample import resize_matmul_traced
    from smelter_tpu.ops.rotate import rotate_traced_cm, traced_work_size

    bh, bw_ = static.traced_size_buf  # type: ignore[misc]
    mips = _src_mips(sources[static.source_index])
    img = mips[0]
    tile = resize_matmul_traced(
        jnp.moveaxis(img, -1, 0), bh, bw_, params.height, params.width,
        crop=(params.crop[0], params.crop[1], params.crop[2], params.crop[3]),
        centered=True,
    ).astype(jnp.float32)

    rw, rh = params.width, params.height
    dy = (jnp.arange(bh, dtype=jnp.float32) + 0.5)[:, None] - bh * 0.5
    dx = (jnp.arange(bw_, dtype=jnp.float32) + 0.5)[None, :] - bw_ * 0.5
    dy = jnp.broadcast_to(dy, (bh, bw_))
    dx = jnp.broadcast_to(dx, (bh, bw_))
    edge = -rounded_rect_sdf(dx, dy, rw * 0.5, rh * 0.5, params.border_radius)
    if static.has_border:
        bwidth = params.border_width
        border_color = _premultiply(params.border_color)
        border_alpha = smoothstep(bwidth - 0.5, bwidth + 0.5, edge)
        inner = border_color + (tile - border_color) * border_alpha[None]
        content_alpha = smoothstep(-0.5, 0.5, edge)
        outer = border_color * content_alpha[None]
        tile = jnp.where((edge > bwidth * 0.5)[None], inner, outer)
    else:
        tile = tile * smoothstep(-0.5, 0.5, edge)[None]

    rotated = rotate_traced_cm(
        tile, params.rotation_degrees, static.traced_rotation_q  # type: ignore[arg-type]
    )
    S = traced_work_size(bh, bw_)
    cy = params.top + rh * 0.5
    cx = params.left + rw * 0.5
    if static.n_masks:
        # masks are canvas-axis-aligned → apply AFTER rotation
        my = (jnp.arange(S, dtype=jnp.float32) + 0.5)[:, None] - S * 0.5 + cy
        mx = (jnp.arange(S, dtype=jnp.float32) + 0.5)[None, :] - S * 0.5 + cx
        my = jnp.broadcast_to(my, (S, S))
        mx = jnp.broadcast_to(mx, (S, S))
        rotated = rotated * _mask_alpha(mx, my, params, static.n_masks, static.rotated_masks)[None]
    return _place_tile_traced(canvas, rotated, cy - S * 0.5, cx - S * 0.5)


def _blend_group(canvas, members, union, sources, h: int, w: int):
    """OVER-blend one coalesced group: one canvas region read, one fused
    elementwise chain, one slice write (none at all when the union covers
    the full canvas)."""
    uy, ux, uh, uw = union
    # the region decodes to f32, the whole chain blends in f32, and only
    # the stored value quantizes back to the canvas storage dtype
    acc = canvas_decode(canvas[:, uy : uy + uh, ux : ux + uw])
    for st, p in members:
        acc = _over(_region_layer(st, p, sources, uy, ux, uh, uw), acc)
    acc = _canvas_encode(acc, canvas.dtype)
    if (uh, uw) == (h, w):
        return acc
    return canvas.at[:, uy : uy + uh, ux : ux + uw].set(acc)


def _align_union(reg, h: int, w: int, sublane: int = 8):
    """Expand a group's union to TPU tiling boundaries — sublane x lane =
    (8, 128) for f32, (16, 128) for bf16 — so the group's canvas slice read
    and dynamic-update-slice write are tile-aligned (a misaligned DUS pays a
    read-modify-write on every boundary tile; device A/B in
    bench_artifacts/align_ab_r05.json). Exact: member contributions are
    evaluated over the whole (expanded) union and are exactly zero outside
    their footprint (see _region_layer), and OVER with a zero layer is the
    identity."""
    uy, ux, uh, uw = reg
    y0 = (uy // sublane) * sublane
    x0 = (ux // 128) * 128
    y1 = min(h, -(-(uy + uh) // sublane) * sublane)
    x1 = min(w, -(-(ux + uw) // 128) * 128)
    return y0, x0, y1 - y0, x1 - x0


def _assembly_mode() -> str:
    import os

    from smelter_tpu.config import xla_kernels_forced

    if xla_kernels_forced():  # GSPMD-sharded trace: no pallas routes
        return "off"
    return os.environ.get("SMELTER_SCENE_ASSEMBLY", "auto")


def _canvas_dtype(planar: bool):
    """Storage dtype of the root planar canvas (SMELTER_CANVAS_DTYPE:
    auto|float32|uint16|bfloat16|float16, auto = uint16 on TPU only).

    A 16-bit canvas halves the canvas HBM traffic — on the 16-input 4K
    general scene that is the dominant remaining cost (the 132 MB f32
    canvas is written by the assembly kernel, read+written by every
    texture group chain and re-read by the YUV output). Every BLEND stays
    f32: canvas reads decode to f32 (color_convert.canvas_decode), layers
    are f32, and only the stored value quantizes (_canvas_encode).

    Why FIXED-POINT u16 (value*8192 + 16384, headroom [-2, 6) for
    Lanczos ringing — an unclamped [0,1]*65535 encoding clips ringing
    that f32 keeps until the final YUV clip, up to 38 u8 LSB off) and
    not a 16-bit float: canvas values are premultiplied ~[0, 1], so u16
    quantization is a uniform 1/8192 ~= 0.03 u8 LSB per store —
    invisible next to the 1-LSB snapshot tolerance even through the
    worst case (assembly write + one group blend + 2x2 chroma pooling).
    bf16 (2^-9 spacing at the range
    top, ~0.5 LSB/store) measurably BREAKS that tolerance — the device
    A/B caught 2-LSB chroma deviations on blend-edge pixels where both
    quantized stores feed the chroma pool — and f16 (which would fit) has
    no Mosaic lowering on this libtpu ("Unsupported type in mosaic
    dialect: 'f16'"). Device A/B + parity gate: tools/bench_canvas_ab.py,
    bench_artifacts/canvas_ab_r05.json. CPU keeps f32 (the parity-pinned
    reference); GSPMD-sharded traces force f32 with the XLA kernel paths
    so multi-chip stays bit-exact vs single-chip."""
    if not planar:
        return jnp.float32
    import os

    from smelter_tpu.config import xla_kernels_forced

    if xla_kernels_forced():
        return jnp.float32
    mode = os.environ.get("SMELTER_CANVAS_DTYPE", "auto")
    if mode in ("uint16", "u16"):
        return jnp.uint16
    if mode in ("float16", "f16"):
        return jnp.float16
    if mode in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if mode == "auto":
        from smelter_tpu.ops.pallas.scene_assembly import _on_tpu

        if _on_tpu():
            return jnp.uint16
    return jnp.float32


def _canvas_encode(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """f32 premultiplied values -> canvas storage (see _canvas_dtype;
    inverse of color_convert.canvas_decode). The u16 fixed-point format
    keeps [-2, 6) headroom for Lanczos ringing."""
    if dtype == jnp.uint16:
        from smelter_tpu.ops.color_convert import (
            CANVAS_FIXED_OFFSET,
            CANVAS_FIXED_SCALE,
        )

        q = jnp.round(x * CANVAS_FIXED_SCALE + CANVAS_FIXED_OFFSET)
        return jnp.clip(q, 0.0, 65535.0).astype(jnp.uint16)
    return x.astype(dtype)


def _try_scene_assembly(items, i: int, j: int, sources, h: int, w: int, clip,
                        out_dtype=jnp.float32):
    """Route a canvas-opening run of region-local layouts (run index 0, no
    background) through the single-pass Pallas SDF assembly kernel
    (ops/pallas/scene_assembly.py): ALL the run's color/box-shadow members
    are painted by one kernel pass that CREATES the canvas (each block
    written exactly once, members culled per block), and the texture members
    are returned for the regular aligned-union group path to blend on top.

    The split pulls SDF members FORWARD past earlier group-routed members,
    which is exact only when their footprints are disjoint (premultiplied
    OVER commutes for disjoint supports, and a zero layer is the blend
    identity): each SDF member joins the kernel only if its clipped
    footprint intersects no earlier group-routed member's footprint —
    otherwise it stays in the group run at its original position. Returns
    (canvas, group_items) or None when nothing routes to the kernel (the
    XLA group path remains the fallback and the off-TPU reference
    implementation)."""
    mode = _assembly_mode()
    if mode == "off":
        return None
    if mode != "on":
        from smelter_tpu.ops.pallas.scene_assembly import _on_tpu

        if not _on_tpu():
            return None
    from smelter_tpu.ops.pallas import scene_assembly as sa

    BH, BW = sa.block_shape()
    specs, plist, group_items = [], [], []
    group_regions: list = []  # clipped footprints routed to the group path
    max_masks = 0

    def _intersects(a, b):
        return (a[0] < b[0] + b[2] and b[0] < a[0] + a[2]
                and a[1] < b[1] + b[3] and b[1] < a[1] + a[3])

    for k in range(i, j):
        st, p = items[k]
        reg = clip(_layer_region(st))
        if reg is None:  # fully off-canvas: contributes nothing
            continue
        if st.content in ("color", "box_shadow") and not any(
            _intersects(reg, gr) for gr in group_regions
        ):
            y0, x0, rh, rw = reg
            fill = None
            if (st.content == "color" and st.no_radius
                    and not st.has_border and not st.has_rotation
                    and st.n_masks == 0):
                # blocks fully in the flat interior (clipped rect shrunk by
                # 2 px: 1 px covers the SDF smoothstep half-width, 1 more
                # the planner's integer hull of the traced rect) skip the
                # SDF math entirely
                fy0, fy1 = -(-(y0 + 2) // BH), (y0 + rh - 2) // BH
                fx0, fx1 = -(-(x0 + 2) // BW), (x0 + rw - 2) // BW
                if fy0 < fy1 and fx0 < fx1:
                    fill = (fy0, fy1, fx0, fx1)
            specs.append(sa.MemberSpec(
                st.content, st.has_border, st.has_rotation,
                st.n_masks, st.rotated_masks,
                (y0 // BH, -(-(y0 + rh) // BH),
                 x0 // BW, -(-(x0 + rw) // BW)),
                fill_blocks=fill,
            ))
            plist.append(p)
            max_masks = max(max_masks, st.n_masks)
        else:
            group_items.append((st, p))
            group_regions.append(reg)
    if not specs:
        return None
    # params rows live in kernel SMEM (scalar memory, small): bound the
    # table so pathological scenes (hundreds of members / deep mask
    # stacks) fall back to the XLA group path instead of overflowing
    if len(specs) * (sa.PARAMS_BASE + sa.MASK_W * max_masks) * 4 > 16384:
        return None
    params = sa.pack_member_params(plist, max_masks)
    return (
        sa.assemble_scene_planar((w, h), specs, params, out_dtype=out_dtype),
        group_items,
    )


def _assemble_local_run(canvas, run_items, sources, h: int, w: int, clip):
    """Blend a run of region-local layouts onto the canvas: coalesce into
    union groups by the traffic model ((k+3)*|union| <= 3*sum(|r_i|) —
    the union read+write plus extra per-member shading area must beat the
    per-layout region reads+writes), align the unions to TPU tiling, and
    assemble one aligned slice update per group."""
    groups = []  # (members, union, paint_idx)
    cur = None  # (members, (uy,ux,uh,uw), area_sum, idx)
    for k, (st2, p2) in enumerate(run_items):
        r2 = clip(_layer_region(st2))
        if r2 is None:  # fully off-canvas: contributes nothing
            continue
        if cur is not None:
            members, (uy, ux, uh, uw), area_sum, idx = cur
            ny0 = min(uy, r2[0])
            nx0 = min(ux, r2[1])
            ny1 = max(uy + uh, r2[0] + r2[2])
            nx1 = max(ux + uw, r2[1] + r2[3])
            n_area = (ny1 - ny0) * (nx1 - nx0)
            if (len(members) + 3) * n_area <= 3 * (area_sum + r2[2] * r2[3]):
                members.append((st2, p2))
                cur = (
                    members,
                    (ny0, nx0, ny1 - ny0, nx1 - nx0),
                    area_sum + r2[2] * r2[3],
                    idx,
                )
                continue
            groups.append((members, (uy, ux, uh, uw), idx))
        cur = ([(st2, p2)], r2, r2[2] * r2[3], k)
    if cur is not None:
        groups.append((cur[0], cur[1], cur[3]))
    sublane = (
        16 if canvas.dtype in (jnp.uint16, jnp.bfloat16, jnp.float16) else 8
    )
    groups = [
        (members, _align_union(union, h, w, sublane), idx)
        for members, union, idx in groups
    ]
    return _assemble_groups(canvas, groups, sources, h, w)


def _assemble_groups(canvas, groups, sources, h: int, w: int):
    """Assemble a run of coalesced groups onto the canvas in paint order:
    one full-canvas slice update per group.

    NOTE (round-5 device A/B, bench_artifacts/banding_ab_r05.json): a
    strip-banding variant that split the canvas into horizontal bands and
    re-joined with one H-concat — motivated by a traffic model in which
    each group's dynamic-update-slice pays a whole-canvas copy — measured
    +0.56 ms on the 4K flagship scene and was deleted. XLA elides most DUS
    copies in-place inside the fused program; the concat re-join's fresh
    canvas materialization is real. Keep assembly flat."""
    for members, union, _ in groups:
        canvas = _blend_group(canvas, members, union, sources, h, w)
    return canvas


def compose_layouts(
    resolution: Tuple[int, int],  # (width, height)
    statics: Sequence[LayoutStatic],
    params: Sequence[LayoutParams],
    sources: Sequence,
    background: Optional[jnp.ndarray] = None,  # (H, W, 4) premultiplied f32
    planar: bool = False,
) -> jnp.ndarray:
    """Blend all layouts over a transparent canvas (see
    `_compose_layouts_impl` for the full algorithm notes)."""
    return _compose_layouts_impl(
        resolution, statics, params, sources, background, planar
    )


def _compose_layouts_impl(
    resolution: Tuple[int, int],
    statics: Sequence[LayoutStatic],
    params: Sequence[LayoutParams],
    sources: Sequence,
    background: Optional[jnp.ndarray] = None,
    planar: bool = False,
) -> jnp.ndarray:
    """Blend all layouts over a transparent canvas; returns premultiplied
    f32 — channel-major (4, H, W) when `planar=True` (feeds the per-plane
    YUV output converters with zero transposes), (H, W, 4) otherwise.
    Layout order = paint order (later on top).

    Layouts whose `static_rect` is set take the region-local fast path
    (no full-canvas gathers); the rest run the general full-canvas pass
    (animating rects / traced rotations). Consecutive region-local layouts
    whose footprints overlap (a tile's shadow + backdrop + content, paint
    order adjacency) COALESCE into one union-region blend chain: one canvas
    region read and one slice write per group instead of one per layout —
    premultiplied OVER is associative, so grouping is exact. The merge
    heuristic is the traffic model: adding a member is accepted iff
    (k+3)*|union| <= 3*sum(|r_i|), i.e. the union read+write plus the extra
    per-member shading area beats the per-layout region reads+writes."""
    w, h = resolution
    dt = _canvas_dtype(planar)
    if background is not None:
        canvas = _canvas_encode(jnp.moveaxis(background, -1, 0), dt)
    elif dt == jnp.uint16:
        # transparent black encodes to the fixed-point zero level
        from smelter_tpu.ops.color_convert import CANVAS_FIXED_OFFSET

        canvas = jnp.full((4, h, w), jnp.uint16(CANVAS_FIXED_OFFSET))
    else:
        canvas = jnp.zeros((4, h, w), dt)
    px = py = None
    items = list(zip(statics, params))

    def _local(st: LayoutStatic) -> bool:
        if st.traced_position or st.traced_size_buf is not None:
            return False
        if st.static_rect is None:
            return False
        if st.has_rotation:
            return st.static_rotation is not None
        return True

    def _clip(reg):
        top, left, hh, ww = reg
        y0, y1 = max(top, 0), min(top + hh, h)
        x0, x1 = max(left, 0), min(left + ww, w)
        if y0 >= y1 or x0 >= x1:
            return None
        return y0, x0, y1 - y0, x1 - x0


    i = 0
    while i < len(items):
        st, p = items[i]
        if (
            st.traced_position
            and st.static_rect is not None
            and st.static_rect[2] <= h
            and st.static_rect[3] <= w
        ):
            canvas = _render_moving_rect_layout(st, p, sources, canvas)
            i += 1
            continue
        if (
            st.traced_size_buf is not None
            and st.traced_rotation_q is not None
            and st.content == "texture"
        ):
            canvas = _render_rotozoom_layout(st, p, sources, canvas)
            i += 1
            continue
        if (
            st.traced_size_buf is not None
            and st.traced_rotation_q is None
            and st.content == "texture"
        ):
            canvas = _render_scaling_rect_layout(st, p, sources, canvas)
            i += 1
            continue
        if _local(st):
            run_end = i
            while run_end < len(items) and _local(items[run_end][0]):
                run_end += 1
            run_items = items[i:run_end]
            if i == 0 and background is None:
                # canvas-opening run: paint the SDF members (background,
                # color backdrops, shadows) via the single-pass Pallas
                # assembly kernel — the canvas is created with one write per
                # block — then blend the textures through the group path
                assembled = _try_scene_assembly(
                    items, i, run_end, sources, h, w, _clip, out_dtype=dt
                )
                if assembled is not None:
                    canvas, run_items = assembled
            canvas = _assemble_local_run(
                canvas, run_items, sources, h, w, _clip
            )
            i = run_end
            continue
        if (
            st.static_rect is not None
            and st.traced_rotation_q is not None
            and st.content == "texture"
        ):
            canvas = _render_rotated_rect_layout_traced(st, p, sources, canvas)
            i += 1
            continue
        # collect a run of full-canvas non-texture layers → fused Pallas
        # pass (one canvas read/write for the whole run)
        run = []
        j = i
        while j < len(items):
            st_j, p_j = items[j]
            if (
                st_j.static_rect is None
                and st_j.content in ("color", "box_shadow")
                and st_j.n_masks == 0
            ):
                run.append((st_j, p_j))
                j += 1
            else:
                break
        if run:
            from smelter_tpu.ops.pallas.sdf_layers import (
                compose_sdf_layers_planar,
                pack_layer_params_traced,
            )

            kinds = tuple(
                (s_.content, s_.has_border, s_.has_rotation) for s_, _ in run
            )
            rows = pack_layer_params_traced([p_ for _, p_ in run])
            # the sdf_layers kernel speaks f32; a 16-bit canvas decodes
            # once here and stays f32 for the rest of the paint order
            canvas = compose_sdf_layers_planar(canvas_decode(canvas), rows, kinds)
            i = j
            continue
        if px is None:
            px = jnp.broadcast_to(
                (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :], (h, w)
            )
            py = jnp.broadcast_to(
                (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None], (h, w)
            )
        layer = render_single_layout(st, p, sources, px, py)
        # full-canvas sampled pass: decode once; the canvas stays f32 for
        # the rest of the paint order (correct, just without the 16-bit
        # traffic win — these layers are animating geometry anyway)
        canvas = _over(layer, canvas_decode(canvas))
        i += 1
    return canvas if planar else jnp.moveaxis(canvas, 0, -1)
