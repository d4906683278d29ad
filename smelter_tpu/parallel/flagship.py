"""Flagship compose pipeline: N x 1080p YUV inputs -> tiled 4K YUV output.

This is the BASELINE.json north-star configuration (16x1080p -> 4K60) as a
pure jittable function, plus a multi-chip sharded variant.

TPU-first design (single chip): the Tiles benchmark scene is an *opaque
axis-aligned grid*, so the whole compose stays in the YUV domain — no
RGBA roundtrip, no per-pixel gathers:

  - per-input rescale runs as separable dense matmuls on the MXU
    (`resize_matmul`: u8 -> bf16 exact, f32 accumulate), batched over all N
    inputs in one einsum per plane when tiles are uniform
  - tiles land in the canvas via static slice updates (XLA performs them
    in place inside the fused program)
  - chroma planes are processed at half resolution, exactly like the
    reference's YUV pipeline avoids upsampling (rgba_to_yuv.wgsl)

Scenes that are NOT an opaque grid (rotation, radii, borders, masks, alpha)
fall back to the general RGBA compose program (`ops/compose.py`), same as the
renderer uses.

Multi chip (jax.sharding over a Mesh):
  - inputs are stacked (N, H, W) planes sharded along N ("streams" axis):
    per-stream rescale runs fully parallel
  - the gather of tiles into the output canvas is a reshape/transpose whose
    resharding XLA lowers to an all-gather over ICI
  - output assembly is sharded along output rows ("space" axis)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smelter_tpu.core.types import Resolution, RGBAColor
from smelter_tpu.ops import color_convert as cc
from smelter_tpu.ops.compose import compose_layouts
from smelter_tpu.ops.resample import build_mips, resize_matmul
from smelter_tpu.render.program import split_layout
from smelter_tpu.scene import components as comp
from smelter_tpu.scene.layout_types import (
    BorderRadius,
    RenderChildNode,
    RenderColor,
)
from smelter_tpu.scene.scene_state import BuildCtx, LayoutNode, build_stateful


def _tiles_layouts(n_inputs: int, in_res: Resolution, out_res: Resolution):
    """Flattened RenderLayouts for a Tiles grid of n inputs (the benchmark
    scene from the reference benchmark bin)."""
    scene = comp.Tiles(
        children=[comp.InputStream(input_id=f"in_{i}") for i in range(n_inputs)],
        background_color=RGBAColor(8, 8, 8),
    )
    return _scene_layouts(scene, n_inputs, in_res, out_res)


def _scene_layouts(scene, n_inputs: int, in_res: Resolution, out_res: Resolution):
    """Flattened RenderLayouts for an arbitrary scene over n input streams."""
    ctx = BuildCtx(
        prev_state={},
        last_render_pts=0.0,
        input_resolutions={f"in_{i}": in_res for i in range(n_inputs)},
        text_measurer=lambda t: (0.0, 0.0),
        image_store=lambda i: (0.0, 0.0),
    )
    stateful = build_stateful(scene, ctx)
    node = LayoutNode(root=stateful, size=(float(out_res.width), float(out_res.height)))
    nested = node.layouts(0.0, [in_res] * n_inputs)
    return nested.flatten([in_res] * n_inputs, out_res)


def _rgb_to_yuv_limited(color: RGBAColor) -> Tuple[int, int, int]:
    """BT.709 RGB -> limited-range YUV for a constant color
    (same matrix as `ops/color_convert.py` / rgba_to_yuv.wgsl:27-57)."""
    r, g, b = color.r / 255.0, color.g / 255.0, color.b / 255.0
    y = 0.2126 * r + 0.7152 * g + 0.0722 * b
    u = (b - y) / 1.8556
    v = (r - y) / 1.5748
    return (
        int(round(16.0 + 219.0 * y)),
        int(round(128.0 + 224.0 * u)),
        int(round(128.0 + 224.0 * v)),
    )


def _analyze_opaque_grid(flat, out_res: Resolution):
    """If the flattened layout list is background + opaque axis-aligned child
    rects (the Tiles case), return (bg_yuv, [(index, top, left, h, w)]);
    else None."""
    bg = (0, 128, 128)
    tiles = []
    for l in flat:
        c = l.content
        if abs(l.rotation_degrees) > 1e-9 or l.masks:
            return None
        if any(r > 1e-6 for r in l.border_radius.as_tuple()):
            return None
        if isinstance(c, RenderColor):
            if c.border_width > 0:
                return None
            full_canvas = (
                l.top <= 0.5 and l.left <= 0.5
                and l.width >= out_res.width - 1 and l.height >= out_res.height - 1
            )
            if not full_canvas or tiles:
                return None  # colored rect above tiles -> general path
            if c.color.a < 255:
                return None
            bg = _rgb_to_yuv_limited(c.color)
        elif isinstance(c, RenderChildNode):
            if c.border_width > 0:
                return None
            # crop must be the full source (flatten emits full-source crop)
            top = int(round(l.top / 2.0)) * 2
            left = int(round(l.left / 2.0)) * 2
            h = int(round(l.height / 2.0)) * 2
            w = int(round(l.width / 2.0)) * 2
            if h <= 0 or w <= 0:
                return None
            if top < 0 or left < 0 or top + h > out_res.height or left + w > out_res.width:
                return None
            tiles.append((c.index, top, left, h, w))
        else:
            return None  # shadows etc. -> general path
    return bg, tiles


def make_flagship_compose(
    n_inputs: int = 16,
    in_res: Resolution = Resolution(1920, 1080),
    out_res: Resolution = Resolution(3840, 2160),
):
    """Returns (fn, example_args): jittable fn(y, u, v) with stacked u8 plane
    batches (N,H,W)/(N,H/2,W/2) -> 4K YUV420 planes (u8)."""
    flat = _tiles_layouts(n_inputs, in_res, out_res)
    grid = _analyze_opaque_grid(flat, out_res)
    if grid is not None:
        return _make_yuv_grid_compose(grid, n_inputs, in_res, out_res)
    return _make_general_compose(flat, n_inputs, in_res, out_res)


def make_flagship_general_compose(
    n_inputs: int = 16,
    in_res: Resolution = Resolution(1920, 1080),
    out_res: Resolution = Resolution(3840, 2160),
):
    """The flagship shape through the GENERAL compose (not the opaque YUV
    grid): N inputs in a grid of rounded (radius 24), half-bordered tiles,
    box shadows on every third, two statically rotated (30 deg / -15 deg) —
    the reference renders these through the same one-pass layout shader it
    uses for plain grids (apply_layouts.wgsl:258-377), so this fast path
    must not be grid-only either (VERDICT r4 item 2). All geometry is
    planner-stable, so layouts take the production fast paths: region-local
    MXU resizes + SDF edges/borders, barrel-shear rotations, and a fused
    Pallas pass for the full-canvas rotated shadows; the channel-major
    canvas flows straight into the planar YUV420 output converters."""
    from smelter_tpu.scene.components import (
        AbsolutePosition,
        BorderRadius as CompRadius,
        BoxShadow,
    )

    cols = max(int(np.ceil(np.sqrt(n_inputs))), 1)
    rows = int(np.ceil(n_inputs / cols))
    tile_w = out_res.width // cols
    tile_h = out_res.height // rows
    margin = 30
    children = []
    for i in range(n_inputs):
        r, c = divmod(i, cols)
        rot = 30.0 if i == 5 % n_inputs else (-15.0 if i == 10 % n_inputs else 0.0)
        shadow = (
            [BoxShadow(offset_x=10.0, offset_y=10.0, blur_radius=24.0,
                       color=RGBAColor(0, 0, 0, 160))]
            if i % 3 == 0 else []
        )
        children.append(comp.Rescaler(
            child=comp.InputStream(input_id=f"in_{i}"),
            border_radius=CompRadius(24.0, 24.0, 24.0, 24.0),
            border_width=4.0 if i % 2 else 0.0,
            border_color=RGBAColor(255, 255, 255, 220),
            box_shadow=shadow,
            position=AbsolutePosition(
                width=float(tile_w - 2 * margin),
                height=float(tile_h - 2 * margin),
                top=float(r * tile_h + margin),
                left=float(c * tile_w + margin),
                rotation_degrees=rot,
            ),
        ))
    scene = comp.View(children=children, background_color=RGBAColor(8, 8, 8))
    flat = _scene_layouts(scene, n_inputs, in_res, out_res)
    statics, params = zip(*(split_layout(l, fast=True) for l in flat))
    levels = 2

    def general4k(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
        # deferred sources: the fast-path layouts crop+resize the subsampled
        # YUV planes directly on the MXU (exact vs convert-then-resize; see
        # color_convert.yuv_tile_rgba_cm) — full-res f32 RGBA never
        # materializes, same as the production program's input handling
        sources = [
            cc.DeferredYuvSource(y[i], u[i], v[i], mip_levels=levels)
            for i in range(n_inputs)
        ]
        canvas = compose_layouts(
            (out_res.width, out_res.height), statics, params, sources,
            planar=True,
        )
        return cc.planar_rgba_to_yuv420(canvas)

    return general4k, _example_args(n_inputs, in_res)


def plan_grid_partition(rects, H: int, W: int):
    """If `rects` [(key, top, left, h, w)] exactly partition an HxW canvas
    (no gaps, no overlap), return them as rows (top→bottom, each row
    left→right); else None. A partition lets the canvas be ASSEMBLED with
    row/column concatenation — one write — instead of a chain of
    dynamic-update-slices that each rewrite the canvas (measured 0.34 ms
    of the 0.94 ms flagship frame at 4K; concat assembly is ~free)."""
    rows: dict = {}
    for r in rects:
        rows.setdefault((r[1], r[3]), []).append(r)
    y = 0
    ordered = []
    for (top, h), row in sorted(rows.items()):
        if top != y or h <= 0:
            return None
        row = sorted(row, key=lambda r: r[2])
        x = 0
        for r in row:
            if r[2] != x or r[4] <= 0:
                return None
            x += r[4]
        if x != W:
            return None
        ordered.append(row)
        y += h
    if y != H:
        return None
    return ordered


def _make_yuv_grid_compose(grid, n_inputs, in_res: Resolution, out_res: Resolution):
    bg, tiles = grid
    H, W = out_res.height, out_res.width
    ch, cw = H // 2, W // 2
    sizes = {(h, w) for _, _, _, h, w in tiles}
    uniform = len(sizes) == 1 and len(tiles) == n_inputs
    partition = plan_grid_partition(tiles, H, W)

    def fn(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
        if uniform:
            _, _, _, th, tw = tiles[0]
            bty = _round_u8(resize_matmul(y, th, tw))          # (N, th, tw)
            btu = _round_u8(resize_matmul(u, th // 2, tw // 2))
            btv = _round_u8(resize_matmul(v, th // 2, tw // 2))
            tile_of = lambda idx, h, w: (bty[idx], btu[idx], btv[idx])
        else:
            def tile_of(idx, h, w):
                return (
                    _round_u8(resize_matmul(y[idx], h, w)),
                    _round_u8(resize_matmul(u[idx], h // 2, w // 2)),
                    _round_u8(resize_matmul(v[idx], h // 2, w // 2)),
                )
        if partition is not None:
            # tiles cover the canvas: assemble with concatenation
            rows_y, rows_u, rows_v = [], [], []
            for row in partition:
                ry, ru, rv = [], [], []
                for idx, _, _, h, w in row:
                    ty, tu, tv = tile_of(idx, h, w)
                    ry.append(ty)
                    ru.append(tu)
                    rv.append(tv)
                rows_y.append(jnp.concatenate(ry, axis=1) if len(ry) > 1 else ry[0])
                rows_u.append(jnp.concatenate(ru, axis=1) if len(ru) > 1 else ru[0])
                rows_v.append(jnp.concatenate(rv, axis=1) if len(rv) > 1 else rv[0])
            cat = lambda rows: rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
            return cat(rows_y), cat(rows_u), cat(rows_v)
        canvas_y = jnp.full((H, W), jnp.uint8(bg[0]))
        canvas_u = jnp.full((ch, cw), jnp.uint8(bg[1]))
        canvas_v = jnp.full((ch, cw), jnp.uint8(bg[2]))
        for idx, top, left, h, w in tiles:
            ty, tu, tv = tile_of(idx, h, w)
            canvas_y = canvas_y.at[top : top + h, left : left + w].set(ty)
            canvas_u = canvas_u.at[
                top // 2 : (top + h) // 2, left // 2 : (left + w) // 2
            ].set(tu)
            canvas_v = canvas_v.at[
                top // 2 : (top + h) // 2, left // 2 : (left + w) // 2
            ].set(tv)
        return canvas_y, canvas_u, canvas_v

    return fn, _example_args(n_inputs, in_res)


def _round_u8(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x.astype(jnp.float32) + 0.5, 0.0, 255.0).astype(jnp.uint8)


def _make_general_compose(flat, n_inputs, in_res: Resolution, out_res: Resolution):
    """General path: RGBA compose program (rotations, radii, alpha...)."""
    statics, params = zip(*(split_layout(l) for l in flat))
    levels = 2

    def fn(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
        sources = [None] * n_inputs
        for i in range(n_inputs):
            rgba = cc.planar_yuv_to_rgba(y[i], u[i], v[i])
            sources[i] = build_mips(rgba, levels)
        canvas = compose_layouts(
            (out_res.width, out_res.height), statics, params, sources,
            planar=True,
        )
        return cc.planar_rgba_to_yuv420(canvas)

    return fn, _example_args(n_inputs, in_res)


def _example_args(n_inputs: int, in_res: Resolution):
    return (
        jnp.zeros((n_inputs, in_res.height, in_res.width), jnp.uint8),
        jnp.full((n_inputs, in_res.height // 2, in_res.width // 2), 128, jnp.uint8),
        jnp.full((n_inputs, in_res.height // 2, in_res.width // 2), 128, jnp.uint8),
    )


def make_multioutput_step(
    mesh: jax.sharding.Mesh,
    n_outputs: int = 8,
    n_inputs: int = 16,
    in_res: Resolution = Resolution(192, 108),
    out_res: Resolution = Resolution(384, 216),
):
    """M independent outputs sharded across chips (SURVEY §2.5 "optionally
    shard outputs across TPU cores"): the decoded input set replicates to
    every chip once per frame (ICI broadcast), each chip composes its own
    outputs' tile grids fully locally — embarrassingly parallel, zero
    cross-chip traffic in the compose itself. Each output views the same
    inputs in a different tile order (per-output scenes).

    Mesh: 1D ("outputs",). Returns (jitted_fn, example_args); fn takes the
    stacked input planes + an (M, N) int32 tile-order table and returns
    (M, OH, OW) output planes sharded along M. Each output runs the
    PRODUCTION flagship compose (the same traced fn single-chip uses) on
    its own permutation of the shared input set, so the per-output content
    is per-pixel identical to a single-chip render of that scene.
    """
    from jax.experimental.shard_map import shard_map

    P = jax.sharding.PartitionSpec
    n = n_inputs
    fn, _ = make_flagship_compose(n, in_res, out_res)

    def one_output(y, u, v, perm):
        return fn(
            jnp.take(y, perm, 0), jnp.take(u, perm, 0), jnp.take(v, perm, 0)
        )

    def local_step(y, u, v, perms_local):
        return jax.vmap(lambda p: one_output(y, u, v, p))(perms_local)

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("outputs", None)),
        out_specs=(P("outputs", None, None),) * 3,
    )
    jitted = jax.jit(sharded)
    rng = np.random.RandomState(0)
    perms = np.stack([rng.permutation(n) for _ in range(n_outputs)]).astype(
        np.int32
    )
    example_args = (
        jnp.zeros((n, in_res.height, in_res.width), jnp.uint8),
        jnp.full((n, in_res.height // 2, in_res.width // 2), 128, jnp.uint8),
        jnp.full((n, in_res.height // 2, in_res.width // 2), 128, jnp.uint8),
        jnp.asarray(perms),
    )
    return jitted, example_args


def make_multichip_step(
    mesh: jax.sharding.Mesh,
    n_inputs: int = 16,
    in_res: Resolution = Resolution(192, 108),
    out_res: Resolution = Resolution(384, 216),
):
    """The PRODUCTION flagship compose, sharded over a ("streams", "space")
    mesh.

    The traced function is the exact object `make_flagship_compose` returns
    (Tiles scene -> `_analyze_opaque_grid` -> partition concat assembly —
    the same program the single-chip renderer runs), so multi-chip is the
    single-chip program plus sharding annotations:

      - inputs shard along "streams": the per-stream MXU rescale matmuls run
        fully parallel with zero communication (the contracted dims are
        unsharded, so no cross-chip reductions — output is bit-identical to
        single-chip; asserted per-pixel in tests/test_multichip.py)
      - the concat canvas assembly reshards tiles over ICI (XLA inserts the
        all-gather/ppermute collectives)
      - output canvas rows land "space"-sharded

    Reference oracle: the single-GPU renderer
    (smelter-render/src/state.rs:220-252) — here the single-chip jit of the
    same fn. Returns (jitted_fn, example_args).
    """
    P = jax.sharding.PartitionSpec
    fn, example_args = make_flagship_compose(n_inputs, in_res, out_res)
    in_spec = jax.sharding.NamedSharding(mesh, P("streams", None, None))
    out_spec = jax.sharding.NamedSharding(mesh, P("space", None))
    jitted = jax.jit(
        fn,
        in_shardings=(in_spec, in_spec, in_spec),
        out_shardings=(out_spec, out_spec, out_spec),
    )
    return jitted, example_args


def make_multichip_general_step(
    mesh: jax.sharding.Mesh,
    n_inputs: int = 8,
    in_res: Resolution = Resolution(128, 72),
    out_res: Resolution = Resolution(256, 144),
):
    """A NON-grid scene (rotated, bordered absolute-positioned children)
    through the production general RGBA compose (`ops/compose.py`), sharded
    over the same ("streams", "space") mesh.

    Exercises the multi-chip path the grid fast path cannot: per-input
    YUV->RGBA conversion + mips shard along "streams", the SDF layer blend
    gathers sources over ICI, and the final RGBA->YUV420 output is
    "space"-row-sharded. Same function single-chip and multi-chip, so output
    parity is per-pixel (<=1 u8, asserted in tests/test_multichip.py).

    Returns (jitted_fn, example_args).
    """
    P = jax.sharding.PartitionSpec
    w, h = out_res.width, out_res.height
    children = []
    for i in range(n_inputs):
        children.append(
            comp.View(
                position=comp.AbsolutePosition(
                    width=w * 0.30,
                    height=h * 0.30,
                    top=(h * 0.55) * ((i // 4) / 1.0 if n_inputs > 4 else 0.0)
                    + h * 0.05,
                    left=(w * 0.22) * (i % 4) + w * 0.04,
                    rotation_degrees=7.0 + 11.0 * i,
                ),
                border_width=3.0,
                border_color=RGBAColor(220, 60, 60, 255),
                border_radius=BorderRadius(6.0, 6.0, 6.0, 6.0),
                background_color=RGBAColor(0, 0, 0, 255),
                children=[comp.InputStream(input_id=f"in_{i}")],
            )
        )
    scene = comp.View(
        background_color=RGBAColor(12, 24, 48, 255), children=children
    )
    flat = _scene_layouts(scene, n_inputs, in_res, out_res)
    base_fn, example_args = _make_general_compose(
        flat, n_inputs, in_res, out_res
    )

    def fn(y, u, v):
        # GSPMD-sharded trace: a pallas_call has no partitioning rule, so
        # the compose/output must stay on the pure-XLA paths (which GSPMD
        # splits cleanly; single-chip parity is unchanged because the CPU
        # reference oracle uses the same XLA paths)
        from smelter_tpu.config import force_xla_kernels

        with force_xla_kernels():
            return base_fn(y, u, v)

    in_spec = jax.sharding.NamedSharding(mesh, P("streams", None, None))
    out_spec = jax.sharding.NamedSharding(mesh, P("space", None))
    jitted = jax.jit(
        fn,
        in_shardings=(in_spec, in_spec, in_spec),
        out_shardings=(out_spec, out_spec, out_spec),
    )
    return jitted, example_args
