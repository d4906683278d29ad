"""Flagship compose pipeline: N x 1080p YUV inputs -> tiled 4K YUV output.

This is the BASELINE.json north-star configuration (16x1080p -> 4K60) as a
pure jittable function, plus a multi-chip sharded variant.

Single chip: one fused XLA program - YUV->RGB conversion, mip build, Tiles
layout compose (via the scene engine's real flatten output), RGB->YUV420.

Multi chip (jax.sharding over a Mesh):
  - inputs are stacked (N, H, W) planes sharded along N ("streams" axis):
    per-stream color conversion + rescale-to-tile runs fully parallel
  - the gather of tiles into the output canvas is a reshape/transpose whose
    resharding XLA lowers to an all-gather over ICI
  - output canvas conversion is sharded along output rows ("space" axis)
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smelter_tpu.core.types import PixelFormat, Resolution, RGBAColor
from smelter_tpu.ops import color_convert as cc
from smelter_tpu.ops.compose import compose_layouts
from smelter_tpu.ops.resample import build_mips, resize_bilinear, resize_lanczos3
from smelter_tpu.render.program import split_layout
from smelter_tpu.scene import components as comp
from smelter_tpu.scene.scene_state import BuildCtx, LayoutNode, build_stateful


def _tiles_layouts(n_inputs: int, in_res: Resolution, out_res: Resolution):
    """Flattened RenderLayouts for a Tiles grid of n inputs (the benchmark
    scene from the reference benchmark bin)."""
    scene = comp.Tiles(
        children=[comp.InputStream(input_id=f"in_{i}") for i in range(n_inputs)],
        background_color=RGBAColor(8, 8, 8),
    )
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


def make_flagship_compose(
    n_inputs: int = 16,
    in_res: Resolution = Resolution(1920, 1080),
    out_res: Resolution = Resolution(3840, 2160),
):
    """Returns (fn, example_args): jittable fn(y, u, v) with stacked u8 plane
    batches (N,H,W)/(N,H/2,W/2) -> 4K YUV420 planes."""
    flat = _tiles_layouts(n_inputs, in_res, out_res)
    statics, params = zip(*(split_layout(l) for l in flat))
    levels = 2  # 1080p -> ~960x540 tiles: one extra mip level suffices

    def fn(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
        sources = [None] * n_inputs
        for i in range(n_inputs):
            rgba = cc.planar_yuv_to_rgba(y[i], u[i], v[i])
            sources[i] = build_mips(rgba, levels)
        canvas = compose_layouts(
            (out_res.width, out_res.height), statics, params, sources
        )
        return cc.rgba_to_planar_yuv420(canvas)

    example_args = (
        jnp.zeros((n_inputs, in_res.height, in_res.width), jnp.uint8),
        jnp.full((n_inputs, in_res.height // 2, in_res.width // 2), 128, jnp.uint8),
        jnp.full((n_inputs, in_res.height // 2, in_res.width // 2), 128, jnp.uint8),
    )
    return fn, example_args


def make_multichip_step(
    mesh: jax.sharding.Mesh,
    n_inputs: int = 16,
    in_res: Resolution = Resolution(192, 108),
    out_res: Resolution = Resolution(384, 216),
):
    """Full sharded compose step over a ("streams", "space") mesh.

    Per-stream stages (convert + rescale to tile) shard along "streams";
    the canvas assembly reshards to row-sharding along "space" (XLA inserts
    the ICI collectives); output color conversion runs row-sharded.

    Returns (jitted_fn, example_args).
    """
    P = jax.sharding.PartitionSpec

    n = n_inputs
    rows = int(math.floor(math.sqrt(n)))
    while n % rows:
        rows -= 1
    cols = n // rows
    tile_h = out_res.height // rows
    tile_w = out_res.width // cols

    in_spec = jax.sharding.NamedSharding(mesh, P("streams", None, None))
    out_spec = jax.sharding.NamedSharding(mesh, P(None, "space", None))

    def step(y, u, v):
        # stage 1: per-stream convert + rescale (sharded along streams)
        def per_stream(yi, ui, vi):
            rgba = cc.planar_yuv_to_rgba(yi, ui, vi)
            return resize_bilinear(rgba, tile_h, tile_w)

        tiles = jax.vmap(per_stream)(y, u, v)  # (N, th, tw, 4) streams-sharded
        # stage 2: assemble canvas (resharding gathers tiles over ICI)
        grid = tiles.reshape(rows, cols, tile_h, tile_w, 4)
        canvas = grid.transpose(0, 2, 1, 3, 4).reshape(
            rows * tile_h, cols * tile_w, 4
        )
        # stage 3: output conversion, sharded along output rows ("space")
        canvas = jax.lax.with_sharding_constraint(
            canvas, jax.sharding.NamedSharding(mesh, P("space", None, None))
        )
        return cc.rgba_to_planar_yuv420(canvas)

    jitted = jax.jit(
        step,
        in_shardings=(in_spec, in_spec, in_spec),
        out_shardings=(
            jax.sharding.NamedSharding(mesh, P("space", None)),
            jax.sharding.NamedSharding(mesh, P("space", None)),
            jax.sharding.NamedSharding(mesh, P("space", None)),
        ),
    )
    example_args = (
        jnp.zeros((n, in_res.height, in_res.width), jnp.uint8),
        jnp.full((n, in_res.height // 2, in_res.width // 2), 128, jnp.uint8),
        jnp.full((n, in_res.height // 2, in_res.width // 2), 128, jnp.uint8),
    )
    return jitted, example_args
