"""Pallas TPU kernel: fused channel-major RGBA -> planar YUV420 output.

The XLA output chain (color_convert.planar_rgba_to_yuv420) materializes
full-resolution f32 U/V planes between the color-matrix fusion and the 2x2
reduce_window chroma downsample — on a 4K canvas that's ~66 MB of extra HBM
writes plus the same re-read, measured at 0.35 ms standalone on v5e (vs a
~0.14 ms traffic floor: one 99 MB canvas read + 12.4 MB of u8 plane writes).

This kernel does the whole conversion in ONE pass: each (4, BH, BW) canvas
block computes Y at full resolution and U/V from the per-pixel-clipped
full-resolution values pooled 2x2 — the pooling runs as two tiny MXU
matmuls against 0.5-weighted pair-selection matrices (lane-dim stride-2
slicing is hostile to the VPU layout; a matmul against a selection matrix
is free on the MXU and keeps every layout dense). Math order mirrors
rgb_planes_to_yuv + downsample_chroma_2x2 + f32_to_u8 exactly; the only
deviation is MXU accumulation order inside the 2x2 average, which can move
a value across a round-to-nearest boundary by 1 u8 LSB (the device A/B
gates on <= 1 LSB, same as the golden-snapshot tolerance).

Routing lives in color_convert.planar_rgba_to_yuv420: TPU-only by default
(SMELTER_FUSED_YUV=auto|on|off), with the XLA chain as the off-TPU
reference implementation. Reference parity target: the rgba_to_yuv
conversion passes in smelter-render (format conversion WGSL).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Y_SCALE = 219.0 / 255.0
_UV_SCALE = 224.0 / 255.0
_FOOTROOM = 16.0 / 255.0


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _u8(x):
    # two-step cast: Mosaic has no direct f32->u8 lowering; the clipped,
    # rounded value is integral in [0, 255] so i32 truncation is exact
    q = jnp.clip(jnp.round(x * 255.0), 0.0, 255.0)
    return q.astype(jnp.int32).astype(jnp.uint8)


def _pick_blocks(h: int, w: int):
    """Block sizes that divide the canvas EXACTLY — partial blocks are
    excluded because the pooled U/V outputs and the full-res Y output would
    need consistent ragged-block semantics across three differently-sized
    arrays. The (BH//2, BW//2) chroma block must itself be (8, 128)-tileable
    (Mosaic lowering requirement), so BH is a multiple of 16 and BW a
    multiple of 256. Returns None when no divisor exists (-> XLA chain)."""
    bh = next((b for b in range(256, 15, -16) if h % b == 0), None)
    bw = next((b for b in (512, 256) if w % b == 0), None)
    if bh is None or bw is None:
        return None
    return bh, bw


def _pair_pool(full, bh, bw):
    """(bh, bw) -> (bh//2, bw//2) 2x2 average via MXU pair-selection
    matmuls: rows then columns, 0.5 weight per selected pair member."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (bh // 2, bh), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (bh // 2, bh), 1)
    prow = jnp.where((rj // 2) == ri, 0.5, 0.0).astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (bw, bw // 2), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (bw, bw // 2), 1)
    pcol = jnp.where((ci // 2) == cj, 0.5, 0.0).astype(jnp.float32)
    half_rows = jnp.dot(prow, full, preferred_element_type=jnp.float32)
    return jnp.dot(half_rows, pcol, preferred_element_type=jnp.float32)


def _kernel_body(full_range, in_ref, y_ref, u_ref, v_ref):
    # the input block is (3, bh, bw): alpha is never read (opaque video
    # output), so the canvas's alpha plane never crosses HBM->VMEM.
    # 16-bit canvases decode in VMEM — the color matrix runs in f32
    # either way; only the HBM->VMEM traffic shrinks. uint16 canvases
    # are fixed-point with headroom (color_convert.canvas_decode; widen
    # via i32 — Mosaic has no direct u16->f32 lowering).
    bh, bw = in_ref.shape[1], in_ref.shape[2]
    if in_ref.dtype == jnp.uint16:
        from smelter_tpu.ops.color_convert import (
            CANVAS_FIXED_OFFSET,
            CANVAS_FIXED_SCALE,
        )

        def _dec(plane):
            v = plane.astype(jnp.int32).astype(jnp.float32)
            return (v - CANVAS_FIXED_OFFSET) * (1.0 / CANVAS_FIXED_SCALE)
        r, g, b = _dec(in_ref[0]), _dec(in_ref[1]), _dec(in_ref[2])
    else:
        r = in_ref[0].astype(jnp.float32)
        g = in_ref[1].astype(jnp.float32)
        b = in_ref[2].astype(jnp.float32)
    y = 0.2126 * r + 0.7152 * g + 0.0722 * b
    u = -0.1146 * r - 0.3854 * g + 0.5 * b + 0.5
    v = 0.5 * r - 0.4542 * g - 0.0458 * b + 0.5
    if not full_range:
        y = y * _Y_SCALE + _FOOTROOM
        u = (u - 0.5) * _UV_SCALE + 0.5 * _UV_SCALE + _FOOTROOM
        v = (v - 0.5) * _UV_SCALE + 0.5 * _UV_SCALE + _FOOTROOM
    y = jnp.clip(y, 0.0, 1.0)
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    y_ref[:] = _u8(y)
    u_ref[:] = _u8(_pair_pool(u, bh, bw))
    v_ref[:] = _u8(_pair_pool(v, bh, bw))


@functools.partial(jax.jit, static_argnums=(1, 2))
def _convert_call(planar, full_range, interpret):
    h, w = planar.shape[1], planar.shape[2]
    bh, bw = _pick_blocks(h, w)
    grid = (h // bh, w // bw)
    kernel = functools.partial(_kernel_body, full_range)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.uint8),
            jax.ShapeDtypeStruct((h // 2, w // 2), jnp.uint8),
            jax.ShapeDtypeStruct((h // 2, w // 2), jnp.uint8),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (3, bh, bw), lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(
            pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh // 2, bw // 2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh // 2, bw // 2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(planar)


def eligible(rgba_cm: jnp.ndarray) -> bool:
    h, w = rgba_cm.shape[1], rgba_cm.shape[2]
    return _pick_blocks(h, w) is not None


def rgba_cm_to_yuv420_fused(
    rgba_cm: jnp.ndarray, full_range: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(4, H, W) f32/u16-fixed-point/bf16 premultiplied channel-major
    canvas -> u8 (y, u, v) planes, 4:2:0, in one fused pass (16-bit
    canvases stream at half the HBM read traffic and decode in VMEM)."""
    if rgba_cm.dtype not in (jnp.uint16, jnp.bfloat16, jnp.float16):
        rgba_cm = rgba_cm.astype(jnp.float32)
    return _convert_call(rgba_cm, bool(full_range), not _on_tpu())
