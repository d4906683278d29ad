"""Pallas TPU kernel: single-pass SDF scene-layer assembly with per-block
member culling.

The general compositor assembles a run of region-local layouts as a chain of
coalesced group blends: canvas-region read -> fused SDF/blend chain -> aligned
dynamic-update-slice write, one per group (ops/compose.py:_assemble_groups).
On a 4K channel-major f32 canvas (132 MB) the SDF members of that run (the
full-canvas background, per-tile color backdrops/borders, box shadows) alone
account for most of the canvas traffic: every group containing one re-reads
and re-writes its whole union region.

This kernel replaces those members with ONE pass that *creates* the canvas:
the grid walks (4, BH, BW) blocks; each block starts from transparent black,
OVER-blends every SDF member whose static footprint intersects the block —
in paint order — and is written exactly once. Member culling is a pair of
scalar compares against static block ranges (pl.when), so members cost
nothing on blocks they don't touch. Canvas HBM traffic for the SDF layers
collapses to ONE canvas write, with zero canvas reads.

Texture members deliberately stay OUT of the kernel: their content tiles
would need per-block HBM DMA, and a device A/B of a full in-kernel variant
(round 5) measured the serialized DMA waits at ~2x the whole XLA path —
6.65 ms vs 3.14 ms for the 4K flagship scene. Instead the compositor paints
all SDF members here first, then blends textures through the existing
aligned-union group path, after statically verifying the reorder is exact
(no texture footprint intersects a LATER SDF member's footprint — OVER is
associative and commutes for disjoint supports).

Member kinds (static, baked into the kernel; numeric params stay traced):
  - "color":      rounded-rect SDF fill, optional border, optional analytic
                  rotation (coordinate rotation, same math as
                  compose.render_single_layout)
  - "box_shadow": SDF-smoothstep blur approximation (reference semantics,
                  apply_layouts.wgsl box-shadow pass)

Parent clip masks (rounded rects, optionally rotating with a rotated
ancestor) are applied in-kernel from the packed param rows (SMEM — scalar
reads stay off the vector memory).

Falls back to interpret mode off-TPU (identical numerics) — production
routing in compose._compose_layouts_impl only takes this kernel on TPU,
keeping the XLA group path as the CPU/test reference implementation; parity
is pinned bit-exact by tests/test_scene_assembly.py and re-checked per-pixel
on device by tools/bench_assembly_ab.py before timing.

Reference behavior mirrored: smelter-render/src/transformations/layout/
apply_layouts.wgsl:258-377 (one-pass layout shader).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PARAMS_BASE = 19  # 0:top 1:left 2:w 3:h 4:rot 5..8:radius 9..12:color
#                  13:border_width 14..17:border_color 18:blur
MASK_W = 9  # radius[4], top, left, w, h, rotation_rad
_BH, _BW = 256, 256


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / jnp.maximum(e1 - e0, 1e-6), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _sdf(dx, dy, half_w, half_h, r_tl, r_tr, r_br, r_bl):
    r_top = jnp.where(dx < 0.0, r_tl, r_tr)
    r_bottom = jnp.where(dx < 0.0, r_bl, r_br)
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


class MemberSpec:
    """Static description of one SDF member (hashable; baked into the
    kernel). blocks = (by0, by1, bx0, bx1): half-open block-index ranges the
    member's clipped footprint intersects on the (BH, BW) canvas grid.
    fill_blocks: optional sub-range of blocks that lie entirely in the
    member's interior where the layer is exactly its flat premultiplied
    color — radius-free, border-free, mask-free, unrotated color members
    only (alpha = smoothstep(-0.5, 0.5, depth) = 1 at depth >= 1). Those
    blocks skip the whole SDF/sqrt/smoothstep chain (the full-canvas
    background alone is ~33 M sqrt+div per 4K frame)."""

    __slots__ = ("kind", "has_border", "has_rotation", "n_masks",
                 "rotated_masks", "blocks", "fill_blocks")

    def __init__(self, kind, has_border, has_rotation, n_masks,
                 rotated_masks, blocks, fill_blocks=None):
        self.kind = kind
        self.has_border = bool(has_border)
        self.has_rotation = bool(has_rotation)
        self.n_masks = int(n_masks)
        self.rotated_masks = tuple(rotated_masks)
        self.blocks = tuple(int(b) for b in blocks)
        self.fill_blocks = (None if fill_blocks is None
                            else tuple(int(b) for b in fill_blocks))

    def key(self):
        return (self.kind, self.has_border, self.has_rotation, self.n_masks,
                self.rotated_masks, self.blocks, self.fill_blocks)


def _mask_alpha_rows(p, px, py, n_masks, rotated_masks, base):
    alpha = None
    for mi in range(n_masks):
        o = base + mi * MASK_W
        r_tl, r_tr, r_br, r_bl = p[o], p[o + 1], p[o + 2], p[o + 3]
        top, left, w, h = p[o + 4], p[o + 5], p[o + 6], p[o + 7]
        cx = left + w * 0.5
        cy = top + h * 0.5
        dx = px - cx
        dy = py - cy
        if mi < len(rotated_masks) and rotated_masks[mi]:
            ang = p[o + 8]
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            dx, dy = ca * dx + sa * dy, -sa * dx + ca * dy
        d = _sdf(dx, dy, w * 0.5, h * 0.5, r_tl, r_tr, r_br, r_bl)
        a = _smoothstep(-0.5, 0.5, -d)
        alpha = a if alpha is None else alpha * a
    return alpha


def _blend_member(spec: "MemberSpec", p, px, py, acc):
    """Returns updated acc (list of 4 (bh, bw) planes). Formula order
    mirrors compose.render_single_layout exactly (parity pinned by
    tests/test_scene_assembly.py)."""
    top, left, w, h = p[0], p[1], p[2], p[3]
    cx = left + w * 0.5
    cy = top + h * 0.5
    dx = px - cx
    dy = py - cy
    if spec.has_rotation:
        ang = p[4] * (jnp.pi / 180.0)
        cos_a = jnp.cos(ang)
        sin_a = jnp.sin(ang)
        rdx = cos_a * dx + sin_a * dy
        rdy = -sin_a * dx + cos_a * dy
        dx, dy = rdx, rdy

    mask_alpha = _mask_alpha_rows(
        p, px, py, spec.n_masks, spec.rotated_masks, PARAMS_BASE
    )
    edge = -_sdf(dx, dy, w * 0.5, h * 0.5, p[5], p[6], p[7], p[8])
    col = (p[9] * p[12], p[10] * p[12], p[11] * p[12], p[12])

    if spec.kind == "box_shadow":
        blur = jnp.maximum(p[18], 1.0)
        a = _smoothstep(-blur * 0.5, blur * 0.5, edge)
        if mask_alpha is not None:
            a = a * mask_alpha
        layer = [col[c] * a for c in range(4)]
    else:  # color
        if spec.has_border:
            bwd = p[13]
            bcol = (p[14] * p[17], p[15] * p[17], p[16] * p[17], p[17])
            border_alpha = _smoothstep(bwd, bwd + 1.0, edge)
            content_alpha = _smoothstep(-0.5, 0.5, edge)
            in_border = edge > bwd * 0.5
            layer = []
            for c in range(4):
                inner = bcol[c] + (col[c] - bcol[c]) * border_alpha
                outer = bcol[c] * content_alpha
                layer.append(jnp.where(in_border, inner, outer))
        else:
            a = _smoothstep(-0.5, 0.5, edge)
            layer = [col[c] * a for c in range(4)]
        if mask_alpha is not None:
            layer = [layer[c] * mask_alpha for c in range(4)]

    one_minus_a = 1.0 - layer[3]
    return [layer[c] + acc[c] * one_minus_a for c in range(4)]


def _kernel_body(specs, params_ref, out_ref, acc_ref):
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    bh, bw = out_ref.shape[1], out_ref.shape[2]
    n_params = params_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    py = rows + (bi * bh).astype(jnp.float32) + 0.5
    px = cols + (bj * bw).astype(jnp.float32) + 0.5

    for c in range(4):
        acc_ref[c] = jnp.zeros((bh, bw), jnp.float32)

    for li, spec in enumerate(specs):
        by0, by1, bx0, bx1 = spec.blocks
        hit = (bi >= by0) & (bi < by1) & (bj >= bx0) & (bj < bx1)

        if spec.fill_blocks is not None:
            fy0, fy1, fx0, fx1 = spec.fill_blocks
            fill = (bi >= fy0) & (bi < fy1) & (bj >= fx0) & (bj < fx1)

            @pl.when(fill)
            def _(li=li):
                # interior: layer == flat premultiplied color everywhere
                p = [params_ref[li, c] for c in (9, 10, 11, 12)]
                col = (p[0] * p[3], p[1] * p[3], p[2] * p[3], p[3])
                one_minus_a = 1.0 - col[3]
                for c in range(4):
                    acc_ref[c] = col[c] + acc_ref[c] * one_minus_a

            hit = hit & jnp.logical_not(fill)

        @pl.when(hit)
        def _(li=li, spec=spec):
            p = [params_ref[li, c] for c in range(n_params)]
            acc = [acc_ref[c] for c in range(4)]
            acc = _blend_member(spec, p, px, py, acc)
            for c in range(4):
                acc_ref[c] = acc[c]

    for c in range(4):
        # blends accumulate in the f32 scratch; only the single canvas
        # store quantizes (16-bit canvases halve the write traffic).
        # uint16 canvases are fixed-point with headroom for Lanczos
        # ringing (color_convert.canvas_decode; two-step cast — Mosaic
        # has no direct f32->u16 lowering)
        if out_ref.dtype == jnp.uint16:
            from smelter_tpu.ops.color_convert import (
                CANVAS_FIXED_OFFSET,
                CANVAS_FIXED_SCALE,
            )

            q = jnp.round(
                acc_ref[c] * CANVAS_FIXED_SCALE + CANVAS_FIXED_OFFSET
            )
            q = jnp.clip(q, 0.0, 65535.0)
            out_ref[c] = q.astype(jnp.int32).astype(jnp.uint16)
        else:
            out_ref[c] = acc_ref[c].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _assemble_call(h, w, spec_keys, interpret, out_dtype, params):
    specs = tuple(MemberSpec(*k) for k in spec_keys)
    grid = (pl.cdiv(h, _BH), pl.cdiv(w, _BW))
    kernel = functools.partial(_kernel_body, specs)
    n_params = params.shape[1]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, h, w), jnp.dtype(out_dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (len(specs), n_params), lambda i, j: (0, 0),
                memory_space=pltpu.SMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (4, _BH, _BW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((4, _BH, _BW), jnp.float32),  # blend accumulator
        ],
        interpret=interpret,
    )(params)


def assemble_scene_planar(
    resolution: Tuple[int, int],  # (width, height)
    specs: Sequence[MemberSpec],
    params: jnp.ndarray,  # (L, PARAMS_BASE + 9*max_masks) f32, traced
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Create the (4, H, W) premultiplied canvas (f32 or bf16 storage;
    blends always accumulate in f32) for one run of static SDF members in
    a single kernel pass. Interpret mode off-TPU (same numerics); compose
    only routes here on TPU."""
    w, h = resolution
    return _assemble_call(
        h, w, tuple(s.key() for s in specs), not _on_tpu(),
        jnp.dtype(out_dtype).name, params.astype(jnp.float32)
    )


def block_shape() -> Tuple[int, int]:
    return _BH, _BW


def pack_member_params(params_list, max_masks: int) -> jnp.ndarray:
    """LayoutParams (traced leaves) -> (L, PARAMS_BASE + 9*max_masks) rows."""
    width = PARAMS_BASE + MASK_W * max_masks
    rows = []
    for p in params_list:
        base = jnp.concatenate([
            jnp.stack([
                jnp.asarray(p.top, jnp.float32),
                jnp.asarray(p.left, jnp.float32),
                jnp.asarray(p.width, jnp.float32),
                jnp.asarray(p.height, jnp.float32),
                jnp.asarray(p.rotation_degrees, jnp.float32),
            ]),
            jnp.asarray(p.border_radius, jnp.float32),
            jnp.asarray(p.color, jnp.float32),
            jnp.reshape(jnp.asarray(p.border_width, jnp.float32), (1,)),
            jnp.asarray(p.border_color, jnp.float32),
            jnp.reshape(jnp.asarray(p.blur_radius, jnp.float32), (1,)),
        ])
        masks = jnp.asarray(p.masks, jnp.float32)
        if masks.ndim == 2 and masks.shape[0] > 0:
            n, mw = masks.shape
            if mw < MASK_W:  # legacy 8-wide rows (no rotation column)
                masks = jnp.pad(masks, ((0, 0), (0, MASK_W - mw)))
            flat = jnp.reshape(masks[:, :MASK_W], (-1,))
        else:
            flat = jnp.zeros((0,), jnp.float32)
        pad = width - PARAMS_BASE - flat.shape[0]
        rows.append(jnp.concatenate([base, flat, jnp.zeros((max(pad, 0),),
                                                           jnp.float32)]))
    return jnp.stack(rows)
