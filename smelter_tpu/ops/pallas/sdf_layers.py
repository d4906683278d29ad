"""Pallas TPU kernel: fused multi-layer rounded-rect SDF compositing.

The general compositor blends color / box-shadow / bordered-color layers one
full-canvas pass at a time (L passes over the f32 canvas in HBM). This kernel
fuses a run of consecutive such layers into ONE pass: the canvas streams
through VMEM in (BH, BW) blocks, every layer's SDF + blend math runs on the
VPU against the resident block, and the block is written back once —
HBM traffic drops from (L+1)× to 1× read + 1× write.

Texture layers are excluded (their content sampling is the MXU resize path);
the compositor routes runs of non-texture layers here.

Layer parameters are traced (animating them does not recompile); per-layer
*kinds* (color / shadow, has_border, has_rotation) are static flags baked
into the kernel at trace time.

Param row layout (f32, PARAMS_WIDTH columns):
  0:top 1:left 2:width 3:height 4:rotation_deg
  5..8:border_radius[tl,tr,br,bl]
  9..12:color rgba (straight, 0..1)
  13:border_width 14..17:border_color rgba 18:blur_radius
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PARAMS_WIDTH = 19
_BH, _BW = 256, 256  # canvas streams as planar (4, BH, BW) blocks


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


def _layer_kernel_body(kinds, params_ref, canvas_ref, out_ref):
    """kinds: static tuple of (content, has_border, has_rotation) per layer.
    Canvas block is PLANAR (4, bh, bw) — the W axis rides the 128 lanes —
    and all math is scalar-times-2D (Mosaic-friendly, no shape casts)."""
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    bh, bw = canvas_ref.shape[1], canvas_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    py = rows + (bi * bh).astype(jnp.float32) + 0.5
    px = cols + (bj * bw).astype(jnp.float32) + 0.5

    # channels as separate 2D planes (premultiplied)
    acc = [canvas_ref[c] for c in range(4)]

    for li, (content, has_border, has_rotation) in enumerate(kinds):
        p = params_ref[li]
        top, left, w, h = p[0], p[1], p[2], p[3]
        cx = left + w * 0.5
        cy = top + h * 0.5
        dx = px - cx
        dy = py - cy
        if has_rotation:
            ang = p[4] * (jnp.pi / 180.0)
            cos_a = jnp.cos(ang)
            sin_a = jnp.sin(ang)
            rdx = cos_a * dx + sin_a * dy
            rdy = -sin_a * dx + cos_a * dy
            dx, dy = rdx, rdy
        edge = -_sdf(dx, dy, w * 0.5, h * 0.5, p[5], p[6], p[7], p[8])
        # premultiplied scalar colors
        col = (p[9] * p[12], p[10] * p[12], p[11] * p[12], p[12])

        if content == "box_shadow":
            blur = jnp.maximum(p[18], 1.0)
            a = _smoothstep(-blur * 0.5, blur * 0.5, edge)
            layer = [col[c] * a for c in range(4)]
        elif has_border:
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

        one_minus_a = 1.0 - layer[3]
        acc = [layer[c] + acc[c] * one_minus_a for c in range(4)]

    for c in range(4):
        out_ref[c] = acc[c]


@functools.partial(jax.jit, static_argnums=(2, 3))
def _compose_call(planar, params, kinds, interpret):
    h, w = planar.shape[1], planar.shape[2]  # (4, H, W): W rides the lanes
    bh, bw = min(_BH, h), min(_BW, w)
    grid = (pl.cdiv(h, bh), pl.cdiv(w, bw))
    kernel = functools.partial(_layer_kernel_body, kinds)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(planar.shape, jnp.float32),
        grid=grid,
        in_specs=[
            # the small param table is replicated into every block
            pl.BlockSpec(
                (len(kinds), PARAMS_WIDTH), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, bh, bw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (4, bh, bw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(params, planar)


def compose_sdf_layers_planar(
    canvas: jnp.ndarray,          # (4, H, W) premultiplied f32
    params: jnp.ndarray,          # (L, PARAMS_WIDTH) f32, traced
    kinds: Tuple[Tuple[str, bool, bool], ...],  # static per layer
) -> jnp.ndarray:
    """Blend L non-texture layers over a CHANNEL-MAJOR canvas in one fused
    pass — the kernel streams (4, bh, bw) blocks, so a planar caller pays
    zero boundary transposes.

    Falls back to interpret mode off-TPU (tests/CPU) — same numerics.
    """
    return _compose_call(
        canvas.astype(jnp.float32),
        params.astype(jnp.float32),
        tuple(kinds),
        not _on_tpu(),
    )


def compose_sdf_layers(
    canvas: jnp.ndarray,          # (H, W, 4) premultiplied f32
    params: jnp.ndarray,
    kinds: Tuple[Tuple[str, bool, bool], ...],
) -> jnp.ndarray:
    """Interleaved-canvas wrapper around `compose_sdf_layers_planar`."""
    return jnp.moveaxis(
        compose_sdf_layers_planar(jnp.moveaxis(canvas, -1, 0), params, kinds),
        0,
        -1,
    )


def pack_layer_params_traced(params_list) -> jnp.ndarray:
    """LayoutParams with traced leaves → (L, PARAMS_WIDTH) traced array
    (used inside the jitted frame program)."""
    rows = []
    for p in params_list:
        rows.append(jnp.concatenate([
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
        ]))
    return jnp.stack(rows)


def pack_layer_params(params_list) -> np.ndarray:
    """LayoutParams (compose.py) → (L, PARAMS_WIDTH) f32 row array."""
    rows = np.zeros((len(params_list), PARAMS_WIDTH), np.float32)
    for i, p in enumerate(params_list):
        rows[i, 0] = p.top
        rows[i, 1] = p.left
        rows[i, 2] = p.width
        rows[i, 3] = p.height
        rows[i, 4] = p.rotation_degrees
        rows[i, 5:9] = np.asarray(p.border_radius, np.float32)
        rows[i, 9:13] = np.asarray(p.color, np.float32)
        rows[i, 13] = p.border_width
        rows[i, 14:18] = np.asarray(p.border_color, np.float32)
        rows[i, 18] = p.blur_radius
    return rows
