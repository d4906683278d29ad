"""Gather-free image rotation for the TPU compose path.

The reference rotates layouts for free in the wgpu vertex stage
(`apply_layouts.wgsl` vertex transform); a literal port would inverse-sample
the canvas — a full-canvas 2D gather, which is the slowest thing you can ask
a TPU to do (~8 ns/tap scalarized, >100 ms/frame at 1080p). Instead, stable
rotations compile to the classic Paeth 3-shear decomposition:

    R(psi) = ShearX(-tan(psi/2)) . ShearY(sin psi) . ShearX(-tan(psi/2))

Each shear shifts rows (or columns) by an amount LINEAR in the row index.
The per-row integer shifts are applied with a barrel-shifter decomposition:
log2(max_shift) whole-image shifts, each gated per row by one bit of that
row's shift (see `_shear_w`) — exact bilinear interpolation with ZERO
gathers, pure pads/slices + elementwise VPU selects, and an op count that
scales with the LOG of the shift range. Quarter turns are jnp.rot90 (layout
moves only). The angle is static (planner-stable rotations only; animated
rotations route to the traced barrel-shear path), so the shift bit-masks bake
into the compiled program as constants.

All core ops work on ``(..., H, W)`` arrays — the compose path feeds
CHANNEL-MAJOR ``(4, H, W)`` tiles so the shear shifts ride the 128-wide lane
axis (the `_cm` entry points). The legacy ``(H, W, C)`` entry points survive
as thin transpose wrappers for tests and external callers.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# With the barrel-shifter shear the op count scales with log2 of the shift
# range, so band count no longer bounds HLO size; the cap survives only as
# a backstop against absurd degenerate geometry.
MAX_SHEAR_BANDS = 1 << 20


def rotation_band_count(theta_deg: float, h: int, w: int) -> int:
    """Estimated total shear bands for rotating an (h, w) tile."""
    psi = math.radians(_normalize(theta_deg)[1])
    a, b = abs(math.tan(psi / 2.0)), abs(math.sin(psi))
    oh, ow = rotated_bbox(theta_deg, h, w)
    return int(a * (oh + 4) + 1) * 2 + int(b * (ow + 4) + 1)


def rotated_bbox(theta_deg: float, h: int, w: int) -> Tuple[int, int]:
    """Axis-aligned bbox (H, W) of an (h, w) rect rotated by theta."""
    t = math.radians(theta_deg)
    bw = abs(math.cos(t)) * w + abs(math.sin(t)) * h
    bh = abs(math.sin(t)) * w + abs(math.cos(t)) * h
    return int(math.ceil(bh)), int(math.ceil(bw))


def _normalize(theta_deg: float) -> Tuple[int, float]:
    """theta -> (quarter_turns, psi) with psi in [-45, 45]."""
    t = theta_deg % 360.0
    q = int(round(t / 90.0)) % 4
    psi = t - 90.0 * (round(t / 90.0))
    return q, psi


def _shear_w(img: jnp.ndarray, k: float) -> jnp.ndarray:
    """out[..., r, c] = bilinear img[..., r, c - k*(r - H/2)]; zero fill.
    Operates on (..., H, W): shifts ride the minor (lane) axis.

    Barrel-shifter decomposition: per-row integer shifts are applied as
    log2(max_shift) whole-image shifts, each gated per row by one bit of
    that row's shift (an (H, 1) jnp.where select) — so the op count scales
    with log2 of the shift range instead of the number of contiguous
    equal-shift bands. On a v5e this replaced ~190 tiny band slices with
    ~9 full-width VPU selects per shear and cut the rotation30 scene from
    3.9 ms to ~0.5 ms device time. The fractional part is one final 1-px
    neighbor blend with a per-row weight vector; results are bit-identical
    to the previous banded implementation."""
    H, W = img.shape[-2], img.shape[-1]
    if H == 0 or abs(k) < 1e-12:
        return img
    delta = k * (np.arange(H, dtype=np.float64) + 0.5 - H / 2.0)
    i = np.floor(delta).astype(np.int64)
    f = (delta - i).astype(np.float32)
    imin, imax = int(i.min()), int(i.max())
    if max(abs(imin), abs(imax)) + 1 >= W:
        return jnp.zeros_like(img)
    bias = -imin if imin < 0 else 0
    shifts = i + bias                        # nonnegative right-shifts
    left = imax + 1 if imax > 0 else 1
    right = bias + 1
    lead = [(0, 0)] * (img.ndim - 2)
    work = jnp.pad(img, lead + [(0, 0), (left, right)])
    padded_w = W + left + right
    for bit in range(int(shifts.max()).bit_length()):
        step = 1 << bit
        mask = jnp.asarray(((shifts >> bit) & 1).astype(bool)).reshape(H, 1)
        shifted = jnp.pad(
            work[..., : padded_w - step], lead + [(0, 0), (step, 0)]
        )
        work = jnp.where(mask, shifted, work)
    frac = jnp.asarray(f).reshape(H, 1)
    neighbor = jnp.pad(work[..., : padded_w - 1], lead + [(0, 0), (1, 0)])
    blended = work * (1.0 - frac) + neighbor * frac
    return blended[..., left + bias : left + bias + W]


def _shear_h(img: jnp.ndarray, k: float) -> jnp.ndarray:
    return jnp.swapaxes(_shear_w(jnp.swapaxes(img, -2, -1), k), -2, -1)


def _shear_w_traced(x: jnp.ndarray, k, cy: float, kmax: float) -> jnp.ndarray:
    """Shift row r (axis -2) along the minor axis by k*(r + 0.5 - cy) — k
    TRACED — via the same barrel-shifter decomposition as `_shear_w`, with
    the per-row shift BITS computed in-graph: (floor(delta) >> bit) & 1 per
    row. The step count and padding come from the STATIC bound ``kmax`` on
    |k| (the planner's quarter-turn buckets keep psi in [-45, 45], so
    |tan(psi/2)| <= 0.415 and |sin(psi)| <= 0.708), so the angle animates
    with zero recompiles. Exact bilinear interpolation — this replaced an
    FFT phase-ramp shear that was 7x slower on v5e (8.3 -> 1.1 ms for a
    900x500 rotation) and rang on hard edges (Gibbs)."""
    h, w = x.shape[-2], x.shape[-1]
    delta = k * (jnp.arange(h, dtype=jnp.float32) + 0.5 - cy)
    i = jnp.floor(delta).astype(jnp.int32)
    f = delta - i.astype(jnp.float32)
    bound = int(math.ceil(kmax * max(cy, h - cy))) + 1
    shifts = i + bound  # in [0, 2*bound]
    lead = [(0, 0)] * (x.ndim - 2)
    left = right = bound + 1
    work = jnp.pad(x, lead + [(0, 0), (left, right)])
    padded_w = w + left + right
    for bit in range((2 * bound).bit_length()):
        step = 1 << bit
        mask = ((shifts >> bit) & 1).astype(bool).reshape(h, 1)
        shifted = jnp.pad(
            work[..., : padded_w - step], lead + [(0, 0), (step, 0)]
        )
        work = jnp.where(mask, shifted, work)
    frac = f.reshape(h, 1)
    neighbor = jnp.pad(work[..., : padded_w - 1], lead + [(0, 0), (1, 0)])
    work = work * (1.0 - frac) + neighbor * frac
    return work[..., left + bound : left + bound + w]


def _shear_h_traced(x: jnp.ndarray, k, cx: float, kmax: float) -> jnp.ndarray:
    return jnp.swapaxes(
        _shear_w_traced(jnp.swapaxes(x, -2, -1), k, cx, kmax), -2, -1
    )


# static |k| bounds for the traced shears with psi in [-45, 45]
_A_MAX = 0.4143  # |tan(psi/2)|
_B_MAX = 0.7072  # |sin(psi)|


def traced_work_size(h: int, w: int) -> int:
    """Working square side for rotate_traced: covers every angle (bounding
    circle), rounded to a lane-friendly multiple of 16."""
    s = int(math.ceil(math.hypot(h, w))) + 4
    return (s + 15) // 16 * 16


def rotate_traced_cm(
    tile: jnp.ndarray, theta_deg, quarter_turns: int
) -> jnp.ndarray:
    """Rotate (..., h, w) f32 premultiplied content by a TRACED angle about
    the tile center; returns an (..., S, S) square (S = traced_work_size)
    centered on the same point. ``quarter_turns`` is the static
    round(theta/90) bucket chosen by the planner (so the traced residual
    psi stays in [-45, 45] where the 3-shear decomposition is stable);
    crossing a bucket recompiles once, animation within it does not."""
    q = quarter_turns % 4
    if q:
        tile = jnp.rot90(tile, k=-q, axes=(-2, -1))
    h, w = tile.shape[-2], tile.shape[-1]
    S = traced_work_size(h, w)
    py = (S - h) // 2
    px = (S - w) // 2
    lead = [(0, 0)] * (tile.ndim - 2)
    work = jnp.pad(
        tile, lead + [(py, py + (S - h) % 2), (px, px + (S - w) % 2)]
    )
    cy = py + h / 2.0
    cx = px + w / 2.0
    psi = (theta_deg % 360.0) - 90.0 * quarter_turns
    rad = psi * (jnp.pi / 180.0)
    a = -jnp.tan(rad / 2.0)
    b = jnp.sin(rad)
    work = _shear_w_traced(work, a, cy, _A_MAX)
    work = _shear_h_traced(work, b, cx, _B_MAX)
    work = _shear_w_traced(work, a, cy, _A_MAX)
    return jnp.clip(work, 0.0, 1.0)


def rotate_traced(
    tile: jnp.ndarray, theta_deg, quarter_turns: int
) -> jnp.ndarray:
    """(h, w, C) wrapper around `rotate_traced_cm` (channel-major core)."""
    return jnp.moveaxis(
        rotate_traced_cm(jnp.moveaxis(tile, -1, 0), theta_deg, quarter_turns),
        0,
        -1,
    )


def rotate_static_cm(
    tile: jnp.ndarray, theta_deg: float, out_h: int, out_w: int
) -> jnp.ndarray:
    """Rotate (..., h, w) f32 premultiplied content by `theta_deg`
    (clockwise, y-down — matching the layout shader's coordinate frame)
    about the tile center; returns the (..., out_h, out_w) crop centered on
    the same point, transparent-filled. The angle is STATIC."""
    q, psi = _normalize(theta_deg)
    if q:
        # jnp.rot90 k>0 is counter-clockwise in array display; clockwise
        # (y-down, positive theta) quarter turns need k=-q
        tile = jnp.rot90(tile, k=-q, axes=(-2, -1))
    h, w = tile.shape[-2], tile.shape[-1]
    # centered embed with matching parity so the content center stays exact
    py = max((out_h - h + 1) // 2, 0) + 2
    px = max((out_w - w + 1) // 2, 0) + 2
    lead = [(0, 0)] * (tile.ndim - 2)
    work = jnp.pad(tile, lead + [(py, py), (px, px)])
    if abs(psi) > 1e-9:
        rad = math.radians(psi)
        a = -math.tan(rad / 2.0)
        b = math.sin(rad)
        work = _shear_w(work, a)
        work = _shear_h(work, b)
        work = _shear_w(work, a)
    WH, WW = work.shape[-2], work.shape[-1]
    t0 = (WH - out_h) // 2
    l0 = (WW - out_w) // 2
    return work[..., t0 : t0 + out_h, l0 : l0 + out_w]


def rotate_static(
    tile: jnp.ndarray, theta_deg: float, out_h: int, out_w: int
) -> jnp.ndarray:
    """(h, w, C) wrapper around `rotate_static_cm` (channel-major core)."""
    return jnp.moveaxis(
        rotate_static_cm(jnp.moveaxis(tile, -1, 0), theta_deg, out_h, out_w),
        0,
        -1,
    )
