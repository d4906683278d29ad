"""Gather-free image rotation for the TPU compose path.

The reference rotates layouts for free in the wgpu vertex stage
(`apply_layouts.wgsl` vertex transform); a literal port would inverse-sample
the canvas — a full-canvas 2D gather, which is the slowest thing you can ask
a TPU to do (~8 ns/tap scalarized, >100 ms/frame at 1080p). Instead, stable
rotations compile to the classic Paeth 3-shear decomposition:

    R(psi) = ShearX(-tan(psi/2)) . ShearY(sin psi) . ShearX(-tan(psi/2))

Each shear shifts rows (or columns) by an amount LINEAR in the row index, so
rows with equal integer shift form contiguous bands. Per band the shear is a
static slice of a zero-padded image plus a constant-weight blend of the two
adjacent integer shifts — exact bilinear interpolation with ZERO gathers,
pure slices + elementwise VPU math. Quarter turns are jnp.rot90 (layout
moves only). The angle is static (planner-stable rotations only; animated
rotations route to the general sampled path), so the band structure bakes
into the compiled program.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

# Above this many total bands the emitted HLO gets large enough to hurt
# compile latency; callers should fall back to the sampled path.
MAX_SHEAR_BANDS = 900


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


def _shear_bands(k: float, n: int, center: float) -> List[Tuple[int, int, int, np.ndarray]]:
    """Row bands for a shear of slope k about `center`:
    [(r0, r1, int_shift, frac (band_h,) )]. All static numpy."""
    if n == 0:
        return []
    delta = k * (np.arange(n, dtype=np.float64) + 0.5 - center)
    i = np.floor(delta).astype(np.int64)
    f = (delta - i).astype(np.float32)
    bands = []
    r0 = 0
    for r in range(1, n + 1):
        if r == n or i[r] != i[r0]:
            bands.append((r0, r, int(i[r0]), f[r0:r]))
            r0 = r
    return bands


def _shear_x(img: jnp.ndarray, k: float) -> jnp.ndarray:
    """out[r, c] = bilinear img[r, c - k*(r - H/2)]; zero fill. (H, W, C)."""
    H, W = img.shape[0], img.shape[1]
    bands = _shear_bands(k, H, H / 2.0)
    if not bands:
        return img
    max_shift = max(abs(b[2]) for b in bands) + 1
    if max_shift >= W:
        return jnp.zeros_like(img)
    pad = [(0, 0), (max_shift, max_shift)] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad)
    parts = []
    for r0, r1, i, f in bands:
        # sample at c - (i + f): lerp of columns (c - i) and (c - i - 1)
        s0 = padded[r0:r1, max_shift - i : max_shift - i + W]
        s1 = padded[r0:r1, max_shift - i - 1 : max_shift - i - 1 + W]
        if s0.shape[0] != len(f):  # pragma: no cover - diagnostic
            raise AssertionError(
                f"shear band mismatch: H={H} W={W} img={img.shape} "
                f"band=({r0},{r1},{i}) f={len(f)} slice={s0.shape} k={k}"
            )
        fb = jnp.asarray(f).reshape((-1,) + (1,) * (img.ndim - 1))
        parts.append(s0 * (1.0 - fb) + s1 * fb)
    return jnp.concatenate(parts, axis=0)


def _shear_y(img: jnp.ndarray, k: float) -> jnp.ndarray:
    return jnp.swapaxes(_shear_x(jnp.swapaxes(img, 0, 1), k), 0, 1)


def _shear_x_fft(x: jnp.ndarray, k, cy: float) -> jnp.ndarray:
    """Shift row r horizontally by k*(r + 0.5 - cy) — k TRACED — via an FFT
    phase ramp. Exact sinc interpolation for band-limited content; hard
    edges ring slightly (Gibbs), which the caller clips. Zero gathers, and
    the angle animates without recompiling. Requires even (TPU: composite
    radix) widths; callers pad to a multiple of 16."""
    h, w = x.shape[0], x.shape[1]
    F = jnp.fft.rfft(x, axis=1)
    freqs = jnp.fft.rfftfreq(w).astype(jnp.float32)
    delta = k * (jnp.arange(h, dtype=jnp.float32) + 0.5 - cy)
    phase = jnp.exp(
        (-2j * jnp.pi) * (freqs[None, :] * delta[:, None]).astype(jnp.complex64)
    )
    # raised-cosine roll-off on the top of the band: sinc interpolation of
    # hard (alpha) edges rings; tapering 0.35..0.5 cycles/px suppresses the
    # fringes at an imperceptible blur cost (the path only runs while the
    # angle is animating)
    t = jnp.clip((freqs - 0.35) / 0.15, 0.0, 1.0)
    taper = (0.5 * (1.0 + jnp.cos(jnp.pi * t))).astype(jnp.complex64)
    phase = phase * taper[None, :]
    shaped = phase.reshape(phase.shape + (1,) * (x.ndim - 2))
    return jnp.fft.irfft(F * shaped, n=w, axis=1)


def _shear_y_fft(x: jnp.ndarray, k, cx: float) -> jnp.ndarray:
    return jnp.swapaxes(_shear_x_fft(jnp.swapaxes(x, 0, 1), k, cx), 0, 1)


def traced_work_size(h: int, w: int) -> int:
    """Working square side for rotate_traced: covers every angle (bounding
    circle) and satisfies the TPU FFT size constraint."""
    s = int(math.ceil(math.hypot(h, w))) + 4
    return (s + 15) // 16 * 16


def rotate_traced(
    tile: jnp.ndarray, theta_deg, quarter_turns: int
) -> jnp.ndarray:
    """Rotate (h, w, C) f32 premultiplied content by a TRACED angle about
    the tile center; returns an (S, S, C) square (S = traced_work_size)
    centered on the same point. ``quarter_turns`` is the static
    round(theta/90) bucket chosen by the planner (so the traced residual
    psi stays in [-45, 45] where the 3-shear decomposition is stable);
    crossing a bucket recompiles once, animation within it does not."""
    q = quarter_turns % 4
    if q:
        tile = jnp.rot90(tile, k=-q, axes=(0, 1))
    h, w = tile.shape[0], tile.shape[1]
    S = traced_work_size(tile.shape[1], tile.shape[0])
    py = (S - h) // 2
    px = (S - w) // 2
    work = jnp.pad(tile, [(py, py + (S - h) % 2), (px, px + (S - w) % 2)]
                   + [(0, 0)] * (tile.ndim - 2))
    cy = py + h / 2.0
    cx = px + w / 2.0
    psi = (theta_deg % 360.0) - 90.0 * quarter_turns
    rad = psi * (jnp.pi / 180.0)
    a = -jnp.tan(rad / 2.0)
    b = jnp.sin(rad)
    work = _shear_x_fft(work, a, cy)
    work = _shear_y_fft(work, b, cx)
    work = _shear_x_fft(work, a, cy)
    # clip FFT ringing out of the premultiplied range
    return jnp.clip(work, 0.0, 1.0)


def rotate_static(
    tile: jnp.ndarray, theta_deg: float, out_h: int, out_w: int
) -> jnp.ndarray:
    """Rotate (h, w, C) f32 premultiplied-RGBA content by `theta_deg`
    (clockwise, y-down — matching the layout shader's coordinate frame)
    about the tile center; returns the (out_h, out_w, C) crop centered on
    the same point, transparent-filled. The angle is STATIC."""
    q, psi = _normalize(theta_deg)
    if q:
        # jnp.rot90 k>0 is counter-clockwise in array display; clockwise
        # (y-down, positive theta) quarter turns need k=-q
        tile = jnp.rot90(tile, k=-q, axes=(0, 1))
    h, w = tile.shape[0], tile.shape[1]
    # centered embed with matching parity so the content center stays exact
    py = max((out_h - h + 1) // 2, 0) + 2
    px = max((out_w - w + 1) // 2, 0) + 2
    work = jnp.pad(tile, [(py, py), (px, px)] + [(0, 0)] * (tile.ndim - 2))
    if abs(psi) > 1e-9:
        rad = math.radians(psi)
        a = -math.tan(rad / 2.0)
        b = math.sin(rad)
        work = _shear_x(work, a)
        work = _shear_y(work, b)
        work = _shear_x(work, a)
    WH, WW = work.shape[0], work.shape[1]
    t0 = (WH - out_h) // 2
    l0 = (WW - out_w) // 2
    return work[t0 : t0 + out_h, l0 : l0 + out_w]
