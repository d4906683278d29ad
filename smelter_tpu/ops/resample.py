"""Rescaling / resampling ops (pure JAX, jittable).

TPU-native equivalents of the reference resampler
(`smelter-render/src/transformations/layout/resample.wgsl` - separable
Lanczos3 with kernel widened by the scale ratio, plus
`downsample.wgsl` - power-of-2 box-reduce prepass for large ratios).

Design notes (TPU-first):
  - Separable 1-D resampling along an axis is expressed as a gather of
    ``taps`` shifted copies + weighted sum. Taps are static per compiled
    program; XLA fuses the whole thing into one VPU loop per axis.
  - For large downscale ratios a box cascade (mean-pool by 2) runs first so
    the Lanczos tap count stays small and static (ratio <= 2 after cascade),
    exactly like the reference's downsample.wgsl prepass.
  - ``resize_bilinear`` matches a GPU linear sampler (texel-center aligned),
    used for the dynamic-size path where target sizes are traced values.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _axis_positions(out_size: int, in_size: int) -> np.ndarray:
    """Texel-center aligned source positions for each output index."""
    return (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5


def _lanczos3(x: np.ndarray) -> np.ndarray:
    """lanczos3(x) = sinc(x) * sinc(x/3) on |x| < 3."""
    x = np.abs(x)
    out = np.where(
        x < 1e-5,
        1.0,
        np.where(
            x < 3.0,
            3.0
            * np.sin(np.pi * x)
            * np.sin(np.pi * x / 3.0)
            / (np.pi * np.pi * x * x + 1e-30),
            0.0,
        ),
    )
    return out


def lanczos_axis_weights(in_size: int, out_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static (indices, weights) for 1-D Lanczos3 resampling.

    Kernel is widened by the downscale ratio (``scale = in/out``) exactly like
    the reference shader: support = 3 * max(scale, 1), sample step 1/kernel.

    Returns indices (out_size, taps) int32 and weights (out_size, taps) f32,
    weights normalized to sum 1 per output sample.
    """
    scale = in_size / out_size
    kernel_scale = max(scale, 1.0)
    support = 3.0 * kernel_scale
    centers = _axis_positions(out_size, in_size)
    first = np.ceil(centers - support)
    taps = int(math.ceil(2.0 * support)) + 1
    offsets = np.arange(taps)
    idx = first[:, None] + offsets[None, :]
    x = (idx - centers[:, None]) / kernel_scale
    w = _lanczos3(x)
    w = w / w.sum(axis=1, keepdims=True)
    idx = np.clip(idx, 0, in_size - 1).astype(np.int32)
    return idx, w.astype(np.float32)


def _resample_axis(img: jnp.ndarray, idx: np.ndarray, w: np.ndarray, axis: int):
    """Apply 1-D resampling with static (idx, weights) along ``axis``."""
    idx_j = jnp.asarray(idx)
    w_j = jnp.asarray(w)
    taps = idx.shape[1]
    gathered = jnp.take(img, idx_j.reshape(-1), axis=axis)
    new_shape = list(img.shape)
    new_shape[axis : axis + 1] = [idx.shape[0], taps]
    gathered = gathered.reshape(new_shape)
    w_shape = [1] * len(new_shape)
    w_shape[axis] = idx.shape[0]
    w_shape[axis + 1] = taps
    return jnp.sum(gathered * w_j.reshape(w_shape), axis=axis + 1)


def box_downsample_2x(img: jnp.ndarray) -> jnp.ndarray:
    """Mean-pool by 2 along H and W (first two axes). Odd sizes drop the last
    row/col, like a power-of-2 box reduce."""
    h, w = img.shape[0] // 2 * 2, img.shape[1] // 2 * 2
    img = img[:h, :w]
    return img.reshape(h // 2, 2, w // 2, 2, *img.shape[2:]).mean(axis=(1, 3))


def resize_lanczos3(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """High-quality separable Lanczos3 resize of (H, W, C) to (out_h, out_w, C).

    Static output size (specialized per compiled program). For downscale
    ratios > 2 a box cascade halves the image first so taps stay <= 13.
    """
    while img.shape[0] / out_h > 2.0 and img.shape[1] / out_w > 2.0:
        img = box_downsample_2x(img)
    if img.shape[0] != out_h:
        idx, w = lanczos_axis_weights(img.shape[0], out_h)
        img = _resample_axis(img, idx, w, axis=0)
    if img.shape[1] != out_w:
        idx, w = lanczos_axis_weights(img.shape[1], out_w)
        img = _resample_axis(img, idx, w, axis=1)
    return img


def _dense_axis_weights(in_size: int, out_size: int, kind: str) -> np.ndarray:
    """Dense (out, in) resampling matrix for one axis.

    TPU-first: a separable resize IS two small dense matmuls, which XLA maps
    straight onto the MXU — far faster than gather-based sampling. The band
    structure wastes some zeros but the matrices are tiny (e.g. 540x1080 f32
    ≈ 2.3 MB) next to the pixel data.
    """
    W = np.zeros((out_size, in_size), np.float32)
    if kind == "lanczos3":
        idx, wts = lanczos_axis_weights(in_size, out_size)
        for o in range(out_size):
            np.add.at(W[o], idx[o], wts[o])
    elif kind == "bilinear":
        pos = np.clip(_axis_positions(out_size, in_size), 0.0, in_size - 1.0)
        lo = np.floor(pos).astype(np.int32)
        hi = np.minimum(lo + 1, in_size - 1)
        f = (pos - lo).astype(np.float32)
        for o in range(out_size):
            W[o, lo[o]] += 1.0 - f[o]
            W[o, hi[o]] += f[o]
    else:
        raise ValueError(f"unknown resize kind {kind!r}")
    return W


def resize_matmul(
    img: jnp.ndarray,
    out_h: int,
    out_w: int,
    kind: str = "lanczos3",
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Separable resize as two MXU matmuls. ``img``: (..., H, W) — leading
    batch dims allowed; resizes the last two axes. uint8 inputs are exact in
    bf16 (integers < 256 fit the 8-bit mantissa); accumulation is f32."""
    in_h, in_w = img.shape[-2], img.shape[-1]
    x = img.astype(compute_dtype)
    if in_h != out_h:
        Wh = jnp.asarray(_dense_axis_weights(in_h, out_h, kind), compute_dtype)
        # (..., H, W) x (out_h, H) -> (..., out_h, W)
        x = jnp.einsum(
            "oh,...hw->...ow", Wh, x, preferred_element_type=jnp.float32
        ).astype(compute_dtype)
    if in_w != out_w:
        Ww = jnp.asarray(_dense_axis_weights(in_w, out_w, kind), compute_dtype)
        x = jnp.einsum(
            "ow,...hw->...ho", Ww, x, preferred_element_type=jnp.float32
        ).astype(compute_dtype)
    return x


def resize_matmul_traced(
    img: jnp.ndarray,
    buf_h: int,
    buf_w: int,
    out_h,
    out_w,
    crop=None,
    centered: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Separable resize to a TRACED output size inside a static (buf_h,
    buf_w) buffer: the dense per-axis weight matrices are computed in-graph
    from the traced scale (anti-aliased triangle kernel, width max(1,
    in/out) so downscales average), then applied as two MXU matmuls — the
    traced analogue of `resize_matmul` for size-animating layouts. Rows and
    columns at or beyond the traced size come out zero.

    ``crop``: optional traced (top, left, width, height) source window —
    folded into the weight matrices, so crop animations (fill-mode zooms)
    stay gather-free too. ``centered=True`` writes the content centered in
    the buffer instead of top-left (needed when a rotation about the buffer
    center follows)."""
    in_h, in_w = img.shape[-2], img.shape[-1]

    def axis_weights(in_size: int, buf: int, out_sz, c0, c_len) -> jnp.ndarray:
        out_sz = jnp.maximum(out_sz.astype(jnp.float32), 1.0)
        o = (jnp.arange(buf, dtype=jnp.float32) + 0.5)[:, None]
        i = jnp.arange(in_size, dtype=jnp.float32)[None, :]
        scale = c_len / out_sz
        off = (buf - out_sz) * 0.5 if centered else 0.0
        pos = c0 + (o - off) * scale - 0.5
        width = jnp.maximum(scale, 1.0)
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(pos - i) / width)
        wgt = wgt * ((o - 0.5 >= off) & (o - 0.5 < off + out_sz))
        norm = jnp.maximum(wgt.sum(axis=1, keepdims=True), 1e-6)
        return (wgt / norm).astype(compute_dtype)

    if crop is None:
        ct, cl = jnp.float32(0.0), jnp.float32(0.0)
        cw, chh = jnp.float32(in_w), jnp.float32(in_h)
    else:
        ct, cl, cw, chh = (jnp.asarray(v, jnp.float32) for v in crop)
    Wh = axis_weights(in_h, buf_h, jnp.asarray(out_h), ct, chh)
    Ww = axis_weights(in_w, buf_w, jnp.asarray(out_w), cl, cw)
    x = img.astype(compute_dtype)
    x = jnp.einsum(
        "oh,...hw->...ow", Wh, x, preferred_element_type=jnp.float32
    ).astype(compute_dtype)
    return jnp.einsum("ow,...hw->...ho", Ww, x, preferred_element_type=jnp.float32)


def resize_matmul_u8(
    img: jnp.ndarray, out_h: int, out_w: int, kind: str = "lanczos3"
) -> jnp.ndarray:
    """uint8 → resized uint8 via bf16 MXU matmuls (rounds and clips)."""
    out = resize_matmul(img, out_h, out_w, kind).astype(jnp.float32)
    return jnp.clip(out + 0.5, 0.0, 255.0).astype(jnp.uint8)


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """GPU-sampler-equivalent bilinear resize (texel-center aligned), static
    output size."""
    in_h, in_w = img.shape[0], img.shape[1]
    # CLAMP_TO_EDGE: clamp the sample position before computing the mix
    ys = jnp.clip(
        jnp.asarray(_axis_positions(out_h, in_h), jnp.float32), 0.0, in_h - 1.0
    )
    xs = jnp.clip(
        jnp.asarray(_axis_positions(out_w, in_w), jnp.float32), 0.0, in_w - 1.0
    )
    y0 = jnp.floor(ys).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, in_h - 1)
    x0 = jnp.floor(xs).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, in_w - 1)
    fy = ys - jnp.floor(ys)
    fx = xs - jnp.floor(xs)
    top = img[y0][:, x0] * (1 - fx)[None, :, None] + img[y0][:, x1] * fx[None, :, None]
    bot = img[y1][:, x0] * (1 - fx)[None, :, None] + img[y1][:, x1] * fx[None, :, None]
    return top * (1 - fy)[:, None, None] + bot * fy[:, None, None]


# ---------------------------------------------------------------------------
# Dynamic sampling: source coords are traced values (used by the compose
# kernel where layout rects animate without recompilation).
# ---------------------------------------------------------------------------


def sample_bilinear(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample (H, W, C) at traced fractional coords.

    ys, xs: any broadcast-compatible shape S (in pixel units, texel centers at
    integer+0.5 convention NOT applied - pass ``coord - 0.5`` semantics
    yourself). Returns shape S + (C,). Coordinates are clamped to edges
    (CLAMP_TO_EDGE sampler semantics).
    """
    in_h, in_w = img.shape[0], img.shape[1]
    # CLAMP_TO_EDGE: clamp the sample position before computing the mix
    ys = jnp.clip(ys, 0.0, in_h - 1.0)
    xs = jnp.clip(xs, 0.0, in_w - 1.0)
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    fy = (ys - y0f)[..., None]
    fx = (xs - x0f)[..., None]
    y0 = y0f.astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, in_h - 1)
    x0 = x0f.astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, in_w - 1)
    p00 = img[y0, x0]
    p01 = img[y0, x1]
    p10 = img[y1, x0]
    p11 = img[y1, x1]
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    return top * (1 - fy) + bot * fy


def build_mips(img: jnp.ndarray, levels: int) -> list:
    """Mip pyramid [img, 1/2, 1/4, ...] via repeated 2x box reduce.

    Static shapes; used as prefilter for dynamically-scaled sampling so
    downscales stay antialiased without dynamic Lanczos taps.
    """
    mips = [img]
    for _ in range(levels - 1):
        if min(mips[-1].shape[0], mips[-1].shape[1]) < 2:
            break
        mips.append(box_downsample_2x(mips[-1]))
    return mips


def sample_bilinear_mip(
    mips: list, ys: jnp.ndarray, xs: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """Trilinear-ish sampling: pick the mip level for traced ``scale``
    (source pixels per output pixel, >= 1 means downscaling) and sample
    bilinearly within it. Level selection is a traced switch over static
    branches, blending the two nearest levels.

    ys, xs are coordinates in level-0 pixel units.
    """
    n = len(mips)
    if n == 1:
        return sample_bilinear(mips[0], ys, xs)
    lod = jnp.clip(jnp.log2(jnp.maximum(scale, 1.0)), 0.0, float(n - 1))
    lo = jnp.clip(jnp.floor(lod).astype(jnp.int32), 0, n - 1)
    frac = lod - jnp.floor(lod)

    def level_sample(i):
        f = float(2**i)
        return sample_bilinear(mips[i], (ys + 0.5) / f - 0.5, (xs + 0.5) / f - 0.5)

    lo_samples = jax.lax.switch(lo, [partial(level_sample, i) for i in range(n)])
    hi_samples = jax.lax.switch(
        jnp.clip(lo + 1, 0, n - 1), [partial(level_sample, i) for i in range(n)]
    )
    return lo_samples * (1.0 - frac) + hi_samples * frac
