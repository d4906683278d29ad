"""Color-space / pixel-format conversion ops (pure JAX, jittable).

TPU-native equivalents of the reference WGSL converters
(`smelter-render/src/wgpu/format/*.wgsl`): BT.709 YUV<->RGB with limited
(MPEG, 16-235/16-240) or full (JPEG) range, chroma up/down-sampling for
4:2:0 / 4:2:2, NV12 pack/unpack, interleaved YUYV/UYVY, and byte swizzles.

Everything operates on float32 in [0, 1]; helpers convert u8 <-> f32 at the
boundary so XLA fuses the normalization into the conversion kernel. Internal
RGBA textures are NOT premultiplied here - premultiplication happens in the
compose stage where alpha first appears.

Matrix constants follow ITU-R BT.709 (same values as the reference's
`planar_yuv_to_rgba.wgsl:44-57` / `rgba_to_yuv.wgsl:27-57`).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

# Limited-range footroom/scale: Y in [16, 235], UV in [16, 240] (8-bit).
_Y_SCALE = 219.0 / 255.0
_UV_SCALE = 224.0 / 255.0
_FOOTROOM = 16.0 / 255.0


def u8_to_f32(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32) * (1.0 / 255.0)


def _as_unit_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Accept u8 [0,255] or float [0,1]; return f32 [0,1]. Integer inputs
    are normalized — passing u8 where f32 was expected silently saturated
    before, a real footgun for API users."""
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer):
        return u8_to_f32(jnp.asarray(x))
    return jnp.asarray(x).astype(jnp.float32)


def f32_to_u8(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x * 255.0), 0.0, 255.0).astype(jnp.uint8)


def _expand_range(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Limited -> full range (inverse footroom), clamped like the reference."""
    y = jnp.clip((y - _FOOTROOM) / _Y_SCALE, 0.0, 1.0)
    u = jnp.clip((u - _FOOTROOM) / _UV_SCALE, 0.0, 1.0)
    v = jnp.clip((v - _FOOTROOM) / _UV_SCALE, 0.0, 1.0)
    return y, u, v


def yuv_to_rgb(
    y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, full_range: bool = False
) -> jnp.ndarray:
    """BT.709 YUV (all planes same shape, [0,1]) -> RGB (H, W, 3) in [0,1]."""
    if not full_range:
        y, u, v = _expand_range(y, u, v)
    u = u - 0.5
    v = v - 0.5
    r = y + 1.5748 * v
    g = y - 0.1873 * u - 0.4681 * v
    b = y + 1.8556 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


def rgb_to_yuv(rgb: jnp.ndarray, full_range: bool = False):
    """BT.709 RGB (..., 3) in [0,1] -> (y, u, v) planes in [0,1]."""
    return rgb_planes_to_yuv(rgb[..., 0], rgb[..., 1], rgb[..., 2], full_range)


def rgb_planes_to_yuv(r, g, b, full_range: bool = False):
    """BT.709 from separate R/G/B planes (the channel-major compose canvas
    feeds these directly — no interleave/transpose)."""
    y = 0.2126 * r + 0.7152 * g + 0.0722 * b
    u = -0.1146 * r - 0.3854 * g + 0.5 * b + 0.5
    v = 0.5 * r - 0.4542 * g - 0.0458 * b + 0.5
    if not full_range:
        y = y * _Y_SCALE + _FOOTROOM
        u = (u - 0.5) * _UV_SCALE + 0.5 * _UV_SCALE + _FOOTROOM
        v = (v - 0.5) * _UV_SCALE + 0.5 * _UV_SCALE + _FOOTROOM
    return (
        jnp.clip(y, 0.0, 1.0),
        jnp.clip(u, 0.0, 1.0),
        jnp.clip(v, 0.0, 1.0),
    )


def upsample_chroma_bilinear(plane: jnp.ndarray, sx: int, sy: int) -> jnp.ndarray:
    """Upsample a chroma plane by (sy vertical, sx horizontal) with the same
    semantics as a GPU linear sampler reading the small texture at full-res
    normalized coordinates (texel-center aligned bilinear)."""
    if sx == 1 and sy == 1:
        return plane
    h, w = plane.shape
    out = plane
    if sy == 2:
        # vertical: output row i samples source at (i + 0.5)/2 - 0.5
        pos = (jnp.arange(2 * h) + 0.5) / 2.0 - 0.5
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, h - 1)
        i1 = jnp.clip(i0 + 1, 0, h - 1)
        frac = jnp.clip(pos - jnp.floor(pos), 0.0, 1.0)
        out = out[i0, :] * (1.0 - frac)[:, None] + out[i1, :] * frac[:, None]
    if sx == 2:
        hw = out.shape[1]
        pos = (jnp.arange(2 * hw) + 0.5) / 2.0 - 0.5
        j0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, hw - 1)
        j1 = jnp.clip(j0 + 1, 0, hw - 1)
        frac = jnp.clip(pos - jnp.floor(pos), 0.0, 1.0)
        out = out[:, j0] * (1.0 - frac)[None, :] + out[:, j1] * frac[None, :]
    return out


def downsample_chroma_2x2(plane: jnp.ndarray) -> jnp.ndarray:
    """Average 2x2 blocks (equivalent to GPU bilinear sample at half-res
    texel centers, as in the reference rgba_to_yuv U/V passes).

    Implemented as a 2x2/stride-2 reduce_window (native TPU windowed
    reduction), NOT reshape(h/2,2,w/2,2).mean: the rank-4 reshape puts a
    size-2 axis on the 128-lane minor dim inside large fused programs
    (observed 0.8 ms/plane at 1080p on v5e vs ~0.03 ms for this form —
    bench_scenes.py catches regressions here)."""
    s = jax.lax.reduce_window(
        plane, 0.0, jax.lax.add, (2, 2), (2, 2), "VALID"
    )
    return s * 0.25


def downsample_chroma_1x2(plane: jnp.ndarray) -> jnp.ndarray:
    """Average horizontal pairs (4:2:2); reduce_window for the same layout
    reason as downsample_chroma_2x2."""
    s = jax.lax.reduce_window(
        plane, 0.0, jax.lax.add, (1, 2), (1, 2), "VALID"
    )
    return s * 0.5


# ---------------------------------------------------------------------------
# Frame-level converters: u8 planes -> RGBA f32 (alpha=1), and back.
# ---------------------------------------------------------------------------


def planar_yuv_to_rgba(
    y: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    full_range: bool = False,
) -> jnp.ndarray:
    """Planar YUV u8 (any subsampling; u/v shape infers it) -> (H, W, 4) f32."""
    yf = u8_to_f32(y)
    uf = u8_to_f32(u)
    vf = u8_to_f32(v)
    sy = y.shape[0] // u.shape[0]
    sx = y.shape[1] // u.shape[1]
    uf = upsample_chroma_bilinear(uf, sx, sy)
    vf = upsample_chroma_bilinear(vf, sx, sy)
    rgb = yuv_to_rgb(yf, uf, vf, full_range)
    alpha = jnp.ones(rgb.shape[:2] + (1,), rgb.dtype)
    return jnp.concatenate([rgb, alpha], axis=-1)


def _chroma_upsample_matrix(n_full: int, n_sub: int):
    """(n_full, n_sub) matrix form of `upsample_chroma_bilinear` along one
    axis (texel-center aligned linear sampling); identity when not
    subsampled."""
    import numpy as np

    if n_full == n_sub:
        return np.eye(n_sub, dtype=np.float32)
    U = np.zeros((n_full, n_sub), np.float32)
    pos = (np.arange(n_full) + 0.5) * (n_sub / n_full) - 0.5
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_sub - 1)
    i1 = np.clip(i0 + 1, 0, n_sub - 1)
    frac = np.clip(pos - np.floor(pos), 0.0, 1.0).astype(np.float32)
    rows = np.arange(n_full)
    np.add.at(U, (rows, i0), 1.0 - frac)
    np.add.at(U, (rows, i1), frac)
    return U


def yuv_tile_rgba_cm(
    y: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    crop,  # (top, left, h, w) in luma pixels, static ints
    out_h: int,
    out_w: int,
    full_range: bool = False,
    kind: str = "lanczos3",
    compute_dtype=jnp.bfloat16,
):
    """Crop + resize + BT.709-convert planar YUV u8 planes directly to a
    channel-major (4, out_h, out_w) f32 RGBA tile (alpha = 1), never
    materializing full-resolution RGBA.

    TPU-first: the per-pixel color matrix is affine and the resize weights
    sum to 1, so spatial resizing commutes with the conversion — resizing
    the subsampled planes first moves ~2.7x fewer MXU FLOPs than converting
    then resizing (4 full-res channels -> 1 luma + 2 quarter-res chroma) and
    skips the full-res f32 RGBA HBM round-trip. Chroma planes resize with
    COMPOSED (resize @ bilinear-upsample) weight matrices whose upsample
    rows are sliced by the luma crop, so any integer crop matches
    `resize_matmul(planar_yuv_to_rgba(y,u,v)[crop])` exactly. The one
    deviation: the limited-range expansion / RGB clamps are not applied
    per-pixel at FULL resolution first, so out-of-range YUV noise (below
    footroom / above headroom) blends linearly instead of pre-clamped —
    the end-of-pipe u8 clamp still bounds the output.

    Implemented as the 1-element case of `yuv_tiles_rgba_cm_batched` so the
    conversion math lives in exactly one place."""
    return yuv_tiles_rgba_cm_batched(
        y[None], u[None], v[None], crop, out_h, out_w,
        full_range=full_range, kind=kind, compute_dtype=compute_dtype,
    )[0]


def yuv_tiles_rgba_cm_batched(
    ys: jnp.ndarray,  # (n, H, W) u8 luma planes, identical shapes
    us: jnp.ndarray,  # (n, Hc, Wc)
    vs: jnp.ndarray,  # (n, Hc, Wc)
    crop,  # (top, left, h, w) in luma pixels, static ints — shared
    out_h: int,
    out_w: int,
    full_range: bool = False,
    kind: str = "lanczos3",
    compute_dtype=jnp.bfloat16,
):
    """Batched `yuv_tile_rgba_cm`: n sources sharing plane shapes, crop and
    target size resize+convert in ONE stacked einsum per axis/plane instead
    of 6 small einsums per source — same weights, same math, so each batch
    element equals the unbatched call exactly. Returns (n, 4, out_h, out_w).

    TPU-first: the flagship scene resizes 16 same-shape 1080p inputs to the
    same tile size; a 16-way batch axis turns 96 dispatches into 6 and keeps
    the MXU on large tiles."""
    import numpy as np

    from smelter_tpu.ops.resample import _dense_axis_weights

    ct, cl, chh, cww = crop
    Wh = _dense_axis_weights(chh, out_h, kind)
    Ww = _dense_axis_weights(cww, out_w, kind)
    Uh = _chroma_upsample_matrix(ys.shape[1], us.shape[1])
    Uw = _chroma_upsample_matrix(ys.shape[2], us.shape[2])
    Wch = np.ascontiguousarray(Wh @ Uh[ct : ct + chh])
    Wcw = np.ascontiguousarray(Ww @ Uw[cl : cl + cww])

    def _rs(imgs, Wr, Wc):
        x = imgs.astype(compute_dtype)
        a = jnp.asarray(Wr, compute_dtype)
        b = jnp.asarray(Wc, compute_dtype)
        x = jnp.einsum(
            "oh,nhw->now", a, x, preferred_element_type=jnp.float32
        ).astype(compute_dtype)
        return jnp.einsum(
            "ow,nhw->nho", b, x, preferred_element_type=jnp.float32
        )

    yt = _rs(ys[:, ct : ct + chh, cl : cl + cww], Wh, Ww) * (1.0 / 255.0)
    ut = _rs(us, Wch, Wcw) * (1.0 / 255.0)
    vt = _rs(vs, Wch, Wcw) * (1.0 / 255.0)
    if not full_range:
        yt = (yt - _FOOTROOM) * (1.0 / _Y_SCALE)
        ut = (ut - _FOOTROOM) * (1.0 / _UV_SCALE)
        vt = (vt - _FOOTROOM) * (1.0 / _UV_SCALE)
    ut = ut - 0.5
    vt = vt - 0.5
    r = yt + 1.5748 * vt
    g = yt - 0.1873 * ut - 0.4681 * vt
    b = yt + 1.8556 * ut
    return jnp.stack([r, g, b, jnp.ones_like(r)], axis=1)


class DeferredYuvSource:
    """Planar-YUV input source whose RGBA conversion is deferred: static
    fast-path texture layouts crop+resize the subsampled planes directly on
    the MXU (`yuv_tile_rgba_cm`); consumers that need full-resolution RGBA
    mips (gather paths, shaders, traced-size transitions) call `.mips()`,
    which converts once per trace. Created inside a traced frame program —
    never shared across traces."""

    def __init__(self, y, u, v, full_range: bool = False, mip_levels: int = 1):
        self.planes = (y, u, v)
        self.full_range = full_range
        self._levels = mip_levels
        self._mips = None

    def tile_cm(self, crop, out_h: int, out_w: int):
        y, u, v = self.planes
        return yuv_tile_rgba_cm(
            y, u, v, crop, out_h, out_w, full_range=self.full_range
        )

    def mips(self):
        if self._mips is None:
            from smelter_tpu.ops.resample import build_mips

            y, u, v = self.planes
            rgba = planar_yuv_to_rgba(y, u, v, full_range=self.full_range)
            self._mips = build_mips(rgba, self._levels)
        return self._mips


def rgba_to_planar_yuv420(rgba: jnp.ndarray, full_range: bool = False):
    """(H, W, 4) RGBA (f32 [0,1] or u8) -> (y, u, v) u8 planes, 4:2:0."""
    y, u, v = rgb_to_yuv(_as_unit_f32(rgba)[..., :3], full_range)
    return (
        f32_to_u8(y),
        f32_to_u8(downsample_chroma_2x2(u)),
        f32_to_u8(downsample_chroma_2x2(v)),
    )


def rgba_to_planar_yuv422(rgba: jnp.ndarray, full_range: bool = False):
    y, u, v = rgb_to_yuv(_as_unit_f32(rgba)[..., :3], full_range)
    return (
        f32_to_u8(y),
        f32_to_u8(downsample_chroma_1x2(u)),
        f32_to_u8(downsample_chroma_1x2(v)),
    )


def rgba_to_planar_yuv444(rgba: jnp.ndarray, full_range: bool = False):
    y, u, v = rgb_to_yuv(_as_unit_f32(rgba)[..., :3], full_range)
    return (f32_to_u8(y), f32_to_u8(u), f32_to_u8(v))


# ---------------------------------------------------------------------------
# Channel-major (4, H, W) canvas -> YUV planes: the compose path's planar
# canvas flows straight into per-plane math with ZERO transposes (the
# interleaved converters above survive for (H, W, 4) sources).
# ---------------------------------------------------------------------------


CANVAS_FIXED_SCALE = 8192.0
CANVAS_FIXED_OFFSET = 16384.0


def canvas_decode(x: jnp.ndarray) -> jnp.ndarray:
    """Canvas storage -> f32 premultiplied values.

    uint16 canvases are fixed-point with HEADROOM — value*8192 + 16384,
    i.e. the representable range is [-2, 6): the TPU production storage
    for root planar canvases (compose._canvas_dtype), half the HBM
    traffic of f32 at 1/8192 quantization (~0.03 u8 LSB per store, far
    inside the 1-LSB snapshot tolerance). The headroom matters: Lanczos3
    tile resizes ring past [0, 1] (measured [-0.31, 1.29] on noise) and
    blends of ringing layers compound — the f32 path keeps all of that
    until the final YUV clip, so a [0, 1]-clipping store format diverges
    by tens of LSBs on sharp edges and a [-0.5, 1.5) one still by a few
    (both measured). 16-bit FLOAT storage is not shippable either: bf16
    measurably breaks the 1-LSB tolerance and Mosaic has no f16 — see
    tools/bench_canvas_ab.py. Float canvases pass through (bf16
    upcasts)."""
    if x.dtype == jnp.uint16:
        return (x.astype(jnp.float32) - CANVAS_FIXED_OFFSET) * (
            1.0 / CANVAS_FIXED_SCALE
        )
    return x.astype(jnp.float32)


def _fused_yuv_mode() -> str:
    import os

    from smelter_tpu.config import xla_kernels_forced

    if xla_kernels_forced():  # GSPMD-sharded trace: no pallas routes
        return "off"
    return os.environ.get("SMELTER_FUSED_YUV", "auto")


def planar_rgba_to_yuv420(rgba_cm: jnp.ndarray, full_range: bool = False):
    """(4, H, W) RGBA f32 [0,1] -> (y, u, v) u8 planes, 4:2:0.

    On TPU this routes to the fused Pallas pass (ops/pallas/yuv_out.py):
    the XLA chain below materializes full-resolution f32 U/V planes between
    the color matrix and the 2x2 downsample (~0.35 ms standalone at 4K on
    v5e vs ~0.14 ms traffic floor). The XLA chain stays the off-TPU
    reference implementation (SMELTER_FUSED_YUV=auto|on|off)."""
    mode = _fused_yuv_mode()
    if mode != "off":
        from smelter_tpu.ops.pallas import yuv_out

        if yuv_out.eligible(rgba_cm) and (mode == "on" or yuv_out._on_tpu()):
            return yuv_out.rgba_cm_to_yuv420_fused(rgba_cm, full_range)
    rgba_cm = canvas_decode(rgba_cm)  # u16/bf16 canvases: matrix in f32
    y, u, v = rgb_planes_to_yuv(rgba_cm[0], rgba_cm[1], rgba_cm[2], full_range)
    return (
        f32_to_u8(y),
        f32_to_u8(downsample_chroma_2x2(u)),
        f32_to_u8(downsample_chroma_2x2(v)),
    )


def planar_rgba_to_yuv422(rgba_cm: jnp.ndarray, full_range: bool = False):
    rgba_cm = canvas_decode(rgba_cm)
    y, u, v = rgb_planes_to_yuv(rgba_cm[0], rgba_cm[1], rgba_cm[2], full_range)
    return (
        f32_to_u8(y),
        f32_to_u8(downsample_chroma_1x2(u)),
        f32_to_u8(downsample_chroma_1x2(v)),
    )


def planar_rgba_to_yuv444(rgba_cm: jnp.ndarray, full_range: bool = False):
    rgba_cm = canvas_decode(rgba_cm)
    y, u, v = rgb_planes_to_yuv(rgba_cm[0], rgba_cm[1], rgba_cm[2], full_range)
    return (f32_to_u8(y), f32_to_u8(u), f32_to_u8(v))


def planar_rgba_to_nv12(rgba_cm: jnp.ndarray):
    y, u, v = planar_rgba_to_yuv420(rgba_cm)
    return y, jnp.stack([u, v], axis=-1)


def nv12_to_rgba(y: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """NV12: y (H, W) u8, uv (H/2, W/2, 2) u8 -> (H, W, 4) f32 (limited range)."""
    return planar_yuv_to_rgba(y, uv[..., 0], uv[..., 1], full_range=False)


def rgba_to_nv12(rgba: jnp.ndarray):
    y, u, v = rgba_to_planar_yuv420(rgba)
    return y, jnp.stack([u, v], axis=-1)


def interleaved_yuyv_to_rgba(data: jnp.ndarray) -> jnp.ndarray:
    """YUYV 4:2:2: data (H, W/2, 4) u8 = [Y0, U, Y1, V] -> (H, W, 4) f32."""
    y = jnp.stack([data[..., 0], data[..., 2]], axis=-1).reshape(
        data.shape[0], data.shape[1] * 2
    )
    u = data[..., 1]
    v = data[..., 3]
    return planar_yuv_to_rgba(y, u, v, full_range=False)


def interleaved_uyvy_to_rgba(data: jnp.ndarray) -> jnp.ndarray:
    """UYVY 4:2:2: data (H, W/2, 4) u8 = [U, Y0, V, Y1] -> (H, W, 4) f32."""
    y = jnp.stack([data[..., 1], data[..., 3]], axis=-1).reshape(
        data.shape[0], data.shape[1] * 2
    )
    u = data[..., 0]
    v = data[..., 2]
    return planar_yuv_to_rgba(y, u, v, full_range=False)


def bgra_to_rgba(data: jnp.ndarray) -> jnp.ndarray:
    return u8_to_f32(data[..., [2, 1, 0, 3]])


def argb_to_rgba(data: jnp.ndarray) -> jnp.ndarray:
    return u8_to_f32(data[..., [1, 2, 3, 0]])


def rgba_u8_to_f32(data: jnp.ndarray) -> jnp.ndarray:
    return u8_to_f32(data)


def convert_to_rgba_f32(format_name: str, planes) -> jnp.ndarray:
    """Static dispatch by pixel format name -> (H, W, 4) f32 RGBA in [0,1]."""
    from smelter_tpu.core.types import PixelFormat

    fmt = PixelFormat(format_name)
    if fmt.is_planar_yuv:
        y, u, v = planes
        return planar_yuv_to_rgba(y, u, v, full_range=fmt.is_full_range)
    if fmt == PixelFormat.NV12:
        y, uv = planes
        return nv12_to_rgba(y, uv)
    if fmt == PixelFormat.INTERLEAVED_YUYV422:
        return interleaved_yuyv_to_rgba(planes)
    if fmt == PixelFormat.INTERLEAVED_UYVY422:
        return interleaved_uyvy_to_rgba(planes)
    if fmt == PixelFormat.RGBA:
        return rgba_u8_to_f32(planes)
    if fmt == PixelFormat.BGRA:
        return bgra_to_rgba(planes)
    if fmt == PixelFormat.ARGB:
        return argb_to_rgba(planes)
    raise ValueError(f"unsupported pixel format {format_name}")
