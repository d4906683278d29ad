"""Golden-value tests for BT.709 color conversion (reference semantics:
smelter-render/src/wgpu/format/planar_yuv_to_rgba.wgsl, rgba_to_yuv.wgsl)."""

import numpy as np
import jax.numpy as jnp
import pytest

from smelter_tpu.ops import color_convert as cc


def test_limited_range_black_white():
    # Y=16 limited is black, Y=235 is white (with neutral chroma 128)
    y = np.full((4, 4), 16, np.uint8)
    u = np.full((2, 2), 128, np.uint8)
    v = np.full((2, 2), 128, np.uint8)
    rgba = np.asarray(cc.planar_yuv_to_rgba(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
    assert np.allclose(rgba[..., :3], 0.0, atol=2 / 255)
    assert np.allclose(rgba[..., 3], 1.0)

    y[:] = 235
    rgba = np.asarray(cc.planar_yuv_to_rgba(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
    assert np.allclose(rgba[..., :3], 1.0, atol=2 / 255)


def test_full_range_grey():
    y = np.full((4, 4), 128, np.uint8)
    u = np.full((4, 4), 128, np.uint8)
    v = np.full((4, 4), 128, np.uint8)
    rgba = np.asarray(
        cc.planar_yuv_to_rgba(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), full_range=True)
    )
    assert np.allclose(rgba[..., :3], 128 / 255, atol=1 / 255)


def test_bt709_red_roundtrip():
    # pure red -> yuv -> back
    rgba = np.zeros((8, 8, 4), np.float32)
    rgba[..., 0] = 1.0
    rgba[..., 3] = 1.0
    y, u, v = cc.rgba_to_planar_yuv444(jnp.asarray(rgba))
    # BT.709: R=1 -> Y' = 0.2126 -> limited: 0.2126*219/255*255+16 = 62.6
    assert abs(int(np.asarray(y)[0, 0]) - 63) <= 1
    back = np.asarray(cc.planar_yuv_to_rgba(y, u, v))
    assert np.allclose(back[..., 0], 1.0, atol=0.02)
    assert np.allclose(back[..., 1], 0.0, atol=0.02)
    assert np.allclose(back[..., 2], 0.0, atol=0.02)


def test_yuv420_roundtrip_smooth_image():
    rng = np.random.RandomState(0)
    # smooth image (chroma subsampling is lossy on sharp edges)
    base = rng.rand(8, 8, 3).astype(np.float32)
    img = np.kron(base, np.ones((16, 16, 1), np.float32))  # 128x128, blocky=smooth within blocks
    rgba = np.concatenate([img, np.ones((128, 128, 1), np.float32)], axis=-1)
    y, u, v = cc.rgba_to_planar_yuv420(jnp.asarray(rgba))
    assert np.asarray(y).shape == (128, 128)
    assert np.asarray(u).shape == (64, 64)
    back = np.asarray(cc.planar_yuv_to_rgba(y, u, v))
    err = np.abs(back[..., :3] - img)
    assert err.mean() < 0.02


def test_nv12_matches_planar():
    rng = np.random.RandomState(1)
    y = rng.randint(16, 235, (16, 16)).astype(np.uint8)
    u = rng.randint(16, 240, (8, 8)).astype(np.uint8)
    v = rng.randint(16, 240, (8, 8)).astype(np.uint8)
    planar = np.asarray(cc.planar_yuv_to_rgba(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
    uv = np.stack([u, v], axis=-1)
    nv = np.asarray(cc.nv12_to_rgba(jnp.asarray(y), jnp.asarray(uv)))
    assert np.allclose(planar, nv)


def test_interleaved_yuyv():
    # uniform color: Y=128, U=90, V=240
    data = np.zeros((4, 4, 4), np.uint8)
    data[..., 0] = 128  # Y0
    data[..., 1] = 90  # U
    data[..., 2] = 128  # Y1
    data[..., 3] = 240  # V
    out = np.asarray(cc.interleaved_yuyv_to_rgba(jnp.asarray(data)))
    assert out.shape == (4, 8, 4)
    y_exp = (128 / 255 - 16 / 255) / (219 / 255)
    u_exp = (90 / 255 - 16 / 255) / (224 / 255) - 0.5
    v_exp = (240 / 255 - 16 / 255) / (224 / 255) - 0.5
    r_exp = np.clip(y_exp + 1.5748 * v_exp, 0, 1)
    assert np.allclose(out[..., 0], r_exp, atol=1e-5)


def test_byte_swizzles():
    data = np.arange(4 * 4 * 4, dtype=np.uint8).reshape(4, 4, 4)
    bgra = np.asarray(cc.bgra_to_rgba(jnp.asarray(data)))
    assert np.allclose(bgra[..., 0] * 255, data[..., 2])
    assert np.allclose(bgra[..., 3] * 255, data[..., 3])
    argb = np.asarray(cc.argb_to_rgba(jnp.asarray(data)))
    assert np.allclose(argb[..., 0] * 255, data[..., 1])
    assert np.allclose(argb[..., 3] * 255, data[..., 0])


def test_chroma_upsample_bilinear_constant():
    plane = jnp.full((4, 4), 0.25, jnp.float32)
    up = np.asarray(cc.upsample_chroma_bilinear(plane, 2, 2))
    assert up.shape == (8, 8)
    assert np.allclose(up, 0.25)


def _tile_vs_oracle(rgba: np.ndarray, crop, out_h, out_w):
    from smelter_tpu.ops.resample import resize_matmul

    y, u, v = cc.rgba_to_planar_yuv420(jnp.asarray(rgba))
    src = cc.DeferredYuvSource(y, u, v)
    new = np.asarray(jnp.clip(src.tile_cm(crop, out_h, out_w), 0.0, 1.0))
    full = cc.planar_yuv_to_rgba(y, u, v)
    ct, cl, chh, cww = crop
    patch = full[ct : ct + chh, cl : cl + cww]
    old = np.asarray(
        jnp.clip(
            resize_matmul(jnp.moveaxis(patch, -1, 0), out_h, out_w), 0.0, 1.0
        )
    )
    return new, np.abs(new - old) * 255.0


def test_yuv_tile_rgba_cm_exact_in_gamut():
    """The deferred crop+resize+convert path (composed chroma weights,
    subsampled-plane matmuls) matches convert-then-resize wherever the
    full-res conversion stays in gamut: the affine BT.709 matrix commutes
    with weight-normalized resizes."""
    yy, xx = np.mgrid[0:108, 0:192]
    # low-saturation content: chroma-resampled pixels stay in gamut
    rgba = np.stack(
        [
            96 + xx * 64 // 192,
            96 + yy * 64 // 108,
            96 + (xx + yy) * 64 // 300,
            np.full_like(xx, 255),
        ],
        -1,
    ).astype(np.uint8)
    rgba[40:70, 80:120, :3] = 160
    new, d = _tile_vs_oracle(rgba, (7, 11, 80, 160), 60, 120)
    assert new.shape == (4, 60, 120)
    assert np.allclose(new[3], 1.0)
    # residual is bf16 rounding taken in two different orders: the oracle
    # upsamples chroma in f32 then resizes in bf16; the deferred path rounds
    # the composed weights to bf16 once
    assert d.max() <= 3.0, d.max()
    assert d.mean() < 0.5, d.mean()


def test_yuv_tile_rgba_cm_bounded_at_gamut_edges():
    """At saturated edges the old path clipped RGB per pixel at FULL res
    before resampling (matching a GPU rgba8 texture), while the deferred
    path filters the unclipped signal in YUV and clamps once at the end —
    standard video-scaler behavior. The deviation is confined to 1-2 px
    seams around gamut-clipped pixels and bounded by the overshoot."""
    yy, xx = np.mgrid[0:108, 0:192]
    rgba = np.stack(
        [
            xx * 255 // 192,
            yy * 255 // 108,
            (xx + yy) * 255 // 300,
            np.full_like(xx, 255),
        ],
        -1,
    ).astype(np.uint8)
    rgba[40:70, 80:120, :3] = 255  # saturated block against a gradient
    _, d = _tile_vs_oracle(rgba, (7, 11, 80, 160), 60, 120)
    assert d.max() <= 24.0, d.max()  # bounded seam, not a broken convert
    assert d.mean() < 0.5, d.mean()  # and globally tight
    assert (d.max(axis=0) > 2.0).mean() < 0.05  # <5% of pixels affected


def test_deferred_yuv_source_mips_memoized():
    y = jnp.zeros((32, 64), jnp.uint8)
    u = jnp.full((16, 32), 128, jnp.uint8)
    v = jnp.full((16, 32), 128, jnp.uint8)
    src = cc.DeferredYuvSource(y, u, v, mip_levels=2)
    m1 = src.mips()
    assert src.mips() is m1 and len(m1) == 2
    assert m1[0].shape == (32, 64, 4)


def test_batched_yuv_tiles_match_single():
    """yuv_tiles_rgba_cm_batched == per-source tile_cm exactly (same
    weights, same einsum contractions, just a batch axis)."""
    import numpy as np
    import jax.numpy as jnp

    from smelter_tpu.ops.color_convert import (
        DeferredYuvSource,
        yuv_tiles_rgba_cm_batched,
    )

    rng = np.random.default_rng(7)
    srcs = []
    for _ in range(3):
        y = jnp.asarray(rng.integers(0, 256, (72, 128), np.uint8))
        u = jnp.asarray(rng.integers(0, 256, (36, 64), np.uint8))
        v = jnp.asarray(rng.integers(0, 256, (36, 64), np.uint8))
        srcs.append(DeferredYuvSource(y, u, v))
    crop = (8, 16, 48, 96)
    batched = np.asarray(yuv_tiles_rgba_cm_batched(
        jnp.stack([s.planes[0] for s in srcs]),
        jnp.stack([s.planes[1] for s in srcs]),
        jnp.stack([s.planes[2] for s in srcs]),
        crop, 32, 64,
    ))
    for i, s in enumerate(srcs):
        single = np.asarray(s.tile_cm(crop, 32, 64))
        assert np.array_equal(batched[i], single), i
