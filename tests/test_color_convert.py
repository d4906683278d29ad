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
