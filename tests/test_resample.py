"""Tests for rescaling ops (reference semantics: resample.wgsl Lanczos3 with
ratio-widened kernel + downsample.wgsl box cascade)."""

import numpy as np
import jax.numpy as jnp

from smelter_tpu.ops import resample as rs


def _img(h, w, c=4, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(h, w, c).astype(np.float32)


def test_lanczos_identity():
    img = _img(32, 48)
    out = np.asarray(rs.resize_lanczos3(jnp.asarray(img), 32, 48))
    assert np.allclose(out, img, atol=1e-5)


def test_lanczos_constant_preserved():
    img = np.full((40, 40, 4), 0.6, np.float32)
    for oh, ow in [(17, 23), (80, 120), (10, 10)]:
        out = np.asarray(rs.resize_lanczos3(jnp.asarray(img), oh, ow))
        assert out.shape == (oh, ow, 4)
        assert np.allclose(out, 0.6, atol=1e-4), (oh, ow)


def test_lanczos_downscale_antialiases():
    # 1px checkerboard downscaled 4x should converge to the mean
    img = np.indices((64, 64)).sum(axis=0) % 2
    img = img.astype(np.float32)[..., None]
    out = np.asarray(rs.resize_lanczos3(jnp.asarray(img), 16, 16))
    assert np.abs(out.mean() - 0.5) < 0.02
    assert out.std() < 0.12  # mostly flattened


def test_bilinear_identity():
    img = _img(16, 16)
    out = np.asarray(rs.resize_bilinear(jnp.asarray(img), 16, 16))
    assert np.allclose(out, img, atol=1e-6)


def test_bilinear_2x_upscale_interpolates():
    img = np.zeros((2, 2, 1), np.float32)
    img[0, 0] = 0.0
    img[0, 1] = 1.0
    img[1, 0] = 1.0
    img[1, 1] = 0.0
    out = np.asarray(rs.resize_bilinear(jnp.asarray(img), 4, 4))
    # center pixels interpolate toward 0.5
    assert abs(out[1, 1, 0] - 0.5) < 0.26
    assert out[0, 0, 0] == 0.0
    assert out[0, 3, 0] == 1.0


def test_box_downsample():
    img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    out = np.asarray(rs.box_downsample_2x(jnp.asarray(img)))
    assert out.shape == (2, 2, 1)
    assert out[0, 0, 0] == (0 + 1 + 4 + 5) / 4


def test_sample_bilinear_matches_resize():
    img = _img(20, 30)
    out_h, out_w = 10, 15
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (20 / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (30 / out_w) - 0.5
    yy = jnp.broadcast_to(ys[:, None], (out_h, out_w))
    xx = jnp.broadcast_to(xs[None, :], (out_h, out_w))
    a = np.asarray(rs.sample_bilinear(jnp.asarray(img), yy, xx))
    b = np.asarray(rs.resize_bilinear(jnp.asarray(img), out_h, out_w))
    assert np.allclose(a, b, atol=1e-5)


def test_mip_sampling_antialiases():
    img = (np.indices((64, 64)).sum(axis=0) % 2).astype(np.float32)[..., None]
    mips = rs.build_mips(jnp.asarray(img), 4)
    assert len(mips) == 4
    out_h = out_w = 8  # 8x downscale -> lod ~3
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * 8.0 - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * 8.0 - 0.5
    yy = jnp.broadcast_to(ys[:, None], (out_h, out_w))
    xx = jnp.broadcast_to(xs[None, :], (out_h, out_w))
    out = np.asarray(rs.sample_bilinear_mip(mips, yy, xx, jnp.float32(8.0)))
    assert np.allclose(out, 0.5, atol=0.05)


def test_mip_sampling_lod0_is_bilinear():
    img = _img(16, 16)
    mips = rs.build_mips(jnp.asarray(img), 3)
    yy = jnp.full((4, 4), 3.25, jnp.float32)
    xx = jnp.full((4, 4), 7.75, jnp.float32)
    a = np.asarray(rs.sample_bilinear_mip(mips, yy, xx, jnp.float32(1.0)))
    b = np.asarray(rs.sample_bilinear(jnp.asarray(img), yy, xx))
    assert np.allclose(a, b, atol=1e-6)
