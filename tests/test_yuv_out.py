"""Parity tests for the fused Pallas RGBA->YUV420 output kernel
(ops/pallas/yuv_out.py) against the XLA conversion chain in color_convert.

The kernel is the TPU production output path for block-divisible canvases;
off-TPU it runs in interpret mode with identical numerics. The only allowed
deviation is MXU accumulation order inside the 2x2 chroma average (<= 1 u8
LSB), the same gate the device A/B (tools/bench_assembly_ab.py) enforces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smelter_tpu.ops import color_convert as cc
from smelter_tpu.ops.pallas import yuv_out


def _xla_chain(canvas, full_range):
    y, u, v = cc.rgb_planes_to_yuv(canvas[0], canvas[1], canvas[2], full_range)
    return (
        cc.f32_to_u8(y),
        cc.f32_to_u8(cc.downsample_chroma_2x2(u)),
        cc.f32_to_u8(cc.downsample_chroma_2x2(v)),
    )


@pytest.mark.parametrize("shape", [(4, 256, 256), (4, 272, 512),
                                   (4, 512, 768)])
@pytest.mark.parametrize("full_range", [False, True])
def test_fused_yuv420_matches_xla_chain(shape, full_range):
    rng = np.random.RandomState(7)
    canvas = jnp.asarray(rng.rand(*shape).astype(np.float32))
    assert yuv_out.eligible(canvas)
    ref = [np.asarray(p).astype(np.int32)
           for p in jax.jit(lambda c: _xla_chain(c, full_range))(canvas)]
    got = [np.asarray(p).astype(np.int32)
           for p in yuv_out.rgba_cm_to_yuv420_fused(canvas, full_range)]
    for name, a, b in zip("yuv", ref, got):
        assert np.abs(a - b).max() <= 1, name
    # Y is pure elementwise math (no pooling): bit-exact
    np.testing.assert_array_equal(ref[0], got[0])


def test_ineligible_shapes_fall_back():
    # no block-aligned divisor -> planar_rgba_to_yuv420 must keep the XLA
    # chain (1080p is the common ineligible case)
    canvas = jnp.zeros((4, 1080, 1920), jnp.float32)
    assert not yuv_out.eligible(canvas)
    y, u, v = cc.planar_rgba_to_yuv420(canvas)
    assert y.shape == (1080, 1920) and u.shape == (540, 960)


def test_saturated_and_flat_values_exact():
    """Flat blocks and out-of-range values (premultiplied halos can exceed
    [0,1] slightly) hit the clip paths identically on both implementations."""
    h, w = 272, 512
    canvas = np.zeros((4, h, w), np.float32)
    canvas[0] = 1.2   # clipped red
    canvas[1] = -0.1  # clipped green
    canvas[2] = 0.5
    canvas[3] = 1.0
    canvas = jnp.asarray(canvas)
    ref = [np.asarray(p).astype(np.int32)
           for p in jax.jit(lambda c: _xla_chain(c, False))(canvas)]
    got = [np.asarray(p).astype(np.int32)
           for p in yuv_out.rgba_cm_to_yuv420_fused(canvas)]
    for name, a, b in zip("yuv", ref, got):
        np.testing.assert_array_equal(a, b, err_msg=name)
