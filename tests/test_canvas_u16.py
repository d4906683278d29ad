"""Parity tests for the 16-bit fixed-point root planar canvas
(SMELTER_CANVAS_DTYPE, ops/compose.py:_canvas_dtype).

The TPU production path stores the root planar canvas as uint16
fixed-point (value*8192 + 16384, range [-2, 6)) to halve its HBM
traffic; every blend stays f32 — canvas reads decode
(color_convert.canvas_decode), layers are f32, and only the stored value
quantizes (~0.03 u8 LSB per store). The headroom absorbs Lanczos3
resize ringing and blend compounding that a [0, 1] or [-0.5, 1.5)
format measurably clips (tens / a few LSBs of divergence on sharp
edges). 16-bit float storage is NOT used: the device A/B caught bf16
producing 2-LSB chroma deviations (two ~0.5-LSB quantized stores feeding
the 2x2 chroma pool) and Mosaic on this libtpu has no f16 lowering —
see tools/bench_canvas_ab.py and bench_artifacts/canvas_ab_r05.json.

These CPU tests pin the <= 1 LSB guarantee through the full general
compose (Pallas kernels in interpret mode, identical numerics) and check
the dtype routing rules.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from smelter_tpu.core.types import Resolution


def _flagship_yuv(mode: str, n=2, in_res=Resolution(128, 96),
                  out_res=Resolution(512, 160)):
    """Render the flagship general scene end-to-end (compose + planar
    YUV420 output) under one SMELTER_CANVAS_DTYPE, Pallas routes forced on
    (interpret mode off-TPU)."""
    from smelter_tpu.parallel.flagship import make_flagship_general_compose

    rng = np.random.RandomState(7)
    y = jnp.asarray(rng.randint(16, 235, (n, in_res.height, in_res.width),
                                np.uint8))
    u = jnp.asarray(rng.randint(16, 240, (n, in_res.height // 2,
                                          in_res.width // 2), np.uint8))
    v = jnp.asarray(rng.randint(16, 240, (n, in_res.height // 2,
                                          in_res.width // 2), np.uint8))
    env = {"SMELTER_CANVAS_DTYPE": mode, "SMELTER_SCENE_ASSEMBLY": "on",
           "SMELTER_FUSED_YUV": "on"}
    os.environ.update(env)
    try:
        fn, _ = make_flagship_general_compose(
            n_inputs=n, in_res=in_res, out_res=out_res
        )
        return [np.asarray(p) for p in jax.jit(fn)(y, u, v)]
    finally:
        for k in env:
            os.environ.pop(k, None)


def test_u16_canvas_within_one_lsb():
    """u16 canvas vs f32 canvas: every YUV output pixel within 1 u8 LSB
    through the full general compose (assembly kernel + group blends +
    fused YUV, interpret mode). Random-noise inputs maximize Lanczos
    ringing, the case that broke narrower fixed-point ranges."""
    ref = _flagship_yuv("float32")
    u16 = _flagship_yuv("uint16")
    for plane, a, b in zip("yuv", u16, ref):
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert d.max() <= 1, (plane, int(d.max()), float((d > 1).mean()))


def test_canvas_encode_decode_roundtrip():
    """encode(decode) is identity-within-quantization across the full
    headroom range, and transparent black is exact."""
    from smelter_tpu.ops.color_convert import (
        CANVAS_FIXED_OFFSET,
        CANVAS_FIXED_SCALE,
        canvas_decode,
    )
    from smelter_tpu.ops.compose import _canvas_encode

    x = jnp.asarray(np.linspace(-1.9, 5.9, 4096, dtype=np.float32))
    got = np.asarray(canvas_decode(_canvas_encode(x, jnp.uint16)))
    # 0.5 quantization step + a little f32 arithmetic slack
    assert np.abs(got - np.asarray(x)).max() <= 0.51 / CANVAS_FIXED_SCALE
    zero = _canvas_encode(jnp.zeros((4,), jnp.float32), jnp.uint16)
    assert np.all(np.asarray(zero) == CANVAS_FIXED_OFFSET)
    assert np.all(np.asarray(canvas_decode(zero)) == 0.0)


def test_canvas_dtype_routing():
    """auto = f32 off-TPU (CPU keeps the parity-pinned reference); the
    root planar canvas actually stores in the requested dtype; RGBA
    (non-planar) canvases never quantize; GSPMD-forced traces stay f32."""
    from smelter_tpu.config import force_xla_kernels
    from smelter_tpu.ops.compose import _canvas_dtype

    assert _canvas_dtype(planar=False) == jnp.float32
    assert _canvas_dtype(planar=True) == jnp.float32  # auto, off-TPU

    os.environ["SMELTER_CANVAS_DTYPE"] = "uint16"
    try:
        assert _canvas_dtype(planar=True) == jnp.uint16
        assert _canvas_dtype(planar=False) == jnp.float32
        with force_xla_kernels():
            assert _canvas_dtype(planar=True) == jnp.float32
    finally:
        os.environ.pop("SMELTER_CANVAS_DTYPE", None)


def test_u16_canvas_dtype_propagates():
    """compose_layouts(planar=True) under uint16 returns a u16 canvas
    (the traffic win only exists if the stored array is actually u16),
    and a solid color decodes back exactly."""
    from smelter_tpu.ops.color_convert import canvas_decode
    from smelter_tpu.ops.compose import LayoutParams, LayoutStatic, compose_layouts

    # static_rect keeps the layer on the region-local group path (the
    # full-canvas sdf_layers path deliberately decodes the canvas to f32)
    statics = [LayoutStatic(content="color", static_rect=(2, 2, 6, 8))]
    params = [LayoutParams(
        top=jnp.float32(2.0), left=jnp.float32(2.0),
        width=jnp.float32(8.0), height=jnp.float32(6.0),
        rotation_degrees=jnp.float32(0.0),
        border_radius=jnp.zeros(4, jnp.float32),
        border_width=jnp.float32(0.0),
        border_color=jnp.zeros(4, jnp.float32),
        color=jnp.asarray([1.0, 0.0, 0.0, 1.0], jnp.float32),
        crop=jnp.zeros(4, jnp.float32),
        blur_radius=jnp.float32(0.0),
        masks=jnp.zeros((0, 9), jnp.float32),
    )]
    os.environ["SMELTER_CANVAS_DTYPE"] = "uint16"
    try:
        out = jax.jit(
            lambda: compose_layouts((16, 8), statics, params, [], planar=True)
        )()
        assert out.dtype == jnp.uint16
        got = np.asarray(canvas_decode(out))
    finally:
        os.environ.pop("SMELTER_CANVAS_DTYPE", None)
    # 1.0 and 0.0 are exact in the fixed-point format
    assert np.allclose(got[:, 4, 4], [1, 0, 0, 1], atol=1e-6)
    assert np.allclose(got[:, 0, 0], 0, atol=1e-6)
