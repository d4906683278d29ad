"""Parity tests for the single-pass Pallas scene-assembly kernel
(ops/pallas/scene_assembly.py) against the XLA group-assembly path.

The kernel is the TPU production path for canvas-opening runs of
region-local layouts; off-TPU it runs in interpret mode with identical
numerics, so these CPU tests pin bit-exact parity between both
implementations — the same guarantee the device A/B
(tools/bench_assembly_ab.py) enforces on the real chip before timing.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smelter_tpu.core.types import Resolution
from smelter_tpu.ops.compose import (
    LayoutParams,
    LayoutStatic,
    compose_layouts,
)


def _compose_both(resolution, statics, params, sources, planar=True):
    outs = {}
    for mode in ("off", "on"):
        os.environ["SMELTER_SCENE_ASSEMBLY"] = mode
        try:
            outs[mode] = np.asarray(
                jax.jit(
                    lambda: compose_layouts(
                        resolution, statics, params, sources, planar=planar
                    )
                )()
            )
        finally:
            os.environ.pop("SMELTER_SCENE_ASSEMBLY", None)
    return outs["off"], outs["on"]


def _params(top=0.0, left=0.0, width=0.0, height=0.0, rotation=0.0,
            radius=(0.0, 0.0, 0.0, 0.0), border_width=0.0,
            border_color=(0, 0, 0, 0), color=(0, 0, 0, 0),
            crop=(0, 0, 0, 0), blur=0.0, masks=None):
    return LayoutParams(
        top=jnp.float32(top), left=jnp.float32(left),
        width=jnp.float32(width), height=jnp.float32(height),
        rotation_degrees=jnp.float32(rotation),
        border_radius=jnp.asarray(radius, jnp.float32),
        border_width=jnp.float32(border_width),
        border_color=jnp.asarray(border_color, jnp.float32),
        color=jnp.asarray(color, jnp.float32),
        crop=jnp.asarray(crop, jnp.float32),
        blur_radius=jnp.float32(blur),
        masks=(jnp.zeros((0, 9), jnp.float32) if masks is None
               else jnp.asarray(masks, jnp.float32)),
    )


def test_flagship_general_scene_bit_exact():
    """The flagship general scene (background + bordered colors + shadows +
    masked textures + two statically rotated tiles) renders identically
    through the kernel and the XLA group path."""
    from smelter_tpu.parallel.flagship import make_flagship_general_compose

    n = 4
    in_res, out_res = Resolution(256, 144), Resolution(768, 432)
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randint(16, 235, (n, in_res.height, in_res.width),
                                np.uint8))
    u = jnp.asarray(rng.randint(16, 240, (n, in_res.height // 2,
                                          in_res.width // 2), np.uint8))
    v = jnp.asarray(rng.randint(16, 240, (n, in_res.height // 2,
                                          in_res.width // 2), np.uint8))
    outs = {}
    for mode in ("off", "on"):
        os.environ["SMELTER_SCENE_ASSEMBLY"] = mode
        try:
            fn, _ = make_flagship_general_compose(
                n_inputs=n, in_res=in_res, out_res=out_res)
            outs[mode] = [np.asarray(p) for p in jax.jit(fn)(y, u, v)]
        finally:
            os.environ.pop("SMELTER_SCENE_ASSEMBLY", None)
    for a, b in zip(outs["off"], outs["on"]):
        np.testing.assert_array_equal(a, b)


def test_mixed_members_bit_exact():
    """Hand-built run: rotated bordered color, box shadow, texture with a
    rotated parent mask, plain texture — partial blocks at the canvas edge
    (canvas not a multiple of the kernel block size)."""
    h, w = 200, 520  # forces partial blocks (256x256 grid)
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.rand(120, 160, 4).astype(np.float32))
    sources = [[src]]

    statics = [
        LayoutStatic(content="color", static_rect=(0, 0, h, w),
                     static_color=(20, 20, 30, 255)),
        LayoutStatic(content="box_shadow", static_rect=(30, 40, 100, 150),
                     static_blur=18.0),
        LayoutStatic(content="color", static_rect=(25, 35, 110, 160),
                     has_border=True, has_rotation=True,
                     static_rotation=20.0),
        LayoutStatic(content="texture", source_index=0, n_masks=1,
                     rotated_masks=(True,), static_rect=(40, 260, 120, 180),
                     static_crop=(0, 0, 120, 160)),
        LayoutStatic(content="texture", source_index=0,
                     static_rect=(100, 60, 80, 120),
                     static_crop=(10, 20, 100, 120)),
    ]
    params = [
        _params(top=0, left=0, width=w, height=h, color=(0.1, 0.1, 0.15, 1.0)),
        _params(top=30, left=40, width=150, height=100, blur=18.0,
                radius=(12, 12, 12, 12), color=(0, 0, 0, 0.6)),
        _params(top=25, left=35, width=160, height=110, rotation=20.0,
                radius=(8, 8, 8, 8), border_width=5.0,
                border_color=(1, 1, 1, 0.9), color=(0.8, 0.2, 0.2, 0.9)),
        _params(top=40, left=260, width=180, height=120,
                radius=(10, 10, 10, 10),
                masks=[[14, 14, 14, 14, 45, 265, 170, 110, 0.3]]),
        _params(top=100, left=60, width=120, height=80,
                radius=(6, 6, 6, 6)),
    ]
    a, b = _compose_both((w, h), statics, params, sources)
    # raw f32 canvases may differ by FMA-contraction noise between the fused
    # XLA chain and the kernel's op stream; quantized u8 output stays within
    # 1 LSB (the same gate the device A/B and golden snapshots enforce)
    np.testing.assert_allclose(a, b, atol=2e-5)
    qa = np.clip(np.round(a * 255.0), 0, 255).astype(np.int32)
    qb = np.clip(np.round(b * 255.0), 0, 255).astype(np.int32)
    assert np.abs(qa - qb).max() <= 1


def test_interleaved_canvas_matches():
    """planar=False returns the same pixels transposed."""
    h, w = 96, 256
    statics = [
        LayoutStatic(content="color", static_rect=(0, 0, h, w)),
        LayoutStatic(content="color", static_rect=(10, 20, 40, 60)),
    ]
    params = [
        _params(top=0, left=0, width=w, height=h, color=(0.2, 0.3, 0.4, 1.0)),
        _params(top=10, left=20, width=60, height=40, radius=(5, 5, 5, 5),
                color=(0.9, 0.8, 0.1, 0.8)),
    ]
    a, b = _compose_both((w, h), statics, params, [], planar=False)
    assert a.shape == (h, w, 4)
    np.testing.assert_array_equal(a, b)


def test_two_masks_one_rotated_bit_exact():
    """A member clipped by two parent masks, one rotating with a rotated
    ancestor, renders identically through the kernel."""
    h, w = 160, 384
    statics = [
        LayoutStatic(content="color", static_rect=(0, 0, h, w)),
        LayoutStatic(content="color", static_rect=(20, 40, 100, 200),
                     n_masks=2, rotated_masks=(False, True)),
    ]
    params = [
        _params(top=0, left=0, width=w, height=h, color=(0.3, 0.3, 0.3, 1.0)),
        _params(top=20, left=40, width=200, height=100,
                radius=(10, 10, 10, 10), color=(0.9, 0.4, 0.1, 0.95),
                masks=[[8, 8, 8, 8, 25, 45, 180, 80, 0.0],
                       [12, 12, 12, 12, 30, 60, 150, 70, 0.4]]),
    ]
    a, b = _compose_both((w, h), statics, params, [])
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_huge_member_count_falls_back():
    """Hundreds of members would overflow the kernel's SMEM param table —
    the router must return None (XLA group path) instead."""
    from smelter_tpu.ops.compose import _try_scene_assembly

    h, w = 256, 512
    items = []
    for i in range(300):
        st = LayoutStatic(content="color",
                          static_rect=(8 * (i % 20), 16 * (i % 30), 16, 24))
        p = _params(top=8 * (i % 20), left=16 * (i % 30), width=24, height=16,
                    color=(0.5, 0.5, 0.5, 0.5))
        items.append((st, p))

    def clip(reg):
        top, left, hh, ww = reg
        y0, y1 = max(top, 0), min(top + hh, h)
        x0, x1 = max(left, 0), min(left + ww, w)
        if y0 >= y1 or x0 >= x1:
            return None
        return y0, x0, y1 - y0, x1 - x0

    os.environ["SMELTER_SCENE_ASSEMBLY"] = "on"
    try:
        assert _try_scene_assembly(items, 0, len(items), [], h, w, clip) is None
    finally:
        os.environ.pop("SMELTER_SCENE_ASSEMBLY", None)


def test_force_xla_kernels_overrides_env():
    """GSPMD-sharded traces (parallel/flagship.py multichip builders) force
    the pure-XLA paths even when the env switches request the kernels — a
    pallas_call has no GSPMD partitioning rule."""
    from smelter_tpu.config import force_xla_kernels
    from smelter_tpu.ops.color_convert import _fused_yuv_mode
    from smelter_tpu.ops.compose import _assembly_mode

    os.environ["SMELTER_SCENE_ASSEMBLY"] = "on"
    os.environ["SMELTER_FUSED_YUV"] = "on"
    try:
        with force_xla_kernels():
            assert _assembly_mode() == "off"
            assert _fused_yuv_mode() == "off"
        assert _assembly_mode() == "on"
        assert _fused_yuv_mode() == "on"
    finally:
        os.environ.pop("SMELTER_SCENE_ASSEMBLY", None)
        os.environ.pop("SMELTER_FUSED_YUV", None)


def test_off_canvas_member_skipped():
    """A fully off-canvas member contributes nothing on either path."""
    h, w = 64, 128
    statics = [
        LayoutStatic(content="color", static_rect=(0, 0, h, w)),
        LayoutStatic(content="color", static_rect=(500, 500, 40, 40)),
    ]
    params = [
        _params(top=0, left=0, width=w, height=h, color=(0.5, 0.5, 0.5, 1.0)),
        _params(top=500, left=500, width=40, height=40, color=(1, 0, 0, 1)),
    ]
    a, b = _compose_both((w, h), statics, params, [])
    np.testing.assert_array_equal(a, b)
