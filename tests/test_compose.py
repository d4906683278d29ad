"""Tests for the layout compositing op (reference semantics:
apply_layouts.wgsl - SDF masks, borders, shadows, premultiplied OVER)."""

import numpy as np
import jax.numpy as jnp

from smelter_tpu.ops.compose import (
    LayoutParams,
    LayoutStatic,
    compose_layouts,
    rounded_rect_sdf,
)


def _params(
    top=0.0,
    left=0.0,
    width=10.0,
    height=10.0,
    rotation=0.0,
    radius=(0, 0, 0, 0),
    border_width=0.0,
    border_color=(0, 0, 0, 0),
    color=(0, 0, 0, 0),
    crop=(0, 0, 0, 0),
    blur=0.0,
    masks=None,
):
    m = np.zeros((1, 8), np.float32) if masks is None else np.asarray(masks, np.float32)
    return LayoutParams(
        top=jnp.float32(top),
        left=jnp.float32(left),
        width=jnp.float32(width),
        height=jnp.float32(height),
        rotation_degrees=jnp.float32(rotation),
        border_radius=jnp.asarray(radius, jnp.float32),
        border_width=jnp.float32(border_width),
        border_color=jnp.asarray(border_color, jnp.float32),
        color=jnp.asarray(color, jnp.float32),
        crop=jnp.asarray(crop, jnp.float32),
        blur_radius=jnp.float32(blur),
        masks=jnp.asarray(m),
    )


def test_sdf_signs():
    dx = jnp.asarray([[0.0, 10.0]])
    dy = jnp.asarray([[0.0, 0.0]])
    d = np.asarray(rounded_rect_sdf(dx, dy, 5.0, 5.0, jnp.zeros(4)))
    assert d[0, 0] < 0  # center inside
    assert d[0, 1] > 0  # outside


def test_solid_color_rect():
    st = [LayoutStatic(content="color")]
    p = [_params(top=2, left=2, width=4, height=4, color=(1, 0, 0, 1))]
    out = np.asarray(compose_layouts((16, 8), st, p, []))
    assert out.shape == (8, 16, 4)
    assert np.allclose(out[4, 4], [1, 0, 0, 1], atol=1e-5)  # inside
    assert np.allclose(out[0, 0], 0, atol=1e-5)  # outside
    assert np.allclose(out[4, 10], 0, atol=1e-5)  # right of the rect


def test_paint_order_over():
    st = [LayoutStatic(content="color"), LayoutStatic(content="color")]
    p = [
        _params(width=8, height=8, color=(1, 0, 0, 1)),
        _params(width=4, height=4, color=(0, 0, 1, 1)),
    ]
    out = np.asarray(compose_layouts((8, 8), st, p, []))
    assert np.allclose(out[2, 2], [0, 0, 1, 1], atol=1e-5)  # blue on top
    assert np.allclose(out[6, 6], [1, 0, 0, 1], atol=1e-5)  # red below


def test_semitransparent_blend():
    st = [LayoutStatic(content="color"), LayoutStatic(content="color")]
    p = [
        _params(width=8, height=8, color=(1, 0, 0, 1)),
        _params(width=8, height=8, color=(0, 0, 1, 0.5)),
    ]
    out = np.asarray(compose_layouts((8, 8), st, p, []))
    # premultiplied over: 0.5 blue + 0.5 red
    assert np.allclose(out[4, 4], [0.5, 0, 0.5, 1.0], atol=1e-5)


def test_texture_content_identity():
    rng = np.random.RandomState(0)
    src = rng.rand(8, 8, 4).astype(np.float32)
    src[..., 3] = 1.0
    st = [LayoutStatic(content="texture", source_index=0)]
    p = [_params(width=8, height=8, crop=(0, 0, 8, 8))]
    out = np.asarray(compose_layouts((8, 8), st, p, [[jnp.asarray(src)]]))
    assert np.allclose(out, src, atol=1e-4)


def test_texture_crop():
    src = np.zeros((8, 8, 4), np.float32)
    src[:, 4:, 0] = 1.0  # right half red
    src[..., 3] = 1.0
    st = [LayoutStatic(content="texture", source_index=0)]
    p = [_params(width=4, height=8, crop=(0, 4, 4, 8))]
    out = np.asarray(compose_layouts((8, 8), st, p, [[jnp.asarray(src)]]))
    assert np.allclose(out[4, 1, 0], 1.0, atol=1e-3)  # cropped region shown at left
    assert np.allclose(out[4, 6], 0.0, atol=1e-5)  # outside rect


def test_border_rendering():
    st = [LayoutStatic(content="color", has_border=True)]
    p = [
        _params(
            width=16,
            height=16,
            color=(0, 1, 0, 1),
            border_width=3.0,
            border_color=(1, 0, 0, 1),
        )
    ]
    out = np.asarray(compose_layouts((16, 16), st, p, []))
    assert np.allclose(out[8, 8], [0, 1, 0, 1], atol=1e-3)  # center: content
    assert np.allclose(out[8, 1], [1, 0, 0, 1], atol=1e-2)  # edge: border


def test_rounded_corners_cut():
    st = [LayoutStatic(content="color")]
    p = [_params(width=16, height=16, color=(1, 1, 1, 1), radius=(8, 0, 0, 0))]
    out = np.asarray(compose_layouts((16, 16), st, p, []))
    assert out[0, 0, 3] < 0.1  # top-left corner cut
    assert out[0, 15, 3] > 0.9  # top-right intact
    assert out[15, 0, 3] > 0.9  # bottom-left intact


def test_parent_mask():
    masks = np.zeros((1, 8), np.float32)
    masks[0] = [0, 0, 0, 0, 0.0, 0.0, 4.0, 4.0]  # radius 0, rect (0,0,4,4)
    st = [LayoutStatic(content="color", n_masks=1)]
    p = [_params(width=8, height=8, color=(1, 1, 1, 1), masks=masks)]
    out = np.asarray(compose_layouts((8, 8), st, p, []))
    assert out[1, 1, 3] > 0.9  # inside mask
    assert out[6, 6, 3] < 0.1  # outside mask


def test_box_shadow():
    st = [LayoutStatic(content="box_shadow")]
    p = [_params(top=4, left=4, width=8, height=8, color=(0, 0, 0, 1), blur=4.0)]
    out = np.asarray(compose_layouts((16, 16), st, p, []))
    assert out[8, 8, 3] > 0.9  # solid in the middle
    assert 0.0 < out[8, 13, 3] < 0.9  # fading at blur edge


def test_rotation_90deg():
    src = np.zeros((4, 8, 4), np.float32)  # wide texture
    src[..., 1] = 1.0
    src[..., 3] = 1.0
    st = [LayoutStatic(content="texture", source_index=0, has_rotation=True)]
    p = [
        _params(
            top=4, left=6, width=8, height=4, rotation=90.0, crop=(0, 0, 8, 4)
        )
    ]
    out = np.asarray(compose_layouts((16, 16), st, p, [[jnp.asarray(src)]]))
    # rotated 90deg: content occupies a tall 4x8 region centered at (10, 6)
    assert out[8, 10, 3] > 0.9  # inside rotated rect (x=10 center col)
    assert out[6, 3, 3] < 0.1  # where unrotated rect would have been


def test_animated_params_no_recompile():
    import jax

    st = (LayoutStatic(content="color"),)

    @jax.jit
    def render(p):
        return compose_layouts((8, 8), st, [p], [])

    p1 = _params(width=4, height=4, color=(1, 0, 0, 1))
    p2 = _params(width=6, height=6, color=(1, 0, 0, 1), left=2.0)
    o1 = render(p1)
    o2 = render(p2)
    assert render._cache_size() == 1
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


# ----------------------------------------------- strip-partitioned assembly


# ------------------------------------------------- tile-aligned group unions


def test_aligned_unions_bit_exact():
    """Expanding group unions to (8, 128) tile boundaries (_align_union)
    must not change a single bit: contributions outside a member's footprint
    are exactly zero and OVER with a zero layer is the identity. Misaligned
    rects chosen to force expansion on every side."""
    import jax

    from smelter_tpu.ops import compose as C

    src = np.random.default_rng(3).random((64, 96, 4)).astype(np.float32)
    src[..., :3] *= src[..., 3:]
    statics = [
        LayoutStatic(
            content="texture", source_index=0,
            static_rect=(13, 37, 50, 70), static_crop=(0, 0, 64, 96),
        ),
        LayoutStatic(
            content="color",
            static_rect=(30, 60, 40, 90),
        ),
    ]
    params = [
        _params(top=13, left=37, width=70, height=50, crop=(0, 0, 96, 64)),
        _params(top=30, left=60, width=90, height=40, color=(0, 0, 1, 0.5)),
    ]
    sources = [[jnp.asarray(src)]]

    def render():
        return np.asarray(
            jax.jit(
                lambda: compose_layouts((256, 144), statics, params, sources)
            )()
        )

    aligned = render()
    orig = C._align_union
    C._align_union = lambda reg, h, w, sublane=8: reg
    try:
        unaligned = render()
    finally:
        C._align_union = orig
    assert np.array_equal(aligned, unaligned)


def test_rotated_parent_mask_follows_rotation():
    """A clip mask introduced by a rotated parent rotates WITH it
    (reference: children render into the parent's texture, so parent clips
    live in the rotated frame). A 90deg-rotated wide mask over a full-canvas
    color layer must pass the VERTICALLY elongated region."""
    # mask rect: 40 wide x 8 tall centered at (32, 32), rotated 90deg
    mask_row = np.zeros((1, 9), np.float32)
    mask_row[0, 4:8] = (28.0, 12.0, 40.0, 8.0)  # top, left, w, h
    mask_row[0, 8] = np.pi / 2.0
    st = [LayoutStatic(content="color", n_masks=1, rotated_masks=(True,))]
    p = [_params(top=0, left=0, width=64, height=64, color=(1, 0, 0, 1),
                 masks=mask_row)]
    out = np.asarray(compose_layouts((64, 64), st, p, []))
    assert out[32 + 15, 32, 3] > 0.9   # inside the rotated (tall) mask
    assert out[32, 32 + 15, 3] < 0.1   # inside the UNROTATED rect: clipped
    # same mask, not flagged rotated: horizontal region passes
    st2 = [LayoutStatic(content="color", n_masks=1, rotated_masks=(False,))]
    out2 = np.asarray(compose_layouts((64, 64), st2, p, []))
    assert out2[32, 32 + 15, 3] > 0.9
    assert out2[32 + 15, 32, 3] < 0.1
