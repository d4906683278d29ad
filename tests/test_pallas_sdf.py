"""Pallas fused SDF compositor vs the reference XLA path (interpret mode on
CPU; compiled on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from smelter_tpu.ops.compose import (
    LayoutParams,
    LayoutStatic,
    render_single_layout,
)
from smelter_tpu.ops.pallas.sdf_layers import (
    compose_sdf_layers,
    pack_layer_params_traced,
)


def _params(top, left, w, h, color, radius=0.0, rot=0.0, border_w=0.0,
            border_color=(1, 1, 1, 1), blur=0.0):
    return LayoutParams(
        top=np.float32(top), left=np.float32(left),
        width=np.float32(w), height=np.float32(h),
        rotation_degrees=np.float32(rot),
        border_radius=np.full(4, radius, np.float32),
        border_width=np.float32(border_w),
        border_color=np.asarray(border_color, np.float32),
        color=np.asarray(color, np.float32),
        crop=np.zeros(4, np.float32),
        blur_radius=np.float32(blur),
        masks=np.zeros((1, 8), np.float32),
    )


def _xla_reference(canvas, layers):
    h, w = canvas.shape[:2]
    px = jnp.broadcast_to((jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :], (h, w))
    py = jnp.broadcast_to((jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None], (h, w))
    cm = jnp.moveaxis(canvas, -1, 0)  # render_single_layout is channel-major
    for st, p in layers:
        layer = render_single_layout(st, p, [], px, py)
        cm = layer + cm * (1.0 - layer[3:4])
    return jnp.moveaxis(cm, 0, -1)


@pytest.mark.parametrize("size", [(180, 320), (257, 511)])
def test_fused_matches_xla_path(size):
    h, w = size
    canvas = jnp.zeros((h, w, 4), jnp.float32)
    layers = [
        (LayoutStatic(content="box_shadow"),
         _params(40, 50, 120, 80, (0, 0, 0, 0.7), radius=12.0, blur=15.0)),
        (LayoutStatic(content="color"),
         _params(30, 40, 120, 80, (0.8, 0.2, 0.2, 1.0), radius=12.0)),
        (LayoutStatic(content="color", has_border=True),
         _params(90, 160, 100, 60, (0.1, 0.5, 0.9, 0.9), radius=8.0,
                 border_w=4.0, border_color=(1, 1, 0, 1))),
        (LayoutStatic(content="color", has_rotation=True),
         _params(20, 180, 90, 50, (0.2, 0.9, 0.3, 0.8), rot=25.0)),
    ]
    expected = np.asarray(_xla_reference(canvas, layers))
    kinds = tuple((st.content, st.has_border, st.has_rotation) for st, _ in layers)
    rows = pack_layer_params_traced([p for _, p in layers])
    got = np.asarray(compose_sdf_layers(canvas, rows, kinds))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-3)
