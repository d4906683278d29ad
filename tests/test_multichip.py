"""Multi-chip sharding (SURVEY §2.5): the flagship 2D (streams x space)
step and the 1D outputs-sharded step on the virtual 8-device CPU mesh.
Correctness is checked against the single-chip grid compose."""

import jax
import numpy as np
import pytest

from smelter_tpu.core.types import Resolution
from smelter_tpu.parallel.flagship import (
    make_flagship_compose,
    make_multichip_general_step,
    make_multichip_step,
    make_multioutput_step,
)


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return devs[:8]


def _planes(n, res, seed=0):
    rng = np.random.RandomState(seed)
    y = rng.randint(16, 235, (n, res.height, res.width), np.uint8)
    u = rng.randint(16, 240, (n, res.height // 2, res.width // 2), np.uint8)
    v = rng.randint(16, 240, (n, res.height // 2, res.width // 2), np.uint8)
    return y, u, v


def test_multichip_step_matches_single_chip(devices):
    """The sharded step runs the PRODUCTION Tiles frame program (the same
    traced fn as make_flagship_compose), so the single-chip jit of that fn
    is the oracle (reference: smelter-render/src/state.rs:220-252) and
    parity is per-pixel."""
    in_res, out_res = Resolution(192, 108), Resolution(384, 216)
    mesh = jax.sharding.Mesh(np.asarray(devices).reshape(2, 4),
                             ("streams", "space"))
    step, _ = make_multichip_step(mesh, n_inputs=16, in_res=in_res,
                                  out_res=out_res)
    y, u, v = _planes(16, in_res)
    sy, su, sv = (np.asarray(p) for p in step(y, u, v))
    assert sy.shape == (216, 384)

    fn, _ = make_flagship_compose(16, in_res, out_res)
    ry, ru, rv = (np.asarray(p) for p in jax.jit(fn)(y, u, v))
    for sharded, ref in ((sy, ry), (su, ru), (sv, rv)):
        diff = np.abs(sharded.astype(np.int32) - ref.astype(np.int32))
        assert int(diff.max()) <= 1, int(diff.max())
    # non-degenerate output (real tile content, not a constant canvas)
    assert float(sy.std()) > 10.0


def test_multichip_general_scene_matches_single_chip(devices):
    """Non-grid scene (rotation + borders + radius) through the production
    general RGBA compose, sharded vs single-chip: per-pixel parity."""
    in_res, out_res = Resolution(128, 72), Resolution(256, 144)
    mesh = jax.sharding.Mesh(np.asarray(devices).reshape(2, 4),
                             ("streams", "space"))
    step, _ = make_multichip_general_step(mesh, n_inputs=8, in_res=in_res,
                                          out_res=out_res)
    y, u, v = _planes(8, in_res, seed=7)
    sharded = [np.asarray(p) for p in step(y, u, v)]
    assert sharded[0].shape == (144, 256)

    single_mesh = jax.sharding.Mesh(
        np.asarray(devices[:1]).reshape(1, 1), ("streams", "space")
    )
    ref_step, _ = make_multichip_general_step(
        single_mesh, n_inputs=8, in_res=in_res, out_res=out_res
    )
    ref = [np.asarray(p) for p in ref_step(y, u, v)]
    for s, r in zip(sharded, ref):
        diff = np.abs(s.astype(np.int32) - r.astype(np.int32))
        assert int(diff.max()) <= 1, int(diff.max())
    # rotated bordered content actually rendered
    assert float(sharded[0].std()) > 10.0


def test_multioutput_step_shards_outputs(devices):
    in_res, out_res = Resolution(192, 108), Resolution(384, 216)
    mesh = jax.sharding.Mesh(np.asarray(devices), ("outputs",))
    n_out = 16
    step, (ey, eu, ev, perms) = make_multioutput_step(
        mesh, n_outputs=n_out, n_inputs=16, in_res=in_res, out_res=out_res
    )
    y, u, v = _planes(16, in_res, seed=3)
    out_y, out_u, out_v = step(y, u, v, perms)
    assert out_y.shape == (n_out, 216, 384)
    # sharded along the outputs axis across all 8 devices
    shard_devs = {s.device for s in out_y.addressable_shards}
    assert len(shard_devs) == 8
    np_y = np.asarray(out_y)
    p = np.asarray(perms)
    # outputs with different tile orders differ; identical orders match
    diff = next(
        (a, b) for a in range(n_out) for b in range(a + 1, n_out)
        if not np.array_equal(p[a], p[b])
    )
    assert not np.array_equal(np_y[diff[0]], np_y[diff[1]])
    # per-output content equals the single-chip PRODUCTION compose of that
    # output's scene (flagship fn on the permuted inputs)
    fn, _ = make_flagship_compose(16, in_res, out_res)
    ref = np.asarray(jax.jit(fn)(y[p[3]], u[p[3]], v[p[3]])[0])
    assert np.array_equal(np_y[3], ref)
