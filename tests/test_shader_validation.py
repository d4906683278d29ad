"""Shader registration validation + sandboxing (VERDICT r2 #3).

Mirrors the reference's register-time WGSL validation semantics
(`smelter-render/src/transformations/shader/validation.rs`): bad shaders
fail the register call (HTTP 400), not the first rendered frame, and the
shader language cannot reach host state.
"""

import numpy as np
import pytest

from smelter_tpu.core.types import FrameSet, Frame, PixelFormat, Resolution, RGBAColor
from smelter_tpu.render.renderer import Renderer
from smelter_tpu.render.shader_validation import (
    SAFE_BUILTINS,
    ShaderValidationError,
    compile_sandboxed,
    validate_source,
)
from smelter_tpu.scene import components as comp


# ---------------------------------------------------------------- sandboxing


def test_import_statement_rejected():
    with pytest.raises(ShaderValidationError, match="Import"):
        validate_source("evil", "import os\ndef main(i, p, r, t): return i[0]")


def test_dunder_import_rejected():
    src = (
        "def main(inputs, params, resolution, time):\n"
        "    __import__('os').system('touch /tmp/pwned')\n"
        "    return inputs[0]\n"
    )
    with pytest.raises(ShaderValidationError, match="underscore"):
        validate_source("evil", src)


def test_dunder_attribute_escape_rejected():
    src = (
        "def main(inputs, params, resolution, time):\n"
        "    cls = ().__class__.__bases__[0].__subclasses__()\n"
        "    return inputs[0]\n"
    )
    with pytest.raises(ShaderValidationError, match="underscore"):
        validate_source("evil", src)


def test_open_and_getattr_rejected():
    for expr in ("open('/etc/passwd')", "getattr(jnp, 'load')"):
        src = f"def main(i, p, r, t):\n    x = {expr}\n    return i[0]\n"
        with pytest.raises(ShaderValidationError, match="not allowed"):
            validate_source("evil", src)


def test_numpy_io_attribute_rejected():
    src = "def main(i, p, r, t):\n    jnp.load('/tmp/x.npy')\n    return i[0]\n"
    with pytest.raises(ShaderValidationError, match="'load'"):
        validate_source("evil", src)


def test_exec_namespace_has_no_real_builtins():
    # even if a denied name slipped the AST check, the namespace must not
    # contain the live builtins module
    assert "__import__" not in SAFE_BUILTINS
    assert "open" not in SAFE_BUILTINS
    assert "eval" not in SAFE_BUILTINS
    fn = compile_sandboxed(
        "probe",
        "def main(inputs, params, resolution, time):\n    return inputs[0]\n",
    )
    globalns = fn.__globals__
    assert isinstance(globalns["__builtins__"], dict)
    assert "__import__" not in globalns["__builtins__"]


def test_registry_rejects_rce_source():
    r = Renderer()
    try:
        with pytest.raises(ValueError):
            r.register_shader(
                "evil",
                "def main(i, p, r, t):\n"
                "    return __import__('os').system('true')\n",
            )
        assert not r.shaders.has("evil")
    finally:
        r.close()


# ----------------------------------------------------- register-time tracing


def test_wrong_output_shape_rejected_at_register():
    r = Renderer()
    try:
        with pytest.raises(ValueError, match="contract"):
            r.register_shader(
                "badshape",
                "def main(inputs, params, resolution, time):\n"
                "    return jnp.zeros((10, 10, 4), jnp.float32)\n",
            )
    finally:
        r.close()


def test_wrong_signature_rejected_at_register():
    r = Renderer()
    try:
        with pytest.raises(ValueError, match="tracing"):
            r.register_shader("badsig", "def main(inputs):\n    return inputs[0]\n")
    finally:
        r.close()


def test_missing_main_rejected():
    r = Renderer()
    try:
        with pytest.raises(ValueError, match="main"):
            r.register_shader("nomain", "def helper(x):\n    return x\n")
    finally:
        r.close()


def test_non_float_output_rejected():
    r = Renderer()
    try:
        with pytest.raises(ValueError, match="floating"):
            r.register_shader(
                "badtype",
                "def main(inputs, params, resolution, time):\n"
                "    h, w = resolution[1], resolution[0]\n"
                "    return jnp.zeros((h, w, 4), jnp.uint8)\n",
            )
    finally:
        r.close()


def test_params_using_shader_registers_and_renders():
    r = Renderer()
    try:
        r.register_input("input_0")
        r.register_shader(
            "gain",
            "def main(inputs, params, resolution, time):\n"
            "    g = params['gain'] if params else 1.0\n"
            "    tex = inputs[0]\n"
            "    rgb = jnp.clip(tex[..., :3] * g, 0.0, 1.0)\n"
            "    return jnp.concatenate([rgb, tex[..., 3:4]], axis=-1)\n",
        )
        r.update_scene(
            "out",
            comp.Shader(
                shader_id="gain",
                shader_param={"gain": 0.5},
                children=[comp.InputStream(input_id="input_0")],
                width=64.0,
                height=48.0,
            ),
            Resolution(64, 48),
            PixelFormat.RGBA,
        )
        rgba = np.zeros((48, 64, 4), np.uint8)
        rgba[..., 0] = 200
        rgba[..., 3] = 255
        frame = Frame(
            data=rgba, format=PixelFormat.RGBA,
            resolution=Resolution(64, 48), pts=0.0,
        )
        out = r.render(FrameSet(pts=0.0, frames={"input_0": frame})).frames["out"]
        px = np.asarray(out.data)[24, 32]
        assert 80 <= int(px[0]) <= 120, px  # 200 * 0.5 ≈ 100
    finally:
        r.close()


# ------------------------------------------------------------- texture cap


def test_max_textures_enforced_at_plan_time():
    r = Renderer()
    try:
        n = r.shaders.MAX_TEXTURES + 1
        for i in range(n):
            r.register_input(f"input_{i}")
        r.register_shader(
            "many",
            "def main(inputs, params, resolution, time):\n"
            "    h, w = resolution[1], resolution[0]\n"
            "    return jnp.zeros((h, w, 4), jnp.float32)\n",
        )
        with pytest.raises(ValueError, match="limit"):
            r.update_scene(
                "out",
                comp.Shader(
                    shader_id="many",
                    children=[
                        comp.InputStream(input_id=f"input_{i}") for i in range(n)
                    ],
                    width=64.0,
                    height=48.0,
                ),
                Resolution(64, 48),
                PixelFormat.RGBA,
            )
    finally:
        r.close()


def test_shader_unregister_before_first_frame():
    """Live-scene pinning applies to shaders too: unregistering between
    update_scene and the first render must not break the program (the
    registry only gates future scene updates)."""
    import numpy as np

    from smelter_tpu.core.types import (
        Frame,
        FrameSet,
        PixelFormat,
        Resolution,
    )
    from smelter_tpu.scene import components as comp

    r = Renderer()
    try:
        r.register_input("in0")
        r.register_shader(
            "inv",
            "def main(inputs, params, resolution, time):\n"
            "    tex = inputs[0]\n"
            "    return jnp.concatenate([1.0 - tex[..., :3], tex[..., 3:4]],"
            " axis=-1)\n",
        )
        scene = comp.Shader(shader_id="inv", width=32.0, height=32.0,
                            children=[comp.InputStream(input_id="in0")])
        r.update_scene("out", scene, Resolution(32, 32), PixelFormat.RGBA)
        r.unregister_shader("inv")  # before the first render
        f = Frame(np.full((32, 32, 4), 200, np.uint8), PixelFormat.RGBA,
                  Resolution(32, 32), 0.0)
        out = r.render(FrameSet(pts=0.0, frames={"in0": f})).frames["out"]
        px = np.asarray(out.data)[16, 16, :3]
        assert (px < 100).all(), px  # inverted content still renders
        with pytest.raises(ValueError, match="not registered"):
            r.update_scene("out", scene, Resolution(32, 32),
                           PixelFormat.RGBA)
    finally:
        r.close()
