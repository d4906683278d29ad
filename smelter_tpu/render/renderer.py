"""Renderer facade.

TPU-native analogue of the reference `Renderer`
(`smelter-render/src/state.rs:95-193`): owns the scene state, the per-output
compiled frame programs, and the shader/image registries. The hot call is
``render(FrameSet) -> FrameSet``; `update_scene` swaps scenes with transition
support; registering inputs/renderers mirrors the reference API.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple


from smelter_tpu.core.types import (
    Frame,
    FrameSet,
    Framerate,
    PixelFormat,
    Resolution,
)
from smelter_tpu.render.image import ImageStore
from smelter_tpu.render.program import OutputProgram, ShaderRegistry
from smelter_tpu.render.text import TextRenderer
from smelter_tpu.scene import components as comp
from smelter_tpu.scene.scene_state import OutputScene, SceneState


@dataclass
class RendererOptions:
    framerate: Framerate = Framerate(30)
    stream_fallback_timeout: float = 0.5  # seconds
    # live mode: compile new scene structures in the background and freeze
    # the last frame meanwhile, so updates never stall the 60 Hz loop
    # (offline/deterministic runs keep synchronous compiles)
    async_compile: bool = False


class Renderer:
    """Thread-safe renderer entry point."""

    def __init__(self, options: RendererOptions = RendererOptions()) -> None:
        self._last_outputs = {}
        self._lock = threading.Lock()
        self.options = options
        self.scene = SceneState()
        self.shaders = ShaderRegistry()
        self.images = ImageStore()
        self.text = TextRenderer()
        from smelter_tpu.render.web import WebRendererRegistry

        self.web = WebRendererRegistry()
        self._inputs: Dict[str, float] = {}  # input_id -> last frame pts
        self._last_frames: Dict[str, Frame] = {}
        self._programs: Dict[str, OutputProgram] = {}
        self._output_formats: Dict[str, PixelFormat] = {}

    # -- registration ----------------------------------------------------------

    def register_input(self, input_id: str) -> None:
        with self._lock:
            self._inputs[input_id] = -1.0

    def unregister_input(self, input_id: str) -> None:
        with self._lock:
            self._inputs.pop(input_id, None)
            self._last_frames.pop(input_id, None)

    def register_shader(self, shader_id: str, source: str) -> None:
        with self._lock:
            self.shaders.register(shader_id, source)

    def register_shader_fn(self, shader_id: str, fn: Callable) -> None:
        with self._lock:
            self.shaders.register_fn(shader_id, fn)

    def unregister_shader(self, shader_id: str) -> None:
        with self._lock:
            self.shaders.unregister(shader_id)

    def register_image(self, image_id: str, **kwargs) -> None:
        with self._lock:
            self.images.register(image_id, **kwargs)

    def unregister_image(self, image_id: str) -> None:
        with self._lock:
            self.images.unregister(image_id)

    # -- scene -------------------------------------------------------------------

    def update_scene(
        self,
        output_id: str,
        root: comp.Component,
        resolution: Resolution,
        output_format: PixelFormat = PixelFormat.PLANAR_YUV420,
    ) -> None:
        with self._lock:
            self._validate_components(root)
            node = self.scene.update_scene(
                OutputScene(output_id, root, resolution),
                text_measurer=lambda t: self.text.measure(t),
                image_store=lambda i: self.images.natural_size(i),
                web_size=self._web_size,
            )
            prev = self._programs.get(output_id)
            if prev is not None and (
                prev.resolution != resolution
                or self._output_formats.get(output_id) != output_format
            ):
                # freeze-frame fallback must never emit a stale frame with the
                # wrong resolution/format to the encoder
                self._last_outputs.pop(output_id, None)
            self._programs[output_id] = OutputProgram(
                node.node, resolution, output_format, self.shaders,
                web=self.web, image_store=self.images,
            )
            self._output_formats[output_id] = output_format

    def unregister_output(self, output_id: str) -> None:
        with self._lock:
            self.scene.unregister_output(output_id)
            self._programs.pop(output_id, None)
            self._output_formats.pop(output_id, None)
            # Drop the cached last frame: a re-registered output reusing this
            # id must not freeze-frame the OLD output's content (possibly a
            # different resolution/format) while its first program compiles.
            self._last_outputs.pop(output_id, None)

    def _validate_components(self, root: comp.Component) -> None:
        def visit(c: comp.Component):
            if isinstance(c, comp.Shader):
                if not self.shaders.has(c.shader_id):
                    raise ValueError(f"shader {c.shader_id!r} not registered")
                if len(c.children) > self.shaders.MAX_TEXTURES:
                    # reference shader.rs:15 SHADER_INPUT_TEXTURES_AMOUNT
                    raise ValueError(
                        f"shader {c.shader_id!r} has {len(c.children)} input "
                        f"textures; the limit is {self.shaders.MAX_TEXTURES}"
                    )
            if isinstance(c, comp.Image) and not self.images.has(c.image_id):
                raise ValueError(f"image {c.image_id!r} not registered")
            if isinstance(c, comp.InputStream) and c.input_id not in self._inputs:
                raise ValueError(f"input {c.input_id!r} not registered")
            for ch in _children(c):
                visit(ch)

        visit(root)

    def close(self) -> None:
        """Drain in-flight background compiles and release web renderer
        sidecars. Short-lived scripts should call this (an atexit hook
        covers the ones that don't — an XLA compile still running during
        interpreter finalization aborts the process)."""
        from smelter_tpu.render.program import _drain_background_compiles

        _drain_background_compiles()
        self.web.close_all()

    def _web_size(self, instance_id: str) -> tuple:
        inst = self.web.get(instance_id)
        if inst is None:
            return (0.0, 0.0)
        w, h = inst.spec.resolution
        return (float(w), float(h))

    # -- hot path ------------------------------------------------------------------

    def render(self, frame_set: FrameSet) -> FrameSet:
        """Compose all outputs for this tick. Missing inputs fall back to
        their last frame until `stream_fallback_timeout`, then render absent
        (reference render_loop.rs:29-32)."""
        from smelter_tpu.utils import tracing

        with tracing.span("render.frame"), self._lock:
            pts = frame_set.pts
            # refresh last-frame cache; skip inputs unregistered while this
            # frameset was in flight in the render channel — otherwise their
            # frame would re-enter the cache after unregister_input popped it
            # and the freeze-frame fallback would keep showing a removed
            # input for stream_fallback_timeout longer
            for iid, frame in frame_set.frames.items():
                if iid not in self._inputs:
                    continue
                self._last_frames[iid] = frame
                self._inputs[iid] = pts
            frames: Dict[str, Frame] = {}
            for iid, last in list(self._last_frames.items()):
                last_seen = self._inputs.get(iid, -1.0)
                if pts - last_seen <= self.options.stream_fallback_timeout:
                    frames[iid] = last
                else:
                    del self._last_frames[iid]

            input_resolutions = {
                iid: f.resolution for iid, f in frames.items()
            }
            self.scene.register_render_event(pts, input_resolutions)

            out = FrameSet(pts=pts)
            for output_id, program in self._programs.items():
                has_last = output_id in self._last_outputs
                planes = program.render(
                    pts, frames, self.images, self.text,
                    allow_async_compile=self.options.async_compile and has_last,
                )
                if planes is None:
                    # program compiling in the background: freeze the last
                    # frame instead of stalling the loop
                    last = self._last_outputs[output_id]
                    out.frames[output_id] = Frame(
                        data=last.data, format=last.format,
                        resolution=last.resolution, pts=pts,
                    )
                    continue
                frame = Frame(
                    data=planes,
                    format=self._output_formats[output_id],
                    resolution=program.resolution,
                    pts=pts,
                )
                self._last_outputs[output_id] = frame
                out.frames[output_id] = frame
            return out


def _children(c: comp.Component) -> List[comp.Component]:
    if isinstance(c, (comp.View, comp.Tiles, comp.Shader, comp.WebView)):
        return c.children
    if isinstance(c, comp.Rescaler):
        return [c.child]
    return []
