"""Compiled frame program.

The TPU replacement for the reference's per-frame wgpu pass list
(`smelter-render/src/state/render_loop.rs`): the whole per-output render -
input pixel-format conversion, mip prefilter, node tree evaluation (layout
compose / user shader / text / image), and output format conversion - is
traced into ONE jitted XLA program.

Static vs traced split:
  - static (recompile on change): node tree structure, input shapes/formats,
    per-layout `LayoutStatic` (content kind, source index, mask count,
    rotation/border presence), output resolution + format
  - traced (animate freely): every numeric layout parameter, shader params,
    time, and all pixel data

Scene transitions only change traced values, so the 60 Hz loop never
recompiles; scene updates (control path) may introduce a new structure which
compiles once and is cached.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smelter_tpu.core.types import Frame, PixelFormat, Resolution
from smelter_tpu.ops import color_convert as cc
from smelter_tpu.ops.compose import (
    MAX_MASKS_COUNT,
    LayoutParams,
    LayoutStatic,
    compose_layouts,
)
from smelter_tpu.ops.resample import build_mips
from smelter_tpu.scene.layout_types import (
    Mask,
    RenderBoxShadow,
    RenderChildNode,
    RenderColor,
    RenderLayout,
)
from smelter_tpu.scene.scene_state import (
    ImageNode,
    InputStreamNode,
    LayoutNode,
    Node,
    ShaderNode,
    TextNode,
    WebNode,
)


def _mip_levels(res: Resolution) -> int:
    """Enough mips that the smallest level is ~32px on the short side."""
    short = max(min(res.width, res.height), 1)
    return max(1, min(5, int(math.floor(math.log2(short / 32.0))) + 1 if short >= 64 else 1))


# ---------------------------------------------------------------------------
# RenderLayout -> (static, traced params)
# ---------------------------------------------------------------------------


def split_layout(
    layout: RenderLayout, fast: bool = False, rot_traced: bool = False,
    moving: bool = False, scaling: bool = False,
) -> Tuple[LayoutStatic, LayoutParams]:
    """``fast=True`` bakes the (non-animating) rect/crop into the static part
    so the compose op can use the region-local MXU path instead of
    full-canvas gathers. The planner decides per frame (see
    `OutputProgram.plan`): a rect that moved since the previous frame renders
    via the general path; stable rects take the fast path."""
    c = layout.content
    n_masks = len(layout.masks)
    static_rect = None
    static_crop = None
    static_blur = 0.0
    no_radius = all(r <= 1e-6 for r in layout.border_radius.as_tuple())
    static_color = None
    static_rotation = None
    traced_q = None
    traced_position = False
    traced_size_buf = None
    if scaling and not fast and isinstance(c, RenderChildNode):
        # size/crop (and possibly position/rotation) animating: traced-size
        # resize into a 64px-bucketed buffer + traced placement (zoom
        # transitions; the crop is traced too, so fill-mode zooms qualify).
        # A nonzero angle adds the traced barrel-shear rotation (roto-zoom).
        bh = max(64, int(math.ceil(max(layout.height, 1.0) / 64.0)) * 64)
        bw = max(64, int(math.ceil(max(layout.width, 1.0) / 64.0)) * 64)
        traced_size_buf = (bh, bw)
        if abs(layout.rotation_degrees) > 1e-9:
            traced_q = int(round((layout.rotation_degrees % 360.0) / 90.0))
    if (
        moving
        and not fast
        and abs(layout.rotation_degrees) <= 1e-9
        and isinstance(c, RenderChildNode)
    ):
        # position animating, size/crop stable: static-size tile placed with
        # traced-index dynamic slices (slide transitions)
        h_i, w_i = int(round(layout.height)), int(round(layout.width))
        if h_i > 0 and w_i > 0:
            static_rect = (0, 0, h_i, w_i)
            traced_position = True
            static_crop = (
                int(round(c.crop.top)),
                int(round(c.crop.left)),
                max(int(round(c.crop.height)), 1),
                max(int(round(c.crop.width)), 1),
            )
    if (
        rot_traced
        and not fast
        and isinstance(c, RenderChildNode)
    ):
        # rect/crop stable but the angle animates: static quarter-turn
        # bucket + traced residual through the traced barrel-shear rotation
        rect = (
            int(round(layout.top)),
            int(round(layout.left)),
            int(round(layout.height)),
            int(round(layout.width)),
        )
        if rect[2] > 0 and rect[3] > 0:
            static_rect = rect
            traced_q = int(round((layout.rotation_degrees % 360.0) / 90.0))
            static_crop = (
                int(round(c.crop.top)),
                int(round(c.crop.left)),
                max(int(round(c.crop.height)), 1),
                max(int(round(c.crop.width)), 1),
            )
    if fast and isinstance(c, RenderColor):
        col = c.color
        static_color = (col.r, col.g, col.b, col.a)
    if (
        fast
        and abs(layout.rotation_degrees) > 1e-9
        and isinstance(c, RenderChildNode)
    ):
        # stable rotation of a texture: gather-free 3-shear path, as long as
        # the banded-shear program stays reasonably sized
        from smelter_tpu.ops.rotate import MAX_SHEAR_BANDS, rotation_band_count

        rect = (
            int(round(layout.top)),
            int(round(layout.left)),
            int(round(layout.height)),
            int(round(layout.width)),
        )
        if (
            rect[2] > 0
            and rect[3] > 0
            and rotation_band_count(layout.rotation_degrees, rect[2], rect[3])
            <= MAX_SHEAR_BANDS
        ):
            static_rect = rect
            static_rotation = round(layout.rotation_degrees, 3)
            static_crop = (
                int(round(c.crop.top)),
                int(round(c.crop.left)),
                max(int(round(c.crop.height)), 1),
                max(int(round(c.crop.width)), 1),
            )
    if (
        fast
        and abs(layout.rotation_degrees) > 1e-9
        and isinstance(c, (RenderColor, RenderBoxShadow))
    ):
        # stable rotation of a color/shadow layer: the rounded-rect SDF is
        # analytic, so rotation is just a coordinate rotation — rendered
        # region-locally over the rotated bbox (elementwise, no gathers, no
        # full-canvas pass; the angle itself stays traced for shading)
        rect = (
            int(round(layout.top)),
            int(round(layout.left)),
            int(round(layout.height)),
            int(round(layout.width)),
        )
        if rect[2] > 0 and rect[3] > 0:
            static_rect = rect
            static_rotation = round(layout.rotation_degrees, 3)
            if isinstance(c, RenderBoxShadow):
                static_blur = float(c.blur_radius)
    if fast and abs(layout.rotation_degrees) <= 1e-9:
        rect = (
            int(round(layout.top)),
            int(round(layout.left)),
            int(round(layout.height)),
            int(round(layout.width)),
        )
        if rect[2] > 0 and rect[3] > 0:
            static_rect = rect
            if isinstance(c, RenderChildNode):
                static_crop = (
                    int(round(c.crop.top)),
                    int(round(c.crop.left)),
                    max(int(round(c.crop.height)), 1),
                    max(int(round(c.crop.width)), 1),
                )
            if isinstance(c, RenderBoxShadow):
                static_blur = float(c.blur_radius)
    masks = np.zeros((max(n_masks, 1), 9), np.float32)
    for i, m in enumerate(layout.masks[:MAX_MASKS_COUNT]):
        masks[i] = [*m.radius.as_tuple(), m.top, m.left, m.width, m.height,
                    math.radians(m.rotation_degrees)]
    rotated_masks = tuple(
        abs(m.rotation_degrees) > 1e-9
        for m in layout.masks[:MAX_MASKS_COUNT]
    )

    def color_vec(col) -> np.ndarray:
        return np.asarray(col.to_float(), np.float32)

    # numpy, not jnp: planning runs on the host every frame — eager device
    # ops here would cost one dispatch per scalar; as numpy the values ride
    # the single jit call
    common = dict(
        top=np.float32(layout.top),
        left=np.float32(layout.left),
        width=np.float32(layout.width),
        height=np.float32(layout.height),
        rotation_degrees=np.float32(layout.rotation_degrees),
        border_radius=np.asarray(layout.border_radius.as_tuple(), np.float32),
        masks=masks,
    )
    if isinstance(c, RenderChildNode):
        static = LayoutStatic(
            content="texture",
            source_index=c.index,
            n_masks=min(n_masks, MAX_MASKS_COUNT),
            rotated_masks=rotated_masks,
            has_rotation=abs(layout.rotation_degrees) > 1e-9,
            has_border=c.border_width > 0.0,
            static_rect=static_rect,
            static_crop=static_crop,
            no_radius=no_radius,
            static_rotation=static_rotation,
            traced_rotation_q=traced_q,
            traced_position=traced_position,
            traced_size_buf=traced_size_buf,
        )
        params = LayoutParams(
            **common,
            border_width=np.float32(c.border_width),
            border_color=color_vec(c.border_color),
            color=np.zeros(4, np.float32),
            crop=np.asarray(
                [c.crop.top, c.crop.left, c.crop.width, c.crop.height], np.float32
            ),
            blur_radius=np.float32(0.0),
        )
    elif isinstance(c, RenderColor):
        static = LayoutStatic(
            content="color",
            n_masks=min(n_masks, MAX_MASKS_COUNT),
            rotated_masks=rotated_masks,
            has_rotation=abs(layout.rotation_degrees) > 1e-9,
            has_border=c.border_width > 0.0,
            static_rect=static_rect,
            no_radius=no_radius,
            static_color=static_color,
            static_rotation=static_rotation,
        )
        params = LayoutParams(
            **common,
            border_width=np.float32(c.border_width),
            border_color=color_vec(c.border_color),
            color=color_vec(c.color),
            crop=np.zeros(4, np.float32),
            blur_radius=np.float32(0.0),
        )
    elif isinstance(c, RenderBoxShadow):
        static = LayoutStatic(
            content="box_shadow",
            n_masks=min(n_masks, MAX_MASKS_COUNT),
            rotated_masks=rotated_masks,
            has_rotation=abs(layout.rotation_degrees) > 1e-9,
            static_rect=static_rect,
            static_blur=static_blur,
            no_radius=no_radius,
            static_rotation=static_rotation,
        )
        params = LayoutParams(
            **common,
            border_width=np.float32(0.0),
            border_color=np.zeros(4, np.float32),
            color=color_vec(c.color),
            crop=np.zeros(4, np.float32),
            blur_radius=np.float32(c.blur_radius),
        )
    else:
        raise ValueError(f"unknown content {type(c)}")
    return static, params


# ---------------------------------------------------------------------------
# layout-tree collapse (plan time)
# ---------------------------------------------------------------------------
#
# A layout entry that places a child LayoutNode's canvas as a pure translation
# (1:1 scale, no rotation/radius/border/crop) is replaced by the child's own
# flattened layouts, offset into the parent frame. Premultiplied OVER is
# associative, so interleaving is exact; the child canvas (and its mip
# pyramid, format conversion and second resample) is never materialized.
# This is what routes the common `View[Rescaler(InputStream), ...]` scene
# onto the flat fast paths (region-local MXU resize / YUV-grid program)
# instead of per-node intermediate canvases.

_COLLAPSE_EPS = 0.51


def _entry_within_bounds(e: RenderLayout, res: Resolution) -> bool:
    """True if the entry's painted footprint stays inside the child canvas,
    so skipping the canvas clip is invisible."""
    margin = 0.5
    if isinstance(e.content, RenderBoxShadow):
        margin += float(e.content.blur_radius)
    t, l, h, w = e.top, e.left, e.height, e.width
    if abs(e.rotation_degrees) > 1e-9:
        ang = math.radians(e.rotation_degrees)
        cx, cy = l + w * 0.5, t + h * 0.5
        bw = abs(math.cos(ang)) * w + abs(math.sin(ang)) * h
        bh = abs(math.sin(ang)) * w + abs(math.cos(ang)) * h
        t, l, h, w = cy - bh * 0.5, cx - bw * 0.5, bh, bw
    return (
        t >= -margin - _COLLAPSE_EPS
        and l >= -margin - _COLLAPSE_EPS
        and t + h <= res.height + margin + _COLLAPSE_EPS
        and l + w <= res.width + margin + _COLLAPSE_EPS
    )


def _collapsible(
    layout: RenderLayout,
    child_res: Optional[Resolution],
    inner: List[Tuple[RenderLayout, Optional[int]]],
) -> bool:
    c = layout.content
    if child_res is None or not isinstance(c, RenderChildNode):
        return False
    if abs(layout.rotation_degrees) > 1e-9 or c.border_width > 0.0:
        return False
    if any(r > 1e-6 for r in layout.border_radius.as_tuple()):
        return False
    if (
        abs(layout.width - child_res.width) > _COLLAPSE_EPS
        or abs(layout.height - child_res.height) > _COLLAPSE_EPS
    ):
        return False
    cr = c.crop
    if (
        abs(cr.top) > _COLLAPSE_EPS
        or abs(cr.left) > _COLLAPSE_EPS
        or abs(cr.width - child_res.width) > _COLLAPSE_EPS
        or abs(cr.height - child_res.height) > _COLLAPSE_EPS
    ):
        return False
    for e, _src in inner:
        if len(e.masks) + len(layout.masks) > MAX_MASKS_COUNT:
            return False
        if not _entry_within_bounds(e, child_res):
            return False
    return True


def _offset_entries(
    inner: List[Tuple[RenderLayout, Optional[int]]], layout: RenderLayout
) -> List[Tuple[RenderLayout, Optional[int]]]:
    from dataclasses import replace as _replace

    dt, dl = layout.top, layout.left
    out = []
    for e, src in inner:
        masks = tuple(
            Mask(m.radius, m.top + dt, m.left + dl, m.width, m.height,
                 m.rotation_degrees)
            for m in e.masks
        ) + tuple(layout.masks)
        out.append((_replace(e, top=e.top + dt, left=e.left + dl, masks=masks), src))
    return out


# ---------------------------------------------------------------------------
# node tree -> traced evaluation
# ---------------------------------------------------------------------------


@dataclass
class FramePlan:
    """Per-frame host-computed traced values for one output render.

    Everything numeric rides the device boundary in TWO buffers — one u8
    pixel buffer holding every host-side input's planes and one f32 vector
    holding every layout parameter + time (the TPU analogue of the
    reference's wgpu uniform buffer, `layout/params.rs`) — so a frame costs
    O(1) host->device transfers instead of one per plane/scalar."""

    # all packable input planes, ravelled + concatenated (sorted by input id)
    frame_buf: np.ndarray
    # inputs that arrived device-resident (or non-u8) pass through untouched
    raw_planes: Dict[str, object]
    # every LayoutParams field flattened (sorted by node id) + [time] tail
    packed_params: np.ndarray
    # texture payloads keyed by (node id) for text/image aux textures
    aux_textures: Dict[int, jnp.ndarray]
    shader_params: Dict[int, object]
    time: float


def _is_packable(data) -> bool:
    planes = data if isinstance(data, (tuple, list)) else (data,)
    return all(
        isinstance(p, np.ndarray) and p.dtype == np.uint8 for p in planes
    )


class _InputAccess:
    """Static unpacking plan mapping input ids to slices of the frame
    buffer (shapes captured from the example frames; the structure key pins
    format+resolution, so shapes are stable per compiled program)."""

    def __init__(self, used_frames: Dict[str, "Frame"]) -> None:
        self.specs: Dict[str, tuple] = {}
        off = 0
        for iid in sorted(used_frames):
            data = used_frames[iid].data
            if _is_packable(data):
                is_tuple = isinstance(data, (tuple, list))
                planes = data if is_tuple else (data,)
                shapes = [tuple(p.shape) for p in planes]
                self.specs[iid] = ("buf", off, shapes, is_tuple)
                off += sum(int(np.prod(s)) for s in shapes)
            else:
                self.specs[iid] = ("raw",)
        self.total = off

    def get(self, iid: str, frame_buf, raw_planes):
        spec = self.specs[iid]
        if spec[0] == "raw":
            return raw_planes[iid]
        _, off, shapes, is_tuple = spec
        planes = []
        for s in shapes:
            n = int(np.prod(s))
            planes.append(frame_buf[off : off + n].reshape(s))
            off += n
        return tuple(planes) if is_tuple else planes[0]


def _pack_frame_buf(used_frames: Dict[str, "Frame"]) -> Tuple[np.ndarray, Dict[str, object]]:
    parts: List[np.ndarray] = []
    raw: Dict[str, object] = {}
    for iid in sorted(used_frames):
        data = used_frames[iid].data
        if _is_packable(data):
            planes = data if isinstance(data, (tuple, list)) else (data,)
            parts.extend(p.reshape(-1) for p in planes)
        else:
            raw[iid] = data
    buf = np.concatenate(parts) if parts else np.zeros(1, np.uint8)
    return buf, raw


_P_FIXED = 23  # [top,left,w,h,rot, radius*4, bw, bcolor*4, color*4, crop*4, blur]


def _pack_layout_params(
    layout_params: Dict[int, List[LayoutParams]], time: float
) -> np.ndarray:
    chunks: List[np.ndarray] = []
    for nid in sorted(layout_params):
        for p in layout_params[nid]:
            chunks.append(
                np.asarray(
                    [p.top, p.left, p.width, p.height, p.rotation_degrees],
                    np.float32,
                )
            )
            chunks.append(np.asarray(p.border_radius, np.float32))
            chunks.append(np.asarray([p.border_width], np.float32))
            chunks.append(np.asarray(p.border_color, np.float32))
            chunks.append(np.asarray(p.color, np.float32))
            chunks.append(np.asarray(p.crop, np.float32))
            chunks.append(np.asarray([p.blur_radius], np.float32))
            chunks.append(np.asarray(p.masks, np.float32).reshape(-1))
    chunks.append(np.asarray([time], np.float32))
    return np.concatenate(chunks)


def _unpack_layout_params(
    vec, static_statics: Dict[int, Tuple[LayoutStatic, ...]]
) -> Dict[int, List[LayoutParams]]:
    out: Dict[int, List[LayoutParams]] = {}
    off = 0
    for nid in sorted(static_statics):
        lst = []
        for st in static_statics[nid]:
            rows = max(st.n_masks, 1)
            f = vec[off : off + _P_FIXED]
            off += _P_FIXED
            masks = vec[off : off + rows * 9].reshape(rows, 9)
            off += rows * 9
            lst.append(
                LayoutParams(
                    top=f[0], left=f[1], width=f[2], height=f[3],
                    rotation_degrees=f[4], border_radius=f[5:9],
                    border_width=f[9], border_color=f[10:14], color=f[14:18],
                    crop=f[18:22], blur_radius=f[22], masks=masks,
                )
            )
        out[nid] = lst
    return out


@dataclass
class NodeMeta:
    """Static per-node info captured at plan time."""

    node_id: int
    kind: str
    resolution: Optional[Resolution]


class ShaderRegistry:
    """User shader components: a restricted Python/JAX source registered by
    id, exposing `main(inputs, params, resolution, time) -> (H, W, 4) f32`.

    TPU-native analogue of the reference WGSL ShaderSpec
    (`smelter-render/src/transformations/shader.rs`). Sources are
    AST-allowlisted, executed against a closed builtins set, and
    abstractly traced at registration (see `render/shader_validation.py`,
    mirroring `shader/validation.rs`); the texture cap mirrors
    `shader.rs:15` SHADER_INPUT_TEXTURES_AMOUNT and is enforced at scene
    plan time.
    """

    MAX_TEXTURES = 16

    def __init__(self) -> None:
        self._shaders: Dict[str, Callable] = {}

    def register(self, shader_id: str, source: str) -> None:
        from smelter_tpu.render import shader_validation as sv

        if shader_id in self._shaders:
            raise ValueError(f"shader {shader_id!r} already registered")
        fn = sv.compile_sandboxed(shader_id, source)
        sv.validate_traced(shader_id, fn, self.MAX_TEXTURES)
        self._shaders[shader_id] = fn

    def register_fn(self, shader_id: str, fn: Callable) -> None:
        if shader_id in self._shaders:
            raise ValueError(f"shader {shader_id!r} already registered")
        self._shaders[shader_id] = fn

    def unregister(self, shader_id: str) -> None:
        del self._shaders[shader_id]

    def get(self, shader_id: str) -> Callable:
        if shader_id not in self._shaders:
            raise ValueError(f"shader {shader_id!r} not registered")
        return self._shaders[shader_id]

    def has(self, shader_id: str) -> bool:
        return shader_id in self._shaders


_DUMMY = np.zeros((2, 2, 4), np.float32)


def _frame_rgba_np(frame) -> np.ndarray:
    """Host-side RGBA view of an input frame (any upload format), for the
    web-renderer uplink — pure numpy, never touches the device."""
    from smelter_tpu.pipeline.side_channel import _frame_to_rgba_bytes

    h, w = frame.resolution.height, frame.resolution.width
    return np.frombuffer(_frame_to_rgba_bytes(frame), np.uint8).reshape(h, w, 4)

# Process-wide trace serialization. A rare (~1-in-3 live soaks) trace-time
# shape corruption was observed in the (since-deleted) banded-shear
# rotation when two background compiles traced concurrently — never
# single-threaded. The program code itself shares no mutable state across
# traces, which points at JAX-internal global state under concurrent
# tracing; serializing trace+first-call removes the race class. Full
# analysis + repro driver: docs/TRACE_RACE.md, tools/repro_trace_race.py.
# Cost: concurrent background compiles queue — off the 60 Hz hot path by
# construction (outputs freeze-frame until their program is ready).
import atexit as _atexit
import threading as _threading_mod
import weakref as _weakref

_TRACE_LOCK = _threading_mod.RLock()

# Live background-compile threads. A daemon thread mid-XLA-compile while
# CPython finalizes segfaults the interpreter (C++ teardown under it), so
# short-lived scripts drain in-flight compiles at exit.
_COMPILE_THREADS: "_weakref.WeakSet" = _weakref.WeakSet()


def _drain_background_compiles(timeout_s: float = 300.0) -> None:
    import time as _time

    deadline = _time.monotonic() + timeout_s
    for t in list(_COMPILE_THREADS):
        t.join(timeout=max(deadline - _time.monotonic(), 0.0))


_atexit.register(_drain_background_compiles)


class OutputProgram:
    """Holds the compiled render fn cache for one output's node tree."""

    def __init__(
        self,
        root: Node,
        resolution: Resolution,
        out_format: PixelFormat,
        shaders: ShaderRegistry,
        web=None,
        image_store=None,
    ) -> None:
        self.root = root
        self.resolution = resolution
        self.out_format = out_format
        self.shaders = shaders
        self.web = web  # WebRendererRegistry (None in bare programs)
        self._node_ids: Dict[int, int] = {}
        self._nodes: Dict[int, Node] = {}
        self._next_id = 0
        self._assign_ids(root)
        self._jit_cache: Dict[tuple, Callable] = {}
        # the LIVE scene keeps rendering its images even if they are
        # unregistered afterwards (reference semantics: the registry only
        # gates FUTURE scene updates, integration-tests unregistering.rs) —
        # resolve every image NOW, while the scene-update validation that
        # just confirmed registration still holds; pinning lazily at first
        # plan() would leave a pre-first-frame window where an unregister
        # kills the render thread
        self._pinned_images: Dict[str, object] = {}
        self._pinned_shaders: Dict[str, Callable] = {}
        for node in self._nodes.values():
            p = node.params
            if isinstance(p, ImageNode) and image_store is not None:
                self._pinned_images[p.image_id] = image_store.get(p.image_id)
            if (
                isinstance(p, ShaderNode)
                and shaders is not None
                and shaders.has(p.shader_id)
            ):
                self._pinned_shaders[p.shader_id] = shaders.get(p.shader_id)
        import threading as _threading

        self._compile_lock = _threading.Lock()
        self._compiling: set = set()
        self._aux_dev: Dict[int, tuple] = {}
        self._used_frames: Dict[str, Frame] = {}
        self._image_store = image_store
        # chromium_embedding of non-input subtrees: per-child sub-programs
        # + last pushed content signature (see _plan_subtree_embed)
        self._embed_programs: Dict[int, "OutputProgram"] = {}
        # (node_id, layout_index) -> last rect signature; used to detect
        # animating layouts (transitions) and route them to the general path
        self._rect_history: Dict[tuple, tuple] = {}

    def _assign_ids(self, node: Node) -> None:
        self._node_ids[id(node)] = self._next_id
        self._nodes[self._next_id] = node
        self._next_id += 1
        for child in node.children:
            self._assign_ids(child)

    def node_id(self, node: Node) -> int:
        return self._node_ids[id(node)]

    # -- per-frame host planning ------------------------------------------------

    def plan(
        self,
        pts: float,
        input_frames: Dict[str, Frame],
        image_store,
        text_renderer,
    ) -> Tuple[tuple, FramePlan]:
        """Walk the node tree at ``pts``: compute flattened layout params,
        gather aux textures, and build the static structure key."""
        layout_params: Dict[int, List[LayoutParams]] = {}
        # per layout nid: merged (RenderLayout, source nid) entries, in that
        # node's canvas coords — consumed by the node's parent for collapse
        collapsed_entries: Dict[int, List[Tuple[RenderLayout, Optional[int]]]] = {}
        aux: Dict[int, jnp.ndarray] = {}
        used_frames: Dict[str, Frame] = {}
        shader_params: Dict[int, object] = {}
        key_parts: List[object] = [
            self.resolution,
            self.out_format,
        ]

        def visit(node: Node) -> Optional[Resolution]:
            nid = self.node_id(node)
            p = node.params
            if isinstance(p, InputStreamNode):
                frame = input_frames.get(p.input_id)
                if frame is None:
                    key_parts.append((nid, "input", None))
                    return None
                key_parts.append(
                    (nid, "input", p.input_id, frame.format, frame.resolution,
                     _is_packable(frame.data))
                )
                used_frames[p.input_id] = frame
                return frame.resolution
            if isinstance(p, TextNode):
                rendered = text_renderer.render(p.component)
                aux[nid] = rendered.rgba
                res = Resolution(rendered.rgba.shape[1], rendered.rgba.shape[0])
                key_parts.append((nid, "text", res))
                return res
            if isinstance(p, ImageNode):
                # pin the asset on first use: the LIVE scene keeps rendering
                # its images even if they are unregistered afterwards
                # (reference semantics — the registry only gates FUTURE scene
                # updates, integration-tests unregistering.rs); scene updates
                # build a fresh program, which re-resolves and re-validates
                asset = self._pinned_images.get(p.image_id)
                if asset is None:
                    asset = image_store.get(p.image_id)
                    self._pinned_images[p.image_id] = asset
                frame = asset.frame_at(pts)
                aux[nid] = frame
                res = Resolution(frame.shape[1], frame.shape[0])
                key_parts.append((nid, "image", res))
                return res
            if isinstance(p, ShaderNode):
                if len(node.children) > ShaderRegistry.MAX_TEXTURES:
                    # reference shader.rs:15 SHADER_INPUT_TEXTURES_AMOUNT
                    raise ValueError(
                        f"shader {p.shader_id!r} has {len(node.children)} "
                        "input textures; the limit is "
                        f"{ShaderRegistry.MAX_TEXTURES}"
                    )
                child_res = [visit(ch) for ch in node.children]
                shader_params[nid] = p.shader_param
                res = Resolution(int(p.size[0]), int(p.size[1]))
                key_parts.append((nid, "shader", p.shader_id, res, tuple(child_res)))
                return res
            if isinstance(p, WebNode):
                # web renderer runs as a host sidecar (render/web.py): its
                # latest page frame enters like an image texture; without a
                # sidecar the node renders transparent (reference
                # web_renderer_fallback.rs)
                child_res = [visit(ch) for ch in node.children]
                inst = self.web.get(p.instance_id) if self.web else None
                method = (
                    inst.spec.embedding_method
                    if inst is not None
                    else "chromium_embedding"
                )
                if (
                    inst is not None
                    and inst.active
                    and method == "chromium_embedding"
                ):
                    # uplink: push child frames INTO the page (embedder.rs:83
                    # embed_sources). InputStream children convert their host
                    # frame directly; any OTHER subtree renders through a
                    # cached per-child sub-program to RGBA and is read back
                    # (the CDP analogue of the reference copying every
                    # child's rendered texture into CEF shared memory,
                    # web_renderer.rs:24-26) — re-rendered and re-pushed
                    # only when its content signature changes
                    embeds = []
                    for ch, cres in zip(node.children, child_res):
                        cp = ch.params
                        entry = None
                        if isinstance(cp, InputStreamNode):
                            f = input_frames.get(cp.input_id)
                            if f is not None:
                                # lazy thunk: embed_sources dedups by pts
                                # BEFORE converting, so freeze-frame/paused
                                # inputs don't pay the RGBA convert +
                                # base64 on every 60 Hz plan() tick
                                entry = (
                                    f.pts,
                                    lambda f=f: _frame_rgba_np(f),
                                )
                        elif cres is not None:
                            entry = self._plan_subtree_embed(
                                ch, cres, pts, input_frames,
                                image_store, text_renderer,
                            )
                        embeds.append(entry)
                    if any(e is not None for e in embeds):
                        inst.embed_sources(embeds)
                frame = inst.frame() if inst is not None else None
                if frame is None:
                    key_parts.append((nid, "web", None, method))
                    return None
                aux[nid] = frame
                res = Resolution(frame.shape[1], frame.shape[0])
                key_parts.append((nid, "web", res, method))
                return res
            if isinstance(p, LayoutNode):
                child_res = [visit(ch) for ch in node.children]
                nested = p.layouts(pts, child_res)
                res = p.resolution(pts)
                if self.node_id(self.root) == nid:
                    res = self.resolution
                flat = nested.flatten(child_res, res)
                # collapse: splice trivially-placed child LayoutNodes inline
                merged: List[Tuple[RenderLayout, Optional[int]]] = []
                for layout in flat:
                    c = layout.content
                    if isinstance(c, RenderChildNode):
                        ch_node = node.children[c.index]
                        ch_nid = self.node_id(ch_node)
                        inner = collapsed_entries.get(ch_nid)
                        if inner is not None and _collapsible(
                            layout, child_res[c.index], inner
                        ):
                            merged.extend(_offset_entries(inner, layout))
                            continue
                        merged.append((layout, ch_nid))
                    else:
                        merged.append((layout, None))
                collapsed_entries[nid] = merged
                source_ids: List[int] = []
                statics = []
                params = []
                for i, (layout, src_nid) in enumerate(merged):
                    sig_key = (nid, i)
                    c = layout.content
                    crop_sig = ()
                    if hasattr(c, "crop"):
                        crop_sig = (
                            round(c.crop.top, 2), round(c.crop.left, 2),
                            round(c.crop.width, 2), round(c.crop.height, 2),
                        )
                    color_sig = ()
                    if isinstance(c, RenderColor):
                        col = c.color
                        color_sig = (col.r, col.g, col.b, col.a)
                    sig = (
                        round(layout.top, 2), round(layout.left, 2),
                        round(layout.width, 2), round(layout.height, 2),
                        round(layout.rotation_degrees, 3), crop_sig, color_sig,
                        tuple(round(r, 2) for r in layout.border_radius.as_tuple()),
                    )
                    prev = self._rect_history.get(sig_key)
                    # fast on first sight or when stable; general while moving;
                    # rect-stable + angle-moving → traced-rotation fast path
                    fast = prev is None or prev == sig
                    rot_traced = (
                        not fast
                        and prev is not None
                        and prev[:4] == sig[:4]
                        and prev[5:] == sig[5:]
                    )
                    # position moving, everything else (incl. size) stable
                    moving = (
                        not fast
                        and not rot_traced
                        and prev is not None
                        and prev[2:4] == sig[2:4]
                        and prev[4:] == sig[4:]
                    )
                    # size/crop/position/rotation animating in any mix;
                    # color/radius stable (zoom + roto-zoom transitions)
                    scaling = (
                        not fast
                        and not rot_traced
                        and not moving
                        and prev is not None
                        and prev[6:] == sig[6:]
                    )
                    self._rect_history[sig_key] = sig
                    st, pp = split_layout(
                        layout, fast=fast, rot_traced=rot_traced, moving=moving,
                        scaling=scaling,
                    )
                    if isinstance(c, RenderChildNode):
                        from dataclasses import replace as _replace

                        if src_nid not in source_ids:
                            source_ids.append(src_nid)  # type: ignore[arg-type]
                        st = _replace(st, source_index=source_ids.index(src_nid))
                    statics.append(st)
                    params.append(pp)
                layout_params[nid] = params
                key_parts.append(
                    (nid, "layout", tuple(statics), res, tuple(child_res),
                     tuple(source_ids))
                )
                return res
            raise ValueError(f"unknown node params {type(p)}")

        visit(self.root)
        frame_buf, raw_planes = _pack_frame_buf(used_frames)
        plan = FramePlan(
            frame_buf=frame_buf,
            raw_planes=raw_planes,
            packed_params=_pack_layout_params(layout_params, pts),
            aux_textures={nid: self._dev_aux(nid, a) for nid, a in aux.items()},
            shader_params=shader_params,
            time=pts,
        )
        self._used_frames = used_frames
        return tuple(key_parts), plan

    def _plan_subtree_embed(self, child, res: Resolution, pts: float,
                            input_frames, image_store, text_renderer):
        """Embed entry for a NON-InputStream child of a chromium_embedding
        WebView: render the child subtree to RGBA via a cached sub-program,
        read it back, and hand it to embed_sources (embedder.rs:83 pushes
        every child's rendered texture into the page; CEF gets it via
        shared memory, we carry it over CDP).

        The returned entry is (signature, thunk): embed_sources dedups on
        the signature before the thunk runs, so a static subtree pays the
        device render + host readback ONCE — only content changes (layout
        params, input frame pts, aux texture identity) re-render."""
        nid = self.node_id(child)
        sub = self._embed_programs.get(nid)
        if sub is None or sub.resolution != res:
            sub = OutputProgram(
                child, res, PixelFormat.RGBA, self.shaders,
                web=self.web, image_store=image_store or self._image_store,
            )
            self._embed_programs[nid] = sub
        try:
            skey, splan = sub.plan(pts, input_frames, image_store,
                                   text_renderer)
        except Exception:
            logging.getLogger("smelter.render").exception(
                "web-embed subtree plan failed (node %d)", nid
            )
            return None
        # packed_params' trailing element is the frame time (shader `time`
        # uniform): a static subtree must not re-push every pts, so the
        # time slot only joins the signature when the subtree actually
        # contains time-driven nodes (shaders). Animating layouts are still
        # caught — their rect params change with pts.
        has_shader = any(
            isinstance(n.params, ShaderNode) for n in sub._nodes.values()
        )
        params = splan.packed_params
        param_bytes = params.tobytes() if has_shader else params[:-1].tobytes()
        sig = hash((
            skey,
            param_bytes,
            tuple(sorted(
                (iid, f.pts) for iid, f in sub._used_frames.items()
            )),
            tuple(sorted(
                (anid, id(a)) for anid, a in splan.aux_textures.items()
            )),
        ))

        def thunk(sub=sub):
            out = sub.render(pts, input_frames, image_store, text_renderer)
            arr = np.asarray(out)  # (H, W, 4) u8, premultiplied
            # the page's putImageData expects straight alpha
            a = arr[..., 3:4].astype(np.float32)
            scale = np.where(a > 0.0, 255.0 / np.maximum(a, 1.0), 0.0)
            rgb = np.clip(
                arr[..., :3].astype(np.float32) * scale, 0.0, 255.0
            ).astype(np.uint8)
            return np.concatenate([rgb, arr[..., 3:]], axis=-1)

        return (sig, thunk)

    def _dev_aux(self, nid: int, arr):
        """Device-resident cache for aux (text/image) textures: unchanged
        textures upload once, not every frame (identity-keyed; animated
        images re-upload on the frame they change)."""
        ent = self._aux_dev.get(nid)
        if ent is not None and ent[0] is arr:
            return ent[1]
        dev = jax.device_put(arr) if isinstance(arr, np.ndarray) else arr
        self._aux_dev[nid] = (arr, dev)
        return dev

    # -- compile + run ------------------------------------------------------------

    def render(self, pts, input_frames, image_store, text_renderer,
               allow_async_compile: bool = False):
        """Render one frame. With ``allow_async_compile`` an uncompiled
        structure kicks off a background compile and returns None instead of
        stalling the 60 Hz loop (SURVEY §7 hard part (a)): the caller shows
        the previous frame until the program is ready. The first-ever frame
        of an output always compiles synchronously."""
        key, plan = self.plan(pts, input_frames, image_store, text_renderer)
        fn = self._jit_cache.get(key)
        if fn is None:
            if allow_async_compile:
                self._compile_async(key, plan, input_frames)
                return None
            # build + first call (which traces/compiles) under the process
            # trace lock; timing is charged to the control path
            with _TRACE_LOCK:
                fn = self._build(key, plan, input_frames)
                out = fn(
                    plan.frame_buf,
                    plan.raw_planes,
                    plan.aux_textures,
                    plan.packed_params,
                    plan.shader_params,
                )
                self._store_program(key, fn)
            return out
        return fn(
            plan.frame_buf,
            plan.raw_planes,
            plan.aux_textures,
            plan.packed_params,
            plan.shader_params,
        )

    # long-running servers see many distinct stable geometries; bound the
    # compiled-program cache (evict oldest) so memory stays flat
    MAX_CACHED_PROGRAMS = 32

    def _store_program(self, key: tuple, fn) -> None:
        if len(self._jit_cache) >= self.MAX_CACHED_PROGRAMS:
            oldest = next(iter(self._jit_cache))
            del self._jit_cache[oldest]
        self._jit_cache[key] = fn

    def _compile_async(self, key: tuple, plan: FramePlan, input_frames) -> None:
        import threading

        with self._compile_lock:
            if key in self._compiling:
                return
            self._compiling.add(key)

        def work() -> None:
            # Trace + compile serialized process-wide (see _TRACE_LOCK).
            # A rare leaked-tracer corruption (KeyError: Var(...)) can still
            # hit a trace running concurrently with hot-path EXECUTION of
            # cached programs on another thread (suspected JAX-internal
            # trace-vs-dispatch state; serializing execution would stall the
            # 60 Hz loop for whole compile durations, so instead the compile
            # retries — the corruption is transient and the freeze-frame
            # fallback covers the extra attempt).
            import logging

            for attempt in range(3):
                try:
                    with _TRACE_LOCK:
                        fn = self._build(key, plan, input_frames)
                        # compile by executing once with the captured args
                        out = fn(
                            plan.frame_buf,
                            plan.raw_planes,
                            plan.aux_textures,
                            plan.packed_params,
                            plan.shader_params,
                        )
                        jax.block_until_ready(out)
                    self._store_program(key, fn)
                    break
                except Exception:  # pragma: no cover - surfaced via logs
                    logging.getLogger("smelter.render").exception(
                        "background compile failed (attempt %d/3)", attempt + 1
                    )
            with self._compile_lock:
                self._compiling.discard(key)

        t = threading.Thread(target=work, name="program-compile", daemon=True)
        _COMPILE_THREADS.add(t)
        t.start()

    def _build(self, key: tuple, plan: FramePlan, input_frames) -> Callable:
        """Build + jit the full render program for the current structure."""
        from smelter_tpu.utils import tracing

        with tracing.span("render.build_program"):
            return self._build_inner(key, plan, input_frames)

    def _build_inner(self, key: tuple, plan: FramePlan, input_frames) -> Callable:
        root = self.root
        out_format = self.out_format
        resolution = self.resolution
        shaders = self.shaders
        node_id = self.node_id
        # capture static info
        input_formats = {
            iid: (f.format, f.resolution) for iid, f in input_frames.items()
        }
        used = {}
        for part in key:
            if (
                isinstance(part, tuple)
                and len(part) >= 3
                and part[1] == "input"
                and part[2] is not None
                and part[2] in input_frames
            ):
                used[part[2]] = input_frames[part[2]]
        access = _InputAccess(used)
        static_statics: Dict[int, Tuple[LayoutStatic, ...]] = {}
        layout_sources: Dict[int, Tuple[int, ...]] = {}
        web_methods: Dict[int, str] = {}
        # statics are re-derived from the structure key captured at plan time
        for part in key:
            if isinstance(part, tuple) and len(part) >= 3 and part[1] == "layout":
                static_statics[part[0]] = part[2]
                layout_sources[part[0]] = part[5] if len(part) > 5 else ()
            elif isinstance(part, tuple) and len(part) >= 4 and part[1] == "web":
                web_methods[part[0]] = part[3]

        root_nid = node_id(root)
        nodes = self._nodes

        # opaque axis-aligned grid of YUV inputs → YUV-domain program
        # (no RGBA roundtrip, MXU/VPU-friendly; same trick as the flagship
        # path in parallel/flagship.py — this is the common Tiles/View case,
        # reached through Rescaler wrappers thanks to the layout collapse)
        fast = _try_yuv_grid_program(
            root, root_nid, static_statics.get(root_nid, ()),
            [nodes[s] for s in layout_sources.get(root_nid, ())],
            resolution, out_format, input_formats, access,
        )
        if fast is not None:
            return fast

        def traced(frame_buf, raw_planes, aux_textures, packed_params, shader_params):
            layout_params = _unpack_layout_params(packed_params, static_statics)
            time = packed_params[-1]
            node_memo: Dict[int, object] = {}
            input_memo: Dict[str, object] = {}

            def eval_node(node: Node):
                nid = node_id(node)
                if nid not in node_memo:
                    node_memo[nid] = _eval(node, nid)
                return node_memo[nid]

            def _eval(node: Node, nid: int):
                """Returns (mips list | None) - premultiplied f32 RGBA."""
                p = node.params
                is_root = nid == root_nid
                if isinstance(p, InputStreamNode):
                    if p.input_id not in access.specs:
                        return None
                    if p.input_id not in input_memo:
                        fmt, res = input_formats[p.input_id]
                        planes = access.get(p.input_id, frame_buf, raw_planes)
                        if fmt.is_planar_yuv:
                            # defer the RGBA conversion: fast-path layouts
                            # crop+resize the subsampled planes directly on
                            # the MXU; .mips() converts on first gather use
                            input_memo[p.input_id] = cc.DeferredYuvSource(
                                *planes,
                                full_range=fmt.is_full_range,
                                mip_levels=_mip_levels(res),
                            )
                        else:
                            rgba = cc.convert_to_rgba_f32(fmt.value, planes)
                            input_memo[p.input_id] = build_mips(
                                rgba, _mip_levels(res)
                            )
                    return input_memo[p.input_id]
                if isinstance(p, (TextNode, ImageNode)):
                    tex = aux_textures[nid]
                    rgba = cc.u8_to_f32(tex)
                    # premultiply straight-alpha aux textures
                    rgba = jnp.concatenate(
                        [rgba[..., :3] * rgba[..., 3:4], rgba[..., 3:4]], axis=-1
                    )
                    res = Resolution(tex.shape[1], tex.shape[0])
                    return build_mips(rgba, _mip_levels(res))
                if isinstance(p, ShaderNode):
                    children = [eval_node(ch) for ch in node.children]
                    inputs = [
                        _full_rgba(c) for c in children if c is not None
                    ]
                    # pinned at program construction (same live-scene
                    # semantics as images: a later unregister only gates
                    # future scene updates)
                    fn = self._pinned_shaders.get(p.shader_id)
                    if fn is None:
                        fn = shaders.get(p.shader_id)
                    res = (int(p.size[0]), int(p.size[1]))
                    out = fn(inputs, shader_params.get(nid), res, time)
                    out = out.astype(jnp.float32)
                    if is_root:
                        return [out]
                    return build_mips(out, _mip_levels(Resolution(*res)))
                if isinstance(p, WebNode):
                    method = web_methods.get(nid, "chromium_embedding")
                    child_outs = [eval_node(ch) for ch in node.children]
                    page = None
                    if nid in aux_textures:
                        tex = aux_textures[nid]
                        rgba = cc.u8_to_f32(tex)
                        page = jnp.concatenate(
                            [rgba[..., :3] * rgba[..., 3:4], rgba[..., 3:4]],
                            axis=-1,
                        )
                    if method == "chromium_embedding":
                        # children were pushed into the page itself
                        # (embed_sources); the page frame is the result
                        if page is None:
                            return None
                        res = Resolution(page.shape[1], page.shape[0])
                        return build_mips(page, _mip_levels(res))
                    # native embedding: composite children above/below the
                    # page content (web_renderer.rs NativeEmbedding*Content)
                    children = [
                        _full_rgba(c) for c in child_outs if c is not None
                    ]
                    if page is None and not children:
                        return None
                    if page is None:
                        canvas = jnp.zeros_like(children[0])
                        layers = children
                    elif method == "native_embedding_under_content":
                        canvas = jnp.zeros_like(page)
                        layers = children + [page]
                    else:  # native_embedding_over_content
                        canvas = jnp.zeros_like(page)
                        layers = [page] + children
                    from smelter_tpu.ops.resample import resize_bilinear

                    for layer in layers:
                        if layer.shape[:2] != canvas.shape[:2]:
                            layer = resize_bilinear(
                                layer, canvas.shape[0], canvas.shape[1]
                            )
                        canvas = layer + canvas * (1.0 - layer[..., 3:4])
                    res = Resolution(canvas.shape[1], canvas.shape[0])
                    return build_mips(canvas, _mip_levels(res))
                if isinstance(p, LayoutNode):
                    # sources are looked up by node id (collapse may reference
                    # grandchildren); only referenced nodes are evaluated, so
                    # collapsed intermediate canvases never materialize
                    sources = []
                    for sid in layout_sources[nid]:
                        r = eval_node(nodes[sid])
                        sources.append(r if r is not None else [jnp.asarray(_DUMMY)])
                    statics = static_statics[nid]
                    params = layout_params[nid]
                    res = resolution if is_root else _layout_res_from_key(key, nid)
                    # a YUV-bound root canvas stays CHANNEL-MAJOR end-to-end:
                    # compose blends (4, H, W) planes and the per-plane YUV
                    # converters below consume them with zero transposes
                    canvas = compose_layouts(
                        (res.width, res.height), statics, params, sources,
                        planar=is_root and out_format != PixelFormat.RGBA,
                    )
                    if is_root:
                        return [canvas]
                    return build_mips(canvas, _mip_levels(res))
                raise ValueError(f"unknown node {type(p)}")

            root_planar = (
                isinstance(root.params, LayoutNode)
                and out_format != PixelFormat.RGBA
            )
            out = eval_node(root)
            if out is None:
                shape = (
                    (4, resolution.height, resolution.width)
                    if root_planar
                    else (resolution.height, resolution.width, 4)
                )
                rgba = jnp.zeros(shape, jnp.float32)
            else:
                rgba = _full_rgba(out)
            # un-premultiply is NOT done: outputs are opaque video frames
            if root_planar:
                if out_format == PixelFormat.PLANAR_YUV420:
                    return cc.planar_rgba_to_yuv420(rgba)
                if out_format == PixelFormat.PLANAR_YUV444:
                    return cc.planar_rgba_to_yuv444(rgba)
                if out_format == PixelFormat.NV12:
                    return cc.planar_rgba_to_nv12(rgba)
                raise ValueError(f"unsupported output format {out_format}")
            if out_format == PixelFormat.RGBA:
                return cc.f32_to_u8(rgba)
            if out_format == PixelFormat.PLANAR_YUV420:
                return cc.rgba_to_planar_yuv420(rgba)
            if out_format == PixelFormat.PLANAR_YUV444:
                return cc.rgba_to_planar_yuv444(rgba)
            if out_format == PixelFormat.NV12:
                return cc.rgba_to_nv12(rgba)
            raise ValueError(f"unsupported output format {out_format}")

        return jax.jit(traced)


def _full_rgba(src):
    """Full-resolution (H, W, 4) f32 RGBA of an eval_node result (mip list,
    bare array, or a DeferredYuvSource converted on first use)."""
    if hasattr(src, "mips"):
        return src.mips()[0]
    return src[0] if isinstance(src, list) else src


def _layout_res_from_key(key: tuple, nid: int) -> Resolution:
    for part in key:
        if isinstance(part, tuple) and part and part[0] == nid and part[1] == "layout":
            return part[3]
    raise KeyError(nid)


def _rgb_to_yuv_limited_u8(r: int, g: int, b: int) -> Tuple[int, int, int]:
    """BT.709 limited-range YUV for a constant color (matches
    ops/color_convert.py matrices)."""
    rf, gf, bf = r / 255.0, g / 255.0, b / 255.0
    y = 0.2126 * rf + 0.7152 * gf + 0.0722 * bf
    u = (bf - y) / 1.8556
    v = (rf - y) / 1.5748
    return (
        int(round(16.0 + 219.0 * y)),
        int(round(128.0 + 224.0 * u)),
        int(round(128.0 + 224.0 * v)),
    )


def _try_yuv_grid_program(
    root: Node,
    root_nid: int,
    statics: Tuple[LayoutStatic, ...],
    source_nodes: List[Node],
    resolution: Resolution,
    out_format: PixelFormat,
    input_formats: Dict[str, tuple],
    access: "_InputAccess",
) -> Optional[Callable]:
    """If this structure is an opaque axis-aligned grid of planar-YUV inputs
    over an opaque background, build the YUV-domain program: per-tile
    separable resizes (MXU matmuls) + static slice placements, chroma at half
    resolution, no RGBA roundtrip. Returns None when conditions don't hold.

    Texture sources must resolve (possibly through collapsed Rescaler/View
    wrappers) to InputStreamNodes with planar-YUV frames."""
    if out_format != PixelFormat.PLANAR_YUV420 or not statics:
        return None
    if not isinstance(root.params, LayoutNode):
        return None
    child_inputs: List[Optional[str]] = []
    for src in source_nodes:
        child_inputs.append(
            src.params.input_id if isinstance(src.params, InputStreamNode) else None
        )

    H, W = resolution.height, resolution.width
    bg = (16, 128, 128)
    tiles = []  # (input_id, top, left, h, w, crop)
    for st in statics:
        if (
            st.has_rotation
            or st.has_border
            or st.n_masks
            or not st.no_radius
            or st.static_rect is None
            or st.traced_position
        ):
            return None
        if st.content == "color":
            if tiles:
                return None  # color over tiles → needs blending
            t, l, h, w = st.static_rect
            if st.static_color is None or st.static_color[3] != 255:
                return None
            if t > 0 or l > 0 or t + h < H or l + w < W:
                return None  # not a full-canvas background
            bg = _rgb_to_yuv_limited_u8(*st.static_color[:3])
        elif st.content == "texture":
            if st.source_index >= len(child_inputs) or st.static_crop is None:
                return None
            fmt = input_formats.get(child_inputs[st.source_index])
            if fmt is None or fmt[0] != PixelFormat.PLANAR_YUV420:
                return None
            t, l, h, w = st.static_rect
            t, l = t // 2 * 2, l // 2 * 2
            h, w = h // 2 * 2, w // 2 * 2
            if h <= 0 or w <= 0 or t < 0 or l < 0 or t + h > H or l + w > W:
                return None
            ct, cl, chh, cww = st.static_crop
            crop = (ct // 2 * 2, cl // 2 * 2, max(chh // 2 * 2, 2), max(cww // 2 * 2, 2))
            tiles.append((child_inputs[st.source_index], t, l, h, w, crop))
        else:
            return None  # shadows need blending

    from smelter_tpu.ops.resample import resize_matmul

    ch_, cw_ = H // 2, W // 2

    # concat assembly when the tiles exactly partition the canvas (one
    # write instead of a canvas-rewriting DUS chain; see
    # parallel/flagship.py:plan_grid_partition)
    from smelter_tpu.parallel.flagship import plan_grid_partition

    partition = plan_grid_partition(
        [(tile, tile[1], tile[2], tile[3], tile[4]) for tile in tiles], H, W
    )

    def inner(frame_buf, raw_planes):
        def round_u8(x):
            return jnp.clip(x.astype(jnp.float32) + 0.5, 0.0, 255.0).astype(jnp.uint8)

        def tile_planes(tile):
            iid, t, l, h, w, (ct, cl, chh, cww) = tile
            y, u, v = access.get(iid, frame_buf, raw_planes)
            ys = y[ct : ct + chh, cl : cl + cww]
            us = u[ct // 2 : (ct + chh) // 2, cl // 2 : (cl + cww) // 2]
            vs = v[ct // 2 : (ct + chh) // 2, cl // 2 : (cl + cww) // 2]
            return (
                round_u8(resize_matmul(ys, h, w)),
                round_u8(resize_matmul(us, h // 2, w // 2)),
                round_u8(resize_matmul(vs, h // 2, w // 2)),
            )

        if partition is not None:
            rows_y, rows_u, rows_v = [], [], []
            for row in partition:
                parts = [tile_planes(entry[0]) for entry in row]
                join = lambda xs, ax: xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=ax)
                rows_y.append(join([p[0] for p in parts], 1))
                rows_u.append(join([p[1] for p in parts], 1))
                rows_v.append(join([p[2] for p in parts], 1))
            join0 = lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=0)
            return join0(rows_y), join0(rows_u), join0(rows_v)

        canvas_y = jnp.full((H, W), jnp.uint8(bg[0]))
        canvas_u = jnp.full((ch_, cw_), jnp.uint8(bg[1]))
        canvas_v = jnp.full((ch_, cw_), jnp.uint8(bg[2]))
        for tile in tiles:
            _, t, l, h, w, _ = tile
            ty, tu, tv = tile_planes(tile)
            canvas_y = canvas_y.at[t : t + h, l : l + w].set(ty)
            canvas_u = canvas_u.at[t // 2 : (t + h) // 2, l // 2 : (l + w) // 2].set(tu)
            canvas_v = canvas_v.at[t // 2 : (t + h) // 2, l // 2 : (l + w) // 2].set(tv)
        return canvas_y, canvas_u, canvas_v

    jitted = jax.jit(inner)

    # params are unused by the grid program — drop them before the jit
    # boundary so they're never transferred
    def run(frame_buf, raw_planes, aux_textures, packed_params, shader_params):
        return jitted(frame_buf, raw_planes)

    return run
