"""Host-side image asset store (PIL).

TPU-native equivalent of the reference image renderer
(`smelter-render/src/transformations/image.rs`): PNG/JPEG assets load once
into RGBA textures; animated GIFs keep per-frame textures and resolve by PTS;
SVG rasterization is optional (matplotlib-free environments may stub it).
Assets register by id from url/path/bytes like the reference ImageSpec.
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image as PILImage


@dataclass
class ImageAsset:
    kind: str  # "bitmap" | "animated"
    frames: List[np.ndarray]  # (H, W, 4) uint8 straight-alpha frames
    durations: List[float]  # per-frame durations in seconds (animated)
    width: int
    height: int

    def frame_at(self, pts: float) -> np.ndarray:
        if self.kind == "bitmap" or len(self.frames) == 1:
            return self.frames[0]
        total = sum(self.durations)
        if total <= 0:
            return self.frames[0]
        t = pts % total
        acc = 0.0
        for frame, dur in zip(self.frames, self.durations):
            acc += dur
            if t < acc:
                return frame
        return self.frames[-1]


class ImageError(Exception):
    pass


class ImageStore:
    """Registry for image renderers, keyed by image id
    (reference `RegistryType::Image`)."""

    def __init__(self) -> None:
        self._assets: Dict[str, ImageAsset] = {}

    def register(
        self,
        image_id: str,
        *,
        path: Optional[str] = None,
        url: Optional[str] = None,
        data: Optional[bytes] = None,
        kind: Optional[str] = None,
    ) -> ImageAsset:
        if image_id in self._assets:
            raise ImageError(f"image {image_id!r} already registered")
        if data is None:
            if path is not None:
                with open(path, "rb") as f:
                    data = f.read()
            elif url is not None:
                import requests

                resp = requests.get(url, timeout=30)
                resp.raise_for_status()
                data = resp.content
            else:
                raise ImageError("one of path/url/data required")
        asset = _decode(data, kind)
        self._assets[image_id] = asset
        return asset

    def unregister(self, image_id: str) -> None:
        if image_id not in self._assets:
            raise ImageError(f"image {image_id!r} not registered")
        del self._assets[image_id]

    def get(self, image_id: str) -> ImageAsset:
        asset = self._assets.get(image_id)
        if asset is None:
            raise ImageError(f"image {image_id!r} not registered")
        return asset

    def natural_size(self, image_id: str) -> Tuple[float, float]:
        a = self.get(image_id)
        return (float(a.width), float(a.height))

    def has(self, image_id: str) -> bool:
        return image_id in self._assets


def _decode(data: bytes, kind: Optional[str]) -> ImageAsset:
    if kind == "svg" or (kind is None and data.lstrip()[:5] in (b"<svg ", b"<?xml")):
        return _decode_svg(data)
    img = PILImage.open(io.BytesIO(data))
    if getattr(img, "is_animated", False):
        frames: List[np.ndarray] = []
        durations: List[float] = []
        for i in range(img.n_frames):
            img.seek(i)
            frames.append(np.asarray(img.convert("RGBA"), dtype=np.uint8))
            durations.append(max(img.info.get("duration", 100), 10) / 1000.0)
        return ImageAsset(
            "animated", frames, durations, frames[0].shape[1], frames[0].shape[0]
        )
    rgba = np.asarray(img.convert("RGBA"), dtype=np.uint8)
    return ImageAsset("bitmap", [rgba], [0.0], rgba.shape[1], rgba.shape[0])


def _decode_svg(data: bytes) -> ImageAsset:
    """Minimal SVG rasterization via matplotlib's SVG path support is not
    practical; environments without an SVG rasterizer reject SVG assets."""
    try:
        import cairosvg  # type: ignore

        png = cairosvg.svg2png(bytestring=data)
        return _decode(png, None)
    except ImportError as exc:
        raise ImageError(
            "SVG assets need an SVG rasterizer (cairosvg) which is not "
            "available in this environment"
        ) from exc
