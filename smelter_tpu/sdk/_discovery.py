"""Side-channel socket discovery (reference `sdks/python/lib/smelter/_discovery.py`).

Sockets are named ``video_<input_id>.sock`` / ``audio_<input_id>.sock``
inside the configured socket dir.
"""

from __future__ import annotations

import os
import re
from typing import Dict

_SOCKET_RE = re.compile(r"^(video|audio)_(.+)\.sock$")


def discover_side_channels(socket_dir: str) -> Dict[str, Dict[str, str]]:
    """Returns {input_id: {"video": path, "audio": path}} for sockets found."""
    found: Dict[str, Dict[str, str]] = {}
    if not os.path.isdir(socket_dir):
        return found
    for name in os.listdir(socket_dir):
        m = _SOCKET_RE.match(name)
        if not m:
            continue
        media, input_id = m.group(1), m.group(2)
        found.setdefault(input_id, {})[media] = os.path.join(socket_dir, name)
    return found
