#!/usr/bin/env python
"""Validate the runtime dependency set before launching the framework.

Analogue of the reference's `tools/src/bin/dependency_check.rs`, which checks
the installed FFmpeg against the version the release was built with and
fetches a prebuilt libav when it is missing. This environment has no network
egress, so instead of downloading we verify every runtime dependency in
place, print versions, and exit non-zero (with a remediation hint) when a
required one is broken.

Usage:
    python tools/dependency_check.py            # human-readable report
    python tools/dependency_check.py --json     # machine-readable
    python tools/dependency_check.py --strict   # optional deps fail too
"""

from __future__ import annotations

import argparse
import ctypes
import ctypes.util
import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

RESULTS: list[dict] = []


def check(name: str, required: bool):
    """Decorator registering a dependency probe. The probe returns a version/
    detail string on success and raises on failure."""

    def wrap(fn):
        def run() -> dict:
            try:
                detail = fn()
                entry = {"name": name, "ok": True, "required": required,
                         "detail": detail or ""}
            except Exception as exc:  # noqa: BLE001
                entry = {"name": name, "ok": False, "required": required,
                         "detail": f"{type(exc).__name__}: {exc}"}
            RESULTS.append(entry)
            return entry

        run.probe = True
        return run

    return wrap


@check("python", required=True)
def _python():
    v = sys.version_info
    if v < (3, 10):
        raise RuntimeError(f"python >= 3.10 required, found {sys.version}")
    return f"{v.major}.{v.minor}.{v.micro}"


@check("jax", required=True)
def _jax():
    import jax

    return f"{jax.__version__}"


@check("jax cpu backend", required=True)
def _jax_cpu():
    # force a private CPU-only check without initializing the default
    # (possibly remote) accelerator in THIS process
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import jax.numpy as jnp;"
        "print((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr.strip().splitlines()[-1])
    return f"matmul ok ({out.stdout.strip()})"


@check("native smelter_io (FFmpeg)", required=True)
def _smelter_io():
    from smelter_tpu.io import codec

    lib = codec._load()  # builds via `make -C native` when stale
    vers = []
    for av in ("avcodec", "avformat", "avutil", "swscale", "swresample"):
        fn = getattr(lib, f"sm_{av}_version", None)
        if fn is not None:
            fn.restype = ctypes.c_uint32
            v = fn()
            vers.append(f"{av} {v >> 16}.{(v >> 8) & 0xFF}.{v & 0xFF}")
    if not vers:
        # fall back to linking check only
        return "loaded (no version exports)"
    return ", ".join(vers)


@check("h264 encode/decode roundtrip", required=True)
def _codec_roundtrip():
    import numpy as np

    from smelter_tpu.io.codec import Codec, VideoDecoder, VideoEncoder

    enc = VideoEncoder(Codec.H264, 64, 64, 30)
    y = np.full((64, 64), 128, np.uint8)
    u = v = np.full((32, 32), 128, np.uint8)
    pkts = []
    for i in range(3):
        enc.send(y, u, v, i / 30.0)
        while True:
            p = enc.receive()
            if p is None or p == "eof":
                break
            pkts.append(p)
    enc.send_eof()
    while True:
        p = enc.receive()
        if p is None or p == "eof":
            break
        pkts.append(p)
    extradata = enc.extradata()
    enc.close()
    dec = VideoDecoder(Codec.H264, extradata)
    n = 0
    for p in pkts:
        dec.send(p.data, p.pts_s)
        while True:
            f = dec.receive()
            if f is None or f == "eof":
                break
            n += 1
    dec.close()
    if not pkts:
        raise RuntimeError("x264 produced no packets")
    return f"{len(pkts)} pkts -> {n} frames"


@check("text shaping (raqm/freetype/harfbuzz)", required=True)
def _text():
    from PIL import features

    from smelter_tpu.render.text import shaping_active

    raqm = features.check("raqm")
    active = shaping_active()
    if not features.check("freetype2"):
        raise RuntimeError("PIL built without freetype2")
    return f"freetype2 ok, raqm={'yes' if raqm else 'no'}, shaping={active}"


@check("SVG rasterizer (librsvg+cairo)", required=False)
def _svg():
    for libname in ("rsvg-2", "rsvg-2.40"):
        path = ctypes.util.find_library(libname)
        if path:
            break
    else:
        raise RuntimeError("librsvg not found (SVG images will be rejected)")
    if not ctypes.util.find_library("cairo"):
        raise RuntimeError("cairo not found")
    return path


@check("cryptography (QUIC/TLS, DTLS-SRTP)", required=True)
def _crypto():
    import cryptography
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    AESGCM(b"\0" * 16).encrypt(b"\0" * 12, b"x", None)
    return cryptography.__version__


@check("pillow (image decode)", required=True)
def _pil():
    import PIL
    from PIL import features

    codecs = [c for c in ("jpg", "zlib") if features.check(c)]
    return f"{PIL.__version__} ({', '.join(codecs)})"


@check("node (TS SDK builds)", required=False)
def _node():
    node = shutil.which("node")
    if node is None:
        raise RuntimeError("node not installed (TS SDK cannot be compiled "
                           "here; published packages are unaffected)")
    out = subprocess.run([node, "--version"], capture_output=True, text=True)
    return out.stdout.strip()


@check("chromium (web renderer sidecar)", required=False)
def _chromium():
    for name in ("chromium", "chromium-browser", "google-chrome", "chrome"):
        path = shutil.which(name)
        if path:
            return path
    raise RuntimeError("no browser binary (web_view renders transparent; "
                       "set SMELTER_WEB_RENDERER_CDP_URL to attach one)")


@check("DeckLink SDK", required=False)
def _decklink():
    lib = ctypes.util.find_library("DeckLinkAPI")
    if lib is None:
        raise RuntimeError("vendor SDK absent (decklink inputs are env-gated)")
    return lib


@check("V4L2 devices", required=False)
def _v4l2():
    devs = sorted(Path("/dev").glob("video*"))
    if not devs:
        raise RuntimeError("no /dev/video* capture devices")
    return ", ".join(str(d) for d in devs)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--strict", action="store_true",
                    help="optional dependency failures also exit non-zero")
    args = ap.parse_args()

    probes = [v for v in globals().values()
              if callable(v) and getattr(v, "probe", False)]
    for p in probes:
        p()

    hard_fail = any(not r["ok"] and r["required"] for r in RESULTS)
    soft_fail = any(not r["ok"] and not r["required"] for r in RESULTS)

    if args.json:
        print(json.dumps({"ok": not hard_fail, "checks": RESULTS}, indent=2))
    else:
        width = max(len(r["name"]) for r in RESULTS)
        for r in RESULTS:
            mark = "ok " if r["ok"] else ("FAIL" if r["required"] else "skip")
            print(f"[{mark:>4}] {r['name']:<{width}}  {r['detail']}")
        if hard_fail:
            print("\nrequired dependencies are broken — see FAIL lines above")
        elif soft_fail:
            print("\noptional capabilities missing (env-gated paths stay off)")

    sys.exit(1 if (hard_fail or (args.strict and soft_fail)) else 0)


if __name__ == "__main__":
    main()
