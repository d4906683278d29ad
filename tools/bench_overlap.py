#!/usr/bin/env python
"""Host<->HBM transfer/compute overlap benchmark (SURVEY §2.3/§2.5).

The gpu-video equivalent's core requirement is that codec I/O overlaps
device compute (the reference's async mapped-buffer downloads,
`render_loop.rs:74,177-199`). This bench measures it directly on the
steady-state hot loop:

  decode (host, native FFmpeg) -> upload (host->HBM) -> compose (jit)
  -> download (HBM->host) -> encode (host, x264)

Two modes over identical work:
  serial:    block after every stage (upload, compute, download each
             synchronized) — the no-overlap baseline
  pipelined: JAX async dispatch + a depth-N in-flight window, so frame
             N's D2H overlaps frame N+1's upload/compute and the host
             decodes/encodes while the device runs

Prints one JSON line with both frame rates and the overlap speedup.
Run on a real TPU VM: JAX_PLATFORMS unset (default device). On the
tunneled dev chip the D2H RTT dominates; numbers still demonstrate
overlap but undersell steady-state throughput.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--inputs", type=int, default=4)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--depth", type=int, default=3,
                    help="in-flight frames in pipelined mode")
    ap.add_argument("--no-codec", action="store_true",
                    help="skip decode/encode (pure transfer+compute overlap)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from smelter_tpu.ops import color_convert as cc
    from smelter_tpu.ops.resample import resize_bilinear

    W, H, N = args.width, args.height, args.inputs
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}",
          file=sys.stderr)

    # compose: N YUV inputs -> RGBA -> 2x2-ish grid -> output YUV (the
    # flagship-style hot path, all in one jit)
    cols = int(np.ceil(np.sqrt(N)))
    rows = int(np.ceil(N / cols))
    tw, th = W // cols, H // rows

    @jax.jit
    def compose(ys, us, vs):
        tiles = []
        for i in range(N):
            rgba = cc.planar_yuv_to_rgba(ys[i], us[i], vs[i])
            tiles.append(resize_bilinear(rgba, th, tw))
        grid = jnp.zeros((H, W, 4), jnp.float32)
        for i, t in enumerate(tiles):
            r, c = divmod(i, cols)
            grid = grid.at[r * th : (r + 1) * th, c * tw : (c + 1) * tw].set(t)
        return cc.rgba_to_planar_yuv420(grid)

    rng = np.random.default_rng(0)
    host_y = [rng.integers(16, 235, (H, W), np.uint8) for _ in range(N)]
    host_u = [rng.integers(16, 240, (H // 2, W // 2), np.uint8) for _ in range(N)]
    host_v = [rng.integers(16, 240, (H // 2, W // 2), np.uint8) for _ in range(N)]

    # optional host codec stages
    enc = None
    if not args.no_codec:
        from smelter_tpu.io.codec import Codec, VideoEncoder

        enc = VideoEncoder(Codec.H264, W, H, 30)

    def upload():
        ys = jax.device_put(np.stack(host_y))
        us = jax.device_put(np.stack(host_u))
        vs = jax.device_put(np.stack(host_v))
        return ys, us, vs

    def encode(y, u, v, i):
        if enc is not None:
            enc.send(np.asarray(y), np.asarray(u), np.asarray(v), i / 30.0)
            while True:
                p = enc.receive()
                if p is None or p == "eof":
                    break

    # warm up the compiled program + transfer paths
    ys, us, vs = upload()
    out = compose(ys, us, vs)
    jax.block_until_ready(out)
    oy = np.asarray(out[0])

    # --- serial: force every stage to complete before the next starts
    t0 = time.monotonic()
    for i in range(args.frames):
        ys, us, vs = upload()
        jax.block_until_ready(ys)
        out = compose(ys, us, vs)
        jax.block_until_ready(out)
        oy, ou, ov = (np.asarray(out[0]), np.asarray(out[1]),
                      np.asarray(out[2]))
        encode(oy, ou, ov, i)
    serial_s = time.monotonic() - t0

    def start_d2h(out):
        """Kick off the HBM->host copy without blocking (the reference's
        async mapped-buffer download, render_loop.rs:177-199)."""
        for plane in out:
            try:
                plane.copy_to_host_async()
            except AttributeError:
                break
        return out

    # --- pipelined: async dispatch, depth-N in-flight window
    t0 = time.monotonic()
    inflight: deque = deque()
    done = 0
    for i in range(args.frames):
        ys, us, vs = upload()             # async H2D
        inflight.append(start_d2h(compose(ys, us, vs)))  # async compute+D2H
        if len(inflight) >= args.depth:
            out = inflight.popleft()
            oy, ou, ov = (np.asarray(out[0]), np.asarray(out[1]),
                          np.asarray(out[2]))  # D2H for the OLDEST frame
            encode(oy, ou, ov, done)
            done += 1
    while inflight:
        out = inflight.popleft()
        oy, ou, ov = np.asarray(out[0]), np.asarray(out[1]), np.asarray(out[2])
        encode(oy, ou, ov, done)
        done += 1
    pipe_s = time.monotonic() - t0

    serial_fps = args.frames / serial_s
    pipe_fps = args.frames / pipe_s
    print(json.dumps({
        "metric": "overlap_speedup",
        "value": round(pipe_fps / serial_fps, 3),
        "unit": "x",
        "serial_fps": round(serial_fps, 2),
        "pipelined_fps": round(pipe_fps, 2),
        "inputs": N,
        "resolution": f"{W}x{H}",
        "depth": args.depth,
        "codec_stages": not args.no_codec,
        "device": dev.platform,
    }))


if __name__ == "__main__":
    main()
