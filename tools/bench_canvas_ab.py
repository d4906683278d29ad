"""A/B device measurement of 16-bit planar compose canvases vs f32
(SMELTER_CANVAS_DTYPE, ops/compose.py:_canvas_dtype).

After the round-5 assembly kernel + fused YUV output, the general 4K
profile (2.64 ms device p50) is traffic-dominated: the (4, H, W) f32
canvas is 132 MB, and every remaining chunk moves it — the assembly
kernel writes it once (0.31 ms), the 16 texture group chains read+write
their aligned union regions (~0.45 ms total), and the fused YUV kernel
re-reads 3 of 4 planes (0.18 ms). Storing the canvas in 16 bits halves
all of that traffic while keeping every blend in f32 (layers are f32, so
`layer OVER canvas` promotes; only the stored value quantizes).

Precision: canvas values are premultiplied [0, 1]. f16 spacing at the
top of that range is 2^-11 ~= 0.125 u8 LSB — two stores (assembly write
+ one group blend) stay far inside the 1-LSB snapshot tolerance. bf16
(2^-9 ~= 0.5 LSB/store) does NOT survive the same gate: the first device
run measured max-2-LSB chroma deviations on ~0.002% of pixels (blend
edges where both quantized stores feed the 2x2 chroma pool), so bf16 is
kept only as a measured variant, never routed. The parity gate below
enforces <= 1 u8 LSB per pixel for the SHIPPED variant (f16) against the
f32 canvas on the same device BEFORE any timing.

  f16  — SMELTER_CANVAS_DTYPE=float16  (shipped: auto routes here on TPU)
  bf16 — SMELTER_CANVAS_DTYPE=bfloat16 (measured for the record)
  f32  — SMELTER_CANVAS_DTYPE=float32  (reference)

All variants keep the round-5 defaults (Pallas assembly + fused YUV on
TPU) and are measured in interleaved same-session rounds so box drift
hits both equally.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from smelter_tpu.config import apply_compile_cache

apply_compile_cache()

import bench  # repo-root bench.py: _profiled_device_ms
from smelter_tpu.core.types import Resolution
from smelter_tpu.parallel.flagship import make_flagship_general_compose

N_INPUTS = 16
IN_RES = Resolution(1920, 1080)
OUT_RES = Resolution(3840, 2160)
ROUNDS = 3
ITERS = 20

ALL_CONFIGS = {
    # tag -> env overrides at trace time
    "u16": {"SMELTER_CANVAS_DTYPE": "uint16"},
    "f16": {"SMELTER_CANVAS_DTYPE": "float16"},
    "bf16": {"SMELTER_CANVAS_DTYPE": "bfloat16"},
    "f32": {"SMELTER_CANVAS_DTYPE": "float32"},
}
# default: the shipped variant (u16 fixed-point) vs the f32 reference;
# --variants a,b,c and --gate x,y override for exploratory runs
CONFIGS = [("u16", ALL_CONFIGS["u16"]), ("f32", ALL_CONFIGS["f32"])]
BASELINE_TAG = "f32"
GATED_TAGS = ("u16",)


def main() -> None:
    import argparse

    import numpy as np

    global CONFIGS, GATED_TAGS
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=None,
                    help="comma list from: " + ",".join(ALL_CONFIGS))
    ap.add_argument("--gate", default=None,
                    help="comma list of variants that must pass <=1 LSB")
    args = ap.parse_args()
    if args.variants:
        CONFIGS = [(t, ALL_CONFIGS[t]) for t in args.variants.split(",")]
    if args.gate is not None:
        GATED_TAGS = tuple(t for t in args.gate.split(",") if t)

    rng = np.random.default_rng(7)
    host = []
    for _ in range(2):
        y = rng.integers(16, 235, (N_INPUTS, IN_RES.height, IN_RES.width),
                         dtype=np.uint8)
        u = rng.integers(16, 240, (N_INPUTS, IN_RES.height // 2,
                                   IN_RES.width // 2), dtype=np.uint8)
        v = rng.integers(16, 240, (N_INPUTS, IN_RES.height // 2,
                                   IN_RES.width // 2), dtype=np.uint8)
        host.append((y, u, v))
    dev = [tuple(jax.device_put(p) for p in f) for f in host]

    def sync(out):
        jax.block_until_ready(out)

    jfns = {}
    for tag, env in CONFIGS:
        os.environ.update(env)
        try:
            fn, _ = make_flagship_general_compose(
                n_inputs=N_INPUTS, in_res=IN_RES, out_res=OUT_RES
            )
            fn.__name__ = f"g4k_{tag}"
            jfn = jax.jit(fn)
            t0 = time.perf_counter()
            sync(jfn(*dev[0]))  # trace+compile happens here, under the env
            print(json.dumps({"variant": tag,
                              "compile_s": round(time.perf_counter() - t0, 1)}),
                  file=sys.stderr)
            jfns[tag] = jfn
        finally:
            for k in env:
                os.environ.pop(k, None)

    # parity gate: per-pixel compare of the u8 YUV outputs against the f32
    # canvas (<= 1 LSB, the golden-snapshot tolerance)
    parity = {}
    outs = {tag: jfns[tag](*dev[0]) for tag, _ in CONFIGS}
    for tag, _ in CONFIGS:
        if tag == BASELINE_TAG:
            continue
        parity[tag] = {}
        for plane, a, b in zip("yuv", outs[tag], outs[BASELINE_TAG]):
            d = np.abs(np.asarray(a).astype(np.int32)
                       - np.asarray(b).astype(np.int32))
            parity[tag][plane] = {"max": int(d.max()),
                                  "pct_gt1": float((d > 1).mean())}
    print(json.dumps({"parity": parity}), file=sys.stderr)
    if any(p["max"] > 1 for t in GATED_TAGS for p in parity[t].values()):
        print(json.dumps({"error": "parity FAILED", "parity": parity}))
        sys.exit(1)

    durs: dict = {tag: [] for tag, _ in CONFIGS}
    for _ in range(ROUNDS):
        for tag, _ in CONFIGS:
            got = bench._profiled_device_ms(
                run=lambda i, jfn=jfns[tag]: jfn(*dev[i % 2]),
                sync=sync,
                iters=ITERS,
                fn_name=f"g4k_{tag}",
            )
            if got:
                durs[tag].extend(got)

    out = {"metric": "general_4k_canvas_dtype_ab",
           "device": str(jax.devices()[0]),
           "rounds": ROUNDS, "iters_per_round": ITERS,
           "parity": parity, "variants": {}}
    for tag, env in CONFIGS:
        d = sorted(durs[tag])
        if not d:
            out["variants"][tag] = {"error": "no device trace"}
            continue
        out["variants"][tag] = {
            "env": env,
            "device_p50_ms": round(statistics.median(d), 3),
            "device_p95_ms": round(d[max(0, int(len(d) * 0.95) - 1)], 3),
            "frames": len(d),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
