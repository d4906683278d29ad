"""A/B device measurement of the single-pass Pallas scene-assembly kernel
(round 5, ops/pallas/scene_assembly.py) vs the XLA group-assembly path.

The post-alignment per-op profile of the general 4K flagship scene (3.14 ms
device p50) has no dominant op: ~0.7 ms sits in the output YUV conversion
chain and ~1.6 ms is spread across ~200 small per-group fusions — the canvas
slice reads, SDF/blend chains, pads and aligned slice writes of the 16
coalesced groups. The assembly kernel collapses all of that into ONE pass
that creates the canvas (each block written exactly once, content windows
DMA'd only for the blocks they intersect).

Both variants are traced under the SMELTER_SCENE_ASSEMBLY env switch
(checked at trace time), then measured in interleaved same-session rounds so
box drift hits both equally; device times come off the jax.profiler
"XLA Modules" track. A per-pixel parity check (max |diff| over the YUV
outputs) runs BEFORE timing — a perf number for a wrong image is worthless.

  kernel — SMELTER_SCENE_ASSEMBLY=on  (Pallas single-pass assembly)
  groups — SMELTER_SCENE_ASSEMBLY=off (XLA coalesced groups, r5 aligned)
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

CONFIGS = [
    # (tag, env overrides at trace time)
    ("kernel_yuv", {"SMELTER_SCENE_ASSEMBLY": "on", "SMELTER_FUSED_YUV": "on"}),
    ("kernel", {"SMELTER_SCENE_ASSEMBLY": "on", "SMELTER_FUSED_YUV": "off"}),
    ("groups", {"SMELTER_SCENE_ASSEMBLY": "off", "SMELTER_FUSED_YUV": "off"}),
]
BASELINE_TAG = "groups"


def main() -> None:
    import numpy as np

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

    # parity gate: per-pixel compare of every variant's u8 YUV outputs
    # against the baseline (<= 1 LSB, the golden-snapshot tolerance)
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
    if any(p["max"] > 1 for t in parity.values() for p in t.values()):
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

    out = {"metric": "general_4k_assembly_ab",
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
