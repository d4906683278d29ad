"""A/B device measurement of tile-aligned group unions (round 5).

The round-5 per-op profile of the general 4K flagship scene
(bench_artifacts/general_ops.txt) shows ~1.3 ms/frame across 16
dynamic-update-slice group writes — ~4x the pure-bandwidth cost of the
regions written. The tile origins (x = 30, 990, 1950, ... from the
30 px grid margins) are lane-misaligned, so every DUS boundary tile pays
a read-modify-write. `ops/compose.py:_align_union` expands each group's
union to (8, 128) boundaries before assembly — exact (member
contributions are zero outside their footprint) and turns every group
write into an aligned slice update.

Two variants, traced under a monkeypatch (alignment acts at trace time),
measured in interleaved same-session rounds so box drift hits both
equally; device times come off the jax.profiler "XLA Modules" track.

  aligned   — _align_union active (shipped round-5 code)
  unaligned — unions kept at their exact clipped bounds (round-4 behavior)
"""

from __future__ import annotations

import json
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
from smelter_tpu.ops import compose
from smelter_tpu.parallel.flagship import make_flagship_general_compose

N_INPUTS = 16
IN_RES = Resolution(1920, 1080)
OUT_RES = Resolution(3840, 2160)
ROUNDS = 3
ITERS = 20

CONFIGS = [("aligned", True), ("unaligned", False)]


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

    orig_align = compose._align_union
    jfns = {}
    for tag, aligned in CONFIGS:
        compose._align_union = orig_align if aligned else (
            lambda reg, h, w: reg
        )
        try:
            fn, _ = make_flagship_general_compose(
                n_inputs=N_INPUTS, in_res=IN_RES, out_res=OUT_RES
            )
            fn.__name__ = f"g4k_{tag}"
            jfn = jax.jit(fn)
            t0 = time.perf_counter()
            sync(jfn(*dev[0]))  # trace+compile happens here, under the patch
            print(json.dumps({"variant": tag,
                              "compile_s": round(time.perf_counter() - t0, 1)}),
                  file=sys.stderr)
            jfns[tag] = jfn
        finally:
            compose._align_union = orig_align

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

    out = {"metric": "general_4k_align_ab", "device": str(jax.devices()[0]),
           "rounds": ROUNDS, "iters_per_round": ITERS, "variants": {}}
    for tag, aligned in CONFIGS:
        d = sorted(durs[tag])
        if not d:
            out["variants"][tag] = {"error": "no device trace"}
            continue
        out["variants"][tag] = {
            "aligned": aligned,
            "device_p50_ms": round(statistics.median(d), 3),
            "device_p95_ms": round(d[max(0, int(len(d) * 0.95) - 1)], 3),
            "frames": len(d),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
