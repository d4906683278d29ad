"""A/B/C/D device measurement of the late-round-4 compose rework.

VERDICT r4 item 1: the strip-banding planner (`ops/compose.py:_plan_bands`)
and the batched deferred-YUV tile prefetch (`_prefetch_tiles`) landed
device-unvalidated (TPU outage) and the one BENCH_r04 datapoint (general_4k
p95 5.303 ms) is ~1 ms WORSE than the 4.31 ms committed before them. This
tool answers keep-or-revert with interleaved same-session trials:

  final   — banding ON,  tile batching ON   (shipped round-4 code)
  noband  — banding OFF, tile batching ON
  nobatch — banding ON,  tile batching OFF
  none    — banding OFF, tile batching OFF  (pre-rework behavior)

Both knobs act at TRACE time (banding picks the program structure, the
prefetch builds the batched einsums), so each variant is traced once under
a monkeypatch and then all four compiled programs are measured in
interleaved rounds — box drift hits every variant equally. Device times
come off the jax.profiler "XLA Modules" track (tunnel RTT excluded),
the same measurement bench.py's headline uses.
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

CONFIGS = [
    ("final", True, True),
    ("noband", False, True),
    ("nobatch", True, False),
    ("none", False, False),
]


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

    orig_bands, orig_prefetch = compose._plan_bands, compose._prefetch_tiles
    jfns = {}
    for tag, band, batch in CONFIGS:
        compose._plan_bands = orig_bands if band else (lambda groups, h: None)
        compose._prefetch_tiles = (
            orig_prefetch if batch else (lambda items, sources: {})
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
            compose._plan_bands, compose._prefetch_tiles = (
                orig_bands, orig_prefetch,
            )

    durs: dict = {tag: [] for tag, _, _ in CONFIGS}
    for r in range(ROUNDS):
        for tag, _, _ in CONFIGS:
            got = bench._profiled_device_ms(
                run=lambda i, jfn=jfns[tag]: jfn(*dev[i % 2]),
                sync=sync,
                iters=ITERS,
                fn_name=f"g4k_{tag}",
            )
            if got:
                durs[tag].extend(got)

    out = {"metric": "general_4k_banding_ab", "device": str(jax.devices()[0]),
           "rounds": ROUNDS, "iters_per_round": ITERS, "variants": {}}
    for tag, band, batch in CONFIGS:
        d = sorted(durs[tag])
        if not d:
            out["variants"][tag] = {"error": "no device trace"}
            continue
        out["variants"][tag] = {
            "banding": band, "tile_batch": batch,
            "device_p50_ms": round(statistics.median(d), 3),
            "device_p95_ms": round(d[max(0, int(len(d) * 0.95) - 1)], 3),
            "frames": len(d),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
