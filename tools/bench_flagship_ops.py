#!/usr/bin/env python
"""Per-op device breakdown of the flagship compose program (bench.py's
metric), read off the jax.profiler "XLA Ops" track. Prints total device
time per frame and the top ops — the tool that found the concat-assembly
win in r2 and the chroma/reshape win in r3, pointed at the flagship.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
from collections import defaultdict

os.environ.setdefault("SMELTER_XLA_CACHE_DIR", "/tmp/smelter_xla_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from smelter_tpu.core.types import Resolution
    from smelter_tpu.parallel.flagship import (
        make_flagship_compose,
        make_flagship_general_compose,
    )

    argv = [a for a in sys.argv[1:] if a != "--general"]
    general = "--general" in sys.argv[1:]
    n = int(argv[0]) if argv else 16
    make = make_flagship_general_compose if general else make_flagship_compose
    fn, _ = make(
        n_inputs=n, in_res=Resolution(1920, 1080), out_res=Resolution(3840, 2160)
    )
    jfn = jax.jit(fn)
    rng = np.random.RandomState(0)
    frames = [
        (
            jnp.asarray(rng.randint(16, 235, (n, 1080, 1920), np.uint8)),
            jnp.asarray(rng.randint(16, 240, (n, 540, 960), np.uint8)),
            jnp.asarray(rng.randint(16, 240, (n, 540, 960), np.uint8)),
        )
        for _ in range(2)
    ]
    jsum = jax.jit(lambda t: jnp.sum(t[0].astype(jnp.int32)))
    out = jfn(*frames[0])
    int(np.asarray(jsum(out)))

    iters = 40
    tracedir = tempfile.mkdtemp(prefix="flagship_ops_")
    try:
        with jax.profiler.trace(tracedir):
            for i in range(iters):
                out = jfn(*frames[i % 2])
            int(np.asarray(jsum(out)))
        files = glob.glob(
            os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True
        )
        events = json.loads(gzip.open(files[0]).read())["traceEvents"]
        device_pids = {
            e["pid"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in e.get("args", {}).get("name", "")
        }

        def track(name):
            return {
                (e["pid"], e["tid"]) for e in events
                if e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("args", {}).get("name") == name
                and e["pid"] in device_pids
            }

        mod_tids, op_tids = track("XLA Modules"), track("XLA Ops")
        durs = sorted(
            e["dur"] / 1000.0 for e in events
            if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in mod_tids
            and str(e.get("name", "")).startswith("jit_")
        )
        totals = defaultdict(float)
        for e in events:
            if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
                totals[e["name"]] += e["dur"] / 1000.0
        print(json.dumps({
            "program": "general_4k" if general else "flagship_grid",
            "device_p50_ms": round(durs[len(durs) // 2], 3) if durs else None,
            "frames": len(durs),
            "top_ops_ms_per_frame": [
                [name, round(total / max(len(durs), 1), 4)]
                for name, total in sorted(totals.items(), key=lambda kv: -kv[1])[:32]
            ],
        }))
    finally:
        shutil.rmtree(tracedir, ignore_errors=True)


if __name__ == "__main__":
    main()
