"""Benchmark: flagship compose on one TPU chip.

BASELINE.json north star: 16x1080p YUV inputs -> tiled 4K60 YUV420 output,
real time (60 fps) with p95 per-frame compose latency < 8 ms.

Prints ONE JSON line:
  {"metric": "...", "value": fps, "unit": "fps", "vs_baseline": fps/60, ...}

Two measurement families, both steady-state after compilation:
  - compute-only (inputs pre-uploaded): device compose latency/throughput
  - live ingest (ingest_*): FRESH host bytes device_put every frame —
    ~47 MB/frame host->HBM — overlapped with compose through a depth-3
    in-flight window (the north star's actual decode->upload->compose shape)
"""

import glob
import gzip
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

# persistent XLA cache: repeated bench runs skip the per-structure compile
os.environ.setdefault("SMELTER_XLA_CACHE_DIR", "/tmp/smelter_xla_cache")

import jax
import jax.numpy as jnp
import numpy as np

from smelter_tpu.config import apply_compile_cache

apply_compile_cache()

N_INPUTS = 16
IN_W, IN_H = 1920, 1080
OUT_W, OUT_H = 3840, 2160
WARMUP = 5
ITERS = 60


def _profiled_device_ms(run, sync, iters: int, fn_name: str):
    """True per-frame device latency: execute `run(i)` iters times under a
    jax.profiler trace and read per-invocation durations of the XLA module
    off the device's "XLA Modules" track. This is wall-independent device
    time — tunnel RTT and host dispatch never enter it."""
    tracedir = tempfile.mkdtemp(prefix="smelter_bench_trace_")
    try:
        with jax.profiler.trace(tracedir):
            out = None
            for i in range(iters):
                out = run(i)
            sync(out)
        files = glob.glob(
            os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True
        )
        if not files:
            return None
        events = json.loads(gzip.open(files[0]).read())["traceEvents"]
        device_pids = {
            e["pid"]
            for e in events
            if e.get("ph") == "M"
            and e.get("name") == "process_name"
            and "TPU" in e.get("args", {}).get("name", "")
        }
        module_tids = {
            (e["pid"], e["tid"])
            for e in events
            if e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e.get("args", {}).get("name") == "XLA Modules"
            and e["pid"] in device_pids
        }
        if not module_tids:  # cpu fallback: any "XLA Modules" track
            module_tids = {
                (e["pid"], e["tid"])
                for e in events
                if e.get("ph") == "M"
                and e.get("name") == "thread_name"
                and e.get("args", {}).get("name") == "XLA Modules"
            }
        durs = [
            e["dur"] / 1000.0
            for e in events
            if e.get("ph") == "X"
            and (e.get("pid"), e.get("tid")) in module_tids
            and str(e.get("name", "")).startswith(f"jit_{fn_name}(")
        ]
        return sorted(durs) if durs else None
    finally:
        shutil.rmtree(tracedir, ignore_errors=True)


def main() -> None:
    # if the accelerator backend is unreachable (remote-tunnel outage), fall
    # back to the CPU backend and SAY SO in the JSON rather than crashing
    # with no output at all — a fallback line is attributable, a traceback
    # is not. CPU numbers are NOT comparable to the TPU headline.
    global ITERS, WARMUP
    backend_error = None
    try:
        jax.devices()
    except RuntimeError as exc:
        backend_error = str(exc).split("\n")[0]
        jax.config.update("jax_platforms", "cpu")
        ITERS, WARMUP = 6, 1  # CPU fallback: keep the run bounded
        print(json.dumps({
            "warning": "accelerator backend unavailable; running the bench "
                       "on the CPU backend (numbers NOT comparable)",
            "backend_error": backend_error,
        }), file=sys.stderr)

    from smelter_tpu.core.types import Resolution
    from smelter_tpu.parallel.flagship import make_flagship_compose

    fn, _ = make_flagship_compose(
        n_inputs=N_INPUTS,
        in_res=Resolution(IN_W, IN_H),
        out_res=Resolution(OUT_W, OUT_H),
    )
    jfn = jax.jit(fn)

    rng = np.random.RandomState(0)
    # two host-side frame variants to alternate (avoids device-side caching)
    host_frames = []
    for k in range(2):
        y = rng.randint(16, 235, (N_INPUTS, IN_H, IN_W), dtype=np.uint8)
        u = rng.randint(16, 240, (N_INPUTS, IN_H // 2, IN_W // 2), dtype=np.uint8)
        v = rng.randint(16, 240, (N_INPUTS, IN_H // 2, IN_W // 2), dtype=np.uint8)
        host_frames.append((y, u, v))
    # pre-upload both variants; the compose benchmark measures device time
    # (host->HBM upload overlap is the C++ IO service's job, benched separately)
    dev_frames = [jax.device_put(f) for f in host_frames]

    # jitted scalar checksum: cheap true-completion sync (a large-array
    # device->host fetch triggers a pathological eager layout-conversion
    # compile on tunneled platforms; block_until_ready alone can return
    # early there)
    jsum = jax.jit(lambda t: jnp.sum(t[0].astype(jnp.int32)))

    def sync(o) -> int:
        return int(np.asarray(jsum(o)))

    for i in range(WARMUP):
        out = jfn(*dev_frames[i % 2])
    sync(out)

    # blocked per-frame timing (true latency on local devices; on tunneled
    # devices the dispatch RTT dominates and amortized timing is used below)
    lat = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        out = jfn(*dev_frames[i % 2])
        jax.block_until_ready(out)
        lat.append(time.perf_counter() - t0)

    # pipelined amortized timing — upper bound on device compute per frame
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = jfn(*dev_frames[i % 2])
    sync(out)
    pipe_ms = (time.perf_counter() - t0) / ITERS * 1000.0

    lat_ms = sorted(x * 1000.0 for x in lat)
    p50 = statistics.median(lat_ms)
    p95 = lat_ms[int(len(lat_ms) * 0.95) - 1]
    if p50 < pipe_ms:
        # block_until_ready returned early (async tunnel) — use amortized
        p50 = pipe_ms
        p95 = max(p95, pipe_ms)
    throughput_fps = 1000.0 / pipe_ms

    # True per-frame device latency from a profiler trace (BASELINE.md's
    # p95 < 8 ms target is a device-latency bound; the blocked numbers above
    # are dominated by tunnel RTT on remote devices).
    device_durs = _profiled_device_ms(
        run=lambda i: jfn(*dev_frames[i % 2]),
        sync=sync,
        iters=ITERS,
        fn_name=fn.__name__,
    )

    # multi-frame batching: vmap B frames into one dispatch, amortizing
    # per-dispatch overhead (amortized_ms ~1.6 vs device ~1.0 per frame
    # shows ~0.6 ms dispatch cost; batching buys it back)
    B = 4
    bjfn = jax.jit(jax.vmap(fn))
    dev_batches = [
        jax.device_put(tuple(np.stack([p] * B) for p in f)) for f in host_frames
    ]
    bout = bjfn(*dev_batches[0])
    sync((bout[0],))
    t0 = time.perf_counter()
    n_disp = max(ITERS // B, 8)
    for i in range(n_disp):
        bout = bjfn(*dev_batches[i % 2])
    sync((bout[0],))
    batched_ms = (time.perf_counter() - t0) / (n_disp * B) * 1000.0
    batched_fps = 1000.0 / batched_ms

    # -- live ingest: fresh host bytes EVERY frame ---------------------------
    # The north star's actual shape: per-frame host->HBM upload of all 16
    # inputs overlapped with compose (tools/bench_overlap.py pattern,
    # depth-3 in-flight window). device_put of a numpy array always
    # transfers, so every frame really moves ~47 MB to the device.
    from collections import deque

    DEPTH = 3
    # blocked mode first: upload + compose + sync per frame (latency bound)
    ingest_lat = []
    for i in range(min(ITERS, 8)):
        t0 = time.perf_counter()
        dev = jax.device_put(host_frames[i % 2])
        out = jfn(*dev)
        sync(out)
        ingest_lat.append(time.perf_counter() - t0)
    ingest_lat_ms = sorted(x * 1000.0 for x in ingest_lat)
    ingest_p50 = statistics.median(ingest_lat_ms)
    ingest_p95 = ingest_lat_ms[int(len(ingest_lat_ms) * 0.95) - 1]

    # pipelined mode: bounded in-flight window, uploads overlap compute
    inflight: deque = deque()
    n_ingest = max(8, ITERS // 4)
    t0 = time.perf_counter()
    for i in range(n_ingest):
        dev = jax.device_put(host_frames[i % 2])
        out = jfn(*dev)
        inflight.append(out)
        if len(inflight) > DEPTH:
            jax.block_until_ready(inflight.popleft())
    sync(out)
    ingest_ms = (time.perf_counter() - t0) / n_ingest * 1000.0
    ingest_fps = 1000.0 / ingest_ms
    if ingest_p50 < ingest_ms:  # async tunnel: blocked returns early
        ingest_p50 = ingest_ms
        ingest_p95 = max(ingest_p95, ingest_ms)

    # host->device link bandwidth, so the ingest numbers are attributable:
    # on a TPU VM the PCIe link sustains GB/s and ingest adds ~1 ms; on the
    # tunneled dev chip the link is the bottleneck, not the design.
    frame_bytes = sum(p.nbytes for p in host_frames[0])
    t0 = time.perf_counter()
    for i in range(4):
        jax.block_until_ready(jax.device_put(host_frames[i % 2]))
    link_mbps = (4 * frame_bytes / (time.perf_counter() - t0)) / 1e6

    # -- general (non-grid) 4K flagship: rotation + radius + shadows ---------
    # same 16x1080p -> 4K shape through compose_layouts' fast paths (the
    # reference runs these scenes through the same one-pass layout shader it
    # uses for grids, apply_layouts.wgsl:258-377 — so must we); headline:
    # device p95 < 8 ms
    from smelter_tpu.parallel.flagship import make_flagship_general_compose

    gfn, _ = make_flagship_general_compose(
        n_inputs=N_INPUTS,
        in_res=Resolution(IN_W, IN_H),
        out_res=Resolution(OUT_W, OUT_H),
    )
    gjfn = jax.jit(gfn)
    gout = gjfn(*dev_frames[0])
    sync(gout)
    general_durs = _profiled_device_ms(
        run=lambda i: gjfn(*dev_frames[i % 2]),
        sync=sync,
        iters=ITERS,
        fn_name=gfn.__name__,
    )
    t0 = time.perf_counter()
    for i in range(ITERS):
        gout = gjfn(*dev_frames[i % 2])
    sync(gout)
    general_amortized_ms = (time.perf_counter() - t0) / ITERS * 1000.0

    fps = max(throughput_fps, batched_fps)
    # HEADLINE latency = device_p50/p95_ms (profiler-measured on-device
    # time, what BASELINE.md's "p95 < 8 ms" bounds). dispatch_* are
    # host-observed blocked round-trips — on a tunneled dev chip they are
    # dominated by tunnel RTT, not compute; do not read them as latency.
    result = {
        "metric": "compose_fps_16x1080p_to_4k_1chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
        "baseline": "60 fps real-time bar (BASELINE.md north star: "
                    "16x1080p -> 4K60, device p95 < 8 ms)",
        "device_latency_budget_ms": 8.0,
        "dispatch_p50_ms": round(p50, 3),
        "dispatch_p95_ms": round(p95, 3),
        "amortized_ms_per_frame": round(pipe_ms, 3),
        "throughput_fps": round(throughput_fps, 2),
        "batched4_ms_per_frame": round(batched_ms, 3),
        "batched4_throughput_fps": round(batched_fps, 2),
        "ingest_ms_per_frame": round(ingest_ms, 3),
        "ingest_fps": round(ingest_fps, 2),
        "ingest_dispatch_p50_ms": round(ingest_p50, 3),
        "ingest_dispatch_p95_ms": round(ingest_p95, 3),
        "ingest_frame_mb": round(frame_bytes / 1e6, 1),
        "host_link_MBps": round(link_mbps, 1),
        "n_inputs": N_INPUTS,
        "device": str(jax.devices()[0]),
    }
    if backend_error is not None:
        result["backend_fallback"] = backend_error
    if device_durs:
        result["device_p50_ms"] = round(statistics.median(device_durs), 3)
        result["device_p95_ms"] = round(
            device_durs[max(0, int(len(device_durs) * 0.95) - 1)], 3
        )
        result["device_frames_profiled"] = len(device_durs)
    general = {
        "scene": "16x1080p -> 4K rounded+bordered+shadowed grid, 2 rotated",
        "amortized_ms_per_frame": round(general_amortized_ms, 3),
    }
    if general_durs:
        general["device_p50_ms"] = round(statistics.median(general_durs), 3)
        general["device_p95_ms"] = round(
            general_durs[max(0, int(len(general_durs) * 0.95) - 1)], 3
        )
    result["general_4k"] = general
    print(json.dumps(result))


if __name__ == "__main__":
    main()
