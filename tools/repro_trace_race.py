"""Minimal repro driver for the concurrent-trace corruption (docs/TRACE_RACE.md).

Recreates, WITHOUT render/program.py's `_TRACE_LOCK`, the exact thread
topology the live pipeline had when the corruption was observed:

  - N_TRACERS threads each tracing+compiling a FRESH jitted program per
    round (fresh callables -> no cache hits, real tracing every time).
    The traced body is the barrel-shifter rotation + region compose chain
    (the op family the original shape corruption hit) with per-round
    shape/angle variation.
  - one EXECUTOR thread hammering an already-compiled jitted program and
    checksum-verifying every result against the known value (catches
    silent wrong-answer corruption, not just raised tracer errors).

Failure modes watched for (both observed in round-2/3 live soaks,
pre-`_TRACE_LOCK`):
  1. trace-time exceptions: `KeyError: Var(...)` (leaked tracer),
     shape-mismatch errors inside banded slicing;
  2. wrong numerics from the EXECUTING program while a trace runs.

Usage:  JAX_PLATFORMS=cpu python tools/repro_trace_race.py [rounds]
Prints one JSON line: rounds run, trace errors (with class counts),
checksum mismatches. Exit code 1 if anything reproduced.
"""

from __future__ import annotations

import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from smelter_tpu.ops.rotate import rotate_static_cm, rotated_bbox

N_TRACERS = 2
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 120

SHAPES = [(48, 64), (56, 72), (40, 96), (64, 48), (72, 56)]
ANGLES = [17.0, 29.5, -23.0, 41.0, -8.5, 63.0]


def _make_traced_fn(round_i: int, tracer_i: int):
    """A fresh callable per round (never cached) running the rotation +
    compose chain that the corrupted live programs contained."""
    h, w = SHAPES[(round_i + tracer_i) % len(SHAPES)]
    theta = ANGLES[(round_i * N_TRACERS + tracer_i) % len(ANGLES)]
    bh, bw = rotated_bbox(theta, h, w)

    def fn(tile):
        r = rotate_static_cm(tile, theta, bh, bw)
        # region OVER-blend onto a canvas, like _blend_group
        canvas = jnp.zeros((4, 128, 128), jnp.float32)
        acc = canvas[:, :bh, :bw]
        acc = r + acc * (1.0 - r[3:4])
        return canvas.at[:, :bh, :bw].set(acc).sum()

    fn.__name__ = f"traced_r{round_i}_t{tracer_i}"
    return jax.jit(fn), np.random.default_rng(round_i).random(
        (4, h, w), np.float32
    )


def main() -> None:
    errors: list[str] = []
    mismatches = [0]
    stop = threading.Event()

    # the executing program: compiled once, result pinned
    x = np.linspace(0.0, 1.0, 4 * 64 * 64, dtype=np.float32).reshape(4, 64, 64)
    exec_fn = jax.jit(
        lambda t: (rotate_static_cm(t, 33.0, *rotated_bbox(33.0, 64, 64))
                   * 2.0).sum()
    )
    expected = float(jax.block_until_ready(exec_fn(x)))

    def executor() -> None:
        while not stop.is_set():
            got = float(jax.block_until_ready(exec_fn(x)))
            if got != expected:
                mismatches[0] += 1

    def tracer(round_i: int, tracer_i: int) -> None:
        try:
            jfn, tile = _make_traced_fn(round_i, tracer_i)
            jax.block_until_ready(jfn(tile))
        except Exception as e:  # noqa: BLE001 - the whole point
            errors.append(f"{type(e).__name__}: {e}")

    ex = threading.Thread(target=executor, daemon=True)
    ex.start()
    t0 = time.monotonic()
    for r in range(ROUNDS):
        threads = [
            threading.Thread(target=tracer, args=(r, i), daemon=True)
            for i in range(N_TRACERS)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors or mismatches[0]:
            break
    stop.set()
    ex.join(timeout=10)

    from collections import Counter

    classes = Counter(e.split(":")[0] for e in errors)
    print(json.dumps({
        "jax": jax.__version__,
        "rounds": r + 1,
        "elapsed_s": round(time.monotonic() - t0, 1),
        "trace_errors": len(errors),
        "error_classes": dict(classes),
        "first_error": errors[0][:300] if errors else None,
        "checksum_mismatches": mismatches[0],
    }))
    sys.exit(1 if (errors or mismatches[0]) else 0)


if __name__ == "__main__":
    main()
