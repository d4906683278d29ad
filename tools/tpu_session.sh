#!/bin/bash
# One-shot TPU measurement session, in watch-item order (NEXT_ROUND.md):
# the offline flagship e2e FIRST (longest, most fragile), then the flagship
# bench, then the device-time scene/op benches. Run on an otherwise-idle
# box; never kill a TPU-attached process mid-run (claim wedge).
set -u -o pipefail
cd "$(dirname "$0")/.."
# stop at the FIRST failing step: continuing against a possibly-wedged TPU
# claim is exactly the process churn the claim-wedge watch item forbids
step() { "$@" || { echo "STEP FAILED ($*) — stopping the session"; exit 1; }; }
export SMELTER_XLA_CACHE_DIR=${SMELTER_XLA_CACHE_DIR:-/tmp/smelter_xla_cache}
export OUT=${1:-/tmp/tpu_session}
mkdir -p "$OUT"

echo "=== 0. TPU health probe $(date +%H:%M:%S)"
python - <<'EOF' || exit 1
import time, json
t0 = time.time()
import jax
devs = jax.devices()
import jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
(x @ x).sum().block_until_ready()
print(json.dumps({"devices": [str(d) for d in devs],
                  "ready_s": round(time.time() - t0, 1)}))
EOF

echo "=== 1. offline flagship MP4->MP4 (16x1080p30 -> 4K) $(date +%H:%M:%S)"
step bash -c 'SMELTER_BENCH_DEVICE=tpu python tools/bench_offline.py --inputs 16 --seconds 10 --fps 30 --in 1920x1080 --out 3840x2160 | tee "$OUT/offline_flagship.json"'

echo "=== 2. flagship bench (bench.py) $(date +%H:%M:%S)"
step bash -c 'python bench.py | tee "$OUT/bench.json"'

echo "=== 3. general scenes device times $(date +%H:%M:%S)"
step bash -c 'python tools/bench_scenes.py | tee "$OUT/scenes.txt"'

echo "=== 4. flagship per-op breakdown $(date +%H:%M:%S)"
step bash -c 'python tools/bench_flagship_ops.py | tee "$OUT/flagship_ops.txt"'

echo "=== 5. animated-transition device times $(date +%H:%M:%S)"
step bash -c 'python tools/bench_animations.py | tee "$OUT/animations.txt"'

echo "=== 6. assembly/YUV kernel A/B + parity gate $(date +%H:%M:%S)"
step bash -c 'python tools/bench_assembly_ab.py | tee "$OUT/assembly_ab.json"'

echo "=== done $(date +%H:%M:%S) — results in $OUT"
