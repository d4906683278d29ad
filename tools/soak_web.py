"""Soak the web-renderer test module (VERDICT r4 item 8): N consecutive
clean runs prove the condition-based screencast/embedding synchronization
cannot flake on a loaded 1-vCPU box (the old sleep-poll waits could).

Usage: python tools/soak_web.py [--rounds 20]
"""

import argparse
import subprocess
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=20)
    args = ap.parse_args()
    for i in range(1, args.rounds + 1):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_web_renderer.py",
             "-q", "-p", "no:cacheprovider"],
            capture_output=True, text=True,
        )
        dt = time.time() - t0
        status = "ok" if proc.returncode == 0 else "FAIL"
        print(f"round {i}/{args.rounds}: {status} ({dt:.1f}s)", flush=True)
        if proc.returncode != 0:
            print(proc.stdout[-4000:])
            print(proc.stderr[-2000:])
            return 1
    print(f"soak clean: {args.rounds}/{args.rounds}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
