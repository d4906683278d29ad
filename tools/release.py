#!/usr/bin/env python
"""Release packaging (reference `tools/src/bin/` release bins): bundle the
server (Python package + native C++ sources + Makefile), the TS SDK
workspace, schemas, and docs into a versioned tarball with checksums.

Usage: python tools/release.py [--version X.Y.Z] [--outdir dist/]

The native library is rebuilt from source first so a broken tree cannot be
packaged; the tarball ships sources (the .so rebuilds on the target via
`make -C native`, same as a fresh clone).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import tarfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INCLUDE = [
    "smelter_tpu",
    "native/smelter_io",
    "native/smelter_decklink",
    "native/Makefile",
    "ts",
    "tools",
    "bench.py",
    "BASELINE.md",
    "README.md",
    "BENCHMARKS.md",
    "PARITY.md",
]

EXCLUDE_DIRS = {"__pycache__", "node_modules", "dist", ".pytest_cache"}


def _filter(info: tarfile.TarInfo):
    parts = info.name.split("/")
    if any(p in EXCLUDE_DIRS or p.endswith(".pyc") for p in parts):
        return None
    return info


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--version", default="0.1.0")
    ap.add_argument("--outdir", default=os.path.join(REPO, "dist"))
    ap.add_argument("--skip-native-build", action="store_true")
    args = ap.parse_args()

    if not args.skip_native_build:
        print("building native library...", flush=True)
        subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True,
                       capture_output=True)

    os.makedirs(args.outdir, exist_ok=True)
    name = f"smelter-tpu-{args.version}"
    tar_path = os.path.join(args.outdir, f"{name}.tar.gz")
    with tarfile.open(tar_path, "w:gz") as tar:
        for rel in INCLUDE:
            src = os.path.join(REPO, rel)
            if not os.path.exists(src):
                print(f"warning: {rel} missing, skipped", file=sys.stderr)
                continue
            tar.add(src, arcname=f"{name}/{rel}", filter=_filter)
        manifest = json.dumps({
            "name": "smelter-tpu",
            "version": args.version,
            "built_at": int(time.time()),
            "python": sys.version.split()[0],
        }, indent=2).encode()
        info = tarfile.TarInfo(f"{name}/RELEASE.json")
        info.size = len(manifest)
        import io as _io

        tar.addfile(info, _io.BytesIO(manifest))

    digest = hashlib.sha256(open(tar_path, "rb").read()).hexdigest()
    with open(tar_path + ".sha256", "w") as f:
        f.write(f"{digest}  {os.path.basename(tar_path)}\n")
    size_mb = os.path.getsize(tar_path) / 1e6
    print(json.dumps({
        "tarball": tar_path,
        "sha256": digest,
        "size_mb": round(size_mb, 1),
    }))


if __name__ == "__main__":
    main()
