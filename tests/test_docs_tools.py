"""Docs/ops tooling: `tools/docs_examples.py` (reference
`generate_docs_examples/main.rs`) and `tools/dependency_check.py`
(reference `dependency_check.rs`)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_dependency_check_json():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "dependency_check.py"),
         "--json"],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    report = json.loads(out.stdout)
    assert report["ok"] is True
    by_name = {c["name"]: c for c in report["checks"]}
    # every required dependency of this image must pass
    for name, c in by_name.items():
        if c["required"]:
            assert c["ok"], f"{name}: {c['detail']}"
    assert "avcodec" in by_name["native smelter_io (FFmpeg)"]["detail"]


def test_docs_examples_render_one(tmp_path):
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "docs_examples.py"),
         "--only", "text", "--duration", "1", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    clip = tmp_path / "components" / "text.mp4"
    assert clip.exists() and clip.stat().st_size > 1000
    reqs = json.loads(clip.with_suffix(".requests.json").read_text())
    assert reqs[0]["route"] == "/api/output/output_1/register"
    assert reqs[-1]["body"] == {"schedule_time_ms": 1000.0}


def test_docs_examples_catalog_listing():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "docs_examples.py"), "--list"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0
    for name in ("guides/quick_start", "components/tiles",
                 "components/shader", "components/slide_show"):
        assert name in out.stdout
