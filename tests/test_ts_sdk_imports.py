"""Static import-resolution check for the TS SDK.

Node/tsc are absent from this image, so a renamed or removed export would
otherwise go unnoticed until a user compiles the SDK. This test implements
a regex-level ES-module resolver: every `import`/`export ... from` across
the ts/ packages must name an export that actually exists in the resolved
module (following `export *` chains and the @smelter-tpu/* workspace map).
"""

import re
from functools import lru_cache
from pathlib import Path

TS_ROOT = Path(__file__).resolve().parent.parent / "ts"

WORKSPACE = {
    "@smelter-tpu/smelter": TS_ROOT / "smelter/src/index.ts",
    "@smelter-tpu/smelter-core": TS_ROOT / "smelter-core/src/index.ts",
    "@smelter-tpu/smelter-node": TS_ROOT / "smelter-node/src/index.ts",
    "@smelter-tpu/smelter-web-client": TS_ROOT / "smelter-web-client/src/index.ts",
}

SCAN_DIRS = [
    "smelter/src",
    "smelter-core/src",
    "smelter-node/src",
    "smelter-web-client/src",
    "examples",
    "node-examples",
]


def _strip_comments(source: str) -> str:
    source = re.sub(r"/\*.*?\*/", "", source, flags=re.S)
    return re.sub(r"(?m)^\s*//.*$", "", source)


def _resolve(from_file: Path, spec: str) -> Path | None:
    """Module specifier -> .ts file, or None for external packages."""
    if spec in WORKSPACE:
        return WORKSPACE[spec]
    if not spec.startswith("."):
        return None  # react, ws, pino, node:..., etc.
    base = (from_file.parent / spec).resolve()
    for candidate in (
        base.with_suffix(".ts") if base.suffix == ".js" else base,
        Path(str(base) + ".ts"),
        base / "index.ts",
    ):
        if candidate.is_file():
            return candidate
    raise AssertionError(f"{from_file}: unresolvable import {spec!r}")


def _split_names(clause: str) -> list[str]:
    """Names bound by an import/export brace clause (post-`as` names for
    imports are local; we track the REMOTE name, pre-`as`)."""
    names = []
    for part in clause.split(","):
        part = part.strip()
        if not part:
            continue
        part = re.sub(r"^type\s+", "", part)
        remote = part.split(" as ")[0].strip()
        if remote:
            names.append(remote)
    return names


@lru_cache(maxsize=None)
def _exports_of(path: Path) -> set[str]:
    source = _strip_comments(path.read_text())
    names: set[str] = set()
    # export [default] const/class/function/type/... NAME
    for m in re.finditer(
        r"export\s+(?:default\s+)?(?:declare\s+)?(?:abstract\s+)?(?:async\s+)?"
        r"(?:const|let|var|class|function\*?|interface|type|enum)\s+([A-Za-z_$][\w$]*)",
        source,
    ):
        names.add(m.group(1))
    if re.search(r"export\s+default\b", source):
        names.add("default")
    # export { A, B as C } [from './x.js']
    for m in re.finditer(r"export\s+(?:type\s+)?\{([^}]*)\}(?:\s*from\s*['\"]([^'\"]+)['\"])?",
                         source):
        clause, spec = m.groups()
        if spec is None:
            for part in clause.split(","):
                part = re.sub(r"^\s*type\s+", "", part.strip())
                local = part.split(" as ")[-1].strip()
                if local:
                    names.add(local)
        else:
            # re-export: exported names are the post-`as` names
            target = _resolve(path, spec)
            available = _exports_of(target) if target else None
            for part in clause.split(","):
                part = re.sub(r"^\s*type\s+", "", part.strip())
                if not part:
                    continue
                pieces = [p.strip() for p in part.split(" as ")]
                if available is not None:
                    assert pieces[0] in available, (
                        f"{path}: re-exports {pieces[0]!r} not found in {spec}"
                    )
                names.add(pieces[-1])
    # export * as NS from / export * from
    for m in re.finditer(r"export\s+\*\s+(?:as\s+([A-Za-z_$][\w$]*)\s+)?from\s*['\"]([^'\"]+)['\"]",
                         source):
        ns, spec = m.groups()
        target = _resolve(path, spec)
        if ns:
            names.add(ns)
        elif target is not None:
            names |= _exports_of(target) - {"default"}
    return names


IMPORT_RE = re.compile(
    r"import\s+(?:type\s+)?"
    r"(?:(?P<default>[A-Za-z_$][\w$]*)\s*,?\s*)?"
    r"(?:\*\s*as\s*(?P<ns>[A-Za-z_$][\w$]*))?"
    r"(?:\{(?P<named>[^}]*)\})?"
    r"\s*from\s*['\"](?P<spec>[^'\"]+)['\"]"
)


def test_ts_imports_resolve():
    checked = 0
    for scan in SCAN_DIRS:
        root = TS_ROOT / scan
        if not root.is_dir():
            continue
        for ts_file in root.rglob("*.ts*"):
            if "node_modules" in ts_file.parts or ts_file.suffix not in (".ts", ".tsx"):
                continue
            source = _strip_comments(ts_file.read_text())
            for m in IMPORT_RE.finditer(source):
                target = _resolve(ts_file, m.group("spec"))
                if target is None:
                    continue  # external dependency; can't check here
                exports = _exports_of(target)
                wanted = []
                if m.group("default"):
                    wanted.append("default")
                wanted += _split_names(m.group("named") or "")
                for name in wanted:
                    checked += 1
                    assert name in exports, (
                        f"{ts_file.relative_to(TS_ROOT)}: imports {name!r} "
                        f"from {m.group('spec')}, but {target.relative_to(TS_ROOT)} "
                        f"does not export it"
                    )
    assert checked > 100, f"resolver only checked {checked} bindings — scan broken?"


def test_ts_namespace_member_references_resolve():
    """`import * as Ns from '...'` followed by `Ns.Member` usage: every
    referenced member must be an actual export of the resolved module.
    This covers the cross-package *type* references (e.g. `Api.Component`
    in annotations) that named-import checking cannot see — the closest
    thing to `tsc --noEmit` available without node in the image."""
    checked = 0
    for scan in SCAN_DIRS:
        root = TS_ROOT / scan
        if not root.is_dir():
            continue
        for ts_file in root.rglob("*.ts*"):
            if "node_modules" in ts_file.parts or ts_file.suffix not in (".ts", ".tsx"):
                continue
            source = _strip_comments(ts_file.read_text())
            for m in IMPORT_RE.finditer(source):
                ns = m.group("ns")
                if not ns:
                    continue
                target = _resolve(ts_file, m.group("spec"))
                if target is None:
                    continue
                exports = _exports_of(target)
                for ref in re.finditer(
                    rf"(?<![\w$.]){re.escape(ns)}\.([A-Za-z_$][\w$]*)", source
                ):
                    checked += 1
                    member = ref.group(1)
                    assert member in exports, (
                        f"{ts_file.relative_to(TS_ROOT)}: references "
                        f"{ns}.{member}, but {target.relative_to(TS_ROOT)} "
                        f"does not export {member!r}"
                    )
    assert checked > 20, f"namespace check saw only {checked} references — scan broken?"
