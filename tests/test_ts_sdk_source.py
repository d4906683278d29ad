"""Static wire-parity check of the TS SDK against the server schema.

Node.js is absent from this image, so the TS packages under ts/ cannot be
executed. Instead this test PARSES the SDK source and cross-checks it
against the exact pydantic models the server validates requests with
(deny-unknown-fields):

- every wire key a component sceneBuilder emits must be an accepted field
  of the corresponding Component model (tag -> model via the discriminated
  union)
- every key the api/input.ts + api/output.ts converters emit must be an
  accepted field of the corresponding Register{Input,Output} model
- every HTTP route in smelter-core/src/api.ts must exist in the server's
  route table
- api.generated.ts must be exactly what tools/generate_ts_types.py produces
  from the current schema (regeneration drift check)

Together with tests/test_ts_sdk_wire.py (live-server replay of the SDK's
request sequences) this pins the SDK to the wire contract without a JS
runtime.
"""

import re
import subprocess
import sys
from pathlib import Path

import pytest

from smelter_tpu.api import schema as api

TS_ROOT = Path(__file__).resolve().parent.parent / "ts"


def _depth1_keys(body: str):
    """Top-level `key:` names and `...spread` names of an object literal
    (the text between the braces, braces excluded)."""
    depth = 0
    keys, spreads = [], []
    for line in body.splitlines():
        stripped = line.strip()
        if depth == 0:
            m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)\s*:", stripped)
            if m:
                keys.append(m.group(1))
            s = re.match(r"^\.\.\.([A-Za-z_][A-Za-z0-9_]*)", stripped)
            if s:
                spreads.append(s.group(1))
        depth += line.count("{") + line.count("(") + line.count("[")
        depth -= line.count("}") + line.count(")") + line.count("]")
        depth = max(depth, 0)
    return keys, spreads


def _object_literals(source: str, anchor: str):
    """Yield the body of every object literal that starts right after
    `anchor` (e.g. "return {")."""
    idx = 0
    while True:
        start = source.find(anchor, idx)
        if start < 0:
            return
        brace = source.index("{", start + len(anchor) - 1)
        depth = 0
        for pos in range(brace, len(source)):
            if source[pos] == "{":
                depth += 1
            elif source[pos] == "}":
                depth -= 1
                if depth == 0:
                    yield source[brace + 1 : pos]
                    break
        idx = brace + 1


def _component_models():
    """tag -> pydantic model from the Component discriminated union."""
    import typing

    union = typing.get_args(api.Component)[0]
    out = {}
    for model in typing.get_args(union):
        tag = typing.get_args(model.model_fields["type"].annotation)[0]
        out[tag] = model
    return out


def _register_models(alias):
    import typing

    union = typing.get_args(alias)[0]
    out = {}
    for model in typing.get_args(union):
        tag = typing.get_args(model.model_fields["type"].annotation)[0]
        out[tag] = model
    return out


def _accepted_fields(model):
    fields = set(model.model_fields)
    for name, field in model.model_fields.items():
        if field.alias:
            fields.add(field.alias)
    return fields


def _assert_keys_accepted(keys, model, context):
    accepted = _accepted_fields(model)
    for key in keys:
        assert key in accepted, (
            f"{context}: TS SDK emits wire key {key!r} that the server's "
            f"{model.__name__} (deny-unknown-fields) does not accept"
        )


COMPONENT_FILES = {
    "View.ts": "view",
    "Tiles.ts": "tiles",
    "Rescaler.ts": "rescaler",
    "Text.ts": "text",
    "InputStream.ts": "input_stream",
    "Shader.ts": "shader",
    "Image.ts": "image",
    "WebView.ts": "web_view",
}


def _balanced(source: str, open_pos: int, pair="{}") -> str:
    """Body of the bracket pair opening at `open_pos` (brackets excluded)."""
    depth = 0
    for pos in range(open_pos, len(source)):
        if source[pos] == pair[0]:
            depth += 1
        elif source[pos] == pair[1]:
            depth -= 1
            if depth == 0:
                return source[open_pos + 1 : pos]
    raise AssertionError("unbalanced brackets")


def _spec_field(body: str, name: str) -> str | None:
    """Text of a `name: [...]` or `name: {...}` entry in an object body."""
    m = re.search(rf"\b{name}\s*:\s*([\[{{])", body)
    if not m:
        return None
    pair = "[]" if m.group(1) == "[" else "{}"
    return _balanced(body, m.end() - 1, pair)


def _snake(name: str) -> str:
    # mirror of scene.ts wireKey()
    return re.sub(r"[A-Z]", lambda m: "_" + m.group(0).lower(), name)


def _spec_emitted_keys(source: str):
    """Wire keys produced by a sceneNodeFromSpec table, computed with the
    same rules as scene.ts's generated builder."""
    m = re.search(r"sceneNodeFromSpec<[^>]*>\(\s*'([a-z0-9_]+)'\s*,\s*\{", source)
    if not m:
        return None, None
    tag = m.group(1)
    body = _balanced(source, m.end() - 1)

    keys = {"type", "id"}
    slot = re.search(r"childSlot\s*:\s*'(\w+)'", body)
    keys.add({"list": "children", "one": "child", "join": "text", None: "children"}
             .get(slot.group(1) if slot else None, "children"))
    keys.discard(None)
    if slot and slot.group(1) == "none":
        keys.discard("children")

    aliases = {}
    alias_body = _spec_field(body, "aliases")
    if alias_body:
        aliases = dict(re.findall(r"(\w+)\s*:\s*'(\w+)'", alias_body))
    for list_name in ("styleFields", "rootFields"):
        arr = _spec_field(body, list_name)
        for prop in re.findall(r"'(\w+)'", arr or ""):
            keys.add(aliases.get(prop, _snake(prop)))
    defaults_body = _spec_field(body, "defaults")
    if defaults_body:
        keys |= {k for k, _ in re.findall(r"(\w+)\s*:\s*(\S+)", defaults_body)}
    return tag, keys


def test_component_scene_builders_emit_accepted_keys():
    models = _component_models()
    for filename, tag in COMPONENT_FILES.items():
        source = (TS_ROOT / "smelter/src/components" / filename).read_text()
        spec_tag, spec_keys = _spec_emitted_keys(source)
        if spec_keys is not None:
            assert spec_tag == tag, f"{filename}: declares tag {spec_tag!r}"
            _assert_keys_accepted(spec_keys, models[tag], filename)
            continue
        builder = source[source.index("function sceneBuilder") :]
        literals = list(_object_literals(builder, "return {"))
        assert literals, f"{filename}: no sceneBuilder return literal found"
        keys, _ = _depth1_keys(literals[0])
        assert "type" in keys, f"{filename}: sceneBuilder does not set type"
        _assert_keys_accepted(keys, models[tag], filename)


def test_component_tags_cover_every_server_component():
    assert set(COMPONENT_FILES.values()) == set(_component_models())


def _function_source(source: str, name: str) -> str:
    start = source.index(f"function {name}")
    rest = source[start:]
    brace = rest.index("{")
    depth = 0
    for pos in range(brace, len(rest)):
        if rest[pos] == "{":
            depth += 1
        elif rest[pos] == "}":
            depth -= 1
            if depth == 0:
                return rest[: pos + 1]
    raise AssertionError(f"unbalanced function {name}")


def _const_literal_keys(fn_source: str, const_name: str):
    anchor = f"const {const_name} = {{"
    for literal in _object_literals(fn_source, anchor):
        keys, _ = _depth1_keys(literal)
        return keys
    return []


def test_input_converters_emit_accepted_keys():
    source = (TS_ROOT / "smelter-core/src/api/input.ts").read_text()
    models = _register_models(api.RegisterInput)
    converter = _function_source(source, "intoRegisterInput")
    for literal in _object_literals(converter, "return {"):
        keys, _ = _depth1_keys(literal)
        tag_match = re.search(r"type:\s*'([a-z0-9_]+)'", literal)
        assert tag_match, "input converter literal without type tag"
        tag = tag_match.group(1)
        _assert_keys_accepted(keys, models[tag], f"input converter {tag}")

    # aux converters against their nested models
    side = _function_source(source, "intoSideChannel")
    for literal in _object_literals(side, "return {"):
        keys, _ = _depth1_keys(literal)
        assert set(keys) <= {"video", "audio", "delay_ms"}, keys
    rtp_audio = _function_source(source, "intoRtpAudio")
    for literal in _object_literals(rtp_audio, "return {"):
        keys, _ = _depth1_keys(literal)
        _assert_keys_accepted(keys, api.RtpInputAudioOptions, "intoRtpAudio")


OUTPUT_HELPER_MODELS = {
    "intoVideoOptions": api.OutputVideoOptions,
    "intoAudioOptions": api.OutputAudioOptions,
    "intoWhipVideoOptions": api.WhipOutputVideoOptions,
    "intoWhipAudioOptions": api.WhipOutputAudioOptions,
    "intoEndCondition": api.OutputEndCondition,
}


def test_output_converters_emit_accepted_keys():
    source = (TS_ROOT / "smelter-core/src/api/output.ts").read_text()
    models = _register_models(api.RegisterOutput)

    converter = _function_source(source, "intoRegisterOutput")
    for literal in _object_literals(converter, "return {"):
        keys, _ = _depth1_keys(literal)
        tag_match = re.search(r"type:\s*'([a-z0-9_]+)'", literal)
        assert tag_match, "output converter literal without type tag"
        tag = tag_match.group(1)
        _assert_keys_accepted(keys, models[tag], f"output converter {tag}")

    for fn_name, model in OUTPUT_HELPER_MODELS.items():
        fn = _function_source(source, fn_name)
        for literal in _object_literals(fn, "return {"):
            keys, spreads = _depth1_keys(literal)
            _assert_keys_accepted(
                [k for k in keys if k != "type"], model, fn_name
            )

    # encoder converters: resolve the `common` spread
    enc = _function_source(source, "intoVideoEncoder")
    common_keys = _const_literal_keys(enc, "common")
    encoder_fields = set()
    for model in (api.FfmpegH264Encoder, api.FfmpegVp8Encoder,
                  api.FfmpegVp9Encoder, api.FfmpegAv1Encoder):
        encoder_fields |= _accepted_fields(model)
    for literal in _object_literals(enc, "return {"):
        keys, spreads = _depth1_keys(literal)
        resolved = set(keys) | (set(common_keys) if "common" in spreads else set())
        assert resolved <= encoder_fields, resolved - encoder_fields
    aenc = _function_source(source, "intoAudioEncoder")
    audio_fields = _accepted_fields(api.AacEncoder) | _accepted_fields(api.OpusEncoder)
    for literal in _object_literals(aenc, "return {"):
        keys, _ = _depth1_keys(literal)
        assert set(keys) <= audio_fields, set(keys) - audio_fields


SERVER_ROUTES = {
    ("POST", "/api/input/{id}/register"),
    ("POST", "/api/input/{id}/unregister"),
    ("POST", "/api/input/{id}/update"),
    ("POST", "/api/output/{id}/register"),
    ("POST", "/api/output/{id}/unregister"),
    ("POST", "/api/output/{id}/update"),
    ("POST", "/api/output/{id}/request_keyframe"),
    ("POST", "/api/shader/{id}/register"),
    ("POST", "/api/shader/{id}/unregister"),
    ("POST", "/api/image/{id}/register"),
    ("POST", "/api/image/{id}/unregister"),
    ("POST", "/api/web-renderer/{id}/register"),
    ("POST", "/api/web-renderer/{id}/unregister"),
    ("POST", "/api/font/register"),
    ("POST", "/api/start"),
    ("POST", "/api/reset"),
    ("GET", "/status"),
    ("GET", "/stats"),
}


def test_api_client_routes_exist_on_server():
    source = (TS_ROOT / "smelter-core/src/api.ts").read_text()
    covered = set()
    # entity routes: this.act('output', <id expr>, 'update', ...)
    for entity, verb in re.findall(
        r"this\.act\(\s*'([\w-]+)'\s*,[^,]+,\s*'(\w+)'", source
    ):
        covered.add(("POST", f"/api/{entity}/{{id}}/{verb}"))
    # fixed routes: this.post('/api/start', ...) / this.get('/stats')
    for route in re.findall(r"this\.post\(\s*'([^']+)'", source):
        covered.add(("POST", route))
    for route in re.findall(r"this\.get\(\s*'([^']+)'", source):
        covered.add(("GET", route))
    assert covered, "no routes found in ApiClient"
    unknown = covered - SERVER_ROUTES
    assert not unknown, (
        f"ApiClient uses routes not in the server route table "
        f"(server/app.py): {unknown}"
    )
    missing = SERVER_ROUTES - covered
    assert not missing, f"ApiClient missing routes: {missing}"


def test_generated_api_types_match_schema():
    """api.generated.ts must be regenerable bit-for-bit from the current
    server schema (drift check for the codegen contract)."""
    generated = TS_ROOT / "smelter/src/api.generated.ts"
    result = subprocess.run(
        [sys.executable, str(TS_ROOT.parent / "tools/generate_ts_types.py"),
         "/tmp/api.generated.check.ts"],
        capture_output=True, text=True,
    )
    assert result.returncode == 0, result.stderr
    assert generated.read_text() == Path("/tmp/api.generated.check.ts").read_text(), (
        "ts/smelter/src/api.generated.ts is stale — run "
        "python tools/generate_ts_types.py"
    )


def test_output_specific_ref_formats_match_server_convention():
    """Raw-id formats in refs must match what the server's tests/SDK
    convention established (__output_specific_input:{n}:{outputId})."""
    input_ref = (TS_ROOT / "smelter/src/types/refs/inputRef.ts").read_text()
    assert "'__output_specific_input'" in input_ref
    image_ref = (TS_ROOT / "smelter/src/types/refs/imageRef.ts").read_text()
    assert "'__output_specific_image'" in image_ref


def test_committed_json_schemas_match_models():
    """tools/schemas/*.json must be regenerable from the current pydantic
    models (same drift guarantee as the TS codegen check)."""
    import json

    schema_dir = TS_ROOT.parent / "tools" / "schemas"
    result = subprocess.run(
        [sys.executable, str(TS_ROOT.parent / "tools/generate_schemas.py"),
         "/tmp/schemas_check"],
        capture_output=True, text=True,
    )
    assert result.returncode == 0, result.stderr
    for name in ("scene.schema.json", "openapi_specification.json"):
        committed = json.loads((schema_dir / name).read_text())
        fresh = json.loads(Path(f"/tmp/schemas_check/{name}").read_text())
        assert committed == fresh, (
            f"tools/schemas/{name} is stale — run python tools/generate_schemas.py"
        )
