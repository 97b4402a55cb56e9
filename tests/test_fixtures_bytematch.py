"""Byte-match replay of the reference's golden fixtures (FIXTURES.md §A).

Every case is lifted from the reference's parameterized test tables
(src/keywords/type_.rs:158-200, src/keywords/properties_.rs:209-238,
src/keywords/ref_.rs:196-236, src/types/schema.rs:105-119,
src/types/validation_error.rs:43-49) and asserted on exact (path, keyword,
message) equality.
"""

import re

import pytest

from jsonschema_validator_ray.jsonvalidate import (
    KeywordType,
    SchemaError,
    ValidationError,
    compile_schema,
    normalise_path,
)


def violations(schema_json, instance):
    schema = compile_schema(schema_json)
    return [e.as_tuple() for e in schema.validation_errors("#", instance)]


# --- validation goldens (type_.rs:189-200, properties_.rs:228-238, ref_.rs:225-236)

VALIDATE_CASES = [
    # type keyword
    ({"type": "string"}, "text", []),
    ({"type": "string"}, True, [("#", KeywordType.TYPE, "Invalid Type")]),
    ({"type": "string"}, 1, [("#", KeywordType.TYPE, "Invalid Type")]),
    ({"type": ["boolean", "string"]}, "text", []),
    ({"type": ["boolean", "string"]}, True, []),
    ({"type": ["boolean", "string"]}, 1, [("#", KeywordType.TYPE, "Invalid Type")]),
    # properties keyword
    ({"properties": {"bool": {"type": "boolean"}}}, "text", []),
    ({"properties": {"bool": {"type": "boolean"}}}, {"bool": True}, []),
    (
        {"properties": {"bool": {"type": "boolean"}}},
        {"bool": "wrong type"},
        [("#/bool", KeywordType.TYPE, "Invalid Type")],
    ),
    # $ref keyword
    ({"definitions": {"model": {}}, "$ref": "#/definitions/model"}, "text", []),
    ({"definitions": {"model": {}}, "$ref": "#/definitions/model"}, None, []),
    ({"definitions": {"model": {"type": "string"}}, "$ref": "#/definitions/model"}, "text", []),
    (
        {"definitions": {"model": {"type": "string"}}, "$ref": "#/definitions/model"},
        None,
        [("#", KeywordType.TYPE, "Invalid Type")],
    ),
]


@pytest.mark.parametrize("schema_json,instance,expected", VALIDATE_CASES)
def test_validate_golden(schema_json, instance, expected):
    assert violations(schema_json, instance) == expected


@pytest.mark.parametrize("schema_json,instance,expected", VALIDATE_CASES)
def test_is_valid_matches_enumeration(schema_json, instance, expected):
    schema = compile_schema(schema_json)
    assert schema.is_valid("#", instance) == (not expected)


# --- compile-error goldens (exact Malformed detail strings)

COMPILE_CASES = [
    (
        {"type": "not-real-type"},
        KeywordType.TYPE,
        "Unsupported primitive type `not-real-type`. Available types are defined "
        "by `json_trait_rs::PrimitiveType::VARIANTS`",
    ),
    ({"type": []}, KeywordType.TYPE, "This array MUST have at least one element."),
    (
        {"type": ["not-real-type-in-array"]},
        KeywordType.TYPE,
        "Unsupported primitive type `not-real-type-in-array`. Available types are "
        "defined by `json_trait_rs::PrimitiveType::VARIANTS`",
    ),
    (
        {"type": [1]},
        KeywordType.TYPE,
        "Values have to be of `string` type. Integer(1) has type `integer`.",
    ),
    (
        {"type": 2},
        KeywordType.TYPE,
        "Values have to be of `string` type. Integer(2) has type `integer`.",
    ),
    (
        {"properties": 1},
        KeywordType.PROPERTIES,
        "Values have to be of `object` type. Integer(1) has type `integer`.",
    ),
]


@pytest.mark.parametrize("schema_json,keyword,detail", COMPILE_CASES)
def test_compile_errors_golden(schema_json, keyword, detail):
    with pytest.raises(SchemaError) as err:
        compile_schema(schema_json)
    assert err.value.keyword == keyword
    assert err.value.detail == detail


def test_compile_error_faulty_property_url():
    # properties_.rs:213-216: faulty URL is memory://{path}#/properties/prop
    with pytest.raises(SchemaError) as err:
        compile_schema({"properties": {"prop": 1}})
    assert re.fullmatch(
        r"Values of properties object must be of object type\. The following URLs "
        r"are recognized as faulty: memory:///[0-9a-f-]{36}#/properties/prop",
        err.value.detail,
    )


# --- non-object schemas (schema.rs:105-118); Display pinned by fixture for `1`

NON_OBJECT_CASES = [
    (None, "raw_schema type is null while is expected type object. raw_schema: null"),
    (False, "raw_schema type is boolean while is expected type object. raw_schema: false"),
    (1, "raw_schema type is integer while is expected type object. raw_schema: 1"),
    ('2', 'raw_schema type is string while is expected type object. raw_schema: "2"'),
    ([3, 4, 5], "raw_schema type is array while is expected type object. raw_schema: [3,4,5]"),
]


@pytest.mark.parametrize("schema_json,detail", NON_OBJECT_CASES)
def test_non_object_schema(schema_json, detail):
    with pytest.raises(SchemaError) as err:
        compile_schema(schema_json)
    assert err.value.keyword == KeywordType.UNKNOWN
    assert err.value.detail == detail


def test_ref_to_non_object_target():
    # ref_.rs:196-199
    with pytest.raises(SchemaError) as err:
        compile_schema({"definitions": {"model": 1}, "$ref": "#/definitions/model"})
    assert err.value.detail == (
        "raw_schema type is integer while is expected type object. raw_schema: 1"
    )


# --- path normalisation (validation_error.rs:43-49)

@pytest.mark.parametrize(
    "path,expected",
    [("#", "#"), ("#/", "#"), ("#/path1", "#/path1"), ("#/path1/", "#/path1")],
)
def test_normalise_path(path, expected):
    assert normalise_path(path) == expected


def test_validation_error_normalises_on_construction():
    assert ValidationError.new("#/", KeywordType.TYPE, "Invalid Type").path == "#"


# --- uninitialised schema sentinel (schema.rs:71-73, 127-133)

def test_uninitialised_schema_sentinel():
    from jsonschema_validator_ray.jsonvalidate.schema import ScopeBuilder

    builder = ScopeBuilder()
    url = builder.inject_schema({})
    schema = builder.schema(url, {})  # not built/initialised
    errors = schema.validation_errors("#/bool", {"bool": True})
    assert [e.as_tuple() for e in errors] == [
        ("#/bool", KeywordType.UNKNOWN, "Uninitialised schema")
    ]
    assert not schema.is_valid("#", {})


# --- remote $ref through a counting loader (ref_.rs:136-146 mock-loader analog)

def test_remote_ref_loader_called_once():
    from jsonschema_validator_ray.jsonvalidate.schema import ScopeBuilder

    remote_doc = {"type": "integer"}
    calls = []

    def loader(uri):
        calls.append(uri)
        return remote_doc

    builder = ScopeBuilder(loader)
    raw = {
        "properties": {
            "a": {"$ref": "memory://remote/doc"},
            "b": {"$ref": "memory://remote/doc"},
        }
    }
    url = builder.inject_schema(raw)
    schema = builder.schema(url, raw)
    builder.build()
    assert calls == ["memory://remote/doc"]  # fetched once, cache-deduped
    assert schema.is_valid("#", {"a": 1, "b": 2})
    assert [e.as_tuple() for e in schema.validation_errors("#", {"a": "x"})] == [
        ("#/a", KeywordType.TYPE, "Invalid Type")
    ]


# --- real HTTP loader against a local mock server (ref_.rs:136-146 analog)

def test_http_loader_fetches_and_caches():
    import http.server
    import json as _json
    import threading

    from jsonschema_validator_ray.jsonvalidate.loader import HttpSchemaLoader
    from jsonschema_validator_ray.jsonvalidate.schema import ScopeBuilder

    hits = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            body = _json.dumps({"type": "integer"}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        loader = HttpSchemaLoader()
        builder = ScopeBuilder(loader)
        raw = {"properties": {
            "a": {"$ref": f"{base}/schema.json"},
            "b": {"$ref": f"{base}/schema.json"},   # same target: ONE fetch
        }}
        url = builder.inject_schema(raw)
        schema = builder.schema(url, raw)
        builder.build()
        assert loader.calls == 1 and len(hits) == 1   # cache-deduped fetch
        assert schema.is_valid("#", {"a": 1, "b": 2})
        assert not schema.is_valid("#", {"a": "nope"})
    finally:
        srv.shutdown()


def test_http_loader_error_is_compile_time():
    import pytest as _pytest

    from jsonschema_validator_ray.jsonvalidate import SchemaError
    from jsonschema_validator_ray.jsonvalidate.loader import HttpSchemaLoader

    loader = HttpSchemaLoader(timeout=0.5)
    with _pytest.raises(SchemaError, match="Loader Error"):
        loader("ftp://example.invalid/schema.json")
    with _pytest.raises(SchemaError, match="Loader Error"):
        loader("http://127.0.0.1:9/nothing-listens-here")
