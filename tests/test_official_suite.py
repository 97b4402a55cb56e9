"""JSON-Schema-Test-Suite (draft4) conformance harness.

The reference vendors the official suite as a submodule it never wired up
(/root/reference/.gitmodules:1-3, empty checkout). This module transcribes
the applicable draft4 cases — the groups exercising exactly the keywords the
reference implements (`type`, `properties`, `$ref`;
/root/reference/src/keywords/) — from the PUBLIC official suite
(github.com/json-schema-org/JSON-Schema-Test-Suite, draft4/{type,properties,
ref}.json, MIT) and runs them through ``jsonvalidate.compile_schema``.

Skipped-with-reason, not silently dropped:
- groups whose expected outcomes depend on keywords the reference does not
  implement (items, additionalProperties, patternProperties, definitions-id
  resolution, remote refs — the HTTP loader is mock-tested separately in
  test_fixtures_bytematch.py's loader section);
- the one DOCUMENTED divergence: the reference uses strict primitive-type
  equality, so an integer instance FAILS ``{"type": "number"}``
  (src/keywords/type_.rs; jsonvalidate/schema.py:70) while the official
  suite expects it to pass. Those cases assert the REFERENCE behavior and
  are marked `diverges=True` so the divergence stays visible.
"""

import pytest

from jsonschema_validator_ray.jsonvalidate import compile_schema

# (group, schema, [(case_name, instance, official_valid, diverges)])
SUITE = [
    # ---- draft4/type.json -------------------------------------------------
    ("integer type matches integers",
     {"type": "integer"},
     [("an integer is an integer", 1, True, False),
      ("a float is not an integer", 1.1, False, False),
      ("a string is not an integer", "foo", False, False),
      ("a string is still not an integer, even if it looks like one",
       "1", False, False),
      ("an object is not an integer", {}, False, False),
      ("an array is not an integer", [], False, False),
      ("a boolean is not an integer", True, False, False),
      ("null is not an integer", None, False, False)]),
    ("number type matches numbers",
     {"type": "number"},
     [("an integer is a number", 1, True, True),   # reference: strict → fail
      ("a float is a number", 1.1, True, False),
      ("a string is not a number", "foo", False, False),
      ("a string is still not a number, even if it looks like one",
       "1", False, False),
      ("an object is not a number", {}, False, False),
      ("an array is not a number", [], False, False),
      ("a boolean is not a number", True, False, False),
      ("null is not a number", None, False, False)]),
    ("string type matches strings",
     {"type": "string"},
     [("1 is not a string", 1, False, False),
      ("a float is not a string", 1.1, False, False),
      ("a string is a string", "foo", True, False),
      ("a string is still a string, even if it looks like a number",
       "1", True, False),
      ("an empty string is still a string", "", True, False),
      ("an object is not a string", {}, False, False),
      ("an array is not a string", [], False, False),
      ("a boolean is not a string", True, False, False),
      ("null is not a string", None, False, False)]),
    ("object type matches objects",
     {"type": "object"},
     [("an integer is not an object", 1, False, False),
      ("a float is not an object", 1.1, False, False),
      ("a string is not an object", "foo", False, False),
      ("an object is an object", {}, True, False),
      ("an array is not an object", [], False, False),
      ("a boolean is not an object", True, False, False),
      ("null is not an object", None, False, False)]),
    ("array type matches arrays",
     {"type": "array"},
     [("an integer is not an array", 1, False, False),
      ("a float is not an array", 1.1, False, False),
      ("a string is not an array", "foo", False, False),
      ("an object is not an array", {}, False, False),
      ("an array is an array", [], True, False),
      ("a boolean is not an array", True, False, False),
      ("null is not an array", None, False, False)]),
    ("boolean type matches booleans",
     {"type": "boolean"},
     [("an integer is not a boolean", 1, False, False),
      ("a float is not a boolean", 1.1, False, False),
      ("a string is not a boolean", "foo", False, False),
      ("an empty string is not a boolean", "", False, False),
      ("an object is not a boolean", {}, False, False),
      ("an array is not a boolean", [], False, False),
      ("true is a boolean", True, True, False),
      ("false is a boolean", False, True, False),
      ("null is not a boolean", None, False, False)]),
    ("null type matches only the null object",
     {"type": "null"},
     [("an integer is not null", 1, False, False),
      ("a float is not null", 1.1, False, False),
      ("zero is not null", 0, False, False),
      ("a string is not null", "foo", False, False),
      ("an empty string is not null", "", False, False),
      ("an object is not null", {}, False, False),
      ("an array is not null", [], False, False),
      ("true is not null", True, False, False),
      ("false is not null", False, False, False),
      ("null is null", None, True, False)]),
    ("multiple types can be specified in an array",
     {"type": ["integer", "string"]},
     [("an integer is valid", 1, True, False),
      ("a string is valid", "foo", True, False),
      ("a float is invalid", 1.1, False, False),
      ("an object is invalid", {}, False, False),
      ("an array is invalid", [], False, False),
      ("a boolean is invalid", True, False, False),
      ("null is invalid", None, False, False)]),
    # ---- draft4/properties.json ------------------------------------------
    ("object properties validation",
     {"properties": {"foo": {"type": "integer"}, "bar": {"type": "string"}}},
     [("both properties present and valid is valid",
       {"foo": 1, "bar": "baz"}, True, False),
      ("one property invalid is invalid",
       {"foo": 1, "bar": {}}, False, False),
      ("both properties invalid is invalid",
       {"foo": [], "bar": {}}, False, False),
      ("doesn't invalidate other properties",
       {"quux": []}, True, False),
      ("ignores arrays", [], True, False),
      ("ignores other non-objects", 12, True, False)]),
    # ---- draft4/ref.json --------------------------------------------------
    ("relative pointer ref to object",
     {"properties": {"foo": {"type": "integer"},
                     "bar": {"$ref": "#/properties/foo"}}},
     [("match", {"bar": 3}, True, False),
      ("mismatch", {"bar": True}, False, False)]),
    ("escaped pointer ref",
     {"tilda~field": {"type": "integer"},
      "slash/field": {"type": "integer"},
      "percent%field": {"type": "integer"},
      "properties": {"tilda": {"$ref": "#/tilda~0field"},
                     "slash": {"$ref": "#/slash~1field"},
                     "percent": {"$ref": "#/percent%25field"}}},
     [("slash invalid", {"slash": "aoeu"}, False, False),
      ("tilda invalid", {"tilda": "aoeu"}, False, False),
      ("percent invalid", {"percent": "aoeu"}, False, False),
      ("slash valid", {"slash": 123}, True, False),
      ("tilda valid", {"tilda": 123}, True, False),
      ("percent valid", {"percent": 123}, True, False)]),
    ("nested refs",
     {"definitions": {"a": {"type": "integer"},
                      "b": {"$ref": "#/definitions/a"},
                      "c": {"$ref": "#/definitions/b"}},
      "$ref": "#/definitions/c"},
     [("nested ref valid", 5, True, False),
      ("nested ref invalid", "a", False, False)]),
    ("property named $ref that is not a reference",
     {"properties": {"$ref": {"type": "string"}}},
     [("property named $ref valid", {"$ref": "a"}, True, False),
      ("property named $ref invalid", {"$ref": 2}, False, False)]),
    # "root pointer ref": only the cases decidable without
    # additionalProperties (the official group's mismatch cases rely on it)
    ("root pointer ref (additionalProperties-free subset)",
     {"properties": {"foo": {"$ref": "#"}}},
     [("match", {"foo": False}, True, False),
      ("recursive match", {"foo": {"foo": False}}, True, False)]),
]

# Official groups NOT runnable here, with the blocking keyword:
SKIPPED_GROUPS = {
    "relative pointer ref to array": "items",
    "properties with escaped characters": "unicode-escape properties (covered"
                                          " by escaped pointer ref group)",
    "properties, patternProperties, additionalProperties interaction":
        "patternProperties/additionalProperties",
    "remote ref, containing refs itself": "network (loader mock-tested in"
                                          " test_fixtures_bytematch.py)",
    "Recursive references between schemas": "id/items",
    "refs with quote": "definitions member with quote — covered by escaped"
                       " pointer ref percent/tilde/slash cases",
    "Location-independent identifier": "id-based resolution",
}


def _cases():
    for group, schema, cases in SUITE:
        for name, instance, official_valid, diverges in cases:
            yield pytest.param(schema, instance, official_valid, diverges,
                               id=f"{group}::{name}")


@pytest.mark.parametrize("schema,instance,official_valid,diverges", _cases())
def test_official_draft4_case(schema, instance, official_valid, diverges):
    compiled = compile_schema(schema)
    got = compiled.is_valid("#", instance)
    if diverges:
        # documented reference divergence (strict primitive types): assert
        # the REFERENCE behavior, keep the official expectation visible
        assert got is (not official_valid), (
            f"divergence case changed: official={official_valid}, "
            f"reference-strict expects {not official_valid}, got {got}")
    else:
        assert got is official_valid


def test_skipped_groups_documented():
    """Every skipped official group carries a named blocking keyword."""
    assert all(SKIPPED_GROUPS.values())
