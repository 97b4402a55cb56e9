"""Core value/error types for the fixture-parity validator.

Byte-match surface (messages and path rules) per the reference:
- path normalisation: src/types/validation_error.rs:18-26 (cases :43-49)
- keyword names:      src/types/keyword_type.rs (Unknown/Type/Properties/Ref)
- primitive types:    json_trait_rs::PrimitiveType — seven Draft-4 primitives,
  Integer distinct from Number (observed via src/keywords/type_.rs:61-67 tests)
- Rust Debug / Display renderings of JSON values surfaced inside compile error
  details (e.g. ``Integer(1)`` at src/keywords/type_.rs:170-177,
  ``raw_schema: 1`` at src/types/schema.rs:105-118).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any


class KeywordType:
    """Mirror of the reference's KeywordType enum (src/types/keyword_type.rs)."""

    UNKNOWN = "Unknown"
    TYPE = "Type"
    PROPERTIES = "Properties"
    REF = "Ref"


# The seven Draft-4 primitives, in declaration order of json_trait_rs.
PRIMITIVE_TYPES = ("null", "boolean", "integer", "number", "string", "array", "object")


def primitive_type(value: Any) -> str:
    """Primitive type name of a Python-decoded JSON value.

    Integer is distinct from Number (Draft-4 style); bool checked before int
    because ``bool`` is an ``int`` subclass in Python.
    """
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "number"
    if isinstance(value, str):
        return "string"
    if isinstance(value, list):
        return "array"
    if isinstance(value, dict):
        return "object"
    raise TypeError(f"not a JSON value: {value!r}")


def rust_debug(value: Any) -> str:
    """Best-effort replica of Rust's ``{:?}`` Debug rendering of a
    ``json_trait_rs::RustType`` value, as surfaced inside compile-error details
    (pinned by fixture: ``Integer(1)``, src/keywords/type_.rs:170-177)."""
    if value is None:
        return "Null"
    if isinstance(value, bool):
        return f"Boolean({str(value).lower()})"
    if isinstance(value, int):
        return f"Integer({value})"
    if isinstance(value, float):
        return f"Number({value})"
    if isinstance(value, str):
        return f'String("{value}")'
    if isinstance(value, list):
        return "List([" + ", ".join(rust_debug(v) for v in value) + "])"
    if isinstance(value, dict):
        inner = ", ".join(f'"{k}": {rust_debug(v)}' for k, v in value.items())
        return "Object({" + inner + "})"
    raise TypeError(f"not a JSON value: {value!r}")


def rust_display(value: Any) -> str:
    """Replica of the Display rendering of a ``RustType`` (compact JSON), as
    surfaced in ``raw_schema: {}`` (src/types/schema.rs:47-56; pinned by
    fixture ``raw_schema: 1``)."""
    return json.dumps(value, separators=(",", ":"))


def normalise_path(path: str) -> str:
    """Path normalisation exactly as the reference
    (src/types/validation_error.rs:18-26): ``"#/"`` → ``"#"``; otherwise strip
    a single trailing ``/``."""
    if path == "#/":
        return "#"
    if path.endswith("/"):
        return path[:-1]
    return path


@dataclass(frozen=True)
class ValidationError:
    """One violation row: (path, keyword, message) — src/types/validation_error.rs:5-10."""

    path: str
    keyword: str
    message: str

    @classmethod
    def new(cls, path: str, keyword: str, message: str) -> "ValidationError":
        return cls(normalise_path(path), keyword, message)

    def as_tuple(self) -> tuple[str, str, str]:
        return (self.path, self.keyword, self.message)


class SchemaError(Exception):
    """Compile-time schema failure — src/types/schema_error.rs:6-18.

    Only the ``Malformed`` variant carries fixture-pinned detail strings; other
    variants (UrlParse, LoaderError) surface as plain messages.
    """

    def __init__(self, detail: str, *, keyword: str = KeywordType.UNKNOWN, path: str = ""):
        super().__init__(detail)
        self.detail = detail
        self.keyword = keyword
        self.path = path

    @classmethod
    def malformed(cls, path: str, keyword: str, detail: str) -> "SchemaError":
        return cls(detail, keyword=keyword, path=path)


def unsupported_primitive_type_detail(name: str) -> str:
    """Exact message from json_trait_rs's TryFrom<&str> error, surfaced verbatim
    by the reference (fixture: src/keywords/type_.rs:158-168)."""
    return (
        f"Unsupported primitive type `{name}`. Available types are defined by "
        "`json_trait_rs::PrimitiveType::VARIANTS`"
    )


def wrong_value_type_detail(expected: str, value: Any) -> str:
    """``Values have to be of `{expected}` type. {value:?} has type `{t}`.``
    (src/keywords/type_.rs:34-45, src/keywords/properties_.rs:25-36)."""
    return (
        f"Values have to be of `{expected}` type. {rust_debug(value)} has type "
        f"`{primitive_type(value)}`."
    )


def non_object_schema_detail(raw_schema: Any) -> str:
    """``raw_schema type is {t} while is expected type object. raw_schema: {json}``
    (src/types/schema.rs:47-56)."""
    return (
        f"raw_schema type is {primitive_type(raw_schema)} while is expected type "
        f"object. raw_schema: {rust_display(raw_schema)}"
    )
