"""Driver-side per-document JSON Schema Draft-4 validator (fixture parity mode).

Re-implements, from scratch in Python, the observable semantics of the Rust
reference crate ``jsonschema-validator`` — the three Draft-4 keywords it supports
(``type``, ``properties``, ``$ref``), its compile/validate split, its error
model, and its exact error message strings — so that the engine's fixture suite
byte-matches the reference's own golden tests (reference:
src/keywords/type_.rs:158-200, src/keywords/properties_.rs:209-238,
src/keywords/ref_.rs:225-236, src/types/schema.rs:105-119).

This module is small, pure-Python, and driver-side only: it is the parity
anchor for message/path semantics that the table-scale Arrow kernels in
``constraints.kernels`` reuse.
"""

from .types import (
    KeywordType,
    PRIMITIVE_TYPES,
    SchemaError,
    ValidationError,
    normalise_path,
    primitive_type,
)
from .schema import Schema, Scope, ScopeBuilder, compile_schema
from .urijoin import full_uri

__all__ = [
    "KeywordType",
    "PRIMITIVE_TYPES",
    "SchemaError",
    "ValidationError",
    "normalise_path",
    "primitive_type",
    "Schema",
    "Scope",
    "ScopeBuilder",
    "compile_schema",
    "full_uri",
]
