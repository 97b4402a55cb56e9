"""Compile/validate core of the fixture-parity Draft-4 validator.

Semantics replicated from the reference (all citations into /root/reference/):
- compile pipeline + keyword order Type→Properties→Ref: src/keywords/mod.rs:44-62
- schema-must-be-object guard: src/types/schema.rs:46-57
- URL-keyed compile cache + memory:// injection: src/types/scope_builder.rs:17-19, 43-54
- freeze/initialise + "Uninitialised schema" sentinel: src/types/scope_builder.rs:56-67,
  src/types/schema.rs:60-73
- `type` keyword: src/keywords/type_.rs:47-109
- `properties` keyword: src/keywords/properties_.rs:48-135
- `$ref` keyword: src/keywords/ref_.rs:23-61

This is a fresh Python implementation of those observable semantics (the
reference is Rust); no code is translated line-by-line.
"""

from __future__ import annotations

import uuid
from collections import Counter
from typing import Any, Callable, Iterator, Optional

from .types import (
    KeywordType,
    SchemaError,
    ValidationError,
    non_object_schema_detail,
    primitive_type,
    unsupported_primitive_type_detail,
    wrong_value_type_detail,
    PRIMITIVE_TYPES,
)
from .urijoin import full_uri, split_fragment


def _resolve_pointer(doc: Any, fragment: str) -> Any:
    """Resolve a JSON-Pointer fragment (``""``, ``"/definitions/model"``) in a doc.

    Per RFC 6901 §6 the WHOLE fragment is URI-percent-decoded first (so an
    encoded ``%2F`` acts as a token separator — member names containing a
    literal ``/`` are addressed via ``~1``; ADVICE r3), then split on ``/``,
    then each token JSON-Pointer-unescaped (``~1`` → ``/``, ``~0`` → ``~``,
    in that order). Covers the official draft4 suite ``ref.json`` "escaped
    pointer ref" cases."""
    from urllib.parse import unquote

    node = doc
    decoded = unquote(fragment)
    if not decoded:
        return node
    # consume exactly ONE leading separator (RFC 6901: "/" is the pointer
    # [""], "//x" is ["", "x"]): lstrip would collapse empty tokens and
    # resolve refs through an empty-string member to the wrong node
    if decoded.startswith("/"):
        tokens = decoded[1:].split("/")
    else:
        tokens = decoded.split("/")   # plain-name fragment (non-pointer)
    for token in tokens:
        token = token.replace("~1", "/").replace("~0", "~")
        if isinstance(node, dict):
            try:
                node = node[token]
            except KeyError:
                raise SchemaError(
                    f"Loader Error: cannot resolve pointer {fragment!r}") from None
        elif isinstance(node, list):
            try:
                node = node[int(token)]
            except (ValueError, IndexError):
                raise SchemaError(
                    f"Loader Error: cannot resolve pointer {fragment!r}") from None
        else:
            raise SchemaError(f"Loader Error: cannot resolve pointer {fragment!r}")
    return node


class Validator:
    """Contract every keyword implements (analog of src/types/validator.rs:5-19)."""

    keyword = KeywordType.UNKNOWN

    def validation_errors(self, path: str, value: Any) -> Iterator[ValidationError]:
        raise NotImplementedError

    def is_valid(self, path: str, value: Any) -> bool:
        # Default: first error exists? (src/types/validator.rs:14-16,
        # src/keywords/mod.rs:30-32 — the error-iterator path is the single
        # source of truth; see SURVEY.md §2.1 quirk note.)
        return next(self.validation_errors(path, value), None) is None


class TypeValidator(Validator):
    """``type`` keyword: instance primitive type ∈ declared set
    (src/keywords/type_.rs:47-109). Note the reference compares by *equality*,
    so an integer instance fails ``{"type": "number"}`` — replicated as-is."""

    keyword = KeywordType.TYPE

    def __init__(self, types: frozenset):
        self.types = types

    @classmethod
    def compile(cls, scope_builder: "ScopeBuilder", schema: "Schema") -> Optional["TypeValidator"]:
        attr = schema.get_attribute("type")
        if attr is None:
            return None

        def parse_one(name_value: Any) -> str:
            if not isinstance(name_value, str) or isinstance(name_value, bool):
                raise SchemaError.malformed(
                    schema.path, KeywordType.TYPE, wrong_value_type_detail("string", name_value)
                )
            if name_value not in PRIMITIVE_TYPES:
                raise SchemaError.malformed(
                    schema.path, KeywordType.TYPE, unsupported_primitive_type_detail(name_value)
                )
            return name_value

        if isinstance(attr, str):
            types = frozenset((parse_one(attr),))
        elif isinstance(attr, list):
            if not attr:
                raise SchemaError.malformed(
                    schema.path, KeywordType.TYPE, "This array MUST have at least one element."
                )
            types = frozenset(parse_one(item) for item in attr)
        else:
            raise SchemaError.malformed(
                schema.path, KeywordType.TYPE, wrong_value_type_detail("string", attr)
            )
        return cls(types)

    def validation_errors(self, path: str, value: Any) -> Iterator[ValidationError]:
        if primitive_type(value) not in self.types:
            yield ValidationError.new(path, KeywordType.TYPE, "Invalid Type")


def property_path(schema_path: str, property_name: str) -> str:
    """Compile path of a property sub-schema:
    ``{base}#{fragment-trimmed}/properties/{name}`` (src/keywords/properties_.rs:38-46)."""
    doc, frag = split_fragment(schema_path)
    return f"{doc}#{frag.rstrip('/')}/properties/{property_name}"


class PropertiesValidator(Validator):
    """``properties`` keyword: per-field sub-schema application
    (src/keywords/properties_.rs:48-135). Absent properties are skipped;
    non-object instances pass vacuously."""

    keyword = KeywordType.PROPERTIES

    def __init__(self, properties: dict):
        self.properties = properties

    @classmethod
    def compile(cls, scope_builder: "ScopeBuilder", schema: "Schema") -> Optional["PropertiesValidator"]:
        attr = schema.get_attribute("properties")
        if attr is None:
            return None
        if not isinstance(attr, dict):
            raise SchemaError.malformed(
                schema.path, KeywordType.PROPERTIES, wrong_value_type_detail("object", attr)
            )

        compiled: dict = {}
        faulty_urls: list[str] = []
        for name, sub_raw in attr.items():
            sub_path = property_path(schema.path, name)
            if isinstance(sub_raw, dict):
                compiled[name] = scope_builder.schema(sub_path, sub_raw)
            else:
                faulty_urls.append(sub_path)
        if faulty_urls:
            raise SchemaError.malformed(
                schema.path,
                KeywordType.PROPERTIES,
                "Values of properties object must be of object type. The following "
                "URLs are recognized as faulty: " + ", ".join(faulty_urls),
            )
        return cls(compiled)

    def validation_errors(self, path: str, value: Any) -> Iterator[ValidationError]:
        if not isinstance(value, dict):
            return
        for name, sub_schema in self.properties.items():
            if name in value:
                yield from sub_schema.validation_errors(f"{path}/{name}", value[name])


class RefValidator(Validator):
    """``$ref`` keyword: resolve against the schema path, fetch through the
    loader, compile (cache-deduped), delegate validation
    (src/keywords/ref_.rs:23-61)."""

    keyword = KeywordType.REF

    def __init__(self, referenced_uri: str, referenced_schema: "Schema"):
        self.referenced_uri = referenced_uri
        self.referenced_schema = referenced_schema

    @classmethod
    def compile(cls, scope_builder: "ScopeBuilder", schema: "Schema") -> Optional["RefValidator"]:
        attr = schema.get_attribute("$ref")
        if attr is None or not isinstance(attr, str):
            # non-string $ref is ignored (src/keywords/ref_.rs:35-40)
            return None
        referenced_uri = full_uri(schema.path, attr)
        referenced_raw = scope_builder.retrieve_schema(referenced_uri)
        referenced_schema = scope_builder.schema(referenced_uri, referenced_raw)
        return cls(referenced_uri, referenced_schema)

    def validation_errors(self, path: str, value: Any) -> Iterator[ValidationError]:
        yield from self.referenced_schema.validation_errors(path, value)


# Keyword registry in reference compile order (src/keywords/mod.rs:47-58).
# Extension surface: register a new class here (analog of add-a-branch).
KEYWORD_VALIDATORS: tuple = (TypeValidator, PropertiesValidator, RefValidator)


class Schema:
    """A compiled validator set over one raw JSON schema (src/types/schema.rs:12-19)."""

    def __init__(self, path: str, raw_schema: Any):
        self.path = path
        self.raw_schema = raw_schema
        self.validators: list[Validator] = []
        self.is_initialised = False

    def get_attribute(self, name: str) -> Any:
        return self.raw_schema.get(name) if isinstance(self.raw_schema, dict) else None

    def inspect_validator(self, keyword_type: KeywordType, fn):
        """Run ``fn`` on this schema's first validator of ``keyword_type``
        — or on ``None`` when the keyword compiled to no validator — and
        return ``fn``'s result. Analog of the reference's test-only
        ``Schema::do_on_validator`` (src/types/schema.rs:80-88): the
        sanctioned introspection hook, so callers never have to reach into
        ``schema.validators`` directly."""
        for validator in self.validators:
            if validator.keyword == keyword_type:
                return fn(validator)
        return fn(None)

    @classmethod
    def create(cls, scope_builder: "ScopeBuilder", path: str, raw_schema: Any) -> "Schema":
        if not isinstance(raw_schema, dict):
            raise SchemaError.malformed(
                path, KeywordType.UNKNOWN, non_object_schema_detail(raw_schema)
            )
        schema = cls(path, raw_schema)
        # Register in the cache before compiling sub-schemas so self-referential
        # `$ref` chains terminate (the reference memoizes compiled refs,
        # src/types/scope_builder.rs:43-54).
        scope_builder._cache_put(path, schema)
        for keyword_cls in KEYWORD_VALIDATORS:
            validator = keyword_cls.compile(scope_builder, schema)
            if validator is not None:
                schema.validators.append(validator)
        return schema

    def initialise(self) -> None:
        self.is_initialised = True

    def validation_errors(self, path: str, value: Any) -> list[ValidationError]:
        """Enumerate-all mode (src/types/schema.rs:67-74; eager, like the
        reference's collected iterator)."""
        if not self.is_initialised:
            return [ValidationError.new(path, KeywordType.UNKNOWN, "Uninitialised schema")]
        out: list[ValidationError] = []
        for validator in self.validators:
            out.extend(validator.validation_errors(path, value))
        return out

    def is_valid(self, path: str = "#", value: Any = None) -> bool:
        """Fail-fast verdict mode (src/types/schema.rs:76-78)."""
        if not self.is_initialised:
            return False
        return all(v.is_valid(path, value) for v in self.validators)


class ScopeBuilder:
    """Mutable compile-time registry: URL-keyed schema cache + document loader
    (src/types/scope_builder.rs:10-67)."""

    def __init__(self, loader: Optional[Callable[[str], Any]] = None):
        self._schema_cache: dict[str, Schema] = {}
        self._documents: dict[str, Any] = {}
        self._loader = loader
        self.load_counts: Counter = Counter()

    def inject_schema(self, raw_schema: Any) -> str:
        url = f"memory:///{uuid.uuid4()}"
        self._documents[url] = raw_schema
        return url

    def retrieve_schema(self, uri: str) -> Any:
        doc_uri, frag = split_fragment(uri)
        if doc_uri not in self._documents:
            if self._loader is None:
                raise SchemaError(f"Loader Error: no loader to fetch {doc_uri}")
            self._documents[doc_uri] = self._loader(doc_uri)
            self.load_counts[doc_uri] += 1
        return _resolve_pointer(self._documents[doc_uri], frag)

    def _cache_put(self, path: str, schema: Schema) -> None:
        self._schema_cache[path] = schema

    def schema(self, path: str, raw_schema: Any) -> Schema:
        cached = self._schema_cache.get(path)
        if cached is not None:
            return cached
        return Schema.create(self, path, raw_schema)

    def build(self) -> "Scope":
        for schema in self._schema_cache.values():
            schema.initialise()
        return Scope(dict(self._schema_cache))


class Scope:
    """Frozen compile result (src/types/scope.rs:5-9)."""

    def __init__(self, schema_cache: dict):
        self.schema_cache = schema_cache


def compile_schema(raw_schema: Any, loader: Optional[Callable[[str], Any]] = None) -> Schema:
    """Convenience: inject → compile → build → return the root schema
    (analog of the test-only draft4_schema, src/types/schema.rs:91-96)."""
    builder = ScopeBuilder(loader)
    url = builder.inject_schema(raw_schema)
    root = builder.schema(url, raw_schema)
    builder.build()
    return root
