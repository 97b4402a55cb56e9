"""Constraint spec → compiled Constraint IR.

The table-scale analog of the reference's compile pipeline
(src/keywords/mod.rs:44-62): a declarative JSON-able spec is compiled ONCE on
the driver into an ordered list of typed constraint objects, content-hashed for
lineage, and shipped to workers via closure capture / ``ray.put``. All spec
errors are raised eagerly on the driver with reference-style ``Malformed``
detail strings (src/keywords/type_.rs:34-45, 70-74) — never on the data plane.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Optional

from ..jsonvalidate.types import (
    KeywordType,
    SchemaError,
    unsupported_primitive_type_detail,
    wrong_value_type_detail,
)

# Engine column types: the seven JSON primitives generalized with `timestamp`
# (the input table needs it; JSON has no time type — SURVEY.md §1.2).
COLUMN_TYPES = ("null", "boolean", "integer", "number", "string", "timestamp")

SPEC_VERSION = 1  # analog of DraftVersion (src/types/draft_version.rs:1-11)


@dataclass(frozen=True)
class RowConstraint:
    """One row-local constraint kernel: evaluated vectorized inside the fused
    ``map_batches`` validate stage. ``params`` must stay hashable/JSON-able."""

    cid: str           # e.g. "enum:role" — lands in the violation rows
    kind: str          # type | enum | required | format_len | format_range | ref
    column: str
    params: tuple = ()
    message: str = ""


@dataclass(frozen=True)
class GroupCheck:
    """Shuffle-stage check: monotonicity + key uniqueness per group
    (groupby(group_key) → sort(order_by) → adjacent scan)."""

    group_key: str = "conv_id"
    order_by: str = "turn_idx"
    ts_column: str = "ts"
    check_unique: bool = True     # unique:(group_key, order_by)
    check_mono: bool = True       # mono: ts strictly increasing in order_by order
    salt_span: int = 4096         # turn_idx // span → salt bucket for hot groups


@dataclass(frozen=True)
class DriftCheck:
    """Distribution-drift constraint evaluated on merged sketch state."""

    cid: str                      # "drift:rolefreq" | "drift:turnlen"
    kind: str                     # "chi2" | "ks"
    column: str
    reference: tuple              # chi2: ((value, freq), ...); ks: ((edge, cdf), ...)
    threshold: float = 0.05       # chi2: min p-value; ks: max KS statistic


@dataclass
class ConstraintIR:
    """The frozen compile result (analog of the built ``Scope``,
    src/types/scope_builder.rs:56-67). ``ir_hash`` stamps lineage manifests;
    a resume run refuses to mix partitions from a different hash."""

    row_constraints: list = field(default_factory=list)
    group_check: Optional[GroupCheck] = None
    drift_checks: list = field(default_factory=list)
    dictionaries: dict = field(default_factory=dict)   # name -> tuple of values
    columns: dict = field(default_factory=dict)        # column -> declared type set
    ir_hash: str = ""

    def dictionary_for(self, constraint: RowConstraint) -> tuple:
        return self.dictionaries[constraint.params[0]]


def _ir_hash(spec: dict) -> str:
    return hashlib.sha256(
        json.dumps(spec, sort_keys=True, separators=(",", ":"), default=str).encode()
    ).hexdigest()[:16]


def _parse_type_set(column: str, declared: Any) -> frozenset:
    """Parse a ``type`` declaration with the reference's exact error semantics
    (src/keywords/type_.rs:48-95), extended with `timestamp`."""

    def parse_one(name: Any) -> str:
        if not isinstance(name, str) or isinstance(name, bool):
            raise SchemaError.malformed(
                column, KeywordType.TYPE, wrong_value_type_detail("string", name)
            )
        if name not in COLUMN_TYPES:
            raise SchemaError.malformed(
                column, KeywordType.TYPE, unsupported_primitive_type_detail(name)
            )
        return name

    if isinstance(declared, str):
        return frozenset((parse_one(declared),))
    if isinstance(declared, list):
        if not declared:
            raise SchemaError.malformed(
                column, KeywordType.TYPE, "This array MUST have at least one element."
            )
        return frozenset(parse_one(n) for n in declared)
    raise SchemaError.malformed(
        column, KeywordType.TYPE, wrong_value_type_detail("string", declared)
    )


def compile_constraints(spec: dict) -> ConstraintIR:
    """Compile a constraint spec into the frozen IR.

    Spec shape::

        {"version": 1,
         "columns": {col: {"type": str|[str], "required": bool,
                           "enum": [..], "ref": dict_name,
                           "max_length": int, "min_length": int,
                           "min": value, "max": value}},
         "table": {"monotonic": {...GroupCheck fields...} | None,
                   "unique": bool,
                   "drift": {"rolefreq": {"column", "reference": {v: freq},
                                          "min_pvalue": float},
                             "turnlen": {"column", "reference_cdf": [[edge, cdf]..],
                                         "max_ks": float}}},
         "dictionaries": {name: [values...]}}
    """
    if not isinstance(spec, dict):
        raise SchemaError.malformed("#", KeywordType.UNKNOWN,
                                    wrong_value_type_detail("object", spec))
    if spec.get("version", SPEC_VERSION) != SPEC_VERSION:
        raise SchemaError(f"Unsupported spec version {spec.get('version')!r}")

    ir = ConstraintIR(ir_hash=_ir_hash(spec))
    ir.dictionaries = {k: tuple(v) for k, v in (spec.get("dictionaries") or {}).items()}

    columns = spec.get("columns") or {}
    if not isinstance(columns, dict):
        raise SchemaError.malformed("columns", KeywordType.PROPERTIES,
                                    wrong_value_type_detail("object", columns))
    for col, cspec in columns.items():
        if not isinstance(cspec, dict):
            raise SchemaError.malformed(
                col, KeywordType.PROPERTIES,
                "Values of properties object must be of object type. The following "
                f"URLs are recognized as faulty: #/columns/{col}",
            )
        if "type" in cspec:
            types = _parse_type_set(col, cspec["type"])
            ir.columns[col] = types
            ir.row_constraints.append(RowConstraint(
                cid=f"type:{col}", kind="type", column=col,
                params=tuple(sorted(types)), message="Invalid Type"))
        if cspec.get("required"):
            ir.row_constraints.append(RowConstraint(
                cid=f"required:{col}", kind="required", column=col,
                message="Required property is missing"))
        if "enum" in cspec:
            values = cspec["enum"]
            if not isinstance(values, list) or not values:
                raise SchemaError.malformed(
                    col, KeywordType.TYPE, "This array MUST have at least one element.")
            ir.row_constraints.append(RowConstraint(
                cid=f"enum:{col}", kind="enum", column=col,
                params=tuple(values), message="Value not in enumeration"))
        if "max_length" in cspec or "min_length" in cspec:
            ir.row_constraints.append(RowConstraint(
                cid=f"format:{col}", kind="format_len", column=col,
                params=(cspec.get("min_length", 0), cspec.get("max_length")),
                message="String length out of bounds"))
        if "min" in cspec or "max" in cspec:
            ir.row_constraints.append(RowConstraint(
                cid=f"range:{col}", kind="format_range", column=col,
                params=(cspec.get("min"), cspec.get("max")),
                message="Value out of range"))
        if "ref" in cspec:
            dict_name = cspec["ref"]
            if dict_name not in ir.dictionaries:
                # analog of a $ref the loader cannot resolve (src/keywords/ref_.rs:42-44)
                raise SchemaError(f"Loader Error: no dictionary named {dict_name!r}")
            ir.row_constraints.append(RowConstraint(
                cid=f"ref:{col}", kind="ref", column=col,
                params=(dict_name,), message="Unresolved reference"))

    table = spec.get("table") or {}
    mono = table.get("monotonic")
    unique = table.get("unique", False)
    if mono or unique:
        mono = mono or {}
        ir.group_check = GroupCheck(
            group_key=mono.get("group_by", "conv_id"),
            order_by=mono.get("order_by", "turn_idx"),
            ts_column=mono.get("column", "ts"),
            check_unique=bool(unique),
            check_mono=bool(table.get("monotonic")),
            salt_span=int(mono.get("salt_span", 4096)),
        )

    drift = table.get("drift") or {}
    if "rolefreq" in drift:
        d = drift["rolefreq"]
        ir.drift_checks.append(DriftCheck(
            cid="drift:rolefreq", kind="chi2", column=d.get("column", "role"),
            reference=tuple(sorted((str(k), float(v)) for k, v in d["reference"].items())),
            threshold=float(d.get("min_pvalue", 0.001))))
    if "turnlen" in drift:
        d = drift["turnlen"]
        ir.drift_checks.append(DriftCheck(
            cid="drift:turnlen", kind="ks", column=d.get("column", "text"),
            reference=tuple((float(e), float(c)) for e, c in d["reference_cdf"]),
            threshold=float(d.get("max_ks", 0.15))))

    return ir


# The default transcript-table spec (BASELINE.json input_hint):
# (conv_id:string, turn_idx:int32, role:string, text:string, tool:string, ts:timestamp)
ROLES = ("system", "user", "assistant", "tool")

TOOL_DICTIONARY = tuple(
    f"{ns}.{name}"
    for ns in ("search", "code", "file", "web")
    for name in ("open", "read", "write", "exec", "list", "query", "fetch", "close")
)  # 32 fixed names (FIXTURES.md §B)

TRANSCRIPT_SPEC = {
    "version": SPEC_VERSION,
    "columns": {
        "conv_id": {"type": "string", "required": True},
        "turn_idx": {"type": "integer", "required": True},
        "role": {"type": "string", "required": True, "enum": list(ROLES)},
        "text": {"type": "string", "required": True, "max_length": 32768},
        "tool": {"type": ["string", "null"], "ref": "tools"},
        "ts": {"type": "timestamp", "required": True,
               "min": "2020-01-01T00:00:00", "max": "2035-01-01T00:00:00"},
    },
    "table": {
        "monotonic": {"group_by": "conv_id", "order_by": "turn_idx",
                      "column": "ts", "salt_span": 4096},
        "unique": True,
        # drift reference stats are attached by the caller (computed from a
        # clean generation — sources/transcripts.py writes them next to the data)
    },
    "dictionaries": {"tools": list(TOOL_DICTIONARY)},
}
