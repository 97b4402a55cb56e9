"""Compiled Constraint IR + vectorized Arrow kernels (the table-scale analog of
the reference's compiled ``Schema`` validator list, src/types/schema.rs:12-19)."""

from .ir import (
    ConstraintIR,
    DriftCheck,
    GroupCheck,
    RowConstraint,
    TRANSCRIPT_SPEC,
    compile_constraints,
)
from .kernels import group_check_table, make_row_validator, VIOLATION_SCHEMA

__all__ = [
    "ConstraintIR",
    "DriftCheck",
    "GroupCheck",
    "RowConstraint",
    "TRANSCRIPT_SPEC",
    "compile_constraints",
    "group_check_table",
    "make_row_validator",
    "VIOLATION_SCHEMA",
]
