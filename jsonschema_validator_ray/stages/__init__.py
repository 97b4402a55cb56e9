"""Ray Data stages: fused row-validate+sketch actor stage, sorted-run group
checker, salted-groupby group checker."""

from .rowstage import RowValidateAndSketch, COMBINED_SCHEMA, split_combined
from .groupcheck import (
    RUN_BOUNDARY_SCHEMA,
    SortedRunChecker,
    merge_run_boundaries,
    make_salted_group_fn,
    add_salt_column,
)

__all__ = [
    "RowValidateAndSketch",
    "COMBINED_SCHEMA",
    "split_combined",
    "RUN_BOUNDARY_SCHEMA",
    "SortedRunChecker",
    "merge_run_boundaries",
    "make_salted_group_fn",
    "add_salt_column",
]
