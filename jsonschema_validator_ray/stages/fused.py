"""Fully-fused single-execution pipeline stage.

One read of the input, one shuffle, one collect:

    read_parquet → map_batches(FusedRowStage)            # full-width pass
        emits per batch: violation rows + one partial-sketch row
              + the (conv_id, turn_idx, ts) projection tagged kind="row",
        every row carrying a hash bucket key
    → groupby("_bucket") → map_groups(fused_bucket_check)
        kind="row" rows: sorted-run uniqueness/monotonicity check (vectorized)
        other kinds: pass through untouched
    → driver: split kinds, merge sketches, fold metrics

Tradeoff (measured at 70M rows, single node): saving the second read does NOT
pay for the fatter shuffle — the superset schema drags the violation/sketch
columns' offset/validity arrays through the 70M-row exchange, moving ~2-3x
the bytes of the dedicated 3-column shuffle. The sequential two-execution
"hashbucket" strategy is faster on this box; ``fused`` remains correct and
wins only where input re-reads are expensive relative to shuffle bandwidth
(cold remote storage). Assumes hashbucket semantics (whole conversations per
bucket — see stages/groupcheck.py skew note).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..constraints.ir import ConstraintIR, GroupCheck
from ..constraints.kernels import VIOLATION_SCHEMA, make_row_validator
from ..state.sketches import SketchState
from .groupcheck import SortedRunChecker

FUSED_SCHEMA = pa.schema([
    ("_bucket", pa.int64()),
    ("kind", pa.int8()),               # 0=row 1=violation 2=sketch 3=verdict
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("ts", pa.timestamp("us")),
    ("constraint_id", pa.string()),
    ("message", pa.string()),
    ("n_rows", pa.int64()),
    ("n_violations", pa.int64()),
    ("payload", pa.binary()),
])

KIND_ROW, KIND_VIOLATION, KIND_SKETCH, KIND_VERDICT = 0, 1, 2, 3


def _hash_buckets(col, n_buckets: int) -> np.ndarray:
    # numpy-only hash: no third-party lazy imports inside worker tasks
    from .groupcheck import np_column_hash

    return (np_column_hash(col) % np.uint64(n_buckets)).astype(np.int64)


class FusedRowStage:
    def __init__(self, ir: ConstraintIR, gc: GroupCheck, n_buckets: int,
                 mode: str = "enumerate", sketch: bool = True):
        if not isinstance(ir, ConstraintIR):
            import ray
            ir = ray.get(ir)
        self.ir = ir
        self.gc = gc
        self.n_buckets = n_buckets
        self.mode = mode
        self.sketch = sketch
        self.validate = make_row_validator(ir, mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        gc = self.gc
        buckets = _hash_buckets(batch[gc.group_key], self.n_buckets)
        parts = []

        # the projected data rows (kind=0); mistyped order/ts columns project
        # to nulls (those rows fired type kernels; group checks skip them)
        ts_col = batch[gc.ts_column] if gc.ts_column in batch.column_names \
            else None
        ts_ok = ts_col is not None and (
            pa.types.is_timestamp(ts_col.type) or pa.types.is_date(ts_col.type)
            or pa.types.is_integer(ts_col.type))
        parts.append(pa.table({
            "_bucket": pa.array(buckets, pa.int64()),
            "kind": pa.array(np.zeros(n, np.int8), pa.int8()),
            "conv_id": batch[gc.group_key].cast(pa.string()),
            "turn_idx": batch[gc.order_by].cast(pa.int32(), safe=False)
            if pa.types.is_integer(batch[gc.order_by].type)
            else pa.nulls(n, pa.int32()),
            "ts": ts_col.cast(pa.timestamp("us"), safe=False) if ts_ok
            else pa.nulls(n, pa.timestamp("us")),
            "constraint_id": pa.nulls(n, pa.string()),
            "message": pa.nulls(n, pa.string()),
            "n_rows": pa.nulls(n, pa.int64()),
            "n_violations": pa.nulls(n, pa.int64()),
            "payload": pa.nulls(n, pa.binary()),
        }, schema=FUSED_SCHEMA))

        out = self.validate(batch)
        if self.mode == "enumerate":
            k = out.num_rows
            if k:
                parts.append(pa.table({
                    "_bucket": pa.array(np.arange(k) % self.n_buckets, pa.int64()),
                    "kind": pa.array(np.full(k, KIND_VIOLATION, np.int8), pa.int8()),
                    "conv_id": out["conv_id"],
                    "turn_idx": out["turn_idx"],
                    "ts": pa.nulls(k, pa.timestamp("us")),
                    "constraint_id": out["constraint_id"],
                    "message": out["message"],
                    "n_rows": pa.nulls(k, pa.int64()),
                    "n_violations": pa.nulls(k, pa.int64()),
                    "payload": pa.nulls(k, pa.binary()),
                }, schema=FUSED_SCHEMA))
        else:
            parts.append(pa.table({
                "_bucket": pa.array([0], pa.int64()),
                "kind": pa.array([KIND_VERDICT], pa.int8()),
                "conv_id": pa.nulls(1, pa.string()),
                "turn_idx": pa.nulls(1, pa.int32()),
                "ts": pa.nulls(1, pa.timestamp("us")),
                "constraint_id": out["first_constraint_id"],
                "message": pa.nulls(1, pa.string()),
                "n_rows": out["n_rows"],
                "n_violations": out["n_violations"],
                "payload": pa.nulls(1, pa.binary()),
            }, schema=FUSED_SCHEMA))

        if self.sketch:
            s = SketchState()
            s.update_batch(batch)
            parts.append(pa.table({
                "_bucket": pa.array([int(buckets[0]) if n else 0], pa.int64()),
                "kind": pa.array([KIND_SKETCH], pa.int8()),
                "conv_id": pa.nulls(1, pa.string()),
                "turn_idx": pa.nulls(1, pa.int32()),
                "ts": pa.nulls(1, pa.timestamp("us")),
                "constraint_id": pa.nulls(1, pa.string()),
                "message": pa.nulls(1, pa.string()),
                "n_rows": pa.array([n], pa.int64()),
                "n_violations": pa.nulls(1, pa.int64()),
                "payload": pa.array([s.to_bytes()], pa.binary()),
            }, schema=FUSED_SCHEMA))
        return pa.concat_tables(parts)


def make_fused_bucket_check(gc: GroupCheck):
    # rows were projected into the FIXED fused columns conv_id/turn_idx/ts,
    # so the checker must read those names — NOT gc's input-table names
    # (a spec with group_by="session_id" would KeyError otherwise; review
    # r4). The violation cids keep the spec's original column names.
    import dataclasses

    pgc = dataclasses.replace(gc, group_key="conv_id", order_by="turn_idx",
                              ts_column="ts")
    checker = SortedRunChecker(pgc, boundary_mode="edges")
    checker.cid_unique = f"unique:({gc.group_key},{gc.order_by})"
    checker.cid_mono = f"mono:{gc.order_by}"

    def check(group: pa.Table) -> pa.Table:
        is_row = pc.equal(group["kind"], KIND_ROW)
        others = group.filter(pc.invert(is_row))
        rows = group.filter(is_row)
        if rows.num_rows == 0:
            return others
        srt = rows.select(["conv_id", "turn_idx", "ts"]).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")])
        out = checker(srt)
        v = out.filter(pc.equal(out["kind"], "violation"))
        k = v.num_rows
        if k == 0:
            return others
        viol = pa.table({
            "_bucket": pa.nulls(k, pa.int64()),
            "kind": pa.array(np.full(k, KIND_VIOLATION, np.int8), pa.int8()),
            "conv_id": v["conv_id"],
            "turn_idx": v["turn_idx"],
            "ts": pa.nulls(k, pa.timestamp("us")),
            "constraint_id": v["constraint_id"],
            "message": v["message"],
            "n_rows": pa.nulls(k, pa.int64()),
            "n_violations": pa.nulls(k, pa.int64()),
            "payload": pa.nulls(k, pa.binary()),
        }, schema=FUSED_SCHEMA)
        return pa.concat_tables([others, viol])
    return check


def split_fused(result: pa.Table):
    """Driver-side split of the fused output → (violations, sketch, counters)."""
    viol = result.filter(pc.equal(result["kind"], KIND_VIOLATION))
    violations = pa.table({n: viol[n] for n in VIOLATION_SCHEMA.names},
                          schema=VIOLATION_SCHEMA)
    sk = result.filter(pc.equal(result["kind"], KIND_SKETCH))
    state = SketchState()
    for payload in sk["payload"].to_pylist():
        state.merge(SketchState.from_bytes(payload))
    verd = result.filter(pc.equal(result["kind"], KIND_VERDICT))
    n_rows = sum(x or 0 for x in verd["n_rows"].to_pylist()) or state.n_rows
    n_row_violations = sum(x or 0 for x in verd["n_violations"].to_pylist())
    if n_row_violations == 0 and violations.num_rows:
        # enumerate mode emits no verdict rows: count non-group-check
        # violation rows, matching split_combined's semantics
        is_group = pc.or_(
            pc.starts_with(violations["constraint_id"], "mono:"),
            pc.starts_with(violations["constraint_id"], "unique:"))
        n_group = pc.sum(pc.cast(is_group, pa.int64())).as_py() or 0
        n_row_violations = violations.num_rows - int(n_group)
    return violations, state, {"n_rows": int(n_rows),
                               "n_row_violations": int(n_row_violations)}
