"""Wide-stage checks: (conv_id, turn_idx) uniqueness + ts monotonicity.

Two interchangeable strategies (pipelines/validate.py picks via ``strategy``):

1. **sorted-run merge** (default, skew-proof): ``ds.sort(["conv_id",
   "turn_idx"])`` range-partitions the (projected, 3-column) stream; each
   sorted block is checked with ONE fully-vectorized pass over all its
   conversation runs (no per-group Python), emitting one tiny boundary record
   per run; the driver merges boundaries to catch duplicates/regressions that
   straddle block splits. Hot conversations are split by the range partitioner
   at block granularity — bounded block size regardless of key skew — and the
   boundary merge restores exact global semantics.

2. **salted groupby** (north-star shape): ``groupby([conv_id, salt])`` where
   ``salt = turn_idx // salt_span`` splits hot conversations explicitly;
   per-group check + cross-bucket boundary merge (constraints/kernels.py
   group_check_table / merge_boundaries).

Check semantics (shared, FIXTURES.md §B):
- rows with null turn_idx are excluded (they already fired type/required),
- unique: adjacent equal turn_idx per conv (over all remaining rows),
- mono: over rows with VALID ts, in turn order, ts must be strictly
  increasing; violations attribute to the regressing row's turn_idx.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..constraints.ir import GroupCheck
from ..constraints.kernels import (
    VIOLATION_SCHEMA,
    group_check_table,
    merge_boundaries,
    _np,
)

RUN_BOUNDARY_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("first_tid", pa.int64()),
    ("last_tid", pa.int64()),
    ("first_vts", pa.float64()),   # first/last VALID ts in the run (us); NaN if none
    ("last_vts", pa.float64()),
    ("first_vtid", pa.int64()),    # tid of the first valid-ts row (mono attribution)
    ("last_vtid", pa.int64()),     # tid of the last valid-ts row
])

CHECK_OUT_SCHEMA = pa.schema([
    ("kind", pa.string()),         # "violation" | "boundary"
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("constraint_id", pa.string()),
    ("message", pa.string()),
    ("first_tid", pa.int64()),
    ("last_tid", pa.int64()),
    ("first_vts", pa.float64()),
    ("last_vts", pa.float64()),
    ("first_vtid", pa.int64()),
    ("last_vtid", pa.int64()),
])


class SortedRunChecker:
    """map_batches stage over blocks of the (conv_id, turn_idx, ts)-projected
    stream AFTER ds.sort([group_key, order_by]). One vectorized pass per block."""

    def __init__(self, gc: GroupCheck):
        self.gc = gc
        self.cid_unique = f"unique:({gc.group_key},{gc.order_by})"
        self.cid_mono = f"mono:{gc.order_by}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        gc = self.gc
        if batch.num_rows == 0:
            return CHECK_OUT_SCHEMA.empty_table()
        conv = _np(batch[gc.group_key].cast(pa.string()))
        tid_raw = batch[gc.order_by]
        keep = ~_np(pc.is_null(tid_raw))
        if not keep.all():
            conv = conv[keep]
        if conv.size == 0:
            return CHECK_OUT_SCHEMA.empty_table()
        tid = _np(tid_raw.cast(pa.int64()))[keep] if not keep.all() \
            else _np(tid_raw.cast(pa.int64()))
        ts = _np(batch[gc.ts_column].cast(pa.int64(), safe=False)).astype(np.float64)[keep] \
            if not keep.all() else \
            _np(batch[gc.ts_column].cast(pa.int64(), safe=False)).astype(np.float64)

        # blocks arrive sorted by (conv, tid); assert cheaply in debug only
        same = conv[1:] == conv[:-1]

        v_conv: list = []
        v_tid: list = []
        v_cid: list = []
        v_msg: list = []

        if gc.check_unique:
            dup = np.flatnonzero(same & (tid[1:] == tid[:-1])) + 1
            v_conv += conv[dup].tolist()
            v_tid += tid[dup].tolist()
            v_cid += [self.cid_unique] * dup.size
            v_msg += ["Duplicate key"] * dup.size

        valid = ts == ts
        if gc.check_mono and valid.any():
            cv, tv, sv = conv[valid], tid[valid], ts[valid]
            same_v = cv[1:] == cv[:-1]
            reg = np.flatnonzero(same_v & (sv[1:] < sv[:-1]) & (tv[1:] != tv[:-1])) + 1
            v_conv += cv[reg].tolist()
            v_tid += tv[reg].tolist()
            v_cid += [self.cid_mono] * reg.size
            v_msg += ["Non-monotonic ts for turn order"] * reg.size

        # per-run boundary records (runs = maximal same-conv spans in this block)
        run_starts = np.concatenate([[0], np.flatnonzero(~same) + 1])
        run_ends = np.concatenate([run_starts[1:], [conv.size]])  # exclusive
        n = conv.size
        idx = np.arange(n)
        masked_first = np.where(valid, idx, n)
        first_valid = np.minimum.reduceat(masked_first, run_starts)
        masked_last = np.where(valid, idx, -1)
        last_valid = np.maximum.reduceat(masked_last, run_starts)

        b_conv = conv[run_starts].tolist()
        b_first_tid = tid[run_starts].tolist()
        b_last_tid = tid[run_ends - 1].tolist()
        b_first_vts = [float(ts[int(f)]) if f < n else float("nan") for f in first_valid]
        b_last_vts = [float(ts[int(l)]) if l >= 0 else float("nan") for l in last_valid]
        b_first_vtid = [int(tid[int(f)]) if f < n else -1 for f in first_valid]
        b_last_vtid = [int(tid[int(l)]) if l >= 0 else -1 for l in last_valid]

        k = len(v_conv)
        r = len(b_conv)
        return pa.table({
            "kind": pa.array(["violation"] * k + ["boundary"] * r),
            "conv_id": pa.array(v_conv + b_conv, pa.string()),
            "turn_idx": pa.array([int(t) for t in v_tid] + [None] * r, pa.int32()),
            "constraint_id": pa.array(v_cid + [None] * r, pa.string()),
            "message": pa.array(v_msg + [None] * r, pa.string()),
            "first_tid": pa.array([None] * k + b_first_tid, pa.int64()),
            "last_tid": pa.array([None] * k + b_last_tid, pa.int64()),
            "first_vts": pa.array([None] * k + b_first_vts, pa.float64()),
            "last_vts": pa.array([None] * k + b_last_vts, pa.float64()),
            "first_vtid": pa.array([None] * k + b_first_vtid, pa.int64()),
            "last_vtid": pa.array([None] * k + b_last_vtid, pa.int64()),
        }, schema=CHECK_OUT_SCHEMA)


def merge_run_boundaries(boundaries: pa.Table, gc: GroupCheck) -> pa.Table:
    """Driver-side merge over per-run boundary records (tiny: one per conv per
    block split). Restores exact global semantics across block splits:
    duplicate keys straddling a split, and ts regressions whose adjacent pair
    was cut by the split."""
    if boundaries.num_rows == 0:
        return VIOLATION_SCHEMA.empty_table()
    tbl = boundaries.sort_by([("conv_id", "ascending"), ("first_tid", "ascending")])
    conv = _np(tbl["conv_id"].cast(pa.string()))
    first_tid = _np(tbl["first_tid"].cast(pa.int64()))
    last_tid = _np(tbl["last_tid"].cast(pa.int64()))
    first_vts = _np(tbl["first_vts"].cast(pa.float64()))
    last_vts = _np(tbl["last_vts"].cast(pa.float64()))
    first_vtid = _np(tbl["first_vtid"].cast(pa.int64()))
    last_vtid = _np(tbl["last_vtid"].cast(pa.int64()))
    same = conv[1:] == conv[:-1]

    out_conv: list = []
    out_tid: list = []
    out_cid: list = []
    out_msg: list = []

    if gc.check_unique:
        dup = np.flatnonzero(same & (first_tid[1:] == last_tid[:-1])) + 1
        out_conv += conv[dup].tolist()
        out_tid += first_tid[dup].tolist()
        out_cid += [f"unique:({gc.group_key},{gc.order_by})"] * dup.size
        out_msg += ["Duplicate key"] * dup.size
    if gc.check_mono:
        ok = same & (first_vts[1:] == first_vts[1:]) & (last_vts[:-1] == last_vts[:-1])
        reg = np.flatnonzero(ok & (first_vts[1:] < last_vts[:-1])
                             & (first_vtid[1:] != last_vtid[:-1])) + 1
        out_conv += conv[reg].tolist()
        out_tid += first_vtid[reg].tolist()
        out_cid += [f"mono:{gc.order_by}"] * reg.size
        out_msg += ["Non-monotonic ts for turn order"] * reg.size

    return pa.table({
        "conv_id": pa.array(out_conv, pa.string()),
        "turn_idx": pa.array([int(t) for t in out_tid], pa.int32()),
        "constraint_id": pa.array(out_cid, pa.string()),
        "message": pa.array(out_msg, pa.string()),
    }, schema=VIOLATION_SCHEMA)


# --- strategy 2: salted groupby (north-star shape) -------------------------

def add_salt_column(gc: GroupCheck):
    """map_batches fn adding ``_salt = turn_idx // salt_span`` (null → -1)."""
    def fn(batch: pa.Table) -> pa.Table:
        tid = _np(batch[gc.order_by].cast(pa.float64(), safe=False))
        salt = np.floor_divide(np.nan_to_num(tid, nan=-float(gc.salt_span)),
                               float(gc.salt_span)).astype(np.int64)
        return batch.append_column("_salt", pa.array(salt, pa.int64()))
    return fn


def make_salted_group_fn(gc: GroupCheck):
    """map_groups fn for groupby([group_key, _salt])."""
    def fn(group: pa.Table) -> pa.Table:
        return group_check_table(group, gc, emit_boundary=True)
    return fn


__all__ = [
    "SortedRunChecker",
    "merge_run_boundaries",
    "merge_boundaries",
    "add_salt_column",
    "make_salted_group_fn",
    "RUN_BOUNDARY_SCHEMA",
    "CHECK_OUT_SCHEMA",
]
