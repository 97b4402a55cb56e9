"""Cross-table integrity validation: primary-key uniqueness and
foreign-key orphan reports.

The reference validates one JSON document against one schema
(`/root/reference/src/types/schema.rs`); the table-engine generalization
of the same contract is *referential* validation — "every fk value in the
child table must exist as a pk value in the parent table" and "the pk
column must be unique and non-null". This module turns those constraints
into a single streaming report over any number of (child, parent)
relations.

100-TB shape: ONE pass per distinct table, no shuffle. Each pass folds
per-block `value_counts` partials (distinct keys + row counts per block)
into a driver-side dict, so driver state is DISTINCT-KEY scale, not row
scale — the same contract as `ref_check`'s broadcast lookup and
`incremental_dedup`'s snapshot set. For row-scale key cardinality
(e.g. an event-id pk at 100 TB), swap the exact fold for the
`bloom_semi_join(negate=True)` route in `ops/join.py` (no false negatives
→ orphan counts stay exact after the exact-verify of bloom survivors);
the report semantics are unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _key_partials(ds, col: str):
    """One streaming pass over ``ds``: returns (counts, n_rows, n_null)
    where ``counts`` maps each distinct non-null int64 key to its row
    count. Per-block work is a vectorized ``value_counts``; the driver
    fold is distinct-key scale."""
    import ray

    def part(batch: pa.Table) -> pa.Table:
        arr = batch[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n_null = arr.null_count
        vc = pc.value_counts(arr.drop_null().cast(pa.int64()))
        return pa.table({
            "keys": pa.array([vc.field("values").to_pylist()],
                             pa.list_(pa.int64())),
            "counts": pa.array([vc.field("counts").to_pylist()],
                               pa.list_(pa.int64())),
            "n_rows": pa.array([batch.num_rows], pa.int64()),
            "n_null": pa.array([n_null], pa.int64()),
        })

    parts = [t for t in ray.get(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .materialize().to_arrow_refs()) if t.num_rows]
    counts: dict = {}
    n_rows = 0
    n_null = 0
    for t in parts:
        n_rows += int(pc.sum(t["n_rows"]).as_py() or 0)
        n_null += int(pc.sum(t["n_null"]).as_py() or 0)
        for ks, cs in zip(t["keys"].to_pylist(), t["counts"].to_pylist()):
            for k, c in zip(ks, cs):
                counts[k] = counts.get(k, 0) + c
    return counts, n_rows, n_null


def integrity_report(pk_checks, fk_checks) -> pa.Table:
    """Build the integrity report table.

    ``pk_checks``: list of ``(label, ds, col)`` — one row per check with
    ``n_violations`` = duplicated pk rows (rows beyond the first per key)
    + null-pk rows, i.e. ``n_rows − count(DISTINCT col)`` in SQL terms
    (SQL DISTINCT excludes nulls, so null rows count as violations on
    both sides).

    ``fk_checks``: list of ``(label, child_ds, fk_col, parent_ds,
    pk_col)`` — ``n_violations`` = child rows whose fk has no matching
    parent pk, exactly SQL ``NOT EXISTS`` (a NULL fk matches no parent
    row, so it counts as an orphan — the corpus convention; filter nulls
    upstream for optional-reference semantics).

    Each distinct Dataset is scanned ONCE even when it appears in several
    checks (keyed by object identity). Keys must be integer-castable
    (the repo-wide join-key contract). Output columns:
    ``check_name, n_rows, n_violations``, sorted by ``check_name``.
    """
    scans: dict = {}

    def scan(ds, col):
        key = (id(ds), col)
        if key not in scans:
            scans[key] = _key_partials(ds, col)
        return scans[key]

    rows = []
    for label, ds, col in pk_checks:
        counts, n_rows, n_null = scan(ds, col)
        dup_extra = sum(c - 1 for c in counts.values() if c > 1)
        rows.append((label, n_rows, dup_extra + n_null))
    for label, child, fk_col, parent, pk_col in fk_checks:
        ccounts, c_rows, c_null = scan(child, fk_col)
        pcounts, _p_rows, _p_null = scan(parent, pk_col)
        if pcounts:
            pk_arr = np.fromiter(pcounts.keys(), np.int64, len(pcounts))
            pk_arr.sort()
            ck = np.fromiter(ccounts.keys(), np.int64, len(ccounts))
            cv = np.fromiter(ccounts.values(), np.int64, len(ccounts))
            pos = np.searchsorted(pk_arr, ck)
            pos[pos == len(pk_arr)] = 0
            orphan_rows = int(cv[pk_arr[pos] != ck].sum())
        else:
            orphan_rows = sum(ccounts.values())
        rows.append((label, c_rows, orphan_rows + c_null))

    rows.sort()
    return pa.table({
        "check_name": pa.array([r[0] for r in rows], pa.string()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
        "n_violations": pa.array([r[2] for r in rows], pa.int64()),
    })
