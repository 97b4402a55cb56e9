"""CDC merge (SQL ``MERGE`` / upsert): apply a change stream to a
snapshot table (SURVEY.md §2.2 joins/set-ops rows; the warehouse
maintenance primitive every incremental ingest needs — the inverse of
``ops.join.table_diff``, which DERIVES a change stream from two
snapshots).

Distributed shape: ONE hash shuffle. Snapshot and changes are tagged
into the same key-hash buckets (side 0 / side 1), so every change lands
in the bucket holding the snapshot row it targets and the merge is a
purely local, vectorized per-bucket reduction — the same
``reduce_side_hash_join`` contract (``ops/join.py:35``) that makes outer
semantics hold globally. Nothing driver-side, nothing quadratic; skewed
keys cost what the key histogram says and can be salted upstream like
any other bucket shuffle in this repo.

At 100 TB the changes side is normally ≪ the snapshot: a future
broadcast fast path (changes below a byte cap shipped via ``ray.put``,
snapshot streamed once, zero shuffle) would mirror
``ops.dedup.incremental_dedup``'s two-route design; the bucket route
here is the always-correct fallback and the one the gate proves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def apply_changes(snapshot_ds, changes_ds, *, key: str,
                  seq_col: str = "seq", op_col: str = "op",
                  snapshot_schema: pa.Schema,
                  changes_schema: pa.Schema,
                  n_buckets: int = 0):
    """Apply a change stream to a snapshot; returns a Dataset with the
    snapshot's schema.

    Contract:

    - ``changes_ds`` carries ``key``, ``seq_col`` (monotone version),
      ``op_col`` (``"U"`` = upsert: update the row if the key exists,
      insert it otherwise; ``"D"`` = delete, a no-op for absent keys)
      plus every snapshot value column (null-allowed on deletes).
    - Per key, the change with the highest ``(seq, op)`` wins — the
      ``op`` tie-break makes equal-seq streams deterministic ("U" > "D"
      lexicographically, i.e. an upsert beats a delete at the same seq).
    - The snapshot is assumed key-unique (its primary key — enforceable
      via ``ops.integrity.integrity_report``). Null-keyed change rows
      are DROPPED (a change must address a row); null-keyed snapshot
      rows pass through unchanged (documented join-key contract,
      VERDICT r4 #7).

    Schemas are passed explicitly — the repo-wide rule: ``.schema()`` on
    a lazy Dataset executes a limit-1 probe.
    """
    from ..rayutil import default_buckets, strip_meta
    from ..stages.groupcheck import np_column_hash, run_starts
    from .join import _pad_to

    n_buckets = default_buckets(n_buckets)

    snap_names = list(snapshot_schema.names)
    for c in (key, seq_col, op_col):
        if c not in changes_schema.names:
            raise ValueError(f"changes side is missing column {c!r}")
    # fail at construction, not deep inside a worker: a snapshot column
    # named like the version/op columns (or the internal tags) would make
    # the union layout carry duplicate field names and the in-bucket
    # select/sort ambiguous
    clash = {seq_col, op_col, "_jb", "_side"} & set(snap_names)
    if clash:
        raise ValueError(
            f"snapshot columns collide with reserved names: {sorted(clash)}"
            f" (rename them or pass different seq_col/op_col)")
    # union layout: _jb, _side, snapshot cols, then seq/op (null on the
    # snapshot side)
    union_schema = pa.schema(
        [("_jb", pa.int64()), ("_side", pa.int8())]
        + list(zip(snapshot_schema.names, snapshot_schema.types))
        + [(seq_col, changes_schema.field(seq_col).type),
           (op_col, changes_schema.field(op_col).type)])
    pad_schema = pa.schema([(n, t) for n, t in zip(union_schema.names,
                                                   union_schema.types)
                            if n not in ("_jb", "_side")])

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            if side == 1:
                if batch[key].null_count:
                    batch = batch.filter(pc.is_valid(batch[key]))
                # loud op-domain check: anything that isn't exactly
                # "U"/"D" (incl. null) would otherwise win the
                # latest-per-key race and silently DELETE the target row
                bad = pc.invert(pc.is_in(
                    batch[op_col],
                    value_set=pa.array(["U", "D"]))).fill_null(True)
                if pc.any(bad).as_py():
                    n_bad = pc.sum(pc.cast(bad, pa.int64())).as_py()
                    raise ValueError(
                        f"{n_bad} change row(s) carry an op outside"
                        f" {{'U','D'}} (nulls included) — refusing to"
                        f" merge a malformed change stream")
            jb = (np_column_hash(batch[key]) % np.uint64(n_buckets)) \
                .astype(np.int64)
            out = _pad_to(batch, pad_schema)
            out = out.add_column(0, "_side", pa.array(
                np.full(batch.num_rows, side, np.int8), pa.int8()))
            return strip_meta(
                out.add_column(0, "_jb", pa.array(jb, pa.int64())))
        return fn

    tagged = snapshot_ds.map_batches(tag(0), batch_format="pyarrow",
                                     zero_copy_batch=True).union(
        changes_ds.map_batches(tag(1), batch_format="pyarrow",
                               zero_copy_batch=True))

    def merge_bucket(group: pa.Table) -> pa.Table:
        is_snap = pc.equal(group["_side"], 0)
        snap = group.filter(is_snap).select(snap_names)
        ch = group.filter(pc.invert(is_snap)) \
            .select(snap_names + [seq_col, op_col])
        if ch.num_rows == 0:
            return snap
        # latest change per key: sort (key asc, seq desc, op desc), keep
        # the first row of each key run — type-agnostic adjacent compare
        # (the Arrow-native run detection idiom, BASELINE.md round-4)
        ch = ch.sort_by([(key, "ascending"), (seq_col, "descending"),
                         (op_col, "descending")])
        latest = ch.filter(pa.array(run_starts(ch[key])))
        # every latest key displaces its snapshot row (update or delete)
        touched = latest[key].combine_chunks()
        kept = snap.filter(
            pc.invert(pc.is_in(snap[key], value_set=touched)))
        ups = latest.filter(
            pc.not_equal(latest[op_col], "D")).select(snap_names)
        return pa.concat_tables(
            [kept, ups.cast(pa.schema(list(zip(snapshot_schema.names,
                                               snapshot_schema.types))))])

    return tagged.groupby("_jb").map_groups(merge_bucket,
                                            batch_format="pyarrow")
