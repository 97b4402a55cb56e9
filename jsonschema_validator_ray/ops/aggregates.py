"""Profiling / aggregation operators (SURVEY.md §2.2 aggregations row).

Pattern: PARTIAL per-batch aggregation inside ``map_batches`` (vectorized
Arrow kernels), FINAL merge of the tiny partial rows — the combiner push-down
that keeps a 10^12-row profile from shuffling anything but per-batch
summaries. Grouped aggregates with small key domains use the same shape;
large-key groupbys go through ``Dataset.groupby`` (a real shuffle).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def profile_columns(ds, numeric_cols: Sequence[str] = (),
                    null_cols: Sequence[str] = (),
                    distinct_cols: Sequence[str] = (),
                    ts_cols: Sequence[str] = ()) -> pa.Table:
    """Single-row table profile: row count, per-column null counts, exact
    distinct counts (small-domain columns only), min/max of timestamp cols.

    Partial+final: each batch emits one summary row; the driver folds them.
    Exact distincts carry per-batch value sets — only valid for small domains
    (enums); use state.HyperLogLog for unbounded columns.
    """
    numeric_cols, null_cols = list(numeric_cols), list(null_cols)
    distinct_cols, ts_cols = list(distinct_cols), list(ts_cols)

    def partial(batch: pa.Table) -> pa.Table:
        out = {"n_rows": [batch.num_rows]}
        for c in null_cols:
            out[f"nulls_{c}"] = [batch.num_rows - pc.count(batch[c]).as_py()]
        for c in numeric_cols:
            out[f"min_{c}"] = [pc.min(batch[c]).as_py()]
            out[f"max_{c}"] = [pc.max(batch[c]).as_py()]
            out[f"sum_{c}"] = [pc.sum(batch[c]).as_py()]
        for c in ts_cols:
            out[f"min_{c}"] = [pc.min(batch[c]).as_py()]
            out[f"max_{c}"] = [pc.max(batch[c]).as_py()]
        for c in distinct_cols:
            vals = pc.unique(batch[c].combine_chunks()
                             if isinstance(batch[c], pa.ChunkedArray)
                             else batch[c]).drop_null()
            out[f"set_{c}"] = [[str(v) for v in vals.to_pylist()]]
        return pa.table(out)

    import ray
    parts = pa.concat_tables(ray.get(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs()),
        promote_options="default")

    final = {"n_rows": pa.array([pc.sum(parts["n_rows"]).as_py()], pa.int64())}
    for c in null_cols:
        final[f"n_null_{c}"] = pa.array(
            [pc.sum(parts[f"nulls_{c}"]).as_py()], pa.int64())
    for c in numeric_cols:
        final[f"min_{c}"] = pa.array([pc.min(parts[f"min_{c}"]).as_py()])
        final[f"max_{c}"] = pa.array([pc.max(parts[f"max_{c}"]).as_py()])
        final[f"sum_{c}"] = pa.array([pc.sum(parts[f"sum_{c}"]).as_py()])
    for c in ts_cols:
        final[f"min_{c}"] = pa.array([pc.min(parts[f"min_{c}"]).as_py()],
                                     parts[f"min_{c}"].type)
        final[f"max_{c}"] = pa.array([pc.max(parts[f"max_{c}"]).as_py()],
                                     parts[f"max_{c}"].type)
    for c in distinct_cols:
        merged = set()
        for s in parts[f"set_{c}"].to_pylist():
            merged.update(s)
        final[f"n_distinct_{c}"] = pa.array([len(merged)], pa.int64())
    return pa.table(final)


def value_counts(ds, column: str, flag_set: Optional[Sequence] = None,
                 flag_name: str = "is_valid") -> pa.Table:
    """Category histogram via partial per-batch ``value_counts`` + small final
    fold (no cluster shuffle for enum-sized domains). Optionally adds a
    membership flag against ``flag_set`` (the enum kernel's summary analog)."""
    def partial(batch: pa.Table) -> pa.Table:
        col = batch[column].combine_chunks() \
            if isinstance(batch[column], pa.ChunkedArray) else batch[column]
        vc = pc.value_counts(col.drop_null())
        return pa.table({
            column: pa.array([i["values"].as_py() for i in vc]),
            "n": pa.array([i["counts"].as_py() for i in vc], pa.int64()),
        })

    import ray
    parts = pa.concat_tables(ray.get(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs()),
        promote_options="default")
    folded = pa.TableGroupBy(parts, column).aggregate([("n", "sum")])
    out = pa.table({column: folded[column],
                    "n": folded["n_sum"].cast(pa.int64())})
    if flag_set is not None:
        flag = pc.is_in(out[column], value_set=pa.array(list(flag_set)))
        out = out.append_column(flag_name, flag)
    return out.sort_by(column)


def grouped_aggregate(ds, keys: Sequence[str], aggs: Sequence[tuple]) -> "ray.data.Dataset":  # noqa: F821
    """Grouped aggregate through Ray Data's shuffle ``groupby``.

    ``aggs``: (column, kind, alias) with kind in sum|count|min|max|mean.
    """
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    mk = {"sum": Sum, "count": Count, "min": Min, "max": Max, "mean": Mean}
    objs = []
    for col, kind, alias in aggs:
        if kind == "count":
            objs.append(Count(alias_name=alias))
        else:
            objs.append(mk[kind](col, alias_name=alias))
    return ds.groupby(list(keys)).aggregate(*objs)


def top_k(ds, key: str, k: int, *, descending: bool = True,
          tiebreak: Optional[str] = None) -> pa.Table:
    """Global top-k with deterministic tiebreak. PARTIAL top-k per batch (the
    only rows that can reach the global answer) → tiny driver-side final sort —
    no global sort shuffle."""
    cols = [key] + ([tiebreak] if tiebreak else [])

    def partial(batch: pa.Table) -> pa.Table:
        order = [(key, "descending" if descending else "ascending")]
        if tiebreak:
            order.append((tiebreak, "ascending"))
        return batch.sort_by(order).slice(0, k)

    import ray
    parts = pa.concat_tables(ray.get(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs()),
        promote_options="default")
    order = [(key, "descending" if descending else "ascending")]
    if tiebreak:
        order.append((tiebreak, "ascending"))
    return parts.sort_by(order).slice(0, k)
