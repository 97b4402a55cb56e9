"""Exact distributed order statistics (SURVEY.md §2.2 aggregations row).

`ks_two_sample` is the exact two-sample Kolmogorov–Smirnov statistic — the
standard numeric-drift test a training-data pipeline runs between two data
slices (time periods, sources, shards). Unlike the sketch-based
`state/drift.py::ks_statistic_from_cdf` (t-digest approximation against a
reference CDF), this one is EXACT over the full data.

Scale shape: KS is an order statistic, so ONE global range sort of the
distinct-value fold is unavoidable. Everything around it is shrunk first:
a per-batch `(value, count_a, count_b)` fold turns the sort input from
row-scale into distinct-value-scale, then two tiny per-block passes (a
summary pass for cross-block prefix offsets, a vectorized CDF-gap pass)
finish the job. The per-block passes run as raw Ray tasks over the
materialized sorted block refs — the Dataset API cannot express a
cross-block prefix scan. Partitioning assumption (documented, exact): Ray
sort produces range-partitioned blocks that are value-disjoint except
possibly at boundary ties; a value whose run continues into the next block
(next block's min equals it) is evaluated only in the LAST block containing
it, where the prefix offsets already include every earlier occurrence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _fold_partial(value_col: str, side_col: str):
    def fold(batch: pa.Table) -> pa.Table:
        from ..rayutil import strip_meta

        sel = batch.select([value_col, side_col])
        mask = pc.and_kleene(pc.is_valid(sel[value_col]),
                             pc.is_valid(sel[side_col])).fill_null(False)
        sel = sel.filter(mask)
        side = sel[side_col].cast(pa.int64())
        t = pa.table({value_col: sel[value_col], "ca": side,
                      "cb": pc.subtract(pa.scalar(1, pa.int64()), side)})
        g = pa.TableGroupBy(t, value_col).aggregate([("ca", "sum"),
                                                     ("cb", "sum")])
        return strip_meta(pa.table({value_col: g[value_col],
                                    "ca": g["ca_sum"].cast(pa.int64()),
                                    "cb": g["cb_sum"].cast(pa.int64())}))
    return fold


def ks_two_sample(ds, value_col: str, side_col: str) -> dict:
    """Exact two-sample KS statistic between the rows where ``side_col``
    is 1 (sample A) and 0 (sample B). Null values/sides are dropped.

    Returns ``{"ks_stat": float, "n_a": int, "n_b": int}`` — the supremum
    CDF gap evaluated after all ties at each distinct value, matching the
    windowed-cumulative SQL formulation exactly.
    """
    import ray

    from ..rayutil import ensure_worker_importable
    ensure_worker_importable()

    folded = ds.map_batches(_fold_partial(value_col, side_col),
                            batch_format="pyarrow", zero_copy_batch=True)
    refs = folded.sort(value_col).materialize().to_arrow_refs()

    @ray.remote
    def blk_summary(t: pa.Table):
        if t.num_rows == 0:
            return (None, None, 0, 0)
        return (t[value_col][0].as_py(),
                t[value_col][t.num_rows - 1].as_py(),
                int(pc.sum(t["ca"]).as_py() or 0),
                int(pc.sum(t["cb"]).as_py() or 0))

    summaries = ray.get([blk_summary.remote(r) for r in refs])
    order = sorted((i for i, s in enumerate(summaries)
                    if s[0] is not None),
                   key=lambda i: (summaries[i][0], summaries[i][1]))
    n_a = sum(s[2] for s in summaries)
    n_b = sum(s[3] for s in summaries)
    if n_a == 0 or n_b == 0:
        raise ValueError("ks_two_sample: one sample is empty "
                         f"(n_a={n_a}, n_b={n_b})")

    @ray.remote
    def blk_gap(t: pa.Table, off_a: int, off_b: int, next_vmin):
        g = pa.TableGroupBy(t, value_col).aggregate([("ca", "sum"),
                                                     ("cb", "sum")])
        srt = g.sort_by(value_col)
        v = srt[value_col].to_numpy(zero_copy_only=False)
        cum_a = off_a + np.cumsum(
            srt["ca_sum"].to_numpy(zero_copy_only=False).astype(np.float64))
        cum_b = off_b + np.cumsum(
            srt["cb_sum"].to_numpy(zero_copy_only=False).astype(np.float64))
        d = np.abs(cum_a / n_a - cum_b / n_b)
        if next_vmin is not None:
            d = d[v != next_vmin]   # run continues: next block evaluates it
        return float(d.max()) if d.size else 0.0

    gaps, off_a, off_b = [], 0, 0
    for pos, i in enumerate(order):
        nxt = summaries[order[pos + 1]][0] if pos + 1 < len(order) else None
        gaps.append(blk_gap.remote(refs[i], off_a, off_b, nxt))
        off_a += summaries[i][2]
        off_b += summaries[i][3]
    return {"ks_stat": max(ray.get(gaps)), "n_a": n_a, "n_b": n_b}


def assign_global_rank(ds, sort_col: str, out: str = "pos",
                       descending: bool = False):
    """Global ``row_number() OVER (ORDER BY sort_col)`` (1-based): one Ray
    range sort, then a per-block count pass feeding driver-side prefix
    offsets (nblocks integers), then a per-block vectorized ``arange`` —
    the same cross-block prefix-scan shape as ``ks_two_sample``, expressed
    as raw Ray tasks over the sorted block refs because the Dataset API
    has no ordered-scan operator. Requires DISTINCT sort keys for a
    well-defined rank (duplicate keys get an arbitrary but consistent
    order within their run — callers needing SQL parity must pass a unique
    key). Returns a Dataset of ``ds``'s columns + ``out``.

    This is the primitive behind deterministic training-data shuffles:
    sort by a seeded hash mix of the id and assign positions.
    """
    import ray

    from ..rayutil import ensure_worker_importable
    ensure_worker_importable()

    refs = ds.sort(sort_col, descending=descending).materialize() \
        .to_arrow_refs()

    @ray.remote
    def blk_summary(t: pa.Table):
        if t.num_rows == 0:
            return (None, None, 0)
        return (t[sort_col][0].as_py(),
                t[sort_col][t.num_rows - 1].as_py(), t.num_rows)

    summaries = ray.get([blk_summary.remote(r) for r in refs])
    order = sorted((i for i, s in enumerate(summaries) if s[0] is not None),
                   key=lambda i: (summaries[i][0], summaries[i][1]),
                   reverse=descending)

    @ray.remote
    def blk_rank(t: pa.Table, offset: int) -> pa.Table:
        return t.append_column(out, pa.array(
            np.arange(offset + 1, offset + 1 + t.num_rows), pa.int64()))

    out_refs, offset = [], 0
    for i in order:
        out_refs.append(blk_rank.remote(refs[i], offset))
        offset += summaries[i][2]
    return ray.data.from_arrow_refs(out_refs)


def _avg_rank_ds(ds, col: str, out: str):
    """Distinct-value average ranks (the tie-aware rank Spearman needs):
    ``avg_rank(v) = (#values < v) + (count(v) + 1) / 2`` (1-based). One
    ``groupby(col).count`` fold to distinct values, one range sort of the
    distinct table, then the sorted-block prefix-offset pass (distinct
    keys, so no cross-block tie handling needed). Returns a Dataset of
    ``(col, out)``."""
    import ray
    from ray.data.aggregate import Count

    folded = ds.select_columns([col]).groupby(col) \
        .aggregate(Count(alias_name="cnt"))
    refs = folded.sort(col).materialize().to_arrow_refs()

    @ray.remote
    def blk_summary(t: pa.Table):
        if t.num_rows == 0:
            return (None, 0)
        return (t[col][0].as_py(), int(pc.sum(t["cnt"]).as_py() or 0))

    summaries = ray.get([blk_summary.remote(r) for r in refs])
    order = sorted((i for i, s in enumerate(summaries) if s[0] is not None),
                   key=lambda i: summaries[i][0])

    @ray.remote
    def blk_rank(t: pa.Table, offset: int) -> pa.Table:
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        before = offset + np.cumsum(cnt) - cnt
        return pa.table({col: t[col],
                         out: pa.array(before + (cnt + 1.0) / 2.0,
                                       pa.float64())})

    out_refs, offset = [], 0
    for i in order:
        out_refs.append(blk_rank.remote(refs[i], offset))
        offset += summaries[i][1]
    return ray.data.from_arrow_refs(out_refs)


def spearman_corr(ds_factory, x: str, y: str) -> dict:
    """Exact Spearman rank correlation with proper tie handling (average
    ranks) — Pearson correlation of the two rank variables.

    Composition of existing primitives, all scale-shaped: two average-rank
    derivations (distinct fold → range sort → prefix offsets), two
    reduce-side hash joins shipping ranks back to rows by value (the rank
    tables are distinct-value sized, so no broadcast assumption), then the
    mergeable-moments Pearson fold (zero shuffle). Rows with a null in
    either column are excluded before ranking (SQL WHERE parity).

    Returns ``{"spearman": float, "n": int}``.
    """
    from .aggregates import grouped_corr
    from .join import reduce_side_hash_join

    def base():
        def dropnulls(batch: pa.Table) -> pa.Table:
            from ..rayutil import strip_meta
            sel = batch.select([x, y])
            both = pc.and_kleene(pc.is_valid(sel[x]), pc.is_valid(sel[y]))
            return strip_meta(sel.filter(both.fill_null(False)))
        return ds_factory().map_batches(dropnulls, batch_format="pyarrow",
                                        zero_copy_batch=True)

    sample = base().limit(1).take_all()
    if not sample:
        raise ValueError("spearman_corr: no non-null (x, y) rows")
    xt = pa.array([sample[0][x]]).type
    yt = pa.array([sample[0][y]]).type
    base_schema = pa.schema([(x, xt), (y, yt)])

    rx = _avg_rank_ds(base(), x, "rx")
    ry = _avg_rank_ds(base(), y, "ry")
    j1 = reduce_side_hash_join(
        base(), rx, x,
        left_schema=base_schema,
        right_schema=pa.schema([(x, xt), ("rx", pa.float64())]))
    j2 = reduce_side_hash_join(
        j1, ry, y,
        left_schema=pa.schema([(x, xt), (y, yt), ("rx", pa.float64())]),
        right_schema=pa.schema([(y, yt), ("ry", pa.float64())]))

    def addkey(batch: pa.Table) -> pa.Table:
        from ..rayutil import strip_meta
        return strip_meta(batch).append_column(
            "_k", pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()))

    out = grouped_corr(j2.map_batches(addkey, batch_format="pyarrow",
                                      zero_copy_batch=True),
                       "_k", "rx", "ry")
    return {"spearman": out["corr"][0].as_py(), "n": out["n"][0].as_py()}
