"""Distributed joins.

Two shapes (SURVEY.md §2.2 joins/lookups row):

- **Broadcast semi/anti join** for small dimension sides: ``ray.put`` the key
  set once, ``pc.is_in`` per batch (see the `ref` kernel and
  ``__ray_entry__.q_ref_check_lineitem``).
- **Reduce-side hash join** for LARGE-LARGE fact joins: both sides are
  tagged and bucketed by ``hash(key) % n_buckets``, shuffled with ONE
  groupby, and joined inside each bucket group with pyarrow's vectorized
  ``Table.join``. An optional ``group_fn`` post-processes each joined bucket
  in place (partial aggregation, local top-k) so only result-scale rows
  leave the shuffle. Because a key's rows land in exactly one bucket, an
  aggregation keyed by the join key completes inside the bucket — no second
  shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _pad_to(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    cols = []
    for f in schema:
        if f.name in batch.column_names:
            cols.append(batch[f.name].cast(f.type))
        else:
            cols.append(pa.nulls(batch.num_rows, f.type))
    return pa.table(dict(zip(schema.names, cols)), schema=schema)


def reduce_side_hash_join(left_ds, right_ds, key: str, *,
                          n_buckets: int = 0, group_fn=None):
    """Inner-join two Datasets on an integer ``key``; returns a Dataset of
    joined rows (or of ``group_fn``'s per-bucket output). Column names other
    than ``key`` must be disjoint across sides."""
    import ray

    from ..stages.groupcheck import np_column_hash

    if n_buckets <= 0:
        avail = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        n_buckets = 4 * avail

    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_names = list(l_schema.names)
    r_names = [n for n in r_schema.names if n != key]
    union_schema = pa.schema(
        [("_jb", pa.int64()), ("_side", pa.int8())]
        + list(zip(l_schema.names, l_schema.types))
        + [(n, t) for n, t in zip(r_schema.names, r_schema.types)
           if n != key])

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            jb = (np_column_hash(batch[key]) % np.uint64(n_buckets)) \
                .astype(np.int64)
            out = _pad_to(batch, pa.schema(
                [(n, t) for n, t in zip(union_schema.names,
                                        union_schema.types)
                 if n not in ("_jb", "_side")]))
            out = out.add_column(0, "_side", pa.array(
                np.full(batch.num_rows, side, np.int8), pa.int8()))
            return out.add_column(0, "_jb", pa.array(jb, pa.int64()))
        return fn

    tagged = left_ds.map_batches(tag(0), batch_format="pyarrow",
                                 zero_copy_batch=True).union(
        right_ds.map_batches(tag(1), batch_format="pyarrow",
                             zero_copy_batch=True))

    def join_bucket(group: pa.Table) -> pa.Table:
        is_l = pc.equal(group["_side"], 0)
        lt = group.filter(is_l).select(l_names)
        rt = group.filter(pc.invert(is_l)).select([key] + r_names)
        j = lt.join(rt, keys=key, join_type="inner")
        return group_fn(j) if group_fn is not None else j

    return tagged.groupby("_jb").map_groups(join_bucket,
                                            batch_format="pyarrow")
