"""Sampling operators.

Two shapes, both streaming (one vectorized ``map_batches`` filter, no
shuffle, no driver materialization):

- ``hash_sample``: DETERMINISTIC sampling by a key column via Knuth
  multiplicative hashing — the same rows are kept on every run, at any block
  split, and the predicate is reproducible in plain SQL
  (``(key * 2654435761 + seed * 2654435769) % 2^32 < fraction * 2^32``).
  This is the
  sampling to use inside resumable pipelines (re-runs see the same sample)
  and for oracle-checked queries.
- ``random_sample``: seeded pseudo-random sampling for rows without a usable
  key — deterministic PER (seed, row-position-hash) so it stays stable under
  Ray's block splitting by hashing the row's content columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.hll import hash64

KNUTH = np.uint64(2654435761)
SEED_MIX = np.uint64(2654435769)   # seed is spread across the hash space —
_MOD = np.uint64(1) << np.uint64(32)  # a raw +seed would barely move the set


def _keep_mask_from_ints(ids: np.ndarray, fraction: float,
                         seed: int) -> np.ndarray:
    h = (ids.astype(np.uint64) * KNUTH + np.uint64(seed) * SEED_MIX) % _MOD
    return h < np.uint64(int(fraction * float(1 << 32)))


def hash_sample(ds, key_column: str, fraction: float, seed: int = 42):
    """Deterministic keyed sample: keep rows whose Knuth-hashed key falls
    under ``fraction``. Integer keys use the SQL-reproducible multiplicative
    hash; other dtypes hash via the vectorized 64-bit column hash."""
    def keep(batch: pa.Table) -> pa.Table:
        col = batch[key_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            ids = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            mask = _keep_mask_from_ints(ids, fraction, seed)
        else:
            h = (hash64(col) + np.uint64(seed) * SEED_MIX) % _MOD
            mask = h < np.uint64(int(fraction * float(1 << 32)))
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def random_sample(ds, fraction: float, seed: int = 42,
                  salt_columns: list | None = None):
    """Seeded pseudo-random sample without a designated key: the keep
    decision hashes the first (or given) columns' values, so it is stable
    under block re-splitting and resume — unlike RNG-per-task sampling."""
    def keep(batch: pa.Table) -> pa.Table:
        cols = salt_columns or batch.column_names[:1]
        acc = np.zeros(batch.num_rows, np.uint64)
        for name in cols:
            acc ^= hash64(batch[name])
        h = (acc * KNUTH + np.uint64(seed) * SEED_MIX) % _MOD
        return batch.filter(pa.array(
            h < np.uint64(int(fraction * float(1 << 32)))))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds, group_column: str, key_column: str, k: int,
                      seed: int = 42, n_buckets: int = 0):
    """Per-group deterministic sample — per-source caps / balanced subsets
    in a training-data pipeline: each group keeps its ``k`` rows with the
    smallest Knuth-hashed key (ties by key), so the selection is stable
    across runs and block splits and reproducible in plain SQL
    (``row_number() OVER (PARTITION BY g ORDER BY knuth(key), key) <= k``).

    ONE hash-bucket groupby (whole groups per bucket — string group keys
    fine), in-group vectorized rank: np.unique group codes + lexsort +
    segmented arange. Only k rows per group leave the shuffle. Returns a
    Dataset of the kept rows + ``rk`` (1-based rank within group)."""
    import ray


    if n_buckets <= 0:
        avail = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        n_buckets = 4 * avail

    from .aggregates import _add_bucket_fn
    add_bucket = _add_bucket_fn(group_column, n_buckets)

    def bucket_sample(group: pa.Table) -> pa.Table:
        body = group.drop_columns(["_bucket"])
        if body.num_rows == 0:
            return body.append_column("rk", pa.array([], pa.int64()))
        g = body[group_column].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        key = body[key_column].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (key * KNUTH + np.uint64(seed) * SEED_MIX) % _MOD
        _, codes = np.unique(g, return_inverse=True)
        order = np.lexsort((key, h, codes))
        cs = codes[order]
        starts = np.flatnonzero(np.concatenate([[True], cs[1:] != cs[:-1]]))
        seg = np.repeat(starts, np.diff(np.concatenate([starts,
                                                        [cs.size]])))
        rk = np.arange(cs.size, dtype=np.int64) - seg + 1
        keep = order[rk <= k]
        out = body.take(pa.array(keep, pa.int64()))
        return out.append_column("rk", pa.array(rk[rk <= k], pa.int64()))

    return ds.map_batches(add_bucket, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("_bucket").map_groups(bucket_sample, batch_format="pyarrow")
