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
