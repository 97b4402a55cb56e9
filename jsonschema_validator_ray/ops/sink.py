"""Resumable partitioned Parquet sink.

``write_partitioned_parquet`` writes one Parquet file per block with a
DETERMINISTIC name derived from the block's content hash, atomically
(tmp + rename), and skips files that already exist — so a killed run
re-executes only unwritten blocks on resume, and re-running a completed
job writes nothing. A ``_manifest.json`` records the file list + row
counts; ``ray.data.read_parquet(out_dir)`` round-trips the dataset.

This is the generic form of the flagship pipeline's per-partition output
(`pipelines/validate.run_partitioned`): never one giant file, safe to
re-run, partition-skippable.

Resume assumption: block boundaries are deterministic for the same input +
plan (true for parquet reads with fixed override_num_blocks). A resume
under a DIFFERENT plan writes a disjoint file set — clear the directory or
use run_partitioned's manifest-checked partitions when plans may change.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


def write_partitioned_parquet(ds, out_dir: str) -> dict:
    """Write ``ds`` to ``out_dir`` as content-addressed Parquet parts.
    Returns the manifest dict {files: [...], n_rows, n_skipped}."""
    import polars as pl  # noqa: F401  (kept importable check out of tasks)
    import ray

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "skipped": pa.array([], pa.bool_())})
        import hashlib

        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, batch.schema) as w:
            w.write_table(batch)
        digest = hashlib.blake2b(sink.getvalue().to_pybytes(),
                                 digest_size=12).hexdigest()
        path = os.path.join(out_dir, f"part-{digest}.parquet")
        skipped = os.path.exists(path)
        if not skipped:
            tmp = path + ".tmp"
            pq.write_table(batch, tmp)
            os.replace(tmp, path)       # atomic commit per block
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_rows": pa.array([batch.num_rows], pa.int64()),
                         "skipped": pa.array([skipped], pa.bool_())})

    results = [t for t in ray.get(
        ds.map_batches(write_block, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs())
        if t.num_rows and "path" in t.column_names]
    files = sorted({p for t in results for p in t["path"].to_pylist()})
    n_rows = sum(n for t in results for n in t["n_rows"].to_pylist())
    n_skipped = sum(1 for t in results for s in t["skipped"].to_pylist() if s)
    manifest = {"files": files, "n_rows": int(n_rows),
                "n_skipped": int(n_skipped)}
    tmp = os.path.join(out_dir, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "_manifest.json"))
    return manifest
