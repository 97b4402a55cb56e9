"""JSONL / CSV sources and sinks (SURVEY.md §2.2 sources/sinks row).

The reference validates JSON documents; at table scale the natural
interchange formats beside Parquet are JSONL (one JSON object per line)
and CSV. Both map onto Ray Data's native parallel readers/writers:
``read_json`` / ``read_csv`` fan out one read task per file (so a
directory of shards parallelizes for free), and ``write_json`` /
``write_csv`` emit one shard per block — the same resumable
one-file-per-shard layout as the Parquet sink. At 100 TB these formats
cost ~3-5× Parquet in bytes and lose column pruning (a JSONL/CSV read
always scans whole rows), so pipelines should land in Parquet; these
sources exist for ingest/egress interop, and the gate proves the
roundtrip is lossless.
"""

from __future__ import annotations

import os
import shutil


def write_jsonl(ds, path: str):
    """Write one ``.json`` (JSONL) shard per block under ``path``
    (directory is replaced — the writer is resume-by-rerun like the
    Parquet sink, not append)."""
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ds.write_json(path)
    return path


def read_jsonl(path: str):
    """Parallel JSONL read: one task per shard file."""
    import ray

    return ray.data.read_json(path)


def write_csv(ds, path: str):
    """Write one ``.csv`` shard per block under ``path`` (replaced)."""
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ds.write_csv(path)
    return path


def read_csv(path: str):
    """Parallel CSV read: one task per shard file (schema inferred by the
    Arrow CSV reader; pass explicit types via read_csv kwargs upstream if
    inference is ambiguous)."""
    import ray

    return ray.data.read_csv(path)
