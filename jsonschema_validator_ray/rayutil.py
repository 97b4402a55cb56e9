"""Worker-importability shim.

Ray pickles map_batches callables BY REFERENCE (module + qualname), so worker
processes must be able to import this package. When the driver initialises Ray
before the package's path reaches PYTHONPATH (the graft driver does exactly
this), workers would die with ModuleNotFoundError and the pipeline would hang
in retries.

``ensure_worker_importable()`` PROBES a worker once per process: if the
package imports there, nothing happens (by-reference pickling stays — it is
~2x faster end-to-end because by-value re-serializes module state with every
task). Only when the probe fails are the package's loaded modules registered
with cloudpickle's by-value serializer, shipping the code inside task payloads
instead.
"""

from __future__ import annotations

import logging as _logging
import sys


class _EmptySchemaFilter(_logging.Filter):
    """Hides Ray Data's schema-change WARNING only when one side of the
    transition is an EMPTY schema (empty shuffle partition blocks) — see
    quiet_empty_partition_warnings."""

    def filter(self, record) -> bool:
        msg = record.getMessage()
        return not ("RefBundle with a different schema" in msg
                    and ("new schema: ." in msg             # real -> empty
                         or "Previous schema: , " in msg))  # empty -> real


_probe_result: dict = {}
_registered: set = set()


def _worker_can_import(pkg: str) -> bool:
    import ray

    @ray.remote(num_cpus=0)
    def probe() -> bool:
        import importlib.util
        return importlib.util.find_spec(pkg) is not None

    try:
        return bool(ray.get(probe.remote(), timeout=30))
    except Exception:
        return False


def ensure_worker_importable(prefix: str = "jsonschema_validator_ray") -> None:
    try:
        from ray import cloudpickle
        import ray
        if not ray.is_initialized():
            return
    except Exception:
        return
    if prefix not in _probe_result:
        _probe_result[prefix] = _worker_can_import(prefix)
    if _probe_result[prefix]:
        return  # workers import the package: keep fast by-reference pickling
    for name, mod in list(sys.modules.items()):
        if mod is None or not name.startswith(prefix) or name in _registered:
            continue
        try:
            cloudpickle.register_pickle_by_value(mod)
            _registered.add(name)
        except Exception:
            pass


def strip_meta(t):
    """Drop schema metadata from a table about to enter a shuffle.

    A ``pa.Schema`` carrying metadata is UNHASHABLE (``hash(schema)`` raises
    ``unhashable type: 'dict'``), which silently defeats Ray Data's
    block-schema deduplication in every reduce task — one warning line per
    reduce PLUS the real cost of re-shipping the schema with every block in
    the all-to-all. Parquet written via pandas (the test tables) and the
    bench corpus (its ``graft_plan`` resume token) both carry metadata, so
    every stage that appends a bucket/tag column to a read batch must strip
    it here. No-op (and allocation-free) for clean schemas."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def quiet_empty_partition_warnings() -> None:
    """Suppress Ray Data's 'RefBundle with a different schema' WARNING for
    the benign empty-partition case ONLY.

    A distributed sort/groupby shuffle whose range partitioner lands zero
    rows in some output partition emits that partition as a block with an
    EMPTY schema; the streaming executor then logs a schema-change warning
    per transition (streaming_executor_state.py). There is no user-side
    knob to avoid empty shuffle partitions (bucket count ≥ block count
    guarantees some), and empty blocks unify fine downstream — so filter
    exactly the transitions whose NEW schema is empty ('new schema: .'),
    keeping any real schema-mismatch warning visible. Idempotent."""
    logger = _logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    if not any(isinstance(f, _EmptySchemaFilter) for f in logger.filters):
        logger.addFilter(_EmptySchemaFilter())


def clean_read_schema(path: str, columns=None):
    """Explicit METADATA-FREE read schema for ``read_parquet(schema=...)``:
    testdata/generator parquet carries pandas / graft_plan footer metadata,
    which makes ``pa.Schema`` unhashable and defeats Ray's block-schema
    dedup in every unify (the 'Failed to hash the schemas' spam). One
    driver-side footer read (~ms) buys clean schemas on every block. The
    single shared implementation of the recipe previously copy-pasted at
    each read site."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    full = pq.read_schema(path).remove_metadata()
    return pa.schema([full.field(c) for c in (columns or full.names)])


def avail_cpus() -> int:
    """Available cluster CPUs (4 when Ray isn't up — the test default)."""
    import ray

    return int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else 4


def default_buckets(n_buckets: int = 0) -> int:
    """Shared hash-bucket count policy: an explicit positive value wins,
    otherwise ~4 buckets per available CPU (whole-group-per-bucket shuffles
    want enough buckets to spread skew but not so many that per-group task
    overhead dominates). The single definition for every bucketed operator
    (review r4 — five copies drifted before this)."""
    if n_buckets > 0:
        return n_buckets
    return 4 * avail_cpus()


def collect_partials(ds, keep_empty: bool = False):
    """Run a partial-emitting ``map_batches`` plan and hand back its
    non-empty Arrow blocks driver-side. ``materialize()`` first:
    ``to_arrow_refs()`` on a lazy plan appends a limit-1 schema probe
    that would re-run the final stage on one block. The single
    definition of the run-collect idiom every driver-fold aggregate
    uses (review r5 — four copies landed in one diff before this).
    ``keep_empty=True`` returns every block — callers that need the
    partial SCHEMA even when zero rows survived (typed empty results)."""
    import ray

    blocks = ray.get(ds.materialize().to_arrow_refs())
    return blocks if keep_empty else [t for t in blocks if t.num_rows]


def fold_partials(ds, keys, sums):
    """Driver fold for partial-aggregate ops: collect the plan's blocks
    (:func:`collect_partials`), concat, one final Arrow group-by on
    ``keys`` summing each column in ``sums`` (result columns keep the
    input names, cast to int64). Returns None when no partial produced
    rows — callers supply their own typed empty table. The partial
    cardinality contract (keys-domain-sized, never row-sized) is the
    caller's to uphold; this helper only removes the boilerplate."""
    import pyarrow as pa

    parts = collect_partials(ds)
    if not parts:
        return None
    cat = pa.concat_tables(parts, promote_options="default")
    g = pa.TableGroupBy(cat, list(keys)).aggregate(
        [(c, "sum") for c in sums])
    cols = {k: g[k] for k in keys}
    cols.update({c: g[f"{c}_sum"].cast(pa.int64()) for c in sums})
    return pa.table(cols)
