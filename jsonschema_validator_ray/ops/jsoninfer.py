"""Distributed JSON schema inference over a string column of JSON
payloads — the discovery half of the validation engine (SURVEY.md §2.2
per-record maps + aggregations): before a constraint IR can be compiled
against a semi-structured column, something must report which keys exist
and which JSON types each key takes. ``infer_json_schema`` produces that
report: one ``(jkey, jtype, n)`` row per top-level key × observed type.

Type names follow DuckDB's ``json_type`` so the report is SQL-oracle
comparable: OBJECT / ARRAY / VARCHAR / BOOLEAN / DOUBLE, integers split
into UBIGINT (>= 0) and BIGINT (< 0), and JSON ``null`` reported as a
NULL type (DuckDB returns SQL NULL for it).

Scale shape: the per-batch combiner first collapses the batch to DISTINCT
payload strings with counts (one Arrow groupby — at 100 TB the parse cost
is bounded by per-batch payload cardinality, not row count; enum-ish
payload domains parse a few hundred strings per block), parses each
distinct string ONCE with the stdlib decoder, and emits ``(jkey, jtype,
n)`` partials whose cardinality is keys × types. The driver folds the
tiny partials with one final groupby — NO shuffle at any size. Invalid
JSON and non-object payloads contribute nothing (the SQL
``json_valid`` + ``json_keys`` contract); null payloads drop.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..rayutil import strip_meta


def _jtype(v) -> str | None:
    # bool before int: Python bools are ints
    if v is None:
        return None
    if isinstance(v, bool):
        return "BOOLEAN"
    if isinstance(v, int):
        return "UBIGINT" if v >= 0 else "BIGINT"
    if isinstance(v, float):
        return "DOUBLE"
    if isinstance(v, str):
        return "VARCHAR"
    if isinstance(v, list):
        return "ARRAY"
    return "OBJECT"


def infer_json_schema(ds, col: str) -> pa.Table:
    """Top-level key/type census of a JSON string column: returns
    ``(jkey, jtype, n)`` sorted by (jkey, jtype), where ``n`` counts the
    rows whose payload has ``jkey`` with a value of ``jtype``. See the
    module docstring for the scale shape and the DuckDB type-name
    contract."""
    import ray

    from ..rayutil import ensure_worker_importable
    ensure_worker_importable()

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col].drop_null()
        g = pa.TableGroupBy(pa.table({"p": vals}), "p") \
            .aggregate([([], "count_all")])
        keys: list = []
        types: list = []
        counts: list = []
        for p, n in zip(g["p"].to_pylist(),
                        g["count_all"].to_pylist()):
            try:
                obj = json.loads(p)
            except ValueError:
                continue
            if not isinstance(obj, dict):
                continue
            for k, v in obj.items():
                keys.append(k)
                types.append(_jtype(v))
                counts.append(n)
        t = pa.table({"jkey": pa.array(keys, pa.string()),
                      "jtype": pa.array(types, pa.string()),
                      "n": pa.array(counts, pa.int64())})
        gb = pa.TableGroupBy(t, ["jkey", "jtype"]).aggregate([("n", "sum")])
        return strip_meta(pa.table({
            "jkey": gb["jkey"], "jtype": gb["jtype"],
            "n": gb["n_sum"].cast(pa.int64())}))

    plist = [t for t in ray.get(ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
        .materialize().to_arrow_refs()) if t.num_rows]
    if not plist:
        return pa.table({"jkey": pa.array([], pa.string()),
                         "jtype": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    parts = pa.concat_tables(plist, promote_options="default")
    g = pa.TableGroupBy(parts, ["jkey", "jtype"]).aggregate([("n", "sum")])
    return pa.table({"jkey": g["jkey"], "jtype": g["jtype"],
                     "n": g["n_sum"].cast(pa.int64())}) \
        .sort_by([("jkey", "ascending"), ("jtype", "ascending")])
