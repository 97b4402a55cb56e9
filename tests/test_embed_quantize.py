"""Symmetric int8 embedding quantization (ops.embed.quantize_embeddings)."""

import pyarrow as pa


def test_quantize_planted_vectors(ray_session):
    """max_abs is per-vector; codes are round-half-away (SQL round());
    the max-abs element maps to ±127; all-zero vectors give max_abs=0
    and all-zero codes."""
    import ray.data

    from jsonschema_validator_ray.ops.embed import quantize_embeddings

    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "e": pa.array([[1.0, -2.0, 0.5],
                       [0.0, 0.0],
                       [-4.0]], pa.list_(pa.float32())),
    })
    out = quantize_embeddings(ray.data.from_arrow(t).repartition(2),
                              "e", "id").take_all()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["max_abs"] == 2.0 and by_id[1]["n_dims"] == 3
    # 1.0*127/2 = 63.5 -> half-away -> 64; -2 -> -127; 0.5*127/2 = 31.75 -> 32
    assert by_id[1]["codes"] == [64, -127, 32]
    assert by_id[2]["max_abs"] == 0.0 and by_id[2]["codes"] == [0, 0]
    assert by_id[3]["codes"] == [-127]


def test_quantize_drops_null_and_empty(ray_session):
    import ray.data

    from jsonschema_validator_ray.ops.embed import quantize_embeddings

    t = pa.table({
        "id": pa.array([1, None, 3, 4], pa.int64()),
        "e": pa.array([[1.0], [1.0], None, []], pa.list_(pa.float32())),
    })
    out = quantize_embeddings(ray.data.from_arrow(t), "e", "id").take_all()
    assert [r["id"] for r in out] == [1]


def test_quantize_matches_duckdb_round(ray_session):
    """Codes equal DuckDB's round() half-away arithmetic element-wise on
    adversarial values (exact .5 quotients, float32 artifacts)."""
    import duckdb
    import ray.data

    from jsonschema_validator_ray.ops.embed import quantize_embeddings

    vecs = [[0.1, -0.3, 0.7, 0.25], [3.5, -3.5, 1.75, -1.75],
            [1e-8, -1e-8, 1.0, -1.0]]
    t = pa.table({"id": pa.array(range(len(vecs)), pa.int64()),
                  "e": pa.array(vecs, pa.list_(pa.float32()))})
    out = sorted(quantize_embeddings(ray.data.from_arrow(t), "e", "id")
                 .take_all(), key=lambda r: r["id"])
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    sql = con.execute("""
        SELECT id, list_transform(e, x ->
            CAST(round(CAST(x AS DOUBLE) * 127.0 /
                 list_max(list_transform(e, y -> abs(CAST(y AS DOUBLE)))))
                 AS BIGINT)) AS codes
        FROM t ORDER BY id""").fetchall()
    for r, (sid, scodes) in zip(out, sql):
        assert r["id"] == sid and list(r["codes"]) == list(scodes)
