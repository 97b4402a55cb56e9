"""grouped_skew_kurt: DuckDB-exact values, small-n/zero-variance NULL
semantics, null-value skipping, multi-block merge."""

import duckdb
import numpy as np
import pyarrow as pa


def test_matches_duckdb_per_group(ray_session):
    import ray

    from jsonschema_validator_ray.ops.aggregates import grouped_skew_kurt

    rng = np.random.default_rng(5)
    k = np.repeat(["a", "b", "c"], 40)
    v = np.concatenate([rng.normal(0, 1, 40),
                        rng.exponential(2.0, 40) ** 2,
                        rng.uniform(-3, 3, 40)])
    t = pa.table({"k": pa.array(k), "v": pa.array(v)})
    out = grouped_skew_kurt(
        ray.data.from_arrow(t).repartition(5), "k", "v")
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute("""SELECT k, count(v) n, skewness(v) s, kurtosis(v) u
                         FROM t GROUP BY k ORDER BY k""").fetchall()
    for (k_, n_, s_, u_), gk, gn, gs, gu in zip(
            exp, out["k"].to_pylist(), out["n"].to_pylist(),
            out["skew"].to_pylist(), out["kurt"].to_pylist()):
        assert (k_, n_) == (gk, gn)
        assert abs(gs - s_) < 1e-9
        assert abs(gu - u_) < 1e-9


def test_null_semantics_match_sql(ray_session):
    import ray

    from jsonschema_validator_ray.ops.aggregates import grouped_skew_kurt

    t = pa.table({
        "k": pa.array(["n2", "n2", "n3", "n3", "n3",
                       "const", "const", "const", "const",
                       "nul", "nul", "nul", "nul", "nul"]),
        "v": pa.array([1.0, 2.0, 1.0, 2.0, 5.0,
                       3.0, 3.0, 3.0, 3.0,
                       1.0, 2.0, 5.0, 9.0, None]),
    })
    out = grouped_skew_kurt(ray.data.from_arrow(t), "k", "v")
    d = {k: (s, u, n) for k, s, u, n in zip(
        out["k"].to_pylist(), out["skew"].to_pylist(),
        out["kurt"].to_pylist(), out["n"].to_pylist())}
    assert d["n2"][0] is None and d["n2"][1] is None       # n < 3
    assert d["n3"][0] is not None and d["n3"][1] is None   # n < 4
    assert d["const"] == (None, None, 4)                   # zero variance
    assert d["nul"][2] == 4                                # null skipped
    assert d["nul"][0] is not None and d["nul"][1] is not None
    # n3 skew matches DuckDB exactly
    con = duckdb.connect()
    s3 = con.execute(
        "SELECT skewness(x) FROM (VALUES (1.0),(2.0),(5.0)) v(x)"
    ).fetchone()[0]
    assert abs(d["n3"][0] - s3) < 1e-12
