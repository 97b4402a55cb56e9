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


def test_large_mean_numerically_stable(ray_session):
    """Epoch-scale means must not cancel: central-moment partials +
    Pebay merge keep G1/G2 accurate where raw power sums explode
    (review r5 — the old power-sum version returned ~1e8 here)."""
    import ray

    from jsonschema_validator_ray.ops.aggregates import grouped_skew_kurt

    rng = np.random.default_rng(9)
    v = 1.7e12 + rng.normal(0.0, 1000.0, 4000)
    t = pa.table({"k": pa.array(["a"] * 4000), "v": pa.array(v)})
    out = grouped_skew_kurt(ray.data.from_arrow(t).repartition(7),
                            "k", "v")
    # ground truth from centered data
    c = v - v.mean()
    n = float(len(v))
    m2, m3, m4 = (c**2).mean(), (c**3).mean(), (c**4).mean()
    g1 = (m3 / m2**1.5) * np.sqrt(n * (n - 1)) / (n - 2)
    g2 = ((n + 1) * (m4 / m2**2 - 3) + 6) * (n - 1) / ((n - 2) * (n - 3))
    assert abs(out["skew"][0].as_py() - g1) < 1e-6
    assert abs(out["kurt"][0].as_py() - g2) < 1e-6


def test_all_null_group_emitted_with_n0(ray_session):
    """A key whose values are ALL NULL must appear with n=0 and NULL
    stats — matching GROUP BY + count(v) SQL output (review r5)."""
    import ray

    from jsonschema_validator_ray.ops.aggregates import grouped_skew_kurt

    t = pa.table({
        "k": pa.array(["a", "a", "a", "a", "b", "b"]),
        "v": pa.array([1.0, 2.0, 4.0, 9.0, None, None]),
    })
    out = grouped_skew_kurt(ray.data.from_arrow(t), "k", "v")
    d = {k: (n, s, u) for k, n, s, u in zip(
        out["k"].to_pylist(), out["n"].to_pylist(),
        out["skew"].to_pylist(), out["kurt"].to_pylist())}
    assert d["b"] == (0, None, None)
    assert d["a"][0] == 4 and d["a"][1] is not None
