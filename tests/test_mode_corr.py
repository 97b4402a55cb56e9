"""grouped_mode (per-group argmax with deterministic tiebreak) and
grouped_corr (mergeable-moments Pearson) — planted-case semantics."""

import numpy as np
import pyarrow as pa


def test_grouped_mode_tiebreak_and_nulls(ray_session):
    """Tie on count -> smallest value wins; null keys/values are skipped
    (SQL GROUP BY ... WHERE both NOT NULL parity)."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.aggregates import grouped_mode

    t = pa.table({
        "g": pa.array([1, 1, 1, 2, 2, None, 2], pa.int64()),
        "v": pa.array(["b", "b", "a", "z", "a", "a", None], pa.string()),
    })
    out = grouped_mode(ray.data.from_arrow(t), "g", "v").take_all()
    by = {r["g"]: (r["mode"], r["n"]) for r in out}
    assert by == {1: ("b", 2), 2: ("a", 1)}   # g=2: a/z tie at 1 -> "a"


def test_grouped_corr_matches_numpy(ray_session):
    """Moments-based corr equals np.corrcoef; a constant group (zero
    variance) yields NULL, null coordinates are skipped."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.aggregates import grouped_corr

    rng = np.random.default_rng(11)
    x = rng.normal(10, 3, 200)
    y = 2.5 * x + rng.normal(0, 1, 200)
    t = pa.table({
        "g": pa.array(["a"] * 200 + ["const"] * 3 + ["skipnull"] * 3),
        "x": pa.array(np.concatenate([x, [5, 5, 5], [1.0, 2.0, 3.0]])),
        "y": pa.array(np.concatenate([y, [1, 2, 3],
                                      [1.0, np.nan, 3.0]])),
    })
    # make the nan an actual NULL
    ycol = t["y"].combine_chunks()
    mask = pa.array(np.isnan(ycol.to_numpy(zero_copy_only=False)))
    t = t.set_column(2, "y", pa.compute.if_else(
        mask, pa.nulls(t.num_rows, pa.float64()), ycol))
    out = grouped_corr(ray.data.from_arrow(t), "g", "x", "y")
    by = {r["g"]: (r["n"], r["corr"]) for r in out.to_pylist()}
    assert by["const"][1] is None               # zero x-variance -> NULL
    assert by["skipnull"][0] == 2               # the null row is skipped
    assert abs(by["skipnull"][1] - 1.0) < 1e-12
    assert by["a"][0] == 200
    assert abs(by["a"][1] - np.corrcoef(x, y)[0, 1]) < 1e-9


def test_grouped_argmax_ties_nulls_and_string_keys(ray_session):
    """Planted case: max order wins; ties -> smallest tiebreak; null key /
    null order rows dropped; string keys supported (no int64 cast)."""
    import pyarrow as pa
    import ray

    from jsonschema_validator_ray.ops.aggregates import grouped_argmax

    t = pa.table({
        "g": ["a", "a", "a", "b", "b", None, "c"],
        "o": [1, 3, 3, 7, None, 9, 2],
        "tb": [10, 12, 11, 1, 2, 3, 4],
        "payload": ["p0", "p1", "p2", "p3", "p4", "p5", "p6"],
    })
    rows = grouped_argmax(ray.data.from_arrow(t), "g", "o",
                          tiebreak="tb").take_all()
    got = {r["g"]: (r["o"], r["tb"], r["payload"]) for r in rows}
    assert got == {"a": (3, 11, "p2"),   # tie at o=3 -> smaller tb wins
                   "b": (7, 1, "p3"),    # null o row dropped
                   "c": (2, 4, "p6")}


def test_vocab_entropy_known_distribution(ray_session):
    """g1: 4 tokens 'x x y z' -> H = -(1/2 log 1/2 + 2 * 1/4 log 1/4)
    = 1.5 bits; g2: uniform 2-token vocab -> 1.0 bit; split across two
    rows to exercise the cross-batch fold."""
    import math

    import pyarrow as pa
    import ray

    from jsonschema_validator_ray.ops.text import vocab_entropy

    t = pa.table({
        "g": ["g1", "g1", "g2", "g2", None],
        "text": ["x x", "y z", "u", "v", "ignored"],
    })
    rows = vocab_entropy(ray.data.from_arrow(t), "g", "text").take_all()
    got = {r["g"]: (r["entropy"], r["n_words"]) for r in rows}
    assert set(got) == {"g1", "g2"}
    assert math.isclose(got["g1"][0], 1.5) and got["g1"][1] == 4
    assert math.isclose(got["g2"][0], 1.0) and got["g2"][1] == 2


def test_grouped_linear_regression_matches_numpy(ray_session):
    """Per-group OLS slope/intercept equal numpy lstsq; rows with a null
    coordinate are skipped; a zero-variance-x group yields NULL."""
    import ray.data

    from jsonschema_validator_ray.ops.aggregates import \
        grouped_linear_regression

    rng = np.random.default_rng(5)
    n = 400
    key = np.where(rng.random(n) < 0.5, "a", "b").tolist()
    x = rng.uniform(0, 23, n)
    y = 3.5 * x + rng.normal(0, 2, n)
    tab = pa.table({
        "k": pa.array(key + ["flat"] * 5 + ["nullish"] * 3),
        "x": pa.array(x.tolist() + [7.0] * 5 + [1.0, None, 2.0],
                      pa.float64()),
        "y": pa.array(y.tolist() + [1.0, 2.0, 3.0, 4.0, 5.0]
                      + [None, 9.0, 4.0], pa.float64()),
    })
    out = grouped_linear_regression(
        ray.data.from_arrow(tab).repartition(5), "k", "x", "y")
    rows = {r["k"]: r for r in out.to_pylist()}
    for g in ("a", "b"):
        mask = np.array([k == g for k in key])
        A = np.vstack([x[mask], np.ones(mask.sum())]).T
        slope_np, icept_np = np.linalg.lstsq(A, y[mask], rcond=None)[0]
        assert abs(rows[g]["slope"] - slope_np) < 1e-9
        assert abs(rows[g]["intercept"] - icept_np) < 1e-9
        assert rows[g]["n"] == int(mask.sum())
    assert rows["flat"]["slope"] is None          # zero variance in x
    assert rows["flat"]["intercept"] is None
    assert rows["nullish"]["n"] == 1              # null x / null y skipped


def test_embedding_covariance_matches_numpy(ray_session):
    """Streaming covariance equals np.cov(bias=True); null and too-short
    lists are dropped."""
    import ray.data

    from jsonschema_validator_ray.ops.stats import embedding_covariance

    rng = np.random.default_rng(9)
    mat = rng.normal(size=(300, 6)).astype(np.float32)
    rows = [list(map(float, mat[i])) for i in range(300)]
    rows += [None, [1.0, 2.0]]                    # dropped: null, short
    tab = pa.table({"embedding": pa.array(rows, pa.list_(pa.float32()))})
    out = embedding_covariance(
        ray.data.from_arrow(tab).repartition(4), "embedding", dims=4)
    want = np.cov(mat.astype(np.float64)[:, :4], rowvar=False, bias=True)
    got = {(r["i"], r["j"]): r["cov"] for r in out.to_pylist()}
    assert all(r == 300 for r in out["n"].to_pylist())
    for i in range(4):
        for j in range(i, 4):
            assert abs(got[(i, j)] - want[i, j]) < 1e-9
    assert len(got) == 10
