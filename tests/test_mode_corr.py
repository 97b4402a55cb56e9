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
