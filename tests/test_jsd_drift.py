"""Jensen-Shannon categorical drift (ops.stats.jsd_drift)."""

import math

import pyarrow as pa


def _mk(ray_data, cats_ref, cats_cur):
    cats = list(cats_ref) + list(cats_cur)
    ts = [0] * len(cats_ref) + [100] * len(cats_cur)
    t = pa.table({"c": pa.array(cats, pa.string()),
                  "ts": pa.array(ts, pa.int64())})
    return ray_data.from_arrow(t).repartition(3)


def test_jsd_planted_value(ray_session):
    """Hand-computed JSD, one-sided category included via the 0·log0
    convention (no bucket exclusion, unlike PSI)."""
    import ray.data

    from jsonschema_validator_ray.ops.stats import jsd_drift

    r = jsd_drift(_mk(ray.data, ["a", "a", "b", "b"],
                      ["a", "b", "c", "c"]), "c", "ts", 50)
    p = {"a": 0.5, "b": 0.5, "c": 0.0}
    q = {"a": 0.25, "b": 0.25, "c": 0.5}
    want = sum((0.5 * p[k] * math.log2(2 * p[k] / (p[k] + q[k]))
                if p[k] > 0 else 0.0)
               + (0.5 * q[k] * math.log2(2 * q[k] / (p[k] + q[k]))
                  if q[k] > 0 else 0.0) for k in p)
    assert abs(r["jsd"] - want) < 1e-12
    assert r["n_categories"] == 3
    assert (r["n_ref"], r["n_cur"]) == (4, 4)


def test_jsd_bounds_and_nulls(ray_session):
    """Identical distributions -> 0; fully disjoint -> 1 bit (the JSD
    upper bound, well-defined where PSI refuses); null rows drop."""
    import ray.data

    from jsonschema_validator_ray.ops.stats import jsd_drift

    same = jsd_drift(_mk(ray.data, ["a", "b"], ["a", "b"]), "c", "ts", 50)
    assert abs(same["jsd"]) < 1e-12

    disj = jsd_drift(_mk(ray.data, ["a", "a"], ["b", "b"]), "c", "ts", 50)
    assert abs(disj["jsd"] - 1.0) < 1e-12

    # null category and null ts rows drop — leaving the cur side empty,
    # which must refuse loudly (drift of nothing is not 'stable')
    import pytest

    t = pa.table({"c": pa.array(["a", None, "b"], pa.string()),
                  "ts": pa.array([0, 0, None], pa.int64())})
    with pytest.raises(ValueError, match="one side"):
        jsd_drift(ray.data.from_arrow(t), "c", "ts", 50)

    # nulls drop but both sides populated: counts exclude the null rows
    t2 = pa.table({"c": pa.array(["a", None, "b", "b"], pa.string()),
                   "ts": pa.array([0, 0, None, 100], pa.int64())})
    r = jsd_drift(ray.data.from_arrow(t2), "c", "ts", 50)
    assert (r["n_ref"], r["n_cur"]) == (1, 1)
