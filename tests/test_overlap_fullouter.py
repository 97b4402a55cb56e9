"""interval_overlap_join and reduce_side_hash_join full-outer/left_fn —
planted-case semantics."""

import numpy as np
import pyarrow as pa


def test_interval_overlap_join_counts(ray_session):
    """Overlap = b_start < a_end AND b_end > a_start, same key only;
    touching-at-endpoint intervals do NOT overlap; keys with no B rows
    report 0 (LEFT semantics)."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.join import interval_overlap_join

    a = pa.table({
        "rid": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array([10, 10, 10, 99], pa.int64()),
        "s": pa.array([0, 10, 20, 0], pa.int64()),
        "e": pa.array([10, 20, 30, 5], pa.int64()),
    })
    b = pa.table({
        "k": pa.array([10, 10, 20], pa.int64()),
        "s": pa.array([5, 10, 0], pa.int64()),
        "e": pa.array([15, 12, 100], pa.int64()),
    })
    out = interval_overlap_join(
        ray.data.from_arrow(a), ray.data.from_arrow(b), on="k",
        a_start="s", a_end="e", b_start="s", b_end="e").take_all()
    by = {r["rid"]: r["n_overlaps"] for r in out}
    # rid1 [0,10): b[5,15) yes, b[10,12) no (touches at 10)  -> 1
    # rid2 [10,20): b[5,15) yes, b[10,12) yes                -> 2
    # rid3 [20,30): nothing                                   -> 0
    # rid4 key 99: no B rows of that key                      -> 0
    assert by == {1: 1, 2: 2, 3: 0, 4: 0}


def test_full_outer_join_with_both_side_combines(ray_session):
    """full outer keeps left-only and right-only keys with nulls; left_fn
    and right_fn pre-combine per-batch partials inside the bucket."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.join import reduce_side_hash_join

    left = pa.table({"uid": pa.array([1, 1, 2], pa.int64()),
                     "n_l": pa.array([1, 1, 1], pa.int64())})
    right = pa.table({"uid": pa.array([2, 3], pa.int64()),
                      "n_r": pa.array([1, 1], pa.int64())})

    def combine(alias):
        def fn(t):
            g = pa.TableGroupBy(t, "uid").aggregate([(alias, "sum")])
            return pa.table({"uid": g["uid"],
                             alias: g[f"{alias}_sum"].cast(pa.int64())})
        return fn

    out = reduce_side_hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), "uid",
        join_type="full outer", left_fn=combine("n_l"),
        right_fn=combine("n_r")).take_all()
    by = {r["uid"]: (r["n_l"], r["n_r"]) for r in out}
    assert by == {1: (2, None), 2: (1, 1), 3: (None, 1)}


def test_grouped_percent_rank_ties_and_singletons(ray_session):
    """Ties share the min rank; a single-row partition gets 0.0; null
    values are dropped."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.aggregates import grouped_percent_rank

    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "g": pa.array(["a", "a", "a", "a", "b", "a"], pa.string()),
        "v": pa.array([1.0, 2.0, 2.0, 3.0, 9.0, None], pa.float64()),
    })
    out = grouped_percent_rank(ray.data.from_arrow(t), "g", "v", "id")
    by = {r["id"]: r["prk"] for r in out.take_all()}
    third = 1.0 / 3.0
    assert by == {1: 0.0, 2: third, 3: third, 4: 1.0, 5: 0.0}
