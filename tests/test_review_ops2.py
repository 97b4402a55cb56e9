"""Round-4 operator review regressions stay fixed (fifth batch): top-k ties,
sliced embedding matrices, null values through range-agg/quantiles, bloom
int64 exactness, string session users."""

import numpy as np
import pyarrow as pa


def test_brute_force_topk_tie_breaks_by_id(ray_session):
    """Cosine ties at the LOCAL k boundary keep the smallest id — the old
    position-order tiebreak returned whichever row came first in the block
    (review r4: ids [10,2,7], identical vectors, k=1 must give id=2)."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.simsearch import brute_force_topk

    v = [1.0, 0.0, 0.0, 0.0]
    t = pa.table({
        "vec_id": pa.array([10, 2, 7], pa.int64()),
        "embedding": pa.array([v, v, v], pa.list_(pa.float64())),
    })
    out = brute_force_topk(ray.data.from_arrow(t), np.array([v]),
                           "vec_id", "embedding", k=1)
    assert out["vec_id"].to_pylist() == [2]


def test_to_matrix_sliced_fixed_size_list():
    """_to_matrix honors slice offsets on fixed_size_list columns —
    .values ignored them and crashed the reshape (review r4)."""
    from jsonschema_validator_ray.ops.simsearch import _to_matrix

    arr = pa.array([[float(i), float(i + 10)] for i in range(6)],
                   pa.list_(pa.float64(), 2))
    m = _to_matrix(arr.slice(2, 3))
    assert m.shape == (3, 2)
    assert m[0, 0] == 2.0 and m[2, 1] == 14.0


def test_range_agg_join_null_point_values(ray_session):
    """A null point value contributes 0 to sum_value (SQL SUM ignores
    nulls) while n_points keeps COUNT(*) — it crashed ArrowInvalid before
    (review r4)."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.join import range_agg_join

    ranges = pa.table({
        "k": pa.array([1], pa.int64()),
        "t0": pa.array([0], pa.int64()),
        "t1": pa.array([100], pa.int64()),
    })
    points = pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "t": pa.array([10, 20, 30], pa.int64()),
        "val": pa.array([2, None, 3], pa.int64()),
    })
    out = range_agg_join(
        ray.data.from_arrow(ranges), ray.data.from_arrow(points),
        on="k", point_on="k", start="t0", end="t1",
        point_ts="t", value="val").take_all()
    assert [r["n_points"] for r in out] == [3]
    assert [r["sum_value"] for r in out] == [5]


def test_grouped_quantiles_ignore_nulls(ray_session):
    """quantile_cont semantics: nulls are ignored by the quantile while n
    stays count(*) — one null used to poison every quantile of its group
    (review r4)."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.aggregates import grouped_quantiles

    t = pa.table({
        "g": pa.array([1, 1, 1, 1], pa.int64()),
        "v": pa.array([1.0, 2.0, 5.0, None], pa.float64()),
    })
    out = pa.concat_tables(ray.get(grouped_quantiles(
        ray.data.from_arrow(t), "g", "v", [0.5]).to_arrow_refs()))
    assert out["n"].to_pylist() == [4]           # count(*) includes the null
    assert out["q50"].to_pylist() == [2.0]       # median of non-nulls


def test_bloom_semi_join_large_keys_with_null(ray_session):
    """A null left key must not decay the batch to float64: keys 2^60 and
    2^60+1 stay distinguishable in the exact verify (review r4), and null
    keys still never match EXISTS / are kept by NOT EXISTS."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.join import bloom_semi_join

    big = 1 << 60
    left = pa.table({"k": pa.array([big, big + 1, None], pa.int64())})
    right = pa.table({"k": pa.array([big], pa.int64())})
    semi = bloom_semi_join(ray.data.from_arrow(left),
                           ray.data.from_arrow(right), "k", "k").take_all()
    assert [r["k"] for r in semi] == [big]
    anti = bloom_semi_join(ray.data.from_arrow(left),
                           ray.data.from_arrow(right), "k", "k",
                           negate=True).take_all()
    assert sorted((r["k"] is None, r["k"]) for r in anti) \
        == [(False, big + 1), (True, None)]


def test_sessionize_string_user_ids(ray_session):
    """sessionize_counts returns the user column in its input type — the
    unconditional int64 cast crashed on string ids (review r4)."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.aggregates import sessionize_counts

    base = np.datetime64("2024-01-01T00:00:00", "us")
    t = pa.table({
        "user_id": pa.array(["u_1", "u_1", "u_2"], pa.string()),
        "ts": pa.array([base, base + np.timedelta64(2, "h"),
                        base], pa.timestamp("us")),
    })
    out = sessionize_counts(ray.data.from_arrow(t), "user_id", "ts", "ts")
    got = dict(zip(out["user_id"].to_pylist(),
                   out["n_sessions"].to_pylist()))
    assert got == {"u_1": 2, "u_2": 1}
