"""Exact two-sample KS (ops/stats.py) and greedy sequence packing
(ops/pack.py) — planted-case semantics including block-boundary ties and
oversized items."""

import math

import numpy as np
import pyarrow as pa
import pytest


def test_ks_two_sample_known_value(ray_session):
    """A = {1,2,3,4}, B = {3,4,5,6}: max CDF gap is at v=2 (2/4 vs 0/4)
    = 0.5."""
    import ray

    from jsonschema_validator_ray.ops.stats import ks_two_sample

    t = pa.table({"v": [1.0, 2.0, 3.0, 4.0, 3.0, 4.0, 5.0, 6.0],
                  "side": [1, 1, 1, 1, 0, 0, 0, 0]})
    r = ks_two_sample(ray.data.from_arrow(t), "v", "side")
    assert r["n_a"] == 4 and r["n_b"] == 4
    assert math.isclose(r["ks_stat"], 0.5)


def test_ks_two_sample_matches_numpy_many_blocks(ray_session):
    """Heavy ties + many blocks (override_num_blocks forces the sorted
    data across block boundaries, exercising the next-vmin deferral)."""
    import ray

    from jsonschema_validator_ray.ops.stats import ks_two_sample

    rng = np.random.default_rng(11)
    a = rng.integers(0, 25, 4000).astype(float)        # heavy ties
    b = (rng.integers(0, 25, 3000) + rng.integers(0, 3, 3000)) \
        .astype(float)
    v = np.concatenate([a, b])
    side = np.concatenate([np.ones(a.size, np.int64),
                           np.zeros(b.size, np.int64)])
    ds = ray.data.from_arrow(pa.table({"v": v, "side": side})) \
        .repartition(16)
    r = ks_two_sample(ds, "v", "side")

    # reference: evaluate CDF gap after ties at each distinct value
    allv = np.unique(v)
    ca = np.searchsorted(np.sort(a), allv, side="right") / a.size
    cb = np.searchsorted(np.sort(b), allv, side="right") / b.size
    assert math.isclose(r["ks_stat"], float(np.abs(ca - cb).max()),
                        rel_tol=1e-12)
    assert r["n_a"] == a.size and r["n_b"] == b.size


def test_ks_two_sample_empty_side_raises(ray_session):
    import ray

    from jsonschema_validator_ray.ops.stats import ks_two_sample

    t = pa.table({"v": [1.0, 2.0], "side": [1, 1]})
    with pytest.raises(ValueError, match="one sample is empty"):
        ks_two_sample(ray.data.from_arrow(t), "v", "side")


def test_pack_sequences_greedy_rule_and_oversize(ray_session):
    """Capacity 10: sizes [4,4,4] -> bins [0,0,1]; an oversized item (12)
    claims its own bin (first row keeps bin 0 even when > capacity); a
    partition boundary (part_size) resets bins."""
    import ray

    from jsonschema_validator_ray.ops.pack import pack_sequences

    t = pa.table({"id": [0, 1, 2, 3, 4, 100, 101],
                  "sz": [4, 4, 4, 12, 1, 9, 2]})
    rows = pack_sequences(ray.data.from_arrow(t), "id", "sz",
                          capacity=10, part_size=100).take_all()
    got = {r["id"]: (r["grp"], r["bin"], r["fill"]) for r in rows}
    assert got == {
        0: (0, 0, 4), 1: (0, 0, 8),   # 4+4 fits
        2: (0, 1, 4),                 # 8+4 > 10 -> new bin
        3: (0, 2, 12),                # oversized -> own bin
        4: (0, 3, 1),                 # 12+1 > 10 -> new bin
        100: (1, 0, 9),               # new partition resets bins
        101: (1, 1, 2),               # 9+2 > 10 -> new bin
    }


def test_concat_packed_text_and_separator_accounting(ray_session):
    """Bins [0: 'aa'+'bb', 1: 'cccc'] at capacity 4 (sizes 2,2,4);
    separator joins but does not count against capacity."""
    import ray

    from jsonschema_validator_ray.ops.pack import concat_packed

    t = pa.table({"id": [0, 1, 2], "sz": [2, 2, 4],
                  "txt": ["aa", "bb", "cccc"]})
    rows = concat_packed(ray.data.from_arrow(t), "id", "sz", "txt",
                         capacity=4, part_size=100).take_all()
    got = {(r["grp"], r["bin"]): (r["n_docs"], r["packed_text"],
                                  r["packed_chars"]) for r in rows}
    assert got == {(0, 0): (2, "aa bb", 5), (0, 1): (1, "cccc", 4)}


def test_assign_global_rank_many_blocks(ray_session):
    """Rank over 16 blocks equals argsort rank; 1-based; all rows kept."""
    import ray

    from jsonschema_validator_ray.ops.stats import assign_global_rank

    rng = np.random.default_rng(3)
    keys = rng.permutation(5000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys,
                                       "row": np.arange(5000)})) \
        .repartition(16)
    rows = assign_global_rank(ds, "k").take_all()
    assert len(rows) == 5000
    for r in rows[:200]:
        assert r["pos"] == r["k"] + 1   # keys are a permutation of 0..4999


def test_mad_outlier_filter_planted(ray_session):
    """Group A: values [1..7, 100] -> median 4.5, MAD 2.0; only 100
    exceeds 4.5 + 3*2.0. Zero-MAD group B flags its single non-median
    value."""
    import ray

    from jsonschema_validator_ray.ops.aggregates import mad_outlier_filter

    t = pa.table({
        "g": ["A"] * 8 + ["B"] * 5,
        "id": list(range(13)),
        "v": [1.0, 2, 3, 4, 5, 6, 7, 100] + [5.0, 5, 5, 5, 9],
    })
    rows = mad_outlier_filter(
        lambda: ray.data.from_arrow(t), "g", "v", k=3.0).take_all()
    assert sorted((r["g"], r["id"]) for r in rows) == [("A", 7), ("B", 12)]


def test_spearman_corr_matches_scipy_formula(ray_session):
    """Tie-heavy planted data: Spearman = Pearson of average ranks,
    verified against a direct numpy computation."""
    import ray

    from jsonschema_validator_ray.ops.stats import spearman_corr

    rng = np.random.default_rng(5)
    x = rng.integers(0, 10, 800).astype(float)          # heavy ties
    y = x * 2 + rng.integers(0, 5, 800)                 # monotone-ish + ties

    def avg_rank(a):
        order = np.argsort(a, kind="stable")
        r = np.empty(a.size, float)
        sa = a[order]
        starts = np.flatnonzero(np.r_[True, sa[1:] != sa[:-1]])
        ends = np.r_[starts[1:], sa.size]
        for s, e in zip(starts, ends):
            r[order[s:e]] = (s + e + 1) / 2.0           # 1-based avg rank
        return r

    rx, ry = avg_rank(x), avg_rank(y)
    expected = np.corrcoef(rx, ry)[0, 1]
    got = spearman_corr(
        lambda: ray.data.from_arrow(pa.table({"x": x, "y": y}))
        .repartition(8), "x", "y")
    assert got["n"] == 800
    assert abs(got["spearman"] - expected) < 1e-9


def test_spearman_corr_side_swap_and_cap(ray_session):
    """x wider than the cap -> sides swap (corr is symmetric); both wider
    -> actionable error."""
    import ray

    from jsonschema_validator_ray.ops.stats import spearman_corr

    rng = np.random.default_rng(9)
    x = rng.permutation(400).astype(float)        # 400 distinct
    y = (x // 100).astype(float)                  # 4 distinct
    t = pa.table({"x": x, "y": y})
    full = spearman_corr(lambda: ray.data.from_arrow(t), "x", "y")
    swapped = spearman_corr(lambda: ray.data.from_arrow(t), "x", "y",
                            broadcast_cap_rows=10)   # forces y as lookup
    assert abs(full["spearman"] - swapped["spearman"]) < 1e-12
    with pytest.raises(ValueError, match="broadcast_cap_rows"):
        spearman_corr(lambda: ray.data.from_arrow(t), "x", "y",
                      broadcast_cap_rows=2)


def test_dense_time_counts_fills_gaps(ray_session):
    """Hours 0, 1 and 3 observed -> hour 2 emitted with n=0."""
    import ray

    from jsonschema_validator_ray.ops.aggregates import dense_time_counts

    ts = pa.array(np.array(["2026-01-01T00:10", "2026-01-01T00:50",
                            "2026-01-01T01:05", "2026-01-01T03:59"],
                           "datetime64[us]"), pa.timestamp("us"))
    t = dense_time_counts(
        ray.data.from_arrow(pa.table({"ts": ts})), "ts", unit="hour")
    assert t.num_rows == 4
    assert t["n"].to_pylist() == [2, 1, 0, 1]


def test_grouped_zscore_flags_planted(ray_session):
    """Group with one 10-sigma point flags exactly that point."""
    import ray

    from jsonschema_validator_ray.ops.aggregates import grouped_zscore_flags

    v = np.concatenate([np.tile([9.0, 11.0], 50), [1000.0]])
    t = pa.table({"g": ["a"] * v.size, "v": v})
    out = grouped_zscore_flags(lambda: ray.data.from_arrow(t), "g", "v",
                               k=2.0)
    assert out["n"].to_pylist() == [101]
    assert out["n_out"].to_pylist() == [1]


def test_global_quantiles_matches_numpy_linear(ray_session):
    """Heavy ties across many blocks: exact quantile_cont / numpy
    method='linear' parity, including nulls dropped."""
    import ray

    from jsonschema_validator_ray.ops.stats import global_quantiles

    rng = np.random.default_rng(7)
    v = rng.integers(0, 40, 5000).astype(float)        # heavy ties
    vals = list(v) + [None] * 37
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals,
                                                     pa.float64())})) \
        .repartition(13)
    qs = (0.0, 0.25, 0.5, 0.75, 0.99, 1.0)
    r = global_quantiles(ds, "x", qs=qs)
    assert r["n"] == v.size
    for q in qs:
        assert math.isclose(r["quantiles"][q],
                            float(np.quantile(v, q, method="linear")),
                            rel_tol=1e-12), q


def test_global_quantiles_single_value_and_empty(ray_session):
    import ray

    from jsonschema_validator_ray.ops.stats import global_quantiles

    ds = ray.data.from_arrow(pa.table({"x": pa.array([5.0] * 9)}))
    r = global_quantiles(ds, "x", qs=(0.1, 0.9))
    assert r["quantiles"][0.1] == 5.0 and r["quantiles"][0.9] == 5.0

    empty = ray.data.from_arrow(pa.table({"x": pa.array([None, None],
                                                        pa.float64())}))
    with pytest.raises(ValueError, match="no non-null rows"):
        global_quantiles(empty, "x")
