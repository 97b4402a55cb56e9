"""Blocked Levenshtein fuzzy join: DP correctness vs DuckDB, window
losslessness, self-join canonicalization, cross-join, empty edges."""

import numpy as np
import pyarrow as pa


def test_levenshtein_batch_matches_duckdb_ascii():
    import random

    import duckdb

    from jsonschema_validator_ray.ops.fuzzy import levenshtein_batch

    random.seed(11)
    voc = "abcd ef"
    pairs = [("".join(random.choice(voc) for _ in range(random.randint(0, 14))),
              "".join(random.choice(voc) for _ in range(random.randint(0, 14))))
             for _ in range(800)]
    pairs += [("kitten", "sitting"), ("", "abc"), ("abc", ""), ("", "")]
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    con = duckdb.connect()
    exp = [con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
           for a, b in pairs]
    assert got.tolist() == exp


def test_levenshtein_batch_codepoint_semantics():
    """Documented divergence from DuckDB: multibyte chars count as ONE
    edit (codepoints), not their UTF-8 byte length."""
    from jsonschema_validator_ray.ops.fuzzy import levenshtein_batch

    assert levenshtein_batch(["café"], ["cafe"]).tolist() == [1]
    assert levenshtein_batch(["漢字"], [""]).tolist() == [2]


def test_length_window_is_lossless():
    """No pair within max_dist may be dropped by the blocking: compare a
    blocked run against brute force over all distinct pairs."""
    import itertools
    import random

    from jsonschema_validator_ray.ops.fuzzy import (_length_window_pairs,
                                                    levenshtein_batch)

    random.seed(3)
    vals = sorted({"".join(random.choice("abc") for _ in range(random.randint(1, 6)))
                   for _ in range(60)}, key=lambda s: (len(s), s))
    ii, jj = _length_window_pairs(vals, vals, 2)
    windowed = {(min(vals[i], vals[j]), max(vals[i], vals[j]))
                for i, j in zip(ii, jj)
                if levenshtein_batch([vals[i]], [vals[j]])[0] <= 2}
    brute = {(min(a, b), max(a, b))
             for a, b in itertools.combinations(vals, 2)
             if levenshtein_batch([a], [b])[0] <= 2}
    assert windowed == brute


def test_fuzzy_self_join_canonical_pairs(ray_session):
    import ray

    from jsonschema_validator_ray.ops.fuzzy import fuzzy_join

    ds = ray.data.from_arrow(pa.table({
        "name": pa.array(["red gear", "red gearx", "red gear",  # dup value
                          "blue bolt", "bolt", None], pa.string())}))
    out = fuzzy_join(ds, ds, "name", "name", max_dist=2)
    pairs = list(zip(out["name_a"].to_pylist(), out["name_b"].to_pylist(),
                     out["dist"].to_pylist()))
    assert ("red gear", "red gearx", 1) in pairs
    # canonical ordering + no self/duplicate pairs
    assert all(a < b for a, b, _ in pairs)
    assert len(pairs) == len(set((a, b) for a, b, _ in pairs))
    # 'blue bolt' vs 'bolt' is distance 5: excluded
    assert ("blue bolt", "bolt") not in {(a, b) for a, b, _ in pairs}


def test_fuzzy_cross_join_two_tables(ray_session):
    import ray

    from jsonschema_validator_ray.ops.fuzzy import fuzzy_join

    left = ray.data.from_arrow(pa.table({
        "l": pa.array(["acme corp", "zzz"], pa.string())}))
    right = ray.data.from_arrow(pa.table({
        "r": pa.array(["acme c0rp", "acme", "yyy"], pa.string())}))
    out = fuzzy_join(left, right, "l", "r", max_dist=1)
    pairs = set(zip(out["name_a"].to_pylist(), out["name_b"].to_pylist()))
    # cross mode preserves side attribution: name_a is the LEFT value
    assert pairs == {("acme corp", "acme c0rp")}


def test_fuzzy_cross_join_shared_values_keep_sides(ray_session):
    """Shared values across the two sides must yield BOTH directed rows
    plus the distance-0 identity rows — no canonical collapse in cross
    mode (review r5)."""
    import ray

    from jsonschema_validator_ray.ops.fuzzy import fuzzy_join

    left = ray.data.from_arrow(pa.table({
        "l": pa.array(["abc", "abd"], pa.string())}))
    right = ray.data.from_arrow(pa.table({
        "r": pa.array(["abd", "abc"], pa.string())}))
    out = fuzzy_join(left, right, "l", "r", max_dist=1)
    rows = set(zip(out["name_a"].to_pylist(), out["name_b"].to_pylist(),
                   out["dist"].to_pylist()))
    assert rows == {("abc", "abc", 0), ("abd", "abd", 0),
                    ("abc", "abd", 1), ("abd", "abc", 1)}


def test_fuzzy_join_empty_and_no_match(ray_session):
    import ray

    from jsonschema_validator_ray.ops.fuzzy import fuzzy_join

    empty = ray.data.from_arrow(pa.table({"v": pa.array([], pa.string())}))
    out = fuzzy_join(empty, empty, "v", "v", max_dist=2)
    assert out.num_rows == 0
    assert out.column_names == ["name_a", "name_b", "dist"]

    far = ray.data.from_arrow(pa.table({
        "v": pa.array(["aaaaaaa", "zzzzzzzzzzzzzz"], pa.string())}))
    out2 = fuzzy_join(far, far, "v", "v", max_dist=2)
    assert out2.num_rows == 0
