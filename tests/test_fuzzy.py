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


def test_bm25_manual_and_block_composability(ray_session):
    """Hand-computed BM25 on a 3-doc corpus; and the per-block local
    top-k must compose to the same global result when the corpus is
    split across many blocks."""
    import math

    import ray

    from jsonschema_validator_ray.ops.index import bm25_search

    tab = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["cat dog", "cat cat fish", "bird"], pa.string()),
    })
    out = bm25_search(ray.data.from_arrow(tab), ["cat"],
                      k1=1.2, b=0.75, top_k=10)
    ids = out["doc_id"].to_pylist()
    assert ids == [2, 1]                      # doc 3 has no 'cat'
    n, df, avgdl = 3.0, 2.0, 2.0
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def s(tf, dl):
        return round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6)

    assert out["score_r6"].to_pylist() == [s(2, 3), s(1, 2)]

    # composability: 12 docs over 6 blocks == single block result
    big = pa.table({
        "doc_id": pa.array(list(range(12)), pa.int64()),
        "text": pa.array(["cat " * (i % 4) + "dog" for i in range(12)],
                         pa.string()),
    })
    one = bm25_search(ray.data.from_arrow(big), ["cat", "dog"], top_k=5)
    many = bm25_search(ray.data.from_arrow(big).repartition(6),
                       ["cat", "dog"], top_k=5)
    assert one.to_pydict() == many.to_pydict()


def test_bm25_oov_term_and_null_text(ray_session):
    import ray

    from jsonschema_validator_ray.ops.index import bm25_search

    tab = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["x y", None], pa.string()),
    })
    # query term absent everywhere -> empty result, stable schema
    out = bm25_search(ray.data.from_arrow(tab), ["zzz"], top_k=3)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "score_r6"]
    # null text doc never scores
    out2 = bm25_search(ray.data.from_arrow(tab), ["x"], top_k=3)
    assert out2["doc_id"].to_pylist() == [1]
