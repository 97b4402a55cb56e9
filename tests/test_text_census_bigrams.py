"""Multi-pattern regex census (ops.text.pattern_census) and adjacent
token-pair counts (ops.text.bigram_counts)."""

import pyarrow as pa


def test_pattern_census_counts_and_rows(ray_session):
    """Per (key, pattern): n_matches counts non-overlapping RE2 matches,
    n_rows counts rows with >= 1 match; null keys/texts drop; patterns
    with zero matches report 0-rows groups they did appear for only."""
    import ray.data

    from jsonschema_validator_ray.ops.text import pattern_census

    t = pa.table({
        "k": pa.array(["a", "a", "b", None, "b"], pa.string()),
        "txt": pa.array(["x1 y22", "no digits", "3 4 5", "9", None],
                        pa.string()),
    })
    out = pattern_census(ray.data.from_arrow(t).repartition(2),
                         "k", "txt",
                         {"digit": "[0-9]+", "zz": "zz+"})
    got = {(r["k"], r["pattern"]): (r["n_matches"], r["n_rows"])
           for r in out.to_pylist()}
    # null key (txt="9") and null txt rows contribute nothing
    assert got == {
        ("a", "digit"): (2, 1), ("b", "digit"): (3, 1),
        ("a", "zz"): (0, 0), ("b", "zz"): (0, 0),
    }
    # sorted (pattern, key)
    assert [r["pattern"] for r in out.to_pylist()] == \
        ["digit", "digit", "zz", "zz"]


def test_pattern_census_empty_input(ray_session):
    import ray.data

    from jsonschema_validator_ray.ops.text import pattern_census

    t = pa.table({"k": pa.array([], pa.string()),
                  "txt": pa.array([], pa.string())})
    out = pattern_census(ray.data.from_arrow(t), "k", "txt",
                         {"d": "[0-9]"})
    assert out.num_rows == 0
    assert out.column_names == ["k", "pattern", "n_matches", "n_rows"]


def test_bigram_counts_pairs_within_docs(ray_session):
    """Pairs are adjacent within a document only (never across docs);
    single-token docs emit no pairs; null texts drop; counts fold
    across blocks."""
    import ray.data

    from jsonschema_validator_ray.ops.text import bigram_counts

    t = pa.table({"txt": pa.array(
        ["a b c", "b c", "solo", None, "a b"], pa.string())})
    out = bigram_counts(ray.data.from_arrow(t).repartition(3), "txt")
    got = {(r["a"], r["b"]): r["n"] for r in out.to_pylist()}
    assert got == {("a", "b"): 2, ("b", "c"): 2}
    # sorted by (a, b)
    assert out["a"].to_pylist() == sorted(out["a"].to_pylist())


def test_bigram_counts_empty_convention(ray_session):
    """split_pattern('', ' ') -> [''] : an empty string is one empty
    token (the repo-wide string_split convention), so '' alone emits no
    pair but ' ' emits ('','')."""
    import ray.data

    from jsonschema_validator_ray.ops.text import bigram_counts

    t = pa.table({"txt": pa.array(["", " "], pa.string())})
    out = bigram_counts(ray.data.from_arrow(t), "txt")
    got = {(r["a"], r["b"]): r["n"] for r in out.to_pylist()}
    assert got == {("", ""): 1}


def test_vocab_coverage_planted(ray_session):
    """coverage = share of token occurrences in the top_k most frequent
    tokens; ties at the cutoff cannot change the sum; null texts drop."""
    import ray.data

    from jsonschema_validator_ray.ops.text import vocab_coverage

    # counts: a=4, b=3, c=2, d=1  (10 tokens, 4 vocab)
    t = pa.table({"txt": pa.array(
        ["a a b", "a b c", "a b c d", None], pa.string())})
    out = vocab_coverage(ray.data.from_arrow(t).repartition(2),
                         "txt", top_k=2).to_pylist()[0]
    assert out["n_tokens"] == 10 and out["n_vocab"] == 4
    assert out["covered"] == 7 and out["coverage"] == 7 / 10
    # top_k beyond vocab covers everything
    full = vocab_coverage(ray.data.from_arrow(t), "txt",
                          top_k=100).to_pylist()[0]
    assert full["covered"] == 10 and full["coverage"] == 1.0
