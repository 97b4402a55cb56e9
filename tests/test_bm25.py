"""BM25 ranked retrieval: hand-computed scores, block composability,
query-tf weighting, OOV/empty-query/null-text edges."""

import pyarrow as pa


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


def test_bm25_duplicate_terms_weight_linearly(ray_session):
    """Lucene query-tf semantics: ['cat','cat'] doubles each doc's score
    vs ['cat'] (review r5); empty query returns the stable empty table."""
    import ray

    from jsonschema_validator_ray.ops.index import bm25_search

    tab = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["cat dog", "cat cat"], pa.string())})
    ds = ray.data.from_arrow(tab)
    one = bm25_search(ds, ["cat"], top_k=5)
    two = bm25_search(ds, ["cat", "cat"], top_k=5)
    assert two["doc_id"].to_pylist() == one["doc_id"].to_pylist()
    for s1, s2 in zip(one["score_r6"].to_pylist(),
                      two["score_r6"].to_pylist()):
        assert abs(s2 - 2 * s1) < 2e-6

    out = bm25_search(ds, [], top_k=5)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "score_r6"]
