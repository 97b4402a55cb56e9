"""chunk_dedup (cross-document exact span dedup) and semdedup (SemDeDup
cluster-local embedding keeper selection) — planted-case semantics."""

import hashlib

import numpy as np
import pyarrow as pa


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_chunk_dedup_keeps_global_first_occurrence(ray_session):
    """A chunk repeated across docs survives only at its smallest
    (doc_id, chunk_idx); repeats inside ONE doc are dropped too."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.dedup import chunk_dedup

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c x y z",          # chunks: "a b c", "x y z"
            "a b c q q q",          # "a b c" dropped (doc 1 has it)
            "q q q q q q",          # first "q q q" dropped (doc 2 has it),
        ]),                         # second "q q q" dropped (same doc, ci 0)
    })
    out = chunk_dedup(ray.data.from_arrow(t), "doc_id", "text",
                      window=3).take_all()
    by = {r["doc_id"]: r for r in out}
    assert by[1]["n_chunks"] == 2 and by[1]["n_kept"] == 2
    assert by[1]["clean_md5"] == _md5("a b c x y z")
    assert by[2]["n_chunks"] == 2 and by[2]["n_kept"] == 1
    assert by[2]["clean_md5"] == _md5("q q q")
    assert by[3]["n_chunks"] == 2 and by[3]["n_kept"] == 0
    assert by[3]["clean_md5"] == _md5("")


def test_chunk_dedup_trailing_partial_and_null(ray_session):
    """The trailing <window-word span is its own chunk (SQL wi//W parity);
    null text yields 0 chunks and md5('')."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.dedup import chunk_dedup

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b c d", None]),    # chunks: "a b c", "d"
    })
    out = chunk_dedup(ray.data.from_arrow(t), "doc_id", "text",
                      window=3).take_all()
    by = {r["doc_id"]: r for r in out}
    assert by[1]["n_chunks"] == 2 and by[1]["n_kept"] == 2
    assert by[1]["clean_md5"] == _md5("a b c d")
    assert by[2]["n_chunks"] == 0 and by[2]["n_kept"] == 0
    assert by[2]["clean_md5"] == _md5("")


def test_semdedup_drops_later_ids_only(ray_session):
    """Each semantic-duplicate set keeps exactly its smallest id: two
    planted near-identical groups -> later members dropped, the orthogonal
    singleton kept."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.dedup import semdedup

    rng = np.random.default_rng(5)
    base_a = rng.normal(size=8)
    base_b = rng.normal(size=8)
    base_b -= base_b @ base_a / (base_a @ base_a) * base_a  # orthogonalize
    lone = np.eye(8)[5] * base_a.std()        # near-orthogonal singleton
    lone -= lone @ base_a / (base_a @ base_a) * base_a
    lone -= lone @ base_b / (base_b @ base_b) * base_b
    vecs = {
        1: base_a, 4: base_a + 1e-3, 9: base_a - 1e-3,      # group A
        2: base_b, 7: base_b * 1.5,                          # group B
        3: lone,
    }
    ids = sorted(vecs)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([vecs[i].tolist() for i in ids],
                              pa.list_(pa.float64())),
    })
    out = semdedup(ray.data.from_arrow(t), "vec_id", "embedding",
                   threshold=0.95, n_centroids=2, n_assign=2)
    assert out["dropped_id"].to_pylist() == [4, 7, 9]


def test_weighted_sample_deterministic_and_weight_biased(ray_session):
    """A-Res selection is identical across runs, drops null/zero weights,
    and heavy rows are selected far more often than light ones."""
    import ray
    import ray.data

    from jsonschema_validator_ray.ops.sampling import weighted_sample

    n = 2000
    t = pa.table({
        "id": pa.array(list(range(n)), pa.int64()),
        # even ids weigh 100x odd ids; two poisoned rows must be dropped
        "w": pa.array([None if i == 0 else 0.0 if i == 1 else
                       (100.0 if i % 2 == 0 else 1.0)
                       for i in range(n)], pa.float64()),
    })
    out1 = weighted_sample(ray.data.from_arrow(t), "id", "w", 200, seed=3)
    out2 = weighted_sample(ray.data.from_arrow(t), "id", "w", 200, seed=3)
    ids1 = out1["id"].to_pylist()
    assert ids1 == out2["id"].to_pylist()          # deterministic
    assert 0 not in ids1 and 1 not in ids1         # null/zero weight dropped
    n_heavy = sum(1 for i in ids1 if i % 2 == 0)
    assert n_heavy > 170                           # ~198 expected at 100:1


class TestWorkerIndexCaches:
    """VERDICT r4 #6: the pair and sets indexes each have their OWN
    one-entry worker cache, so interleaved lookups (one verify run's pair
    index, another run's sets index) never evict each other mid-run."""

    def test_interleaved_lookups_do_not_cross_evict(self):
        import numpy as np
        import pyarrow as pa
        import ray

        from jsonschema_validator_ray.ops import dedup as dd

        pairs = pa.table({"id_a": pa.array([1, 2], pa.int64()),
                          "id_b": pa.array([2, 3], pa.int64())})
        blob = np.arange(4, dtype=np.uint64).tobytes()
        sets = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                         "shingles": pa.array([blob, blob])})
        pref = [ray.put(pairs)]
        sref = [ray.put(sets)]
        dd._PAIR_INDEX_CACHE.clear()
        dd._SETS_INDEX_CACHE.clear()
        p1 = dd._pair_index(pref, 4)
        s1 = dd._sets_index(sref)
        # a DIFFERENT pair-index key (new n_verify_parts) misses and
        # replaces the pair cache — the sets cache must be untouched
        dd._pair_index(pref, 8)
        assert dd._sets_index(sref) is s1          # zero rebuilds
        # and vice versa: a sets miss must not evict the pair index
        p2 = dd._pair_index(pref, 8)
        dd._sets_index(sref, id_col="doc_id", blob_col="shingles")
        sets2 = pa.table({"doc_id": pa.array([5], pa.int64()),
                          "shingles": pa.array([blob])})
        dd._sets_index([ray.put(sets2)])
        assert dd._pair_index(pref, 8) is p2       # zero rebuilds
        assert len(dd._PAIR_INDEX_CACHE) == 1      # one entry per kind
        assert len(dd._SETS_INDEX_CACHE) == 1
