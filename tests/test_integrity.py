"""Cross-table integrity report: planted duplicate/null pks, orphan and
null fks, shared-scan dedup, and the empty-parent edge."""

import pyarrow as pa


def test_pk_and_fk_violations_planted(ray_session):
    import ray

    from jsonschema_validator_ray.ops.integrity import integrity_report

    parent = ray.data.from_arrow(pa.table({
        # pk 7 duplicated twice (2 extra rows), one null pk
        "pk": pa.array([1, 2, 7, 7, 7, None], pa.int64()),
    }))
    child = ray.data.from_arrow(pa.table({
        # 3 orphan rows (9, 9, 42) + 1 null fk row
        "fk": pa.array([1, 1, 2, 9, 9, 42, None], pa.int64()),
    }))
    rep = integrity_report(
        pk_checks=[("pk:parent.pk", parent, "pk")],
        fk_checks=[("fk:child.fk->parent.pk", child, "fk", parent, "pk")],
    )
    d = {n: (r, v) for n, r, v in zip(rep["check_name"].to_pylist(),
                                      rep["n_rows"].to_pylist(),
                                      rep["n_violations"].to_pylist())}
    # 6 rows, count(DISTINCT)=3 -> 3 violations (2 dup extras + 1 null)
    assert d["pk:parent.pk"] == (6, 3)
    # NOT EXISTS semantics: 3 orphans + the null fk row
    assert d["fk:child.fk->parent.pk"] == (7, 4)
    # sorted by check_name
    assert rep["check_name"].to_pylist() == sorted(
        rep["check_name"].to_pylist())


def test_empty_parent_all_child_rows_orphaned(ray_session):
    import ray

    from jsonschema_validator_ray.ops.integrity import integrity_report

    parent = ray.data.from_arrow(pa.table({
        "pk": pa.array([], pa.int64())}))
    child = ray.data.from_arrow(pa.table({
        "fk": pa.array([5, 5, 6], pa.int64())}))
    rep = integrity_report(
        pk_checks=[],
        fk_checks=[("fk:c->p", child, "fk", parent, "pk")])
    assert rep["n_violations"].to_pylist() == [3]


def test_shared_dataset_scanned_once(ray_session):
    """The same (ds, col) pair used as both a pk check and an fk parent
    must fold identical partials (one logical scan result reused) — the
    report numbers must agree with independent computation."""
    import ray

    from jsonschema_validator_ray.ops.integrity import integrity_report

    t = pa.table({"k": pa.array(list(range(10)) + [3], pa.int64())})
    ds = ray.data.from_arrow(t)
    child = ray.data.from_arrow(
        pa.table({"k": pa.array([0, 11, 12], pa.int64())}))
    rep = integrity_report(
        pk_checks=[("pk:t.k", ds, "k")],
        fk_checks=[("fk:c.k->t.k", child, "k", ds, "k")])
    d = {n: v for n, v in zip(rep["check_name"].to_pylist(),
                              rep["n_violations"].to_pylist())}
    assert d["pk:t.k"] == 1          # one duplicate extra row
    assert d["fk:c.k->t.k"] == 2     # 11, 12 orphaned
