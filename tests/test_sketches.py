"""Sketch correctness: HLL error bounds, t-digest quantile accuracy,
merge = single-pass equivalence, serialization round-trips, drift tests."""

import numpy as np
import pyarrow as pa

from jsonschema_validator_ray.state import (
    HyperLogLog,
    SketchState,
    TDigest,
    chi_square_test,
)
from jsonschema_validator_ray.state.drift import chi2_sf, ks_statistic_from_cdf


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(7)
    a = HyperLogLog(12)
    b = HyperLogLog(12)
    va = [f"u{i}" for i in range(20000)]
    vb = [f"u{i}" for i in range(10000, 40000)]  # overlap 10k..20k
    a.update(va)
    b.update(vb)
    merged = HyperLogLog.from_bytes(a.to_bytes()).merge(b)
    est = merged.cardinality()
    assert abs(est - 40000) / 40000 < 0.05  # ~1.04/sqrt(4096) ≈ 1.6% std err


def test_hll_small_cardinality_linear_counting():
    h = HyperLogLog(12)
    h.update([f"x{i}" for i in range(100)])
    assert abs(h.cardinality() - 100) < 5


def test_tdigest_quantiles_and_merge():
    rng = np.random.default_rng(42)
    data = rng.lognormal(4.0, 0.8, size=100_000)
    whole = TDigest()
    parts = [TDigest() for _ in range(8)]
    for i, chunk in enumerate(np.array_split(data, 8)):
        parts[i].update(chunk)
    whole.update(data)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(data, q)
        assert abs(whole.quantile(q) - exact) / exact < 0.02
        assert abs(merged.quantile(q) - exact) / exact < 0.02
    rt = TDigest.from_bytes(merged.to_bytes())
    assert abs(rt.quantile(0.5) - merged.quantile(0.5)) < 1e-9
    assert abs(rt.cdf(float(np.median(data))) - 0.5) < 0.02


def test_chi2_sf_known_values():
    # chi2 sf(3.841, 1) ≈ 0.05; sf(7.815, 3) ≈ 0.05; sf(0, k) = 1
    assert abs(chi2_sf(3.841, 1) - 0.05) < 0.002
    assert abs(chi2_sf(7.815, 3) - 0.05) < 0.002
    assert chi2_sf(0.0, 4) == 1.0


def test_chi_square_test_detects_shift():
    ref = {"a": 0.5, "b": 0.3, "c": 0.2}
    clean = {"a": 5000, "b": 3000, "c": 2000}
    stat, p = chi_square_test(clean, ref)
    assert p > 0.9
    drifted = {"a": 3000, "b": 3000, "c": 4000}
    stat, p = chi_square_test(drifted, ref)
    assert p < 1e-6
    # unseen category counts as drift
    stat, p = chi_square_test({"a": 5000, "zzz": 5000}, ref)
    assert p < 1e-6


def test_sketch_state_batch_update_and_roundtrip():
    batch = pa.table({
        "conv_id": pa.array([f"c{i % 50}" for i in range(1000)]),
        "role": pa.array((["user", "assistant"] * 500)[:1000]),
        "text": pa.array(["x" * (i % 100) for i in range(1000)]),
        "tool": pa.array([None if i % 3 else "search.query" for i in range(1000)]),
    })
    s = SketchState()
    s.update_batch(batch)
    assert s.n_rows == 1000
    assert abs(s.conv_hll.cardinality() - 50) < 3
    assert s.role_counts == {"user": 500, "assistant": 500}
    rt = SketchState.from_b64(s.to_b64())
    assert rt.role_counts == s.role_counts
    assert rt.n_rows == 1000
    merged = SketchState().merge(rt).merge(SketchState.from_b64(s.to_b64()))
    assert merged.n_rows == 2000
    assert abs(merged.conv_hll.cardinality() - 50) < 3  # same keys: no growth


def test_ks_statistic_detects_shift():
    rng = np.random.default_rng(0)
    base = rng.lognormal(4.0, 0.8, 50_000)
    ref_digest = TDigest()
    ref_digest.update(base)
    edges = [ref_digest.quantile(q) for q in np.linspace(0.01, 0.99, 25)]
    ref_cdf = [(e, ref_digest.cdf(e)) for e in edges]

    same = TDigest()
    same.update(rng.lognormal(4.0, 0.8, 50_000))
    assert ks_statistic_from_cdf(same, ref_cdf) < 0.02

    shifted = TDigest()
    shifted.update(rng.lognormal(4.5, 0.8, 50_000))
    assert ks_statistic_from_cdf(shifted, ref_cdf) > 0.15
