"""SketchState: the per-actor/per-partition bundle of streaming sketches the
validation pipeline maintains (SURVEY.md §2.2 aggregations row):

- HLL distinct counts for ``conv_id`` and ``tool``
- t-digest of turn text lengths
- exact categorical counter of ``role`` frequencies
- exact row/null counters

Updates are vectorized per Arrow batch; states merge commutatively so actor
partials and partition manifests combine in any order, exactly once each.
"""

from __future__ import annotations

import base64
import pickle
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .drift import chi_square_test, ks_statistic_from_cdf
from .hll import HyperLogLog, hash64
from .tdigest import TDigest


class SketchState:
    def __init__(self, p: int = 12, compression: float = 200.0):
        self.conv_hll = HyperLogLog(p)
        self.tool_hll = HyperLogLog(p)
        self.turnlen = TDigest(compression)
        self.role_counts: Counter = Counter()
        self.n_rows = 0

    def update_batch(self, batch: pa.Table) -> None:
        self.n_rows += batch.num_rows
        if "conv_id" in batch.column_names:
            uniq = pc.unique(batch["conv_id"].combine_chunks()
                             if isinstance(batch["conv_id"], pa.ChunkedArray)
                             else batch["conv_id"])
            uniq = uniq.drop_null()
            if len(uniq):
                self.conv_hll.update_hashes(hash64(uniq))
        if "tool" in batch.column_names:
            uniq = pc.unique(batch["tool"].combine_chunks()
                             if isinstance(batch["tool"], pa.ChunkedArray)
                             else batch["tool"]).drop_null()
            if len(uniq):
                self.tool_hll.update_hashes(hash64(uniq))
        if "text" in batch.column_names:
            lengths = pc.utf8_length(batch["text"]).drop_null()
            if len(lengths):
                self.turnlen.update(lengths.to_numpy(zero_copy_only=False)
                                    .astype(np.float64))
        if "role" in batch.column_names:
            vc = batch["role"].drop_null()
            counts = pc.value_counts(vc.combine_chunks()
                                     if isinstance(vc, pa.ChunkedArray) else vc)
            for item in counts:
                self.role_counts[item["values"].as_py()] += item["counts"].as_py()

    def merge(self, other: "SketchState") -> "SketchState":
        self.conv_hll.merge(other.conv_hll)
        self.tool_hll.merge(other.tool_hll)
        self.turnlen.merge(other.turnlen)
        self.role_counts.update(other.role_counts)
        self.n_rows += other.n_rows
        return self

    # --- drift evaluation (driver-side final step over merged state) -------

    def evaluate_drift(self, drift_checks) -> list[dict]:
        """Evaluate DriftChecks → one verdict dict per check."""
        out = []
        for d in drift_checks:
            if d.kind == "chi2":
                ref = dict(d.reference)
                # restrict to reference categories: out-of-enum values are
                # row-level violations (enum kernel), not distribution drift
                observed = {k: v for k, v in self.role_counts.items() if k in ref}
                stat, pval = chi_square_test(observed, ref)
                out.append({"constraint_id": d.cid, "statistic": stat,
                            "p_value": pval, "threshold": d.threshold,
                            "passed": bool(pval >= d.threshold)})
            elif d.kind == "ks":
                ks = ks_statistic_from_cdf(self.turnlen, d.reference)
                out.append({"constraint_id": d.cid, "statistic": ks,
                            "p_value": None, "threshold": d.threshold,
                            "passed": bool(ks == ks and ks <= d.threshold)})
            else:
                raise ValueError(f"unknown drift kind {d.kind!r}")
        return out

    def summary(self) -> dict:
        return {
            "n_rows": self.n_rows,
            "distinct_conv_id_approx": round(self.conv_hll.cardinality()),
            "distinct_tool_approx": round(self.tool_hll.cardinality()),
            "turnlen_p50": self.turnlen.quantile(0.5),
            "turnlen_p99": self.turnlen.quantile(0.99),
            "role_counts": dict(self.role_counts),
        }

    # --- serialization for manifests / partial-sketch rows ------------------

    def to_bytes(self) -> bytes:
        return pickle.dumps({
            "conv": self.conv_hll.to_bytes(),
            "tool": self.tool_hll.to_bytes(),
            "turnlen": self.turnlen.to_bytes(),
            "roles": dict(self.role_counts),
            "n_rows": self.n_rows,
        }, protocol=pickle.HIGHEST_PROTOCOL)

    @classmethod
    def from_bytes(cls, data: bytes) -> "SketchState":
        d = pickle.loads(data)
        s = cls()
        s.conv_hll = HyperLogLog.from_bytes(d["conv"])
        s.tool_hll = HyperLogLog.from_bytes(d["tool"])
        s.turnlen = TDigest.from_bytes(d["turnlen"])
        s.role_counts = Counter(d["roles"])
        s.n_rows = d["n_rows"]
        return s

    def to_b64(self) -> str:
        return base64.b64encode(self.to_bytes()).decode()

    @classmethod
    def from_b64(cls, data: str) -> "SketchState":
        return cls.from_bytes(base64.b64decode(data))
