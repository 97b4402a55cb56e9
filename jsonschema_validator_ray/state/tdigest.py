"""A compact mergeable t-digest (Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests", public algorithm) for streaming quantiles over
turn lengths. Batch updates are vectorized (sort + weighted clustering);
merge concatenates centroids and re-compresses, so partial digests from
batches/partitions combine associatively.
"""

from __future__ import annotations

import numpy as np


class TDigest:
    def __init__(self, compression: float = 200.0,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.compression = float(compression)
        self.means = means if means is not None else np.empty(0, np.float64)
        self.weights = weights if weights is not None else np.empty(0, np.float64)
        self._min = float(self.means.min()) if self.means.size else np.inf
        self._max = float(self.means.max()) if self.means.size else -np.inf

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum())

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        self._min = min(self._min, float(values.min()))
        self._max = max(self._max, float(values.max()))
        self.means = np.concatenate([self.means, values])
        self.weights = np.concatenate([self.weights, np.ones(values.size)])
        if self.means.size > 8 * self.compression:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._compress()
        return self

    def _compress(self) -> None:
        if self.means.size == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means = self.means[order]
        weights = self.weights[order]
        total = weights.sum()
        # scale function k1: q -> (δ/2π) asin(2q-1); cluster boundaries where
        # k crosses integers
        cum = np.cumsum(weights) - weights / 2.0
        q = cum / total
        k = (self.compression / (2.0 * np.pi)) * np.arcsin(2.0 * np.clip(q, 0, 1) - 1.0)
        bucket = np.floor(k - k[0]).astype(np.int64)
        # force first/last SORTED points into singleton clusters (the
        # t-digest extreme-isolation rule): exact min/max centroids anchor
        # the tail interpolation instead of leaning solely on the _min/_max
        # clamps (review r4 — the comment predated the implementation)
        if bucket.size >= 2:
            inner = bucket[1:-1] + 1
            last = (inner[-1] + 1) if inner.size else 1
            bucket = np.concatenate([[0], inner, [last]])
        nb = bucket[-1] + 1 if bucket.size else 0
        sums = np.bincount(bucket, weights=means * weights, minlength=nb)
        wsum = np.bincount(bucket, weights=weights, minlength=nb)
        keep = wsum > 0
        self.means = sums[keep] / wsum[keep]
        self.weights = wsum[keep]

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        self._compress()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        # (W-1)-convention target against centroid MIDPOINTS: with unit
        # weights value i sits at cum i+0.5, so q*(W-1)+0.5 reproduces SQL
        # quantile_cont / np.quantile(linear) EXACTLY while centroids are
        # singletons; q*W overshoots by up to one value at the tails (a
        # 14%-relative p99 error on a 200-point heavy-tailed group)
        target = q * (self.weights.sum() - 1.0) + 0.5
        return float(np.interp(target, cum, self.means,
                               left=self._min, right=self._max))

    def cdf(self, x: float) -> float:
        """P(value <= x) estimated from centroids."""
        if self.means.size == 0:
            return float("nan")
        self._compress()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        total = self.weights.sum()
        if x <= self._min:
            return 0.0
        if x >= self._max:
            return 1.0
        return float(np.interp(x, self.means, cum / total))

    def to_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        self._compress()
        return self.means.copy(), self.weights.copy()

    def to_bytes(self) -> bytes:
        self._compress()
        header = np.array([self.compression, self._min, self._max,
                           float(self.means.size)], np.float64)
        return np.concatenate([header, self.means, self.weights]).tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        arr = np.frombuffer(data, np.float64)
        comp, mn, mx, n = arr[0], arr[1], arr[2], int(arr[3])
        d = cls(comp, arr[4:4 + n].copy(), arr[4 + n:4 + 2 * n].copy())
        d._min, d._max = float(mn), float(mx)
        return d
