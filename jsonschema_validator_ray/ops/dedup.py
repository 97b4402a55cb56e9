"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup.

Scale shapes:
- exact: content-hash per batch (map_batches) → groupby(hash) shuffle of the
  HASH + id only (never the payload) → keeper = min id per group.
- MinHash LSH: shingle→minhash signature per batch (vectorized numpy) →
  flat_map band rows → groupby(band_key) buckets → candidate pairs from
  same-bucket ids → exact Jaccard verify (per-pair, only on candidates).
- SimHash: 64-bit hyperplane-free charged-bit signature; near-dup = small
  Hamming distance within LSH bands of the signature.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.hll import hash64

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of the k-char shingles of a text (vectorized windows)."""
    if not text or len(text) < k:
        return hash64([text or ""])
    b = np.frombuffer(text.encode("utf-8", "ignore"), np.uint8)
    if b.size < k:
        return hash64([text])
    # windowed view → per-window 64-bit FNV-ish fold, vectorized
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    h = np.full(win.shape[0], np.uint64(1469598103934665603))
    for j in range(k):
        h = (h ^ win[:, j]) * np.uint64(1099511628211)
    return np.unique(h)


class MinHasher:
    """n_perms permutation min-hashes via universal hashing (a*x+b mod p).

    The signature matmul is blocked over shingles so the (n_shingles x
    n_perms) intermediate stays cache-resident."""

    def __init__(self, n_perms: int = 128, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, n_perms, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, n_perms, dtype=np.uint64)
        self.n_perms = n_perms

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        x = shingles.astype(np.uint64)
        out = np.full(self.n_perms, np.uint64(0xFFFFFFFFFFFFFFFF))
        step = 512
        for i in range(0, x.size, step):
            # (a*x + b) mod p; 64-bit wrap preserves min-comparison uniformity
            vals = (x[i:i + step, None] * self.a[None, :] + self.b[None, :]) \
                % _MERSENNE
            np.minimum(out, vals.min(axis=0), out=out)
        return out


def minhash_lsh_candidates(ds, id_column: str, text_column: str,
                           n_perms: int = 128, bands: int = 32, k: int = 5,
                           concurrency=None):
    """MinHash + banded LSH: returns a Dataset of candidate bucket rows
    (band, band_hash, id). Same (band, band_hash) ⇒ candidate pair."""
    rows_per_band = n_perms // bands
    if concurrency is None:
        import ray
        avail = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        # fixed-size pool: the autoscaling pool ramps too slowly for a short
        # compute-dense stage (measured on the signature stage)
        size = max(2, min(avail - 2, 16))
        concurrency = (size, size)

    class SignatureStage:
        def __init__(self):
            self.hasher = MinHasher(n_perms)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_column].to_pylist()
            texts = batch[text_column].to_pylist()
            out_band, out_hash, out_id, out_sig = [], [], [], []
            for i, t in zip(ids, texts):
                sig = self.hasher.signature(_shingle_hashes(t or "", k))
                bands_view = sig.reshape(bands, rows_per_band)
                for bi in range(bands):
                    h = hashlib.blake2b(bands_view[bi].tobytes(),
                                        digest_size=8).hexdigest()
                    out_band.append(bi)
                    out_hash.append(h)
                    out_id.append(i)
                    # full signature rides on the band-0 row (one per doc) so
                    # the pair stage can estimate Jaccard without re-reading
                    out_sig.append(sig.tobytes() if bi == 0 else None)
            return pa.table({
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.string()),
                id_column: pa.array(out_id),
                "signature": pa.array(out_sig, pa.binary()),
            })

    # small batches so the signature work spreads across the whole pool
    return ds.map_batches(SignatureStage, batch_format="pyarrow",
                          batch_size=256, concurrency=concurrency)


def minhash_near_duplicates(ds, id_column: str, text_column: str,
                            n_perms: int = 128, bands: int = 32, k: int = 5,
                            verify_threshold: float = 0.8,
                            concurrency=(1, 4)) -> pa.Table:
    """Full near-dup pipeline: signatures → band buckets (groupby shuffle) →
    candidate pairs → exact shingle-Jaccard verification. Returns
    (id_a, id_b, jaccard) for verified pairs, id_a < id_b.

    The verify stage re-reads ONLY candidate documents (broadcast the
    candidate id set; at 100 TB candidates are a vanishing fraction)."""
    import ray

    buckets = minhash_lsh_candidates(ds, id_column, text_column, n_perms,
                                     bands, k, concurrency)

    # Bucket rows are |docs| x bands (tiny relative to the corpus); candidate
    # pairs are extracted with ONE vectorized sort + run scan — per-bucket
    # map_groups would pay a Python call per bucket (~|docs| x bands calls).
    bt = pa.concat_tables(ray.get(buckets.to_arrow_refs()),
                          promote_options="default")
    bt = bt.sort_by([("band", "ascending"), ("band_hash", "ascending"),
                     (id_column, "ascending")])
    band = np.asarray(bt["band"].to_pylist(), np.int64)
    bh = bt["band_hash"].to_pylist()
    ids_col = np.asarray(bt[id_column].to_pylist(), np.int64)
    pairs = set()
    start = 0
    n = len(band)
    for i in range(1, n + 1):
        if i == n or band[i] != band[start] or bh[i] != bh[start]:
            if i - start > 1:
                uniq = sorted(set(ids_col[start:i].tolist()))
                pairs.update(combinations(uniq, 2))
            start = i
    if not pairs:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    pairs = sorted(pairs)

    # Vectorized signature-agreement pre-filter: est(J) has σ ≈ 1/sqrt(perms);
    # pairs estimated far below threshold cannot pass exact verification, so
    # only near/above-threshold candidates pay the exact shingle Jaccard.
    sig_rows = bt.filter(pc.is_valid(bt["signature"]))
    sig_ids = np.asarray(sig_rows[id_column].to_pylist(), np.int64)
    sig_mat = np.frombuffer(b"".join(sig_rows["signature"].to_pylist()),
                            np.uint64).reshape(len(sig_ids), n_perms)
    row_of = {int(i): r for r, i in enumerate(sig_ids)}
    pa_idx = np.array([row_of[a] for a, _ in pairs])
    pb_idx = np.array([row_of[b] for _, b in pairs])
    margin = 3.0 / np.sqrt(n_perms)
    keep = np.zeros(len(pairs), bool)
    step = 65536   # chunk: the pairwise compare matrix stays ~64 MB
    for i in range(0, len(pairs), step):
        est = (sig_mat[pa_idx[i:i + step]] ==
               sig_mat[pb_idx[i:i + step]]).mean(axis=1)
        keep[i:i + step] = est >= (verify_threshold - margin)
    pairs = [p for p, k_ in zip(pairs, keep) if k_]
    if not pairs:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    cand_ids = sorted({i for p in pairs for i in p})
    docs = pa.concat_tables(ray.get(
        ds.map_batches(
            lambda b: b.filter(pc.is_in(b[id_column],
                                        value_set=pa.array(cand_ids))),
            batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs()),
        promote_options="default")
    text_by_id = dict(zip(docs[id_column].to_pylist(),
                          docs[text_column].to_pylist()))
    sh = {i: _shingle_hashes(text_by_id.get(i) or "", k) for i in cand_ids}

    out_a, out_b, out_j = [], [], []
    for a, b in pairs:
        sa, sb = sh[a], sh[b]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        j = inter / union if union else 1.0
        if j >= verify_threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(j)
    return pa.table({"id_a": pa.array(out_a, pa.int64()),
                     "id_b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


def add_simhash(ds, text_column: str = "text", out: str = "simhash", k: int = 5,
                concurrency=(1, 4)):
    """64-bit SimHash per document: sign-sum of shingle-hash bits."""
    class Stage:
        def __init__(self):
            self.bits = (np.uint64(1) << np.arange(64, dtype=np.uint64))

        def __call__(self, batch: pa.Table) -> pa.Table:
            sims = np.zeros(batch.num_rows, np.uint64)
            for i, t in enumerate(batch[text_column].to_pylist()):
                h = _shingle_hashes(t or "", k)
                bitmat = ((h[:, None] & self.bits[None, :]) != 0)
                charge = bitmat.sum(axis=0) * 2 - h.size   # +1/-1 vote sum
                sims[i] = np.uint64(((charge > 0) * self.bits).sum())
            return batch.append_column(out, pa.array(sims, pa.uint64()))

    return ds.map_batches(Stage, batch_format="pyarrow", concurrency=concurrency)


def simhash_near_duplicates(ds, id_column: str, text_column: str = "text",
                            max_hamming: int = 3, k: int = 5) -> pa.Table:
    """SimHash near-dup: 4×16-bit band LSH on the signature, verify candidates
    by Hamming distance ≤ max_hamming. Returns (id_a, id_b, hamming)."""
    import ray

    with_sig = add_simhash(ds, text_column, "simhash", k)
    t = pa.concat_tables(ray.get(
        with_sig.select_columns([id_column, "simhash"]).to_arrow_refs()),
        promote_options="default")
    ids = np.asarray(t[id_column].to_pylist(), np.int64)
    sigs = np.asarray(t["simhash"].to_pylist(), np.uint64)
    cands = set()
    for band in range(4):
        keys = (sigs >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        order = np.argsort(keys, kind="stable")
        ks, os_ = keys[order], order
        start = 0
        for i in range(1, len(ks) + 1):
            if i == len(ks) or ks[i] != ks[start]:
                if i - start > 1:
                    for a, b in combinations(sorted(ids[os_[start:i]]), 2):
                        cands.add((int(a), int(b)))
                start = i
    sig_by_id = dict(zip(ids.tolist(), sigs.tolist()))
    out_a, out_b, out_h = [], [], []
    for a, b in sorted(cands):
        d = int(bin(sig_by_id[a] ^ sig_by_id[b]).count("1"))
        if d <= max_hamming:
            out_a.append(a)
            out_b.append(b)
            out_h.append(d)
    return pa.table({"id_a": pa.array(out_a, pa.int64()),
                     "id_b": pa.array(out_b, pa.int64()),
                     "hamming": pa.array(out_h, pa.int64())})


def exact_dedup_keepers(ds, id_column: str, text_column: str):
    """Exact dedup: content hash per batch → groupby(hash) over (hash, id)
    ONLY → keeper = min id + copy count per distinct content.

    Hashing is vectorized (two independent 64-bit polars hashes → 128-bit
    key, collision-negligible at 10^12 docs). NULL text hashes to polars'
    deterministic null-hash value, distinct from "" — NULL stays its own
    group, matching SQL ``GROUP BY text`` semantics."""
    import polars as pl

    def add_hash(batch: pa.Table) -> pa.Table:
        col = batch[text_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pl.from_arrow(col)
        h1 = s.hash(seed=42).to_numpy().astype(np.uint64)
        h2 = s.hash(seed=1337).to_numpy().astype(np.uint64)
        return pa.table({
            "content_hash": pa.array(h1.astype(np.int64), pa.int64()),
            "content_hash2": pa.array(h2.astype(np.int64), pa.int64()),
            id_column: batch[id_column],
        })

    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            zero_copy_batch=True)
    return hashed.groupby(["content_hash", "content_hash2"]).aggregate(
        Min(id_column, alias_name="keeper_id"),
        Count(alias_name="n_copies"))


def embedding_near_duplicates(ds, id_column: str, vec_column: str,
                              threshold: float = 0.95) -> pa.Table:
    """Embedding-cosine near-dup for corpora whose embedding table fits the
    driver after normalization (sf-scale); the at-scale path goes through
    ops.simsearch IVF buckets. Returns (id_a, id_b, cos)."""
    import ray

    t = pa.concat_tables(ray.get(
        ds.select_columns([id_column, vec_column]).to_arrow_refs()),
        promote_options="default")
    ids = np.asarray(t[id_column].to_pylist(), np.int64)
    mat = np.asarray(t[vec_column].to_pylist(), np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = mat @ mat.T
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= threshold
    return pa.table({
        "id_a": pa.array(ids[iu[0][mask]], pa.int64()),
        "id_b": pa.array(ids[iu[1][mask]], pa.int64()),
        "cos": pa.array(sims[iu][mask], pa.float64()),
    })
