"""Fuzzy string join: blocked Levenshtein similarity join over DISTINCT
values.

Record linkage / catalog reconciliation at training-data scale ("are
these two near-identical part names / domain names / titles the same
entity?") needs an edit-distance join, which no SQL engine does without
an O(V_L × V_R) cross product. The scale shape here:

1. DISTINCT values per side — one streaming ``pc.unique`` partial pass,
   folded driver-side at distinct-VALUE scale (the dictionary-scale
   assumption shared with `ref_check`'s broadcast lookup; names/domains
   dedupe 4-6 orders of magnitude below row count at 100 TB).
2. Candidate generation by LENGTH BLOCKING — ``|len(a) − len(b)| > d``
   is impossible for edit distance ≤ d, so sorting by length and
   sliding a ±d window is lossless. Within-band all-pairs is the
   documented cost; the named growth path for adversarially uniform
   lengths is a positional q-gram count prefilter (PPJoin-style, see
   `ops/dedup.py::ngram_neardup`), which composes in front of the same
   verify stage.
3. Distributed VERIFY — candidate pairs are chunked into blocks and
   verified by ``map_batches`` with a Levenshtein DP that is fully
   vectorized across the PAIR axis: one loop over the longer string's
   length; the column-direction insertion dependency (a min-plus prefix
   scan) is computed as ``minimum.accumulate(t − j) + j``, so each DP
   row is O(1) numpy kernels over all pairs at once — no per-pair
   Python in the hot stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def levenshtein_batch(a_list, b_list) -> np.ndarray:
    """Exact Levenshtein distance for each (a_list[i], b_list[i]) pair,
    vectorized across pairs (see module docstring for the scan trick).
    Unicode-correct: compares CODEPOINTS. DuckDB's ``levenshtein``
    operates on UTF-8 BYTES, so the two agree on ASCII (fuzz-tested,
    2000 pairs exact) and deliberately diverge on multibyte text —
    codepoint distance is the linkage-correct semantics ("é" vs "e" is
    one edit, not two)."""
    n = len(a_list)
    out = np.zeros(n, np.int64)
    if n == 0:
        return out
    a_lens = np.fromiter((len(s) for s in a_list), np.int64, n)
    b_lens = np.fromiter((len(s) for s in b_list), np.int64, n)
    La = int(a_lens.max(initial=0))
    Lb = int(b_lens.max(initial=0))
    if Lb == 0:
        return a_lens
    # codepoint matrices, zero-padded (0 never appears in real text)
    A = np.zeros((n, max(La, 1)), np.uint32)
    B = np.zeros((n, Lb), np.uint32)
    for i, s in enumerate(a_list):
        if s:
            A[i, :len(s)] = np.frombuffer(
                s.encode("utf-32-le"), np.uint32)
    for i, s in enumerate(b_list):
        if s:
            B[i, :len(s)] = np.frombuffer(
                s.encode("utf-32-le"), np.uint32)

    rng = np.arange(Lb + 1, dtype=np.int64)
    prev = np.broadcast_to(rng, (n, Lb + 1)).copy()
    ans = b_lens.copy()                      # dp[0][len(b)] when a == ""
    t = np.empty((n, Lb + 1), np.int64)
    for i in range(1, La + 1):
        cost = (A[:, i - 1][:, None] != B).astype(np.int64)
        t[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=t[:, 1:])
        cur = np.minimum.accumulate(t - rng, axis=1) + rng
        done = a_lens == i
        if done.any():
            ans[done] = cur[done, b_lens[done]]
        prev = cur
    return ans


def _distinct_strings(ds, col: str) -> list:
    """One streaming pass: per-block ``pc.unique`` partials folded into
    the sorted distinct non-null value list (distinct-value scale)."""
    import ray

    def part(batch: pa.Table) -> pa.Table:
        arr = batch[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        u = pc.unique(arr.drop_null())
        return pa.table({"v": u.cast(pa.string())})

    parts = [t for t in ray.get(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .materialize().to_arrow_refs()) if t.num_rows]
    vals: set = set()
    for t in parts:
        vals.update(t["v"].to_pylist())
    return sorted(vals)


def _length_window_pairs(a_vals, b_vals, max_dist: int):
    """Candidate (i, j) index pairs with ``|len − len| ≤ max_dist``,
    generated with offset arithmetic (no Python pair loop). Both inputs
    must be sorted by (length, value); for the self-join case pass the
    same list twice — only i < j pairs are emitted."""
    self_join = a_vals is b_vals
    a_lens = np.fromiter((len(s) for s in a_vals), np.int64, len(a_vals))
    b_lens = np.fromiter((len(s) for s in b_vals), np.int64, len(b_vals))
    lo = np.searchsorted(b_lens, a_lens - max_dist, side="left")
    hi = np.searchsorted(b_lens, a_lens + max_dist, side="right")
    if self_join:
        lo = np.maximum(lo, np.arange(len(a_vals)) + 1)   # i < j only
    counts = np.maximum(hi - lo, 0)
    total = int(counts.sum())
    if total == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64))
    ii = np.repeat(np.arange(len(a_vals), dtype=np.int64), counts)
    # concatenated aranges: j = lo[i] + (position within i's run)
    starts = np.zeros(len(a_vals), np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    jj = np.arange(total, dtype=np.int64) - np.repeat(starts, counts) \
        + np.repeat(lo, counts)
    return ii, jj


def fuzzy_join(left_ds, right_ds, left_col: str, right_col: str,
               max_dist: int = 2, chunk_pairs: int = 1 << 16) -> pa.Table:
    """Similarity join over distinct values: all (left value, right
    value) pairs with Levenshtein distance ≤ ``max_dist``.

    Pass ``right_ds is left_ds`` and ``right_col == left_col`` for a
    SELF-join: each unordered pair is emitted once, canonicalized so
    ``name_a < name_b`` lexicographically (identical values never pair —
    the input is one distinct set). In CROSS mode (two different
    inputs), side attribution is preserved instead: ``name_a`` is always
    the LEFT value and ``name_b`` the RIGHT value, so shared values can
    legitimately yield both ``(x, y)`` and ``(y, x)`` rows and
    ``name_a == name_b`` rows (distance 0). Output columns:
    ``name_a, name_b, dist`` sorted by (name_a, name_b); result is
    match-scale, collected driver-side.

    Driver memory is INDEX-scale, not pair-string-scale: candidate
    chunks ship as (i, j) int64 pairs (16 B/pair) and the distinct value
    arrays broadcast once via ``ray.put``; verify tasks gather their own
    strings (review r5).
    """
    import ray

    self_join = right_ds is left_ds and right_col == left_col
    a_vals = _distinct_strings(left_ds, left_col)
    b_vals = a_vals if self_join else _distinct_strings(right_ds, right_col)
    # candidate windows need length-sorted order
    a_vals = sorted(a_vals, key=lambda s: (len(s), s))
    b_vals = a_vals if self_join else sorted(
        b_vals, key=lambda s: (len(s), s))
    ii, jj = _length_window_pairs(a_vals, a_vals if self_join else b_vals,
                                  max_dist)

    empty = pa.table({"name_a": pa.array([], pa.string()),
                      "name_b": pa.array([], pa.string()),
                      "dist": pa.array([], pa.int64())})
    if len(ii) == 0:
        return empty

    a_ref = ray.put(pa.array(a_vals, pa.string()))
    b_ref = a_ref if self_join else ray.put(pa.array(b_vals, pa.string()))
    chunks = [pa.table({"i": pa.array(ii[s:s + chunk_pairs]),
                        "j": pa.array(jj[s:s + chunk_pairs])})
              for s in range(0, len(ii), chunk_pairs)]

    def verify(batch: pa.Table) -> pa.Table:
        ka = ray.get(a_ref).take(batch["i"].combine_chunks())
        kb = ray.get(b_ref).take(batch["j"].combine_chunks())
        d = levenshtein_batch(ka.to_pylist(), kb.to_pylist())
        keep = d <= max_dist
        if not keep.any():
            return empty
        mask = pa.array(keep)
        ka = ka.filter(mask)
        kb = kb.filter(mask)
        kd = pa.array(d[keep], pa.int64())
        if self_join:
            # canonical a < b ordering (self-join emits length-ordered
            # pairs, which is not lexicographic)
            lt = pc.less(ka, kb)
            return pa.table({"name_a": pc.if_else(lt, ka, kb),
                             "name_b": pc.if_else(lt, kb, ka),
                             "dist": kd})
        return pa.table({"name_a": ka, "name_b": kb, "dist": kd})

    parts = [t for t in ray.get(
        ray.data.from_arrow(chunks)
        .map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
        .materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return empty
    out = pa.concat_tables(parts)
    return out.sort_by([("name_a", "ascending"), ("name_b", "ascending")])
