"""Graph operators over edge-list Datasets.

`connected_components` (min-label propagation over near-dup pairs) lives in
ops/dedup.py next to its pair producers; this module holds the general
graph analytics that take an explicit weighted edge list — currently
weighted PageRank, the second distributed ITERATIVE algorithm in the
engine (alongside ops/cluster.py's k-means), and the one with an EXACT
SQL oracle (each power iteration unrolls to one CTE).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pagerank(edges_ds, src: str, dst: str, weight: str,
             damping: float = 0.85, iterations: int = 2) -> pa.Table:
    """Weighted PageRank by power iteration over a distributed edge list:
    ``r_{t+1}(v) = (1-d) + d * Σ_{(u,v,w)} r_t(u) * w / out_w(u)`` from
    ``r_0 ≡ 1`` (the classic unnormalized form; dangling nodes keep their
    base rank — no out-edges means no contribution anywhere, matching the
    SQL oracle's LEFT JOIN + COALESCE exactly).

    Distributed shape: the edge Dataset materializes ONCE (it is re-swept
    every iteration); a node-index + out-weight pass folds per-batch
    ``(src, w)`` partials; then each iteration is ONE broadcast of the rank
    vector (``ray.put``, zero-copy numpy on workers) + one streaming
    ``map_batches`` emitting per-batch ``(dst_idx, contribution)`` partials
    + a node-scale driver fold. NO shuffle in the iteration loop. The node
    vector is driver/broadcast-scale (the `ref_check` dictionary
    assumption — fine for 10^8 nodes; an edge-partitioned vertex state is
    the growth path beyond that).

    Null src/dst and NON-POSITIVE-weight edges drop (PageRank is defined
    on positive weights; w <= 0 would NaN-poison the division). Returns
    ``(node, rank)`` sorted by node; ranks are float64 — round before
    hashing comparisons."""
    import ray

    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1): {damping}")
    edges = edges_ds.materialize()

    def edge_filter(batch: pa.Table):
        """Valid, POSITIVE-weight edges only: w <= 0 would zero (or flip)
        a node's out-mass and a node whose edges ALL have w = 0 divides
        0/0 into NaN ranks — PageRank is defined on positive weights, so
        non-positive edges drop (the `weighted_sample` w > 0 precedent)."""
        ok = pc.and_(
            pc.and_(pc.is_valid(batch[src]), pc.is_valid(batch[dst])),
            pc.greater(pc.cast(batch[weight], pa.float64()),
                       pa.scalar(0.0)).fill_null(False))
        return batch.filter(ok)

    def node_partial(batch: pa.Table) -> pa.Table:
        b = edge_filter(batch)
        if not b.num_rows:
            return pa.table({"src": pa.array([], pa.int64()),
                             "ow": pa.array([], pa.float64()),
                             "nodes": pa.array([], pa.binary())})
        s = b[src].cast(pa.int64())
        t = pa.table({"src": s, "w": b[weight].cast(pa.float64())})
        g = pa.TableGroupBy(t, "src").aggregate([("w", "sum")])
        blob = np.unique(np.concatenate([
            s.to_numpy(zero_copy_only=False),
            b[dst].cast(pa.int64())
            .to_numpy(zero_copy_only=False)])).tobytes()
        return pa.table({
            "src": g["src"],
            "ow": g["w_sum"],
            # batch's node set rides the FIRST row only
            "nodes": pa.array([blob] + [b""] * (g.num_rows - 1),
                              pa.binary()),
        })

    parts = [t for t in ray.get(
        edges.map_batches(node_partial, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
        .to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())})
    folded = pa.concat_tables(parts)
    nodes = np.unique(np.frombuffer(
        b"".join(folded["nodes"].to_pylist()), np.int64))
    out_w = np.zeros(nodes.size, np.float64)
    src_np = folded["src"].to_numpy(zero_copy_only=False)
    np.add.at(out_w, np.searchsorted(nodes, src_np),
              folded["ow"].to_numpy(zero_copy_only=False))

    nodes_ref = ray.put(nodes)
    outw_ref = ray.put(out_w)
    rank = np.ones(nodes.size, np.float64)

    def contrib_stage(rank_ref):
        def fn(batch: pa.Table) -> pa.Table:
            nds = ray.get(nodes_ref)
            ow = ray.get(outw_ref)
            r = ray.get(rank_ref)
            b = edge_filter(batch)
            si = np.searchsorted(nds, b[src].cast(pa.int64())
                                 .to_numpy(zero_copy_only=False))
            di = np.searchsorted(nds, b[dst].cast(pa.int64())
                                 .to_numpy(zero_copy_only=False))
            w = b[weight].cast(pa.float64()).to_numpy(zero_copy_only=False)
            contrib = r[si] * w / ow[si]
            # aggregate over the batch's DISTINCT dsts only — a dense
            # node-sized array per batch would cost O(batches x nodes)
            # alloc+scan per iteration (review r4 batch 3)
            uniq, inv = np.unique(di, return_inverse=True)
            c = np.bincount(inv, weights=contrib)
            return pa.table({"idx": pa.array(uniq, pa.int64()),
                             "c": pa.array(c, pa.float64())})
        return fn

    for _ in range(iterations):
        rank_ref = ray.put(rank)
        iter_parts = [t for t in ray.get(
            edges.map_batches(contrib_stage(rank_ref),
                              batch_format="pyarrow", zero_copy_batch=True)
            .materialize().to_arrow_refs()) if t.num_rows]
        total = np.zeros(nodes.size, np.float64)
        for t in iter_parts:
            np.add.at(total, t["idx"].to_numpy(zero_copy_only=False),
                      t["c"].to_numpy(zero_copy_only=False))
        rank = (1.0 - damping) + damping * total

    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank": pa.array(rank, pa.float64())})
