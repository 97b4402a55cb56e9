"""Embedding-preprocessing operators — the steps between an embedding
dump and a vector index at 100 TB: symmetric int8 quantization (the
standard 4x memory/bandwidth cut ANN services apply before indexing;
max-abs scaling per vector, codes in [-127, 127]).

Scale shape: pure streaming ``map_batches`` — flatten the list column to
one values buffer, one ``np.maximum.reduceat`` per batch for the per-row
max-abs, one vectorized round for the codes, rebuilt as a zero-copy
ListArray. NO shuffle, no driver state, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..rayutil import strip_meta


def quantize_embeddings(ds, list_col: str, id_col: str):
    """Symmetric per-vector int8 quantization of ``list_col``: for each
    row, ``max_abs = max(|x_i|)`` (float64, computed over the float32
    values cast losslessly to double) and ``codes_i =
    round_half_away(x_i * 127.0 / max_abs)`` — the exact arithmetic and
    rounding of SQL ``round(CAST(x AS DOUBLE) * 127.0 / max_abs)``
    (DuckDB rounds half away from zero, mirrored here by
    ``sign·floor(|v| + 0.5)``). All-zero vectors quantize to all-zero
    codes with ``max_abs = 0``. Rows with a null id, null embedding, or
    empty embedding are dropped (mirrored by the oracle's ``WHERE ...
    len(embedding) > 0``).

    Streams ``(id, n_dims, max_abs, codes:list<int8>)``."""

    def fn(batch: pa.Table) -> pa.Table:
        sel = batch.select([id_col, list_col])
        ok = pc.and_kleene(pc.is_valid(sel[id_col]),
                           pc.is_valid(sel[list_col])).fill_null(False)
        sel = sel.filter(ok)
        lists = sel[list_col].combine_chunks() \
            if isinstance(sel[list_col], pa.ChunkedArray) else sel[list_col]
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        lens = offs[1:] - offs[:-1]
        keep = lens > 0
        if not keep.all():
            kidx = pa.array(np.flatnonzero(keep), pa.int64())
            sel = sel.take(kidx)
            lists = sel[list_col].combine_chunks() \
                if isinstance(sel[list_col], pa.ChunkedArray) \
                else sel[list_col]
            offs = lists.offsets.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            offs = offs - offs[0]
            lens = offs[1:] - offs[:-1]
        n = len(lens)
        if n == 0:
            return pa.table({
                id_col: pa.array([], batch.schema.field(id_col).type),
                "n_dims": pa.array([], pa.int64()),
                "max_abs": pa.array([], pa.float64()),
                "codes": pa.array([], pa.list_(pa.int8()))})
        # lossless float32 -> float64 widening; |x| then per-row max via
        # one segmented reduce (no per-row Python)
        flat = np.abs(lists.flatten().to_numpy(zero_copy_only=False)
                      .astype(np.float64))
        vals = lists.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        mx = np.maximum.reduceat(flat, offs[:-1])
        rep = np.repeat(mx, lens)
        with np.errstate(divide="ignore", invalid="ignore"):
            scaled = vals * 127.0 / rep
        scaled = np.where(rep == 0.0, 0.0, scaled)
        codes = (np.sign(scaled)
                 * np.floor(np.abs(scaled) + 0.5)).astype(np.int8)
        code_arr = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(codes, pa.int8()))
        return strip_meta(pa.table({
            id_col: sel[id_col],
            "n_dims": pa.array(lens, pa.int64()),
            "max_abs": pa.array(mx, pa.float64()),
            "codes": code_arr}))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def jl_matrix(out_dims: int, in_dims: int) -> np.ndarray:
    """Deterministic sparse Johnson-Lindenstrauss projection matrix
    (Achlioptas 2003, public construction): entries in {-1, 0, +1} with
    P(+1)=P(-1)=1/6, drawn from a Knuth multiplicative hash of the cell
    index — both the engine and the SQL oracle inline the SAME matrix, so
    projections are bit-comparable. int8, shape (out_dims, in_dims)."""
    idx = np.arange(out_dims * in_dims, dtype=np.uint64) + np.uint64(1)
    h = (idx * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
    m = h % np.uint64(6)
    r = np.where(m == 0, 1, np.where(m == 1, -1, 0)).astype(np.int8)
    return r.reshape(out_dims, in_dims)


def random_projection(ds, list_col: str, id_col: str, in_dims: int,
                      out_dims: int = 4):
    """Random-projection dimensionality reduction (the JL shape): project
    each ``in_dims``-long embedding onto ``out_dims`` deterministic
    {-1,0,+1} directions (:func:`jl_matrix`) — the cheap pre-index /
    visualization / LSH-input reduction step. One float64 BLAS matmul per
    batch against a closure-captured (tiny) matrix, NO shuffle, no per-row
    Python; rows with null ids, null embeddings or the wrong length drop
    (mirrored by the oracle's ``len(embedding) = in_dims`` filter).
    Sums are float64 over ≤ in_dims terms so 6 dp rounding is
    summation-order-safe vs SQL ``list_dot_product``.

    Streams ``(id, y0..y{out_dims-1})`` (float64, unrounded)."""
    r_t = jl_matrix(out_dims, in_dims).astype(np.float64).T

    def fn(batch: pa.Table) -> pa.Table:
        sel = batch.select([id_col, list_col])
        lists = sel[list_col].combine_chunks() \
            if isinstance(sel[list_col], pa.ChunkedArray) else sel[list_col]
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        lens = offs[1:] - offs[:-1]
        keep = (lens == in_dims) \
            & pc.is_valid(sel[id_col]).to_numpy(zero_copy_only=False) \
            & pc.is_valid(lists).to_numpy(zero_copy_only=False)
        kidx = pa.array(np.flatnonzero(keep), pa.int64())
        sel = sel.take(kidx)
        lists = sel[list_col].combine_chunks() \
            if isinstance(sel[list_col], pa.ChunkedArray) else sel[list_col]
        n = sel.num_rows
        if n == 0:
            return strip_meta(pa.table(
                {id_col: pa.array([], batch.schema.field(id_col).type)}
                | {f"y{j}": pa.array([], pa.float64())
                   for j in range(out_dims)}))
        x = lists.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(n, in_dims)
        y = x @ r_t
        return strip_meta(pa.table(
            {id_col: sel[id_col]}
            | {f"y{j}": pa.array(y[:, j], pa.float64())
               for j in range(out_dims)}))

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)
