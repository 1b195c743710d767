"""Arrow-vectorized NumPy kernels for the fixed-matrix float work on the
embedding paths (LSH band signatures, PQ codeword assignment).

Why these exist: Spark evaluates higher-order array functions
(``zip_with`` + ``aggregate``) as interpreted CodegenFallback
expressions.  A band-signature projection is ``n_planes`` such folds per
row (32/64/96 dot products of 64 terms each) and the PQ assignment is 64
folds per row — measured at sf1 (500k vectors, wide family) the
interpreted projection alone costs ~165 s while the identical arithmetic
in one NumPy pass costs ~6.5 s (25x; probe committed in
OPTIMIZATION_r13.md).  The round-12 attempt to fix this inside codegen
(flat per-index expansion) failed for a different reason — the generated
method blew HotSpot's 8 KB JIT limit (DOTKERNEL_AB_r13.json) — so the
fix that actually works is the optimization guide's §4.2 shape: let
Spark do distribution and shuffles, hand each Arrow batch to vectorized
NumPy.

BIT-IDENTITY CONTRACT (what makes this safe against the DuckDB oracle):
every accumulation below is PER-DIMENSION SEQUENTIAL, exactly the
left-to-right fold the Catalyst expressions and DuckDB's
``list_dot_product`` perform:

    acc = 0.0; for d in range(D): acc += x[d] * y[d]

vectorized across rows (``acc += X[:, d] * P[d]``) — the per-element
operation sequence in IEEE double is identical to
``aggregate(zip_with(a, b, (x, y) -> x*y), 0.0D, (acc, x) -> acc + x)``,
so signs, norms, distances and argmins are bit-identical to the fold
(verified 0 mismatches over 500k vectors x 64 planes, and pinned by
tests/test_arrowkernels.py).  ``np.dot``/BLAS matmul would NOT satisfy
this (pairwise/SIMD-blocked summation reorders the adds); do not
"optimize" the d-loop into one.

The embedding column crosses the boundary as Arrow — float32 storage is
widened to float64 in NumPy (exact, same as Spark's array<double> cast)
and passed back through, so downstream re-rank folds see the identical
doubles they read from parquet.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rows_f64(col: pa.Array | pa.ChunkedArray, d: int, what: str) -> np.ndarray:
    """List-of-float column -> (n, d) float64 matrix, enforcing the fixed
    width loudly (the band/PQ planes are d-wide literal matrices; a ragged
    or mismatched embedding must fail, not truncate — advice r12#1)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(f"{what}: embedding column contains nulls")
    flat = col.flatten()
    n = len(col)
    if len(flat) != n * d:
        raise ValueError(
            f"{what}: expected fixed width {d}, got {len(flat)} values for "
            f"{n} rows (ragged or mismatched embedding dimension)"
        )
    return np.asarray(flat).astype(np.float64, copy=False).reshape(n, d)


def _list_array(mat: np.ndarray, arrow_type: pa.DataType) -> pa.ListArray:
    """(n, w) matrix -> Arrow list column without a per-row Python loop."""
    n, w = mat.shape
    offsets = pa.array(np.arange(0, (n + 1) * w, w, dtype=np.int32))
    return pa.ListArray.from_arrays(
        offsets, pa.array(np.ascontiguousarray(mat).ravel(), type=arrow_type)
    )


def band_signature_frame(
    df: DataFrame,
    planes: list[list[float]],
    n_bands: int,
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, embedding) -> (id, emb array<double>, nrm double,
    bands array<int>): the hyperplane-LSH signature projection plus the
    hoisted per-row norm, in one Arrow pass.

    ``df`` must have exactly two columns: one id column (any name/type,
    passed through untouched) and ``emb_col``.  ``bands[k]`` packs the
    sign bits of planes ``k*band_bits .. (k+1)*band_bits-1`` MSB-first —
    the exact integer ``_band_cols`` builds, over bit-identical dot
    products (module docstring).  Consumers posexplode ``bands`` in the
    JVM so the vector payload crosses the Python boundary once per row,
    not once per band row."""
    others = [c for c in df.columns if c != emb_col]
    if len(others) != 1:
        raise ValueError(f"expected one id column beside {emb_col!r}: {df.columns}")
    id_col = others[0]
    id_type = df.schema[id_col].dataType.simpleString()

    P = np.array(planes, dtype=np.float64).T  # (d, n_planes)
    d, n_planes = P.shape
    band_bits = n_planes // n_bands
    weights = np.array(
        [1 << (band_bits - 1 - j) for j in range(band_bits)], dtype=np.int64
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            X = _rows_f64(batch.column(emb_col), d, "band_signature_frame")
            n = X.shape[0]
            acc = np.zeros((n, n_planes), dtype=np.float64)
            nrm_acc = np.zeros(n, dtype=np.float64)
            for i in range(d):  # sequential per-dim accumulation (bit contract)
                xi = X[:, i]
                acc += xi[:, None] * P[i]
                nrm_acc += xi * xi
            bits = (acc >= 0).astype(np.int64)
            bands = bits.reshape(n, n_bands, band_bits) @ weights  # exact ints
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_col),
                    _list_array(X, pa.float64()),
                    pa.array(np.sqrt(nrm_acc)),
                    _list_array(bands.astype(np.int32), pa.int32()),
                ],
                names=[id_col, "emb", "nrm", "bands"],
            )

    return df.mapInArrow(
        kernel,
        f"{id_col} {id_type}, emb array<double>, nrm double, bands array<int>",
    )


def pq_assign_frame(
    df: DataFrame,
    codebook: list[list[list[float]]],
    emb_col: str = "embedding",
) -> DataFrame:
    """(key, embedding) -> (key, err double, code string): per-subspace
    nearest-codeword assignment for product quantization, one Arrow pass
    instead of subspaces x codewords interpreted distance folds per row.

    Distances are the sequential fold ``acc += (x_d - c_d)^2`` (bit
    contract in the module docstring); per subspace the error is the min
    over codewords and the code the FIRST index attaining it (np.argmin
    = ties to the smallest index, the ``min(struct(dist, c))`` /
    ``list_position`` tie-break both engines use); the total err is the
    left-associated sum over subspaces in order."""
    others = [c for c in df.columns if c != emb_col]
    if len(others) != 1:
        raise ValueError(f"expected one key column beside {emb_col!r}: {df.columns}")
    key_col = others[0]
    key_type = df.schema[key_col].dataType.simpleString()

    C = np.array(codebook, dtype=np.float64)  # (subspaces, codewords, subdim)
    n_sub, n_codes, subdim = C.shape
    d = n_sub * subdim

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            X = _rows_f64(batch.column(emb_col), d, "pq_assign_frame")
            n = X.shape[0]
            err = None
            code_cols = []
            for s in range(n_sub):
                sub = X[:, s * subdim : (s + 1) * subdim]
                dist = np.zeros((n, n_codes), dtype=np.float64)
                for i in range(subdim):  # sequential per-dim fold (bit contract)
                    diff = sub[:, i, None] - C[s, :, i]
                    dist += diff * diff
                sub_err = dist.min(axis=1)
                code_cols.append(dist.argmin(axis=1))  # first min = lowest c
                err = sub_err if err is None else err + sub_err  # left-assoc
            code = code_cols[0].astype("U2")
            for c in code_cols[1:]:
                code = np.char.add(np.char.add(code, ","), c.astype("U2"))
            yield pa.RecordBatch.from_arrays(
                [batch.column(key_col), pa.array(err), pa.array(code.tolist())],
                names=[key_col, "err", "code"],
            )

    return df.mapInArrow(kernel, f"{key_col} {key_type}, err double, code string")


def centroid_assign_frame(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    emb_col: str = "emb",
    keep_emb: bool = False,
    with_norm: bool = False,
) -> DataFrame:
    """(vec_id, emb) -> (vec_id[, emb], cid): nearest-centroid assignment
    against a COLLECTED centroid list — the k-means assign step with the
    scored cross join moved into one Arrow pass.

    The score is ``|c|^2 - 2*dot(x, c)`` with both dot products as the
    sequential per-dim fold (bit contract above), and the argmin is the
    lexicographic ``min(struct(score, cid))``: NumPy evaluates centroids
    in ascending-cid order, so ``argmin`` ties break to the lowest cid —
    identical to the aggregate form in ``kmeans_assign`` and the
    oracle's ``ROW_NUMBER OVER (ORDER BY score, cid)``.  Collecting the
    centroid frame is the same boundedness class as the broadcast it
    replaces (K rows, K always broadcast-sized by design)."""
    others = [c for c in df.columns if c != emb_col]
    if len(others) != 1:
        raise ValueError(f"expected one id column beside {emb_col!r}: {df.columns}")
    id_col = others[0]
    id_type = df.schema[id_col].dataType.simpleString()

    cents = sorted(centroids)  # ascending cid -> argmin ties to lowest cid
    cids = np.array([c[0] for c in cents], dtype=np.int64)
    M = np.array([c[1] for c in cents], dtype=np.float64).T  # (d, K)
    d, k = M.shape
    # |c|^2 hoisted per centroid, same sequential fold as dot(c, c)
    c_sq = np.zeros(k, dtype=np.float64)
    for i in range(d):
        c_sq += M[i] * M[i]

    cid_type = "bigint"
    out_cols = [f"{id_col} {id_type}"]
    if keep_emb:
        out_cols.append("emb array<double>")
    out_cols.append(f"cid {cid_type}")
    if with_norm:
        out_cols.append("nrm double")

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            X = _rows_f64(batch.column(emb_col), d, "centroid_assign_frame")
            n = X.shape[0]
            dots = np.zeros((n, k), dtype=np.float64)
            nrm_acc = np.zeros(n, dtype=np.float64) if with_norm else None
            for i in range(d):  # sequential per-dim fold (bit contract)
                xi = X[:, i]
                dots += xi[:, None] * M[i]
                if with_norm:
                    nrm_acc += xi * xi
            score = c_sq - 2.0 * dots
            best = cids[np.argmin(score, axis=1)]  # ties -> lowest cid
            arrays = [batch.column(id_col)]
            names = [id_col]
            if keep_emb:
                arrays.append(_list_array(X, pa.float64()))
                names.append("emb")
            arrays.append(pa.array(best))
            names.append("cid")
            if with_norm:
                arrays.append(pa.array(np.sqrt(nrm_acc)))
                names.append("nrm")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.mapInArrow(kernel, ", ".join(out_cols))


def exploded_band_rows(base: DataFrame, *payload: str) -> DataFrame:
    """JVM-side explode of a :func:`band_signature_frame` result into
    (id..., payload..., band_idx, band_val) — the duplication to <=4 band
    rows happens after the Python boundary, codegen'd."""
    id_col = base.columns[0]
    return base.select(
        id_col,
        *payload,
        F.posexplode("bands").alias("band_idx", "band_val"),
    )
