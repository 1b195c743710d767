"""Similarity search over embedding columns (`array<float>`).

Two access paths, per the standard ANN playbook:
- **brute force** — exact cosine top-k via higher-order functions
  (`zip_with` + `aggregate`), fully JVM-side, O(n·d) per query. The
  baseline, and exactly what you run when the query set is small.
- **IVF-style partition-pruned search** — restrict the scan to the query's
  coarse cluster (the `label` column plays the centroid assignment here;
  in production the assignment comes from a k-means fit). At 100 TB the
  cluster id is a partition column, so the search is partition-pruned I/O,
  not just less compute.

All arithmetic is done in DOUBLE on both engines (embeddings are stored as
float32; DuckDB's list_cosine_similarity on FLOAT lists computes in float
and would diverge) and rounded to 6 decimals for stable comparison.
Tie-breaks are explicit (`sim DESC, vec_id ASC`) so top-k is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.session import load_table

QUERY_VEC_ID = 0
TOP_K = 10
DEDUP_COSINE_THRESHOLD = 0.45


def _as_double(arr: Column) -> Column:
    return arr.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


_COSINE_SQL = (
    "list_dot_product(a.emb, b.emb) / "
    "(sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))"
)


def knn_bruteforce(
    embeddings: DataFrame, query: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Exact top-k: broadcast the query vector against every row. The
    ORDER BY + LIMIT compiles to TakeOrderedAndProject — per-partition
    heaps then a single driver merge, no global sort shuffle."""
    q = query.select(_as_double(F.col("embedding")).alias("q_emb"))
    sim = cosine(_as_double(F.col("embedding")), F.col("q_emb"))
    return (
        embeddings.crossJoin(F.broadcast(q))
        .select("vec_id", F.round(sim, 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID)
    others = emb.filter(F.col("vec_id") != QUERY_VEC_ID)
    return knn_bruteforce(others, query)


ORACLE_KNN_BRUTEFORCE = f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
),
scored AS (
  SELECT b.vec_id,
         round(list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))), 6) AS sim
  FROM q a, (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
             WHERE vec_id <> {QUERY_VEC_ID}) b
)
SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id ASC LIMIT {TOP_K}
"""


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style: search only the query's coarse cluster (label). The
    cluster filter lands on the scan as a pushed predicate — at scale, with
    the table partitioned by cluster id, it prunes partitions entirely."""
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        _as_double(F.col("embedding")).alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    sim = cosine(_as_double(F.col("embedding")), F.col("q_emb"))
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(query), F.col("label") == F.col("q_label"))
        .select("vec_id", F.round(sim, 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


ORACLE_KNN_IVF = f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS emb, label
  FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
),
scored AS (
  SELECT b.vec_id,
         round(list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))), 6) AS sim
  FROM q a JOIN (SELECT vec_id, label, embedding::DOUBLE[] AS emb
                 FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}) b
    ON a.label = b.label
)
SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id ASC LIMIT {TOP_K}
"""


def q_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by embedding cosine, label-blocked — same blocked
    pairwise shape as the text near-dup baseline. Per-row norms are
    computed ONCE at scan time and carried through the join, so the
    per-pair work is a single zip_with/aggregate dot product; the division
    `dot/(norm_a*norm_b)` is the same float expression the oracle runs, so
    hoisting doesn't perturb the 6-dp rounding."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("emb")
    )
    emb = emb.withColumn("nrm", norm(F.col("emb")))
    a, b = emb.alias("a"), emb.alias("b")
    sim = dot(F.col("a.emb"), F.col("b.emb")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(sim, 6).alias("sim"),
        )
        .filter(F.col("sim") >= DEDUP_COSINE_THRESHOLD)
    )


ORACLE_EMBEDDING_DEDUP = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_COSINE_SQL}, 6) AS sim
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_COSINE_SQL} >= {DEDUP_COSINE_THRESHOLD}
"""


def q_knn_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 nearest neighbors of every label centroid member count — a
    grouped top-k (window + rank) exercising the per-group ANN shape used
    for batched query sets."""
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("emb")
    )
    centroids = emb.groupBy(F.col("label").alias("a_label")).agg(
        F.min("vec_id").alias("anchor_id")
    )
    anchors = emb.join(
        centroids, (emb.vec_id == centroids.anchor_id)
    ).select("a_label", F.col("emb").alias("a_emb"), "anchor_id")
    sim = cosine(F.col("emb"), F.col("a_emb"))
    scored = (
        emb.join(F.broadcast(anchors), F.col("label") == F.col("a_label"))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select("label", "vec_id", F.round(sim, 6).alias("sim"))
    )
    w = W.partitionBy("label").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("label", "vec_id", "sim", F.col("rk").cast("int").alias("rk"))
    )


ORACLE_KNN_PER_LABEL = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
),
anchors AS (
  SELECT label AS a_label, MIN(vec_id) AS anchor_id FROM e GROUP BY label
),
aemb AS (
  SELECT a.a_label, a.anchor_id, e.emb AS a_emb
  FROM anchors a JOIN e ON a.anchor_id = e.vec_id
),
scored AS (
  SELECT e.label, e.vec_id,
         round(list_dot_product(aemb.a_emb, e.emb)
               / (sqrt(list_dot_product(aemb.a_emb, aemb.a_emb))
                  * sqrt(list_dot_product(e.emb, e.emb))), 6) AS sim
  FROM e JOIN aemb ON e.label = aemb.a_label
  WHERE e.vec_id <> aemb.anchor_id
),
ranked AS (
  SELECT label, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY label ORDER BY sim DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT label, vec_id, sim, rk::INT AS rk FROM ranked WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# Random-hyperplane LSH top-k — the third ANN access path beside brute
# force and IVF: 16 sign bits (one per hyperplane) banded 4×4; candidates
# share at least one band with the query, exact cosine re-ranks them.
# Hyperplane coefficients are derived deterministically from md5 in Python
# and embedded as LITERALS in both the Spark plan and the oracle SQL —
# same doubles, same accumulation order, bit-identical signs (the
# HASH_FAMILY pattern from dedup.py).
#
# Scale: the corpus side computes signatures in one scan projection and
# explodes to 4 (band, value) keys; the query side broadcasts, so
# candidate selection is a broadcast semi join — no shuffle of the
# vectors. Exact cosine runs only on candidates (recall tunable by
# bits/bands), then TakeOrderedAndProject. This is the plan that serves
# ANN over 100 TB of embeddings without an index service.
# ---------------------------------------------------------------------------

import hashlib as _hashlib

LSH_BITS = 16
LSH_BANDS = 4
LSH_BAND_BITS = LSH_BITS // LSH_BANDS
EMB_DIM = 64


def _plane_coef(b: int, d: int) -> float:
    h = int(_hashlib.md5(f"rh-{b}-{d}".encode()).hexdigest()[:15], 16)
    return (h % 2001) / 1000.0 - 1.0


PLANES = [[_plane_coef(b, d) for d in range(EMB_DIM)] for b in range(LSH_BITS)]


def _band_cols(emb: Column) -> list[Column]:
    """4 band values, each packing 4 sign bits of hyperplane dot products."""
    bits = [
        F.when(dot(emb, F.array(*[F.lit(c) for c in PLANES[b]])) >= 0, 1).otherwise(0)
        for b in range(LSH_BITS)
    ]
    bands = []
    for k in range(LSH_BANDS):
        v = F.lit(0)
        for j in range(LSH_BAND_BITS):
            v = v + bits[k * LSH_BAND_BITS + j] * (1 << (LSH_BAND_BITS - 1 - j))
        bands.append(v)
    return bands


def knn_lsh(emb: DataFrame, query_vec_id: int, k: int = TOP_K) -> DataFrame:
    """LSH candidate selection + exact re-rank over an (vec_id, emb
    array<double>) frame. Recall follows the hyperplane-LSH collision
    law: P(bit agrees) = 1 − θ/π, so a 0.99-cosine near-duplicate
    collides in ≥1 of the 4 bands with probability ≈0.999 while a
    near-orthogonal pair (θ≈90°) collides only ≈23% of the time — the
    filter is FOR near-duplicates; low-similarity "neighbors" of a
    random query are expected casualties."""
    with_bands = emb.select(
        "vec_id",
        "emb",
        F.posexplode(F.array(*_band_cols(F.col("emb")))).alias("band_idx", "band_val"),
    )
    qb = with_bands.filter(F.col("vec_id") == query_vec_id).select(
        "band_idx", "band_val"
    )
    candidates = (
        with_bands.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(qb), ["band_idx", "band_val"], "left_semi")
        .select("vec_id")
        .distinct()
    )
    q_emb = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("emb").alias("q_emb")
    )
    sim = cosine(F.col("emb"), F.col("q_emb"))
    return (
        candidates.join(emb, "vec_id")
        .crossJoin(F.broadcast(q_emb))
        .select("vec_id", F.round(sim, 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    return knn_lsh(emb, QUERY_VEC_ID)


def _oracle_knn_lsh() -> str:
    def plane_sql(b: int) -> str:
        lits = ", ".join(repr(c) for c in PLANES[b])
        return f"list_dot_product(emb, [{lits}]::DOUBLE[])"

    band_exprs = []
    for k in range(LSH_BANDS):
        parts = []
        for j in range(LSH_BAND_BITS):
            b = k * LSH_BAND_BITS + j
            parts.append(
                f"(CASE WHEN {plane_sql(b)} >= 0 THEN 1 ELSE 0 END)"
                f" * {1 << (LSH_BAND_BITS - 1 - j)}"
            )
        band_exprs.append(f"({' + '.join(parts)}) AS band_{k}")
    band_cols = ", ".join(band_exprs)
    unpivot = " UNION ALL ".join(
        f"SELECT vec_id, {k} AS band_idx, band_{k} AS band_val FROM sigs"
        for k in range(LSH_BANDS)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
),
sigs AS (
  SELECT vec_id, {band_cols} FROM e
),
bands AS ({unpivot}),
qbands AS (SELECT band_idx, band_val FROM bands WHERE vec_id = {QUERY_VEC_ID}),
cand AS (
  SELECT DISTINCT b.vec_id FROM bands b
  JOIN qbands q ON b.band_idx = q.band_idx AND b.band_val = q.band_val
  WHERE b.vec_id <> {QUERY_VEC_ID}
),
scored AS (
  SELECT c.vec_id,
         round(list_dot_product(a.emb, q.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(q.emb, q.emb))), 6) AS sim
  FROM cand c
  JOIN e a ON a.vec_id = c.vec_id
  CROSS JOIN (SELECT emb FROM e WHERE vec_id = {QUERY_VEC_ID}) q
)
SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id ASC LIMIT {TOP_K}
"""


# ---------------------------------------------------------------------------
# Scalar (int8-style) quantization — the storage-side half of ANN at
# 100 TB: 64 float32 dims → 64 bytes (+2 floats of scale metadata), a 4×
# footprint cut before any index is built. Everything is JVM higher-order
# functions over the array column (no Python, no shuffle until the tiny
# per-label rollup); the quantize/dequantize arithmetic is spelled out
# with floor(x + 0.5) so Spark and DuckDB round identically and the
# reconstruction-error bound gets a full value oracle.
# ---------------------------------------------------------------------------

QUANT_LEVELS = 255


def quantize_error(emb: Column) -> Column:
    """Max per-dimension |x - dequantize(quantize(x))| for one vector
    under per-vector min/max scaling to QUANT_LEVELS+1 codes. Bounded by
    scale/2 = (max-min)/510 by construction."""
    lo = F.array_min(emb)
    scale = (F.array_max(emb) - lo) / F.lit(float(QUANT_LEVELS))
    code = lambda x: F.floor((x - lo) / scale + F.lit(0.5))  # noqa: E731
    return F.array_max(
        F.transform(emb, lambda x: F.abs(x - (lo + code(x) * scale)))
    )


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", _as_double(F.col("embedding")).alias("emb")
    )
    return (
        emb.select("label", quantize_error(F.col("emb")).alias("max_err"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("max_err"), 6).alias("mean_err"),
            F.round(F.max("max_err"), 6).alias("worst_err"),
        )
    )


ORACLE_EMBEDDING_QUANTIZE = f"""
WITH e AS (
  SELECT label, embedding::DOUBLE[] AS emb FROM embeddings
),
p AS (
  SELECT label, emb,
         list_min(emb) AS lo,
         (list_max(emb) - list_min(emb)) / {float(QUANT_LEVELS)} AS scale
  FROM e
),
err AS (
  SELECT label,
         list_max(list_transform(emb,
             x -> abs(x - (lo + floor((x - lo) / scale + 0.5) * scale))))
             AS max_err
  FROM p
)
SELECT label, COUNT(*) AS n_vecs,
       round(AVG(max_err), 6) AS mean_err,
       round(MAX(max_err), 6) AS worst_err
FROM err GROUP BY label
"""


QUERIES = {
    "q_knn_bruteforce": q_knn_bruteforce,
    "q_knn_ivf": q_knn_ivf,
    "q_embedding_dedup": q_embedding_dedup,
    "q_knn_per_label": q_knn_per_label,
    "q_knn_lsh": q_knn_lsh,
    "q_embedding_quantize": q_embedding_quantize,
}

ORACLES = {
    "q_knn_bruteforce": ORACLE_KNN_BRUTEFORCE,
    "q_knn_ivf": ORACLE_KNN_IVF,
    "q_embedding_dedup": ORACLE_EMBEDDING_DEDUP,
    "q_knn_per_label": ORACLE_KNN_PER_LABEL,
    "q_knn_lsh": _oracle_knn_lsh(),
    "q_embedding_quantize": ORACLE_EMBEDDING_QUANTIZE,
}
