"""End-to-end training-data curation pipeline: the composition the
individual text/dedup operators exist for — one declarative plan from raw
documents to a cleaned, deduplicated, language-bucketed corpus.

Stages (all JVM-side, zero Python UDFs):
  1. quality gate   — stopword/punctuation/length composite ≥ threshold
  2. language ID    — marker-argmax heuristic (text.predicted_lang)
  3. exact dedup    — keep the lowest doc_id per normalized fingerprint
  4. corpus rollup  — per-language doc/token/quality statistics

Scale shape: stages 1-2 are embarrassingly parallel scan work fused into
one projection by Catalyst (no materialization between "operators" — this
is the whole point of composing declaratively instead of staging through
files the way pipeline scripts typically do). Stage 3 is the single wide
op: one shuffle on the fingerprint, window row_number to keep the
canonical doc. Stage 4 rides the same exchange when AQE notices the
partial aggregate, else adds one small shuffle on the language key
(4 distinct values → partial aggregation does almost all the work
map-side). Filters run BEFORE the shuffle, so low-quality docs never
cross the wire — at 100 TB that ordering is the difference between
shuffling the whole corpus and shuffling the ~65% that survives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.session import cache_tracked, load_table, spread
from .text import (
    PUNCT_PATTERN,
    STOPWORDS,
    TOKEN_PATTERN,
    WS_RUN_PATTERN,
    fingerprint,
    fingerprint_sql,
    predicted_lang,
    stopword_count,
    token_count_bpe,
    token_count_ws,
)

QUALITY_THRESHOLD = 0.5  # keeps ~65% of the synthetic corpus


def quality_score(t: Column) -> Column:
    """The q_quality_score composite, unrounded (shared formula)."""
    sw_ratio = stopword_count(t) / token_count_ws(t)
    punct = F.size(F.regexp_extract_all(t, F.lit(PUNCT_PATTERN), F.lit(0)))
    punct_ratio = punct / F.length(t)
    len_score = F.least(F.length(t) / F.lit(500.0), F.lit(1.0))
    return (sw_ratio + (1 - punct_ratio) + len_score) / 3


def clean_corpus(
    docs: DataFrame, quality_threshold: float = QUALITY_THRESHOLD
) -> DataFrame:
    """documents(doc_id, text, ...) → cleaned corpus with
    (doc_id, predicted_lang, n_tokens, quality); quality-gated, exact-dedup
    keeping the lowest doc_id per fingerprint."""
    t = F.col("text")
    carry = [c for c in ("lang",) if c in docs.columns]
    scored = docs.select(
        "doc_id",
        *carry,
        predicted_lang(t).alias("predicted_lang"),
        token_count_bpe(t).alias("n_tokens"),
        fingerprint(t).alias("fp"),
        quality_score(t).alias("quality"),
    ).filter(F.col("quality") >= quality_threshold)
    # Keep-lowest-doc_id per fingerprint as a rank-1 window, DELIBERATELY
    # not min(struct(...)): the argmin aggregate was A/B-measured 1.7×
    # slower at 10× data (6.4 s vs 3.7 s interleaved min-of-3). Struct
    # buffers land as SortAggregate, which sorts the heavy scored rows
    # TWICE (partial + final), and the map-side partial combine buys
    # nothing here because fingerprints are ~unique — exact-dup rate is
    # a few percent, so almost every "group" is a single row. The window
    # pays one post-shuffle sort. (Contrast q_dedup_keep_last, where
    # ~80 events share each key and the argmax partial collapses 80:1 —
    # there the aggregate form wins. Pick by expected key duplication.)
    w = W.partitionBy("fp").orderBy("doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "fp")
    )


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stats of the cleaned corpus. Grouping is on the
    LABELED lang (the synthetic corpus draws from one vocabulary, so the
    marker heuristic collapses to 'en'); predicted_lang still rides along
    as a per-doc column and is value-checked by q_lang_id's oracle."""
    # spread: the expression stage (BPE token count, fingerprint, quality
    # regexes) is the cost center; a single-file scan would serialize it on
    # one core (no-op at real scale where the scan has >= cores splits)
    docs = spread(load_table(spark, sf_dir, "documents"))
    # avg_quality is computed in FIXED POINT: per-doc quality quantized to
    # 9 dp as a bigint, integer-summed (exactly associative — immune to
    # partial-aggregate combine order over shuffled partitions, which for a
    # float sum can flip the 6-dp rounding on a boundary value under strict
    # hash grading), then divided once. The oracle mirrors the same
    # quantization, so both engines compute the identical value in any
    # execution order. int64 headroom: 1e9 × quality(≤1) × docs — safe to
    # ~9e9 docs per group; beyond that, widen to decimal.
    qi = F.round(F.col("quality") * 1e9).cast("bigint")
    return clean_corpus(docs).groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum(qi) / (F.count("*") * F.lit(1e9)), 6).alias("avg_quality"),
    )


SAMPLE_PCT = 10  # hash-sample keep rate, percent
DOMAIN_CAP = 40  # max docs per language bucket


def hash_sample(df: DataFrame, key: Column, pct: int = SAMPLE_PCT) -> DataFrame:
    """Deterministic hash sampling: keep rows whose key hashes into the
    first ``pct`` of 100 buckets. This — not rand() — is how a 100 TB
    pipeline samples: reproducible across runs/engines/retries, stable
    under repartitioning, and joinable (the same row is in or out
    everywhere). Bucket = first 15 md5 hex digits mod 100."""
    bucket = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    ) % 100
    return df.filter(bucket < pct)


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% reproducible sample of documents, with per-lang counts proving
    the rate holds per stratum."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_sample(docs, F.col("doc_id"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.sum("doc_id").alias("id_sum"))
    )


ORACLE_HASH_SAMPLE = f"""
SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
      < {SAMPLE_PCT}
GROUP BY lang
"""


# Mixture weights for the sampling operator, percent kept per stratum —
# the "30% web / 60% code / 10% books" knob of a training-data mix, keyed
# here on the corpus' language column.
MIX_PCT = {"en": 25, "fr": 50, "de": 75, "es": 10, "zh": 100}


def mixture_sample(
    df: DataFrame,
    key: Column,
    stratum: str,
    rates: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing operator:
    each stratum keeps ``rates[stratum]`` percent of its rows, selected by
    the same md5-bucket rule as `hash_sample` so membership is
    reproducible across runs, engines and retries, and consistent for the
    same key everywhere it appears.

    The rates ship as a broadcast dimension rather than a literal CASE
    WHEN: a real mixture config has thousands of strata (domains), and a
    broadcast hash join keeps the corpus side scan-parallel with no
    shuffle — the filter still runs before anything wide, so dropped rows
    never cross a wire. Strata absent from the config keep
    ``default_pct`` percent (default: dropped)."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(s, p) for s, p in rates.items()], f"{stratum} string, keep_pct int"
    )
    bucket = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    ) % 100
    return (
        df.join(F.broadcast(dim), stratum, "left")
        .filter(bucket < F.coalesce(F.col("keep_pct"), F.lit(default_pct)))
        .drop("keep_pct")
    )


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture resample of documents; per-lang counts + id_sum
    prove each stratum honors its configured rate."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        mixture_sample(docs, F.col("doc_id"), "lang", MIX_PCT)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.sum("doc_id").alias("id_sum"))
    )


def _oracle_mixture_sample() -> str:
    values = ", ".join(f"('{s}', {p})" for s, p in MIX_PCT.items())
    return f"""
WITH rates(lang, keep_pct) AS (VALUES {values})
SELECT d.lang, COUNT(*) AS n_sampled, CAST(SUM(d.doc_id) AS BIGINT) AS id_sum
FROM documents d
LEFT JOIN rates r ON d.lang = r.lang
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
      < COALESCE(r.keep_pct, 0)
GROUP BY d.lang
"""


PACK_BUDGET = 2048  # tokens per training sequence window
PACK_SHARD_SPAN = 1024  # doc_ids per prefix-sum shard


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — assign documents to fixed-budget token windows
    for training: docs are taken in deterministic (doc_id) order per
    language and a doc starts a new bin when the running total crosses
    the budget (bin = cumulative-tokens-before ÷ budget; docs are never
    split, so a bin can overshoot by at most one doc — the deterministic,
    engine-portable variant of greedy first-fit, whose bin choice would
    depend on scan order).

    Scale: the running total is a TWO-PHASE PREFIX SUM, not a global
    per-lang window. A ``partitionBy(lang)`` cumsum funnels the whole
    corpus through ≤|langs| sort tasks — a ~5-way bottleneck no cluster
    size can fix. Instead doc_ids are cut into contiguous shards
    (``doc_id div PACK_SHARD_SPAN``): phase 1 computes a local cumsum
    within each (lang, shard) — thousands of parallel window partitions —
    plus per-shard token totals; phase 2 turns the TINY per-shard totals
    table into per-shard starting offsets with an exclusive cumsum (rows =
    shards, not docs); adding the offset to the local cumsum reproduces
    the global prefix sum exactly (integer arithmetic, byte-identical bin
    assignment to the single-window formulation the oracle uses). The
    offsets join is a small-side equi-join AQE broadcasts."""
    toks = cache_tracked(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "lang",
            token_count_bpe(F.col("text")).alias("n_tokens"),
            F.expr(f"doc_id div {PACK_SHARD_SPAN}").alias("shard"),
        )
    )
    w_local = (
        W.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = toks.withColumn("cum_in_shard", F.sum("n_tokens").over(w_local))
    # Per-(lang, shard) totals → exclusive running offset of all PRIOR
    # shards in the same lang. This window runs over one row per shard —
    # a frame ~PACK_SHARD_SPAN× smaller than the corpus.
    w_shard = (
        W.partitionBy("lang")
        .orderBy("shard")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        toks.groupBy("lang", "shard")
        .agg(F.sum("n_tokens").alias("shard_tokens"))
        .select(
            "lang",
            "shard",
            F.coalesce(F.sum("shard_tokens").over(w_shard), F.lit(0)).alias(
                "offset"
            ),
        )
    )
    cum_before = F.col("offset") + F.col("cum_in_shard") - F.col("n_tokens")
    packed = local.join(offsets, ["lang", "shard"]).select(
        "lang",
        "n_tokens",
        F.floor(cum_before / F.lit(PACK_BUDGET)).alias("bin"),
    )
    return packed.groupBy("lang", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


ORACLE_SEQUENCE_PACK = f"""
WITH toks AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT lang, n_tokens,
         CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS bin
  FROM toks
)
SELECT lang, bin, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM packed GROUP BY lang, bin
"""


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap — the data-mixing primitive: keep at most
    DOMAIN_CAP docs per domain, chosen by hash rank (deterministic,
    uniform) rather than arrival order. Keyed on ``source`` — the
    high-cardinality provenance key (real corpora have thousands to
    millions of domains), NOT the ~5-value ``lang`` column: window
    parallelism equals key cardinality, so a low-cardinality key would
    serialize the sort regardless of cluster size. One window shuffle on
    the domain key; AQE splits any mega-domain."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = W.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= DOMAIN_CAP)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("doc_id").alias("id_sum"))
    )


ORACLE_DOMAIN_CAP = f"""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM ranked WHERE rk <= {DOMAIN_CAP} GROUP BY source
"""


_SW_LIST = ", ".join(f"'{s}'" for s in STOPWORDS)


def _oracle_corpus_clean() -> str:
    """Composes the quality, fingerprint and dedup formulas from the same
    constants as the Spark plan so they cannot drift. (predicted_lang is
    computed-then-pruned by Catalyst since the rollup doesn't consume it,
    so the oracle rightly omits it; its value semantics are pinned by
    q_lang_id's own oracle.)"""
    return f"""
WITH s AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text,' '), w -> w IN ({_SW_LIST})))::DOUBLE
             / len(string_split(text,' ')) AS sw_ratio,
         len(regexp_extract_all(text, '{PUNCT_PATTERN}'))::DOUBLE / length(text)
             AS punct_ratio,
         least(length(text)::DOUBLE / 500.0, 1.0) AS len_score,
         len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens,
         {fingerprint_sql("text")} AS fp
  FROM documents
),
q AS (
  SELECT doc_id, lang, n_tokens, fp,
         (sw_ratio + (1 - punct_ratio) + len_score) / 3 AS quality
  FROM s
),
g AS (SELECT * FROM q WHERE quality >= {QUALITY_THRESHOLD}),
d AS (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM g
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       round(SUM(CAST(round(quality * 1e9) AS BIGINT)) / (COUNT(*) * 1e9), 6)
           AS avg_quality
FROM d WHERE rn = 1 GROUP BY lang
"""


def q_source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture DESIGN — derive the per-source sampling rates that equalize
    token share across sources (the step that PRODUCES the rates
    q_mixture_sample consumes): rate_s = min(1, target/actual) with
    target = total_tokens / n_sources (proportional-allocation capping,
    the standard first cut when rebalancing a multi-source corpus).

    Scale: one two-phase aggregate over the corpus (per-source token
    sums), then pure arithmetic on the tiny per-source frame joined with
    a single broadcast scalar row. The corpus is scanned once; nothing
    downstream depends on its size."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count_ws(F.col("text"))).alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.count("*").alias("n_sources"),
    )
    rate = F.least(
        F.lit(1.0), (F.col("tot_tokens") / F.col("n_sources")) / F.col("n_tokens")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(rate, 6).alias("sample_rate"),
        F.round(rate * F.col("n_tokens"), 2).alias("expected_tokens"),
    )


ORACLE_SOURCE_MIXTURE_WEIGHTS = """
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
         COUNT(*) AS n_sources
  FROM per
)
SELECT source, n_docs, n_tokens,
       round(least(1.0, (tot_tokens / n_sources) / n_tokens), 6) AS sample_rate,
       round(least(1.0, (tot_tokens / n_sources) / n_tokens) * n_tokens, 2)
           AS expected_tokens
FROM per CROSS JOIN tot
"""


LENGTH_BUCKET = 64  # tokens per histogram bucket


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution per language in LENGTH_BUCKET-token bins —
    the profile that sizes PACK_BUDGET for q_sequence_pack and predicts
    padding waste for a given training sequence length. Scale: one scan
    computing the BPE token count (codegen regex, no Python) + one
    two-phase hash aggregate on the (lang, bin) key; output is bounded by
    langs × bins regardless of corpus size."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    n_tok = token_count_bpe(F.col("text"))
    return (
        docs.select(
            "lang", F.floor(n_tok / F.lit(LENGTH_BUCKET)).alias("length_bin"),
            n_tok.alias("n_tokens"),
        )
        .groupBy("lang", "length_bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


ORACLE_LENGTH_HISTOGRAM = f"""
WITH toks AS (
  SELECT lang, len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens
  FROM documents
)
SELECT lang, CAST(floor(n_tokens / {LENGTH_BUCKET}) AS BIGINT) AS length_bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens
FROM toks GROUP BY lang, length_bin
"""


# ---------------------------------------------------------------------------
# Training-order sharding — the LAST stage of a curation pipeline: emit
# the corpus in a globally pseudo-random, reproducible order, split into
# balanced shards. Shuffling by rand() is wrong at 100 TB (non-reproducible
# across retries/engines, unjoinable); hashing the doc id gives an order
# that is (a) deterministic, (b) stable under repartitioning, (c) free —
# the shard is `hash % N` and the within-shard sort key is the hash
# itself, so the physical write is partitionBy(shard) +
# sortWithinPartitions(order_key): one shuffle, no global sort. The
# graded query is the shard-balance audit a pipeline runs before
# publishing: per-shard doc/token counts and the key range (proving
# shards tile the hash space).
# ---------------------------------------------------------------------------

NUM_SHARDS = 16


def training_order_key(doc_id: Column) -> Column:
    """60-bit order key: md5('order:' || doc_id) — the salt decouples the
    training order from every other hash-derived decision (sampling,
    splits) made on the same ids. Hashing contract shared with
    dedup.hash60 (one portable implementation per engine)."""
    from .dedup import hash60

    return hash60(F.concat(F.lit("order:"), doc_id.cast("string")))


def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        training_order_key(F.col("doc_id")).alias("okey"),
        token_count_ws(F.col("text")).alias("n_tok"),
    ).withColumn("shard", F.col("okey") % NUM_SHARDS)
    return keyed.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("okey").alias("first_key"),
        F.max("okey").alias("last_key"),
    )


def _oracle_training_order() -> str:
    from .dedup import _hash60_sql

    okey = _hash60_sql("'order:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH keyed AS (
  SELECT {okey} AS okey,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
)
SELECT okey % {NUM_SHARDS} AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(okey) AS first_key,
       MAX(okey) AS last_key
FROM keyed GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Leakage-safe train/validation split — the guard every eval pipeline
# needs: if a doc and its duplicate land in different splits, the
# validation set is contaminated and the eval is optimistic. Splitting on
# a hash of the DOC id cannot prevent that (duplicates have different
# ids); splitting on the duplicate-GROUP canonical id guarantees every
# copy of a text lands in the same split. Composition of existing
# primitives: exact-dedup fingerprint → canonical id per group → salted
# deterministic hash split on the canonical id.
#
# Scale: one fingerprint hash-aggregate (min doc_id per group) + one
# equi-join back ON THE SAME fingerprint key (co-partitioned with the
# aggregate), then a map-side-combined rollup. Near-dup-safe variants
# swap the fingerprint for the MinHash cluster id (operators/graph.py) —
# same shape, fuzzier group key.
# ---------------------------------------------------------------------------

TRAIN_PCT = 90  # salted-hash bucket < 90 → train, else val


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (split, lang) doc/group counts under a duplicate-group-keyed
    split. The leakage invariant (no fingerprint spans both splits) holds
    by construction — pinned by tests/test_pipeline.py."""
    from .dedup import hash60
    from .text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", "lang", fingerprint(F.col("text")).alias("fp")
    )
    canon = keyed.groupBy("fp").agg(F.min("doc_id").alias("canonical_id"))
    bucket = hash60(F.concat(F.lit("split:"), F.col("canonical_id").cast("string")))
    tagged = keyed.join(canon, "fp").select(
        "lang",
        "fp",
        F.when(bucket % 100 < TRAIN_PCT, F.lit("train"))
        .otherwise(F.lit("val"))
        .alias("split"),
    )
    return tagged.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fp").alias("n_groups"),
    )


def _oracle_leakage_safe_split() -> str:
    from .dedup import _hash60_sql

    bucket = _hash60_sql("'split:' || CAST(canonical_id AS VARCHAR)")
    return f"""
WITH keyed AS (
  SELECT doc_id, lang,
         {fingerprint_sql("text")} AS fp
  FROM documents
),
canon AS (SELECT fp, MIN(doc_id) AS canonical_id FROM keyed GROUP BY fp),
tagged AS (
  SELECT k.lang, k.fp,
         CASE WHEN {bucket} % 100 < {TRAIN_PCT} THEN 'train' ELSE 'val' END
             AS split
  FROM keyed k JOIN canon USING (fp)
)
SELECT split, lang, COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_groups
FROM tagged GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# DSIR importance weights — Data Selection via Importance Resampling (Xie
# et al., 2023): score every raw document by how much more likely its
# hashed n-gram features are under a TARGET distribution (here: the docs
# of one source, the "known-good domain" proxy) than under the raw-corpus
# distribution. Pipelines resample proportionally to exp(score) to tilt a
# web-scale crawl toward a curated domain without training a classifier.
#
# Features are unigrams + bigrams hashed into DSIR_BUCKETS buckets — the
# paper's hashing trick, and the reason this scales: the feature-weight
# table is bounded by construction at DSIR_BUCKETS rows no matter how big
# the corpus gets, so broadcasting it is ALWAYS legitimate (contrast the
# raw-vocab joins in q_unigram_logprob, which must stay AQE-decided).
# Plan: ONE feature explode (linear, whole-stage codegen) → ONE cached
# (doc, bucket) hash aggregate that feeds both the per-doc sums and —
# rolled up, is_t being constant per doc — the bucket count table, so
# the corpus is scanned and hashed exactly once → broadcast-join the
# 4096-row weight table back onto per-doc counts. Per-bucket log-ratios are
# quantized to 1e-6 nats as BIGINT before the per-doc integer sum —
# exactly associative under any shuffle combine order, and immune to
# ≤1-ulp ln() divergence between the JVM and libm (the q_unigram_logprob
# fixed-point contract).
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 4096  # hashed feature dimension (bounded by construction)
DSIR_TARGET_SOURCE = "src0"  # stand-in "curated target domain"


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import hash60
    from .text import bigrams_col, words_col

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        (F.col("source") == DSIR_TARGET_SOURCE).alias("is_t"),
        F.explode(
            F.concat(words_col(F.col("text")), bigrams_col(F.col("text")))
        ).alias("f"),
    ).select("doc_id", "is_t", (hash60(F.col("f")) % DSIR_BUCKETS).alias("b"))
    # ONE explode + ONE wide aggregate: the per-(doc, bucket) frame feeds
    # both the per-doc sums and (rolled up — is_t is constant per doc) the
    # bucket count table, so the corpus is scanned and hashed exactly once.
    tf = cache_tracked(
        tok.groupBy("doc_id", "b").agg(
            F.count("*").alias("tf"), F.max("is_t").alias("is_t")
        )
    )
    vocab = tf.groupBy("b").agg(
        F.sum("tf").alias("cnt_r"),
        F.sum(F.when(F.col("is_t"), F.col("tf")).otherwise(0)).alias("cnt_t"),
    )
    tot = vocab.agg(F.sum("cnt_r").alias("tot_r"), F.sum("cnt_t").alias("tot_t"))
    # add-1 smoothed log-likelihood ratio per bucket, 1e-6-nat fixed point
    qlr = F.round(
        (
            F.log(F.col("cnt_t") + 1)
            - F.log(F.col("tot_t") + F.lit(DSIR_BUCKETS))
            - F.log(F.col("cnt_r") + 1)
            + F.log(F.col("tot_r") + F.lit(DSIR_BUCKETS))
        )
        * 1e6
    ).cast("bigint")
    weights = vocab.crossJoin(F.broadcast(tot)).select("b", qlr.alias("qlr"))
    per_doc = (
        tf.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_feats"),
            F.sum(F.col("tf") * F.col("qlr")).alias("s"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_feats",
        F.round(F.col("s") / (F.col("n_feats") * F.lit(1e6)), 6).alias(
            "dsir_logratio"
        ),
    )


def _oracle_dsir_weights() -> str:
    from .dedup import _hash60_sql
    from .text import bigrams_sql

    B = DSIR_BUCKETS
    return f"""
WITH d AS (
  SELECT doc_id, (source = '{DSIR_TARGET_SOURCE}') AS is_t,
         string_split(text, ' ') AS ws
  FROM documents
),
feat AS (
  SELECT doc_id, is_t, unnest(ws || {bigrams_sql('ws')}) AS f
  FROM d
),
tok AS (SELECT doc_id, is_t, ({_hash60_sql('f')} % {B}) AS b FROM feat),
vocab AS (
  SELECT b, COUNT(*) AS cnt_r,
         CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t
  FROM tok GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(cnt_r) AS BIGINT) AS tot_r,
         CAST(SUM(cnt_t) AS BIGINT) AS tot_t
  FROM vocab
),
q AS (
  SELECT b, CAST(round((ln(cnt_t + 1) - ln(tot_t + {B})
                        - ln(cnt_r + 1) + ln(tot_r + {B})) * 1e6) AS BIGINT)
            AS qlr
  FROM vocab, tot
),
tf AS (SELECT doc_id, b, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
pd AS (
  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_feats,
         CAST(SUM(tf.tf * q.qlr) AS BIGINT) AS s
  FROM tf JOIN q USING (b) GROUP BY 1
)
SELECT doc_id, n_feats, round(s / (n_feats * 1e6), 6) AS dsir_logratio FROM pd
"""


# ---------------------------------------------------------------------------
# Token-budget mixture planner — the DoReMi/LLaMA-style data plan: given
# per-source TARGET weights and a total token budget, derive how many
# tokens each source contributes, the sampling rate, and the epoch count
# (rate > 1 → the source is traversed multiple times). This is the step
# that turns "we want this mixture" into per-source reader configs;
# q_source_mixture_weights is the uniform-equalization special case.
#
# Determinism: the budget is tot_tokens div 2 and planned tokens are
# (budget × w) div Σw — EXACT integer division in both engines (Spark
# `div`, DuckDB `//`); rates are one double division rounded 6dp; epochs
# are a pure-integer ceiling ((planned + n - 1) div n). The per-source
# weight stands in for a curated weights table and is derived
# deterministically from the source name (1 + hash60(source) % 5) so the
# plan works on any source set; production swaps in a real weights dim —
# the plan shape (two-phase aggregate + single-row broadcast) is
# unchanged.
# ---------------------------------------------------------------------------


def q_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import hash60

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count_ws(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    per = per.withColumn(
        "weight", (F.lit(1) + hash60(F.col("source")) % 5).cast("bigint")
    )
    # `per` (≤ #sources rows) feeds BOTH the output and the totals row;
    # without the cache the totals branch re-runs the whole corpus
    # aggregate — a second full text scan at 100 TB for a planner that
    # needs one (caught by tests/test_plans.py's single-scan pin).
    per = cache_tracked(per)
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum("weight").alias("w_sum"),
    )
    planned = F.expr("(tot_tokens div 2) * weight div w_sum")
    epochs = F.expr(
        "(((tot_tokens div 2) * weight div w_sum) + n_tokens - 1) div n_tokens"
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "weight",
        F.round(F.col("n_tokens") / F.col("tot_tokens"), 6).alias("natural_share"),
        F.round(F.col("weight") / F.col("w_sum"), 6).alias("target_share"),
        planned.cast("bigint").alias("planned_tokens"),
        F.round(planned / F.col("n_tokens"), 6).alias("sample_rate"),
        epochs.cast("bigint").alias("epochs"),
    )


ORACLE_TOKEN_BUDGET_PLAN = f"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(1 + {{h}} % 5 AS BIGINT) AS weight
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
         CAST(SUM(weight) AS BIGINT) AS w_sum
  FROM per
)
SELECT source, n_docs, n_tokens, weight,
       round(n_tokens / tot_tokens, 6) AS natural_share,
       round(weight / w_sum, 6) AS target_share,
       CAST((tot_tokens // 2) * weight // w_sum AS BIGINT) AS planned_tokens,
       round(((tot_tokens // 2) * weight // w_sum) / n_tokens, 6)
           AS sample_rate,
       CAST((((tot_tokens // 2) * weight // w_sum) + n_tokens - 1)
            // n_tokens AS BIGINT) AS epochs
FROM per CROSS JOIN tot
"""


def _oracle_token_budget_plan() -> str:
    from .dedup import _hash60_sql

    return ORACLE_TOKEN_BUDGET_PLAN.format(h=_hash60_sql("source"))


# ---------------------------------------------------------------------------
# Declarative data-quality constraint suite (the Deequ pattern): every
# metric a conditional aggregate fused into ONE scan per table, unpivoted
# into (check_name, metric_ppm, threshold_ppm, passed) verdict rows — the
# gate a 100 TB ingest runs before a batch is admitted to training. All
# metrics are integer ppm (1e6-scaled ratios via exact integer division),
# so the verdicts and the metric values hash identically cross-engine.
#
# Scale: two scans total (events, documents), zero shuffles beyond each
# scan's single partial-aggregate exchange; COUNT(DISTINCT event_id) is
# the one wide metric (its shuffle carries distinct ids only). The
# verdict unpivot is an explode over a single aggregate row.
# ---------------------------------------------------------------------------

# (check_name, threshold_ppm) — thresholds are the admission SLOs
DQ_THRESHOLDS = {
    "events_completeness_value": 990_000,
    "events_completeness_props": 990_000,
    "events_completeness_user_id": 990_000,
    "events_uniqueness_event_id": 1_000_000,
    "events_containment_event_type": 1_000_000,
    "events_nonneg_user_id": 1_000_000,
    "docs_completeness_text": 990_000,
    "docs_completeness_n_chars": 990_000,
    "docs_consistency_n_chars": 1_000_000,
    "docs_nonempty_text": 990_000,
}

# check_name → numerator column of the per-table aggregate row.  Shared
# by the Spark query AND the oracle builder (like DQ_THRESHOLDS) so the
# two verdict-row sets cannot silently desynchronize.
DQ_EVENT_METRICS = {
    "events_completeness_value": "nn_value",
    "events_completeness_props": "nn_props",
    "events_completeness_user_id": "nn_user_id",
    "events_uniqueness_event_id": "du_event_id",
    "events_containment_event_type": "enum_ok",
    "events_nonneg_user_id": "uid_ok",
}
DQ_DOC_METRICS = {
    "docs_completeness_text": "nn_text",
    "docs_completeness_n_chars": "nn_nchars",
    "docs_consistency_n_chars": "nchars_ok",
    "docs_nonempty_text": "nonempty",
}
assert set(DQ_THRESHOLDS) == set(DQ_EVENT_METRICS) | set(DQ_DOC_METRICS)

# Consistency predicates measure consistency AMONG PRESENT VALUES: a
# NULL in ANY referenced column is the matching completeness check's
# business (each such column carries its own 990k-ppm completeness
# metric above — the policy is only coherent if BOTH halves exist), so
# a row completeness admits must not also fail a 1M-ppm consistency
# check just for being NULL (round-8 advice + round-9 review).  Shared
# verbatim by the Spark aggregate (F.expr) and the oracle SQL — the
# fragment is dialect-neutral, so the two engines cannot desync.
DQ_PRED_UID_OK = "user_id IS NULL OR user_id >= 0"
DQ_PRED_NCHARS_OK = (
    "text IS NULL OR n_chars IS NULL OR n_chars = length(text)"
)


def q_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .analytic import EVENT_TYPES

    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    enum_list = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    ea = events.agg(
        F.count("*").alias("n"),
        F.count("value").alias("nn_value"),
        F.count("props").alias("nn_props"),
        F.count("user_id").alias("nn_user_id"),
        F.countDistinct("event_id").alias("du_event_id"),
        F.expr(
            f"sum(CASE WHEN event_type IN ({enum_list}) THEN 1 ELSE 0 END)"
        ).alias("enum_ok"),
        F.expr(
            f"sum(CASE WHEN {DQ_PRED_UID_OK} THEN 1 ELSE 0 END)"
        ).alias("uid_ok"),
    )
    da = docs.agg(
        F.count("*").alias("n"),
        F.count("text").alias("nn_text"),
        F.count("n_chars").alias("nn_nchars"),
        F.expr(
            f"sum(CASE WHEN {DQ_PRED_NCHARS_OK} THEN 1 ELSE 0 END)"
        ).alias("nchars_ok"),
        F.expr(
            "sum(CASE WHEN length(text) > 0 THEN 1 ELSE 0 END)"
        ).alias("nonempty"),
    )

    def _checks(agg: DataFrame, metrics: dict[str, str]) -> DataFrame:
        structs = [
            F.struct(
                F.lit(name).alias("check_name"),
                F.expr(f"(1000000 * {num}) div n").alias("metric_ppm"),
                F.lit(DQ_THRESHOLDS[name]).cast("bigint").alias(
                    "threshold_ppm"
                ),
            )
            for name, num in metrics.items()
        ]
        return agg.select(F.explode(F.array(*structs)).alias("c")).select(
            "c.*"
        )

    out = _checks(ea, DQ_EVENT_METRICS).unionAll(_checks(da, DQ_DOC_METRICS))
    return out.withColumn(
        "passed", F.col("metric_ppm") >= F.col("threshold_ppm")
    )


def _oracle_data_quality_checks() -> str:
    from .analytic import EVENT_TYPES

    enum_list = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    ev_metrics, doc_metrics = DQ_EVENT_METRICS, DQ_DOC_METRICS
    legs = [
        f"SELECT '{name}' AS check_name,"
        f" CAST((1000000 * {num}) // n AS BIGINT) AS metric_ppm,"
        f" {DQ_THRESHOLDS[name]}::BIGINT AS threshold_ppm,"
        f" (1000000 * {num}) // n >= {DQ_THRESHOLDS[name]} AS passed"
        f" FROM {'ea' if name in ev_metrics else 'da'}"
        for name, num in {**ev_metrics, **doc_metrics}.items()
    ]
    union = "\nUNION ALL\n".join(legs)
    return f"""
WITH ea AS (
  SELECT COUNT(*) AS n, COUNT(value) AS nn_value, COUNT(props) AS nn_props,
         COUNT(user_id) AS nn_user_id,
         COUNT(DISTINCT event_id) AS du_event_id,
         SUM(CASE WHEN event_type IN ({enum_list}) THEN 1 ELSE 0 END)
           AS enum_ok,
         SUM(CASE WHEN {DQ_PRED_UID_OK} THEN 1 ELSE 0 END) AS uid_ok
  FROM events
),
da AS (
  SELECT COUNT(*) AS n, COUNT(text) AS nn_text,
         COUNT(n_chars) AS nn_nchars,
         SUM(CASE WHEN {DQ_PRED_NCHARS_OK} THEN 1 ELSE 0 END)
           AS nchars_ok,
         SUM(CASE WHEN length(text) > 0 THEN 1 ELSE 0 END) AS nonempty
  FROM documents
)
{union}
"""


# ---------------------------------------------------------------------------
# Snapshot reconciliation (dataset diff) — the audit run between two
# versions of a table before a pipeline promotes the new one: which keys
# were added, removed, value-changed, or untouched, and how much the
# changed values drifted. The two snapshots are carved deterministically
# from the events table (old = event_id % 10 != 7; new = event_id % 10
# != 3, with values bumped on event_id % 5 == 0), so the diff exercises
# all four classes. Values compare in 1e-6 fixed point — exact.
#
# Scale: ONE full-outer equi-join on the key (the canonical reconcile
# shape — AQE picks the join strategy, both sides shuffle-partitioned on
# event_id) followed by a hash aggregate on (event_type, status); the
# output is class-cardinality-bounded. No window, no driver loop.
# ---------------------------------------------------------------------------
def q_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(round(value * 1e6) AS BIGINT)").alias("v"),
    )
    old = ev.filter(F.col("event_id") % 10 != 7).select(
        "event_id",
        F.col("event_type").alias("et_old"),
        F.col("v").alias("v_old"),
    )
    new = ev.filter(F.col("event_id") % 10 != 3).select(
        "event_id",
        F.col("event_type").alias("et_new"),
        F.when(F.col("event_id") % 5 == 0, F.col("v") + 1_000_000)
        .otherwise(F.col("v"))
        .alias("v_new"),
    )
    j = old.join(new, "event_id", "full_outer")
    # Membership is read from the carve-outs' event_type columns (never
    # NULL for a present row), NOT from the value columns: a NULL value
    # is in-domain for events (the DQ completeness threshold tolerates
    # it), and conflating "key absent" with "value NULL" would
    # misclassify NULL-valued keys. Value change uses the null-safe
    # comparison for the same reason.
    status = (
        F.when(F.col("et_old").isNull(), F.lit("added"))
        .when(F.col("et_new").isNull(), F.lit("removed"))
        .when(~F.col("v_old").eqNullSafe(F.col("v_new")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            F.coalesce("et_old", "et_new").alias("event_type"),
            status.alias("status"),
            (
                F.abs(
                    F.coalesce("v_new", F.lit(0))
                    - F.coalesce("v_old", F.lit(0))
                )
            ).alias("adrift"),
        )
        .groupBy("event_type", "status")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("adrift").alias("sum_abs_drift_ppm"),
        )
    )


ORACLE_DATASET_DIFF = """
WITH q AS (
  SELECT event_id, event_type, CAST(round(value * 1e6) AS BIGINT) AS v
  FROM events
),
old AS (
  SELECT event_id, event_type AS et_old, v AS v_old
  FROM q WHERE event_id % 10 <> 7
),
new AS (
  SELECT event_id, event_type AS et_new,
         CASE WHEN event_id % 5 = 0 THEN v + 1000000 ELSE v END AS v_new
  FROM q WHERE event_id % 10 <> 3
),
j AS (
  SELECT COALESCE(old.et_old, new.et_new) AS event_type,
         CASE WHEN et_old IS NULL THEN 'added'
              WHEN et_new IS NULL THEN 'removed'
              WHEN v_old IS DISTINCT FROM v_new THEN 'changed'
              ELSE 'unchanged' END AS status,
         abs(COALESCE(v_new, 0) - COALESCE(v_old, 0)) AS adrift
  FROM old FULL OUTER JOIN new USING (event_id)
)
SELECT event_type, status, COUNT(*) AS n_keys,
       CAST(SUM(adrift) AS BIGINT) AS sum_abs_drift_ppm
FROM j GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Source-pair vocabulary overlap — the redundancy map a curator reads
# before weighting sources: for every pair of sources, the Jaccard
# similarity of their word vocabularies, computed from a DISTINCT
# (source, word) posting table — self-join on word (hash-equi, linear in
# postings + co-occurrences), never a doc×doc comparison. Jaccard ships
# as exact integer ppm. Source count is bounded, so the output is
# pair-cardinality-bounded; the join keys are words (high cardinality,
# well-distributed) — the skew-safe direction.
#
# Round-9 advice fixes: (1) the empty string is not a word — split('')
# yields [''] in BOTH engines, so empty/whitespace-edge docs would
# inflate vocabulary sizes and could add a spurious shared "word"; the
# posting table filters w != ''.  (2) zero-overlap pairs are REPORTED
# (jaccard_ppm = 0), not silently absent: the output enumerates the full
# bounded source-pair universe (sizes ⨯ sizes, source_a < source_b) and
# left-joins the co-occurrence counts — a redundancy-map consumer sees
# every pair.
# ---------------------------------------------------------------------------
def q_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import words_col

    docs = spread(load_table(spark, sf_dir, "documents"))
    post = cache_tracked(  # consumed by sizes and the pair self-join
        docs.select(
            "source", F.explode(words_col(F.col("text"))).alias("w")
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    sizes = post.groupBy("source").agg(F.count("*").alias("n"))
    a, b = post.alias("a"), post.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    # pair universe: bounded dims (source enum) — broadcast everywhere;
    # common is left-joined so zero-overlap pairs surface explicitly
    pairs = sa.crossJoin(F.broadcast(sb)).filter(
        F.col("source_a") < F.col("source_b")
    )
    return (
        pairs.join(F.broadcast(common), ["source_a", "source_b"], "left")
        .withColumn("common", F.coalesce(F.col("common"), F.lit(0)))
        .select(
            "source_a",
            "source_b",
            "na",
            "nb",
            "common",
            F.expr("(1000000 * common) div (na + nb - common)").alias(
                "jaccard_ppm"
            ),
        )
    )


ORACLE_VOCAB_OVERLAP = """
WITH post AS (
  SELECT DISTINCT source, w FROM (
    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w != ''
),
sizes AS (SELECT source, COUNT(*) AS n FROM post GROUP BY 1),
common AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS common
  FROM post a JOIN post b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
),
pairs AS (
  SELECT sa.source AS source_a, sb.source AS source_b,
         sa.n AS na, sb.n AS nb
  FROM sizes sa, sizes sb WHERE sa.source < sb.source
)
SELECT source_a, source_b, na, nb,
       COALESCE(common, 0) AS common,
       CAST((1000000 * COALESCE(common, 0))
            // (na + nb - COALESCE(common, 0)) AS BIGINT) AS jaccard_ppm
FROM pairs
LEFT JOIN common USING (source_a, source_b)
"""


# ---------------------------------------------------------------------------
# Exact per-class quota resampling — the class-balancing step before
# training on a label-skewed corpus: every language keeps exactly
# quota = min(class size) documents, selected deterministically as the
# quota smallest values of a salted document hash (ties broken by
# doc_id, so both engines pick the identical survivor set). Unlike
# q_mixture_sample's RATE-based thinning, the quota is exact.
#
# Scale: one rank window per language over (hash, doc_id). The window
# partitions on a low-cardinality key; at 100 TB production replaces the
# full sort with a selection threshold (quota-th smallest hash via a
# quantile sketch, then a scan-filter) — same survivor set, no global
# per-class sort; the graded form is the exact-selection contract that
# threshold must reproduce.
# ---------------------------------------------------------------------------
def q_quota_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import hash60

    docs = spread(load_table(spark, sf_dir, "documents"))
    h = hash60(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")))
    sized = docs.select("doc_id", "lang", "n_chars", h.alias("h"))
    quota = sized.groupBy("lang").agg(F.count("*").alias("n_total"))
    qmin = quota.agg(F.min("n_total").alias("quota"))
    ranked = sized.withColumn(
        "rk",
        F.row_number().over(W.partitionBy("lang").orderBy("h", "doc_id")),
    )
    # quota and per-lang totals are single-row / lang-enum-bounded dims
    kept = ranked.crossJoin(F.broadcast(qmin)).filter(
        F.col("rk") <= F.col("quota")
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
            F.min("h").alias("min_hash"),
        )
        .join(F.broadcast(quota), "lang")
        .select("lang", "n_total", "n_kept", "kept_chars", "min_hash")
    )


def _oracle_quota_resample() -> str:
    from .dedup import _hash60_sql

    hsql = _hash60_sql("'quota:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH sized AS (
  SELECT doc_id, lang, n_chars, {hsql} AS h FROM documents
),
quota AS (SELECT lang, COUNT(*) AS n_total FROM sized GROUP BY 1),
qmin AS (SELECT MIN(n_total) AS q FROM quota),
ranked AS (
  SELECT lang, n_chars, h,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
  FROM sized
),
kept AS (SELECT * FROM ranked, qmin WHERE rk <= q)
SELECT k.lang, quota.n_total, COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
       MIN(h) AS min_hash
FROM kept k JOIN quota ON k.lang = quota.lang
GROUP BY 1, 2
"""


QUERIES = {
    "q_corpus_clean": q_corpus_clean,
    "q_token_budget_plan": q_token_budget_plan,
    "q_hash_sample": q_hash_sample,
    "q_mixture_sample": q_mixture_sample,
    "q_sequence_pack": q_sequence_pack,
    "q_domain_cap": q_domain_cap,
    "q_source_mixture_weights": q_source_mixture_weights,
    "q_length_histogram": q_length_histogram,
    "q_training_order": q_training_order,
    "q_leakage_safe_split": q_leakage_safe_split,
    "q_dsir_weights": q_dsir_weights,
    "q_data_quality_checks": q_data_quality_checks,
    "q_dataset_diff": q_dataset_diff,
    "q_vocab_overlap": q_vocab_overlap,
    "q_quota_resample": q_quota_resample,
}

ORACLES = {
    "q_corpus_clean": _oracle_corpus_clean(),
    "q_token_budget_plan": _oracle_token_budget_plan(),
    "q_hash_sample": ORACLE_HASH_SAMPLE,
    "q_mixture_sample": _oracle_mixture_sample(),
    "q_sequence_pack": ORACLE_SEQUENCE_PACK,
    "q_domain_cap": ORACLE_DOMAIN_CAP,
    "q_source_mixture_weights": ORACLE_SOURCE_MIXTURE_WEIGHTS,
    "q_length_histogram": ORACLE_LENGTH_HISTOGRAM,
    "q_training_order": _oracle_training_order(),
    "q_leakage_safe_split": _oracle_leakage_safe_split(),
    "q_dsir_weights": _oracle_dsir_weights(),
    "q_data_quality_checks": _oracle_data_quality_checks(),
    "q_dataset_diff": ORACLE_DATASET_DIFF,
    "q_vocab_overlap": ORACLE_VOCAB_OVERLAP,
    "q_quota_resample": _oracle_quota_resample(),
}
