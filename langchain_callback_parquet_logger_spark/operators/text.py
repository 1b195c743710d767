"""Text-analysis operators for large-scale training-data pipelines.

Beyond-parity extensions (BASELINE.json north star): language-ID heuristic,
quality scoring, token counting, and document fingerprinting over the
``documents`` table. Everything here is built from JVM-side
``pyspark.sql.functions`` — no Python UDFs anywhere in the hot path — so
the plans stay inside whole-stage codegen and scale linearly with
partitions: at 100 TB these are embarrassingly parallel scans with no
shuffle at all (the per-doc operators) or a single partial+final hash
aggregate (the rollups).

Portability conventions for the DuckDB oracles: tokenization is
single-space ``split``; hashes are md5 (hex string) — both engines agree
byte-for-byte on ASCII input; ratios are rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.session import load_table, spread

from .dedup import PUNCT_PATTERN, WS_RUN_PATTERN, fingerprint, fingerprint_sql

# BPE-ish word/number/punctuation token pattern, shared verbatim with the
# oracle's regexp_extract_all.
TOKEN_PATTERN = f"[a-zA-Z]+|[0-9]+|{PUNCT_PATTERN}"

# Stopword list used by the quality score (drawn from common English
# function words present in the corpus vocabulary).
STOPWORDS = ("the", "a", "of", "and", "in", "to")

# Marker words per language for the n-gram/marker heuristic. Deterministic
# argmax with ties broken alphabetically, 'en' fallback when all zero.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "nicht"),
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "que", "los"),
    "fr": ("le", "les", "et", "une"),
}


def words_col(text: Column) -> Column:
    return F.split(text, " ")


def bigrams_col(text: Column) -> Column:
    """Positional (multiplicity-preserving) word bigrams; empty for docs
    under 2 words. The n>=2 guard matters for cross-engine agreement: an
    unguarded sequence(1, n-1) degenerates on 1-word docs, where Spark's
    concat_ws over a 1-element slice would emit the lone word while the
    SQL twin's ws[i+1] is NULL — silently diverging buckets/pairs. Shared
    by q_bpe_merge_candidates, q_pmi_collocations and q_dsir_weights;
    keep in sync with :func:`bigrams_sql`."""
    ws = words_col(text)
    n = F.size(ws)
    grams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.slice(ws, i, 2)),
    )
    return F.when(n >= 2, grams).otherwise(F.array().cast("array<string>"))


def bigrams_sql(ws_expr: str) -> str:
    """DuckDB twin of :func:`bigrams_col` over a split-words expression."""
    return (
        f"CASE WHEN len({ws_expr}) >= 2 THEN "
        f"list_transform(generate_series(1, len({ws_expr}) - 1), "
        f"i -> {ws_expr}[i] || ' ' || {ws_expr}[i+1]) "
        f"ELSE [] END"
    )


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words_col(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish regex token count (letters / digits / punctuation runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), F.lit(0)))


def stopword_count(text: Column) -> Column:
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(words_col(text), lambda w: F.array_contains(sw, w)))


# fingerprint / fingerprint_sql are defined beside the other shared
# cross-engine primitives in dedup.py (they carry the round-6 mixed-
# script case-fold contract) and re-exported here for all existing
# importers.


def lang_scores(text: Column) -> dict[str, Column]:
    w = words_col(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(w, lambda t: F.array_contains(arr, t)))
    return out


def predicted_lang(text: Column) -> Column:
    """Marker-count argmax, alphabetical tie-break, 'en' when all zero.

    Expressed as a chain of comparisons (no UDF): lang L wins iff its score
    is strictly greater than every alphabetically-earlier lang's score and
    greater-or-equal to every later one."""
    scores = lang_scores(text)
    langs = sorted(scores)  # alphabetical = tie-break order
    best = F.lit("en")
    # iterate from last to first so earlier langs win ties
    expr = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = (
                scores[lang] > scores[other]
                if other < lang
                else scores[lang] >= scores[other]
            )
            cond = c if cond is None else (cond & c)
        win = cond & (scores[lang] > 0)
        expr = F.when(win, F.lit(lang)) if expr is None else expr.when(win, F.lit(lang))
    return expr.otherwise(best)


# ---------------------------------------------------------------------------
# Declared queries
# ---------------------------------------------------------------------------


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    n_ws = token_count_ws(t)
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        n_ws.alias("n_words"),
        token_count_bpe(t).alias("n_tokens"),
        F.size(F.array_distinct(words_col(t))).alias("n_distinct_words"),
        F.round(F.length(F.regexp_replace(t, " ", "")) / n_ws, 6).alias("avg_word_len"),
    )


ORACLE_TEXT_STATS = f"""
SELECT doc_id,
       length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_words,
       len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
       round(length(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')), 6)
           AS avg_word_len
FROM documents
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: stopword ratio, punctuation ratio, length band.
    Composite score = mean of the three bounded signals (a cheap, fully
    columnar analog of fasttext-style quality filters)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    n_words = token_count_ws(t)
    sw_ratio = stopword_count(t) / n_words
    punct = F.size(F.regexp_extract_all(t, F.lit(PUNCT_PATTERN), F.lit(0)))
    punct_ratio = punct / F.length(t)
    len_score = F.least(F.length(t) / F.lit(500.0), F.lit(1.0))
    score = (sw_ratio + (1 - punct_ratio) + len_score) / 3
    return docs.select(
        "doc_id",
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(len_score, 6).alias("len_score"),
        F.round(score, 6).alias("quality"),
    )


_SW_LIST = ", ".join(f"'{s}'" for s in STOPWORDS)

ORACLE_QUALITY_SCORE = f"""
WITH s AS (
  SELECT doc_id,
         len(list_filter(string_split(text,' '), w -> w IN ({_SW_LIST})))::DOUBLE
             / len(string_split(text,' ')) AS sw_ratio,
         len(regexp_extract_all(text, '{PUNCT_PATTERN}'))::DOUBLE / length(text)
             AS punct_ratio,
         least(length(text)::DOUBLE / 500.0, 1.0) AS len_score
  FROM documents
)
SELECT doc_id,
       round(sw_ratio, 6) AS stopword_ratio,
       round(punct_ratio, 6) AS punct_ratio,
       round(len_score, 6) AS len_score,
       round((sw_ratio + (1 - punct_ratio) + len_score) / 3, 6) AS quality
FROM s
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    scores = lang_scores(t)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        predicted_lang(t).alias("predicted_lang"),
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(scores)],
    )


def _oracle_lang_id() -> str:
    score_exprs = []
    for lang in sorted(LANG_MARKERS):
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        score_exprs.append(
            f"len(list_filter(string_split(text,' '), w -> w IN ({markers}))) AS score_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    when_clauses = []
    for lang in langs:
        conds = []
        for other in langs:
            if other == lang:
                continue
            op = ">" if other < lang else ">="
            conds.append(f"score_{lang} {op} score_{other}")
        conds.append(f"score_{lang} > 0")
        when_clauses.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(when_clauses) + " ELSE 'en' END"
    return f"""
WITH s AS (
  SELECT doc_id, lang AS labeled_lang, {", ".join(score_exprs)}
  FROM documents
)
SELECT doc_id, labeled_lang, {case} AS predicted_lang,
       {", ".join(f"score_{lang}" for lang in langs)}
FROM s
"""


# ---------------------------------------------------------------------------
# Language-ID confusion matrix — the accuracy audit the marker-argmax
# classifier (q_lang_id) gets before anyone trusts its buckets: per
# (labeled, predicted) cell, the document count and the row share in
# exact integer ppm. Composes predicted_lang; one hash aggregate onto
# the bounded lang×lang key space plus a lang-enum-bounded broadcast of
# row totals. The diagonal cells' row_ppm IS per-class recall.
# ---------------------------------------------------------------------------
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    cells = (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            predicted_lang(F.col("text")).alias("predicted_lang"),
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )
    totals = cells.groupBy("labeled_lang").agg(
        F.sum("n_docs").alias("row_total")
    )
    return cells.join(F.broadcast(totals), "labeled_lang").select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        F.expr("(1000000 * n_docs) div row_total").alias("row_ppm"),
    )


def _oracle_langid_confusion() -> str:
    base = _oracle_lang_id()
    return f"""
WITH pred AS ({base}),
cells AS (
  SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs
  FROM pred GROUP BY 1, 2
),
totals AS (
  SELECT labeled_lang, SUM(n_docs) AS row_total FROM cells GROUP BY 1
)
SELECT c.labeled_lang, c.predicted_lang, c.n_docs,
       CAST((1000000 * c.n_docs) // t.row_total AS BIGINT) AS row_ppm
FROM cells c JOIN totals t ON c.labeled_lang = t.labeled_lang
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fingerprint"),
        F.md5(F.col("text")).alias("raw_md5"),
    )


ORACLE_DOC_FINGERPRINT = f"""
SELECT doc_id,
       {fingerprint_sql("text")} AS fingerprint,
       md5(text) AS raw_md5
FROM documents
"""


def q_lang_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(F.length(t)), 6).alias("avg_chars"),
            F.sum(token_count_ws(t)).alias("total_words"),
        )
    )


ORACLE_LANG_ROLLUP = """
SELECT lang,
       COUNT(*) AS n_docs,
       round(AVG(length(text)), 6) AS avg_chars,
       CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS total_words
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Rolling-hash document fingerprint (Rabin-Karp polynomial hash over the
# word sequence): order-sensitive, incremental, the primitive under
# shift-resistant chunk dedup (content-defined chunking). One linear fold
# per doc, zero shuffle; h = fold(acc*B + h60(w) mod p) with B,p chosen so
# every intermediate stays < 2^62 (no overflow on either engine).
# ---------------------------------------------------------------------------

ROLL_B = 31
ROLL_P = (1 << 31) - 1


def rolling_hash(text: Column) -> Column:
    hashed = F.transform(
        words_col(text),
        lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("bigint")
        % F.lit(ROLL_P),
    )
    return F.aggregate(
        hashed,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * ROLL_B + x) % ROLL_P,
    )


def q_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        rolling_hash(F.col("text")).alias("roll_hash"),
        F.size(words_col(F.col("text"))).alias("n_words"),
    )


ORACLE_ROLLING_HASH = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(string_split(text, ' '),
             w -> (('0x' || substr(md5(w), 1, 15))::BIGINT) % {ROLL_P})),
         (a, b) -> (a * {ROLL_B} + b) % {ROLL_P}) AS roll_hash,
       len(string_split(text, ' ')) AS n_words
FROM documents
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary rollup + per-language top terms — the explode→agg→
# grouped-top-k shape of every corpus-statistics job. Scale: explode is
# linear; the aggregate is two-phase (partial per partition, final after
# one shuffle on (lang, word)); the top-k is a rank window per lang whose
# input is already the small aggregated frame.
# ---------------------------------------------------------------------------


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = spread(load_table(spark, sf_dir, "documents"))
    counts = (
        docs.select("lang", F.explode(words_col(F.col("text"))).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("word").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "word", "n", F.col("rk").cast("int").alias("rk"))
    )


ORACLE_TOP_TERMS = """
WITH counts AS (
  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
),
agg AS (
  SELECT lang, word, COUNT(*) AS n FROM counts GROUP BY lang, word
),
ranked AS (
  SELECT lang, word, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word ASC) AS rk
  FROM agg
)
SELECT lang, word, n, rk::INT AS rk FROM ranked WHERE rk <= 5
"""


# ---------------------------------------------------------------------------
# Intra-document repetition ratio — the Gopher-style quality signal that
# catches boilerplate/spam: fraction of word-trigram occurrences that are
# repeats of an earlier trigram in the same doc. Pure array higher-order
# functions in one scan projection (the trigram list is built with
# transform over an index sequence — no explode, no shuffle until the
# rollup); the same construction in DuckDB gives a full value oracle.
# ---------------------------------------------------------------------------

REPETITION_THRESHOLD = 0.2


def trigram_list(text: Column) -> Column:
    """Built from three shifted slices zipped elementwise, NOT from a
    transform-over-index-sequence whose lambda closes over the word
    array: higher-order-function lambdas are interpreted (no whole-stage
    codegen), and a closed-over expression subtree re-evaluates PER
    ELEMENT PER REFERENCE — the old shape re-split the text ~3x per
    trigram (measured: a 500k-doc single-row-group scan ground one core
    for >30 min at the round-11 sf1 audit). zip_with binds its inputs
    once per ROW, so the split cost is O(refs), not O(refs x len)."""
    w = words_col(text)
    n = F.size(w)
    m = (n - F.lit(2)).cast("int")
    tail = F.zip_with(
        F.slice(w, 2, m),
        F.slice(w, 3, m),
        lambda b, c: F.concat(b, F.lit(" "), c),
    )
    return F.when(
        n >= 3,
        F.zip_with(
            F.slice(w, 1, m), tail, lambda a, bc: F.concat(a, F.lit(" "), bc)
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_ratio(text: Column) -> Column:
    tg = trigram_list(text)
    n = F.size(tg)
    return F.when(
        n > 0, (n - F.size(F.array_distinct(tg))) / n.cast("double")
    ).otherwise(F.lit(0.0))


def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    r = repetition_ratio(F.col("text"))
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.round(r, 6)), 6).alias("avg_repetition"),
        F.count_if(F.round(r, 6) > REPETITION_THRESHOLD).alias("n_repetitive"),
    )


ORACLE_REPETITION_RATIO = f"""
WITH t AS (
  SELECT lang,
         CASE WHEN len(string_split(text, ' ')) >= 3 THEN
           list_transform(
             generate_series(1, len(string_split(text, ' ')) - 2),
             i -> string_split(text, ' ')[i] || ' ' ||
                  string_split(text, ' ')[i+1] || ' ' ||
                  string_split(text, ' ')[i+2])
         ELSE [] END AS tg
  FROM documents
),
r AS (
  SELECT lang,
         CASE WHEN len(tg) > 0
              THEN round((len(tg) - len(list_distinct(tg)))::DOUBLE / len(tg), 6)
              ELSE 0.0 END AS rep
  FROM t
)
SELECT lang, COUNT(*) AS n_docs,
       round(AVG(rep), 6) AS avg_repetition,
       COUNT(*) FILTER (WHERE rep > {REPETITION_THRESHOLD}) AS n_repetitive
FROM r GROUP BY lang
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms per language — the classic corpus-statistics operator.
# Factored deliberately: per-(lang, word) term frequency is an INTEGER
# aggregate and idf is computed once per word, so the final score is one
# int×double multiply — no float summation order anywhere, which is what
# lets a distributed engine hash-match a single-threaded oracle exactly.
# Scale: explode is linear; tf and df are two-phase hash aggregates; the
# doc-count N broadcasts as a scalar; top-k per lang is a rank window
# over the (small) per-lang word table.
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 5


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        "doc_id", "lang", F.explode(words_col(F.col("text"))).alias("word")
    )
    tf = words.groupBy("lang", "word").agg(F.count("*").alias("total_tf"))
    df_ = words.groupBy("word").agg(
        F.countDistinct("doc_id").alias("df_docs")
    )
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df_, "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "lang",
            "word",
            "total_tf",
            "df_docs",
            F.round(
                F.col("total_tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df_docs") + 1)),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("lang").orderBy(F.col("tfidf").desc(), F.col("word").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_K)
        .select("lang", "word", "total_tf", "df_docs", "tfidf",
                F.col("rk").cast("int").alias("rk"))
    )


ORACLE_TFIDF_TOP_TERMS = f"""
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
  SELECT lang, word, COUNT(*) AS total_tf FROM words GROUP BY lang, word
),
df AS (
  SELECT word, COUNT(DISTINCT doc_id) AS df_docs FROM words GROUP BY word
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.lang, tf.word, tf.total_tf, df.df_docs,
         round(tf.total_tf * ln((n.n_docs + 1)::DOUBLE / (df.df_docs + 1)), 6)
             AS tfidf
  FROM tf JOIN df USING (word) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY tfidf DESC, word ASC) AS rk
  FROM scored
)
SELECT lang, word, total_tf, df_docs, tfidf, rk::INT AS rk
FROM ranked WHERE rk <= {TFIDF_TOP_K}
"""


# ---------------------------------------------------------------------------
# Pattern redaction — the scrubbing stage of a curation pipeline: one
# compiled alternation of PII-shaped patterns (email here) plus a
# configurable denylist, applied in a single regexp pass per document.
# Scale: pure scan-side JVM regex (whole-stage codegen, no shuffle until
# the per-language rollup); the pattern is a literal, so the same plan
# serves any denylist size that fits a regex trie.
# ---------------------------------------------------------------------------

REDACT_DENYLIST = ("spark", "vector")
REDACT_PATTERN = (
    r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
    + "".join(rf"|\b{w}\b" for w in REDACT_DENYLIST)
)
REDACT_TOKEN = "[REDACTED]"


def redact(text: Column, pattern: str = REDACT_PATTERN) -> Column:
    return F.regexp_replace(text, pattern, REDACT_TOKEN)


def redaction_count(text: Column, pattern: str = REDACT_PATTERN) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def q_denylist_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    per_doc = docs.select(
        "lang",
        redaction_count(t).alias("n_red"),
        F.length(redact(t)).alias("scrubbed_len"),
    )
    return per_doc.groupBy("lang").agg(
        F.sum("n_red").alias("n_redactions"),
        F.count_if(F.col("n_red") > 0).alias("docs_affected"),
        F.sum("scrubbed_len").alias("sum_scrubbed_len"),
    )


def _oracle_denylist_redact() -> str:
    return f"""
WITH per_doc AS (
  SELECT lang,
         len(regexp_extract_all(text, '{REDACT_PATTERN}')) AS n_red,
         length(regexp_replace(text, '{REDACT_PATTERN}', '{REDACT_TOKEN}', 'g'))
             AS scrubbed_len
  FROM documents
)
SELECT lang, CAST(SUM(n_red) AS BIGINT) AS n_redactions,
       COUNT(*) FILTER (WHERE n_red > 0) AS docs_affected,
       CAST(SUM(scrubbed_len) AS BIGINT) AS sum_scrubbed_len
FROM per_doc GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Python UDTF — the table-function leg of the UDF surface (the reference
# has none, SURVEY §2.9; Spark's scalar/grouped/map legs are covered by
# q_quality_score-style columns, q_user_value_median, q_batch_map). A UDTF
# is the right tool when one row fans out into a VARIABLE number of rows
# via imperative logic; trigram emission keeps the semantics
# SQL-checkable so the lateral-join plumbing gets a full value oracle.
# Arrow-optimized (useArrow) so batches cross the boundary columnar.
# ---------------------------------------------------------------------------


def _trigram_udtf():
    from pyspark.sql.functions import udtf

    class TrigramEmitter:
        def eval(self, text: str):
            if text is None:
                return
            words = text.split(" ")
            for i in range(len(words) - 2):
                yield i, " ".join(words[i : i + 3])

    try:
        return udtf(TrigramEmitter, returnType="pos int, trigram string", useArrow=True)
    except TypeError:  # older pyspark without useArrow kwarg
        return udtf(TrigramEmitter, returnType="pos int, trigram string")


def q_udtf_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram shingle profile per language, fanned out by a Python
    UDTF in a LATERAL join. Scale: the UDTF is per-row independent (no
    state), so it parallelizes with the scan; the only wide op is the
    two-phase rollup after emission. Distinct-counting rides the same
    aggregate."""
    spread(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "docs_udtf"
    )
    spark.udtf.register("trigram_emit", _trigram_udtf())
    return spark.sql(
        """
        SELECT d.lang,
               COUNT(*) AS n_trigrams,
               COUNT(DISTINCT g.trigram) AS n_distinct
        FROM docs_udtf d, LATERAL trigram_emit(d.text) g
        GROUP BY d.lang
        """
    )


ORACLE_UDTF_TRIGRAMS = """
WITH w AS (
  SELECT lang, string_split(text, ' ') AS ws FROM documents
),
t AS (
  SELECT lang, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS trigram
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) g
  WHERE len(ws) >= 3
)
SELECT lang, COUNT(*) AS n_trigrams, COUNT(DISTINCT trigram) AS n_distinct
FROM t GROUP BY lang
"""


# ---------------------------------------------------------------------------
# BPE merge-candidate mining — the frequency-counting step a word-piece /
# BPE tokenizer trainer iterates: count adjacent-pair occurrences across
# the corpus, take the top-K as merge candidates. One training iteration
# == one run of this query on the re-segmented corpus, so its scale shape
# IS tokenizer-training scale shape: linear pair explode (whole-stage
# codegen, no Python), two-phase hash aggregate on the pair key, then
# TakeOrderedAndProject for the top-K (per-partition heaps + driver merge
# — NEVER a single-partition global-sort window). Deterministic total
# order (count desc, pair asc) pins the cutoff for the oracle.
# ---------------------------------------------------------------------------

BPE_TOP_K = 30


def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(bigrams_col(F.col("text"))).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(BPE_TOP_K)
    )


ORACLE_BPE_MERGE_CANDIDATES = f"""
WITH w AS (
  SELECT string_split(text, ' ') AS ws FROM documents
),
p AS (
  SELECT unnest({bigrams_sql('ws')}) AS pair FROM w
)
SELECT pair, COUNT(*) AS n_occurrences
FROM p GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC
LIMIT {BPE_TOP_K}
"""


# ---------------------------------------------------------------------------
# BPE merge APPLICATION — the other half of the tokenizer loop: given the
# ranked merge list the trainer learned (q_bpe_merge_candidates), segment
# the corpus with it. One rule application = a leftmost-greedy,
# non-overlapping rewrite of every adjacent (a, b) token pair into the
# merged symbol, applied in rank order — classic BPE semantics (Sennrich
# et al. 2016), here at word level to match the rest of the text surface.
#
# The merge rules are plan PARAMETERS (they shape the fold expressions),
# so the graded query embeds the trainer's learned list as literals —
# the same pattern as q_pq_quantize's PQ_CODEBOOK: the bounded K-row
# collect lives in the TRAINER loop (examples/tokenizer_design_example.py),
# never in the graded query, which stays fully declarative.
#
# Scale design: each rule is ONE JVM-side higher-order fold per document
# (F.aggregate over the token array, whole-stage codegen, no Python, no
# shuffle) — applying M rules is M narrow map stages over the corpus, a
# purely embarrassingly-parallel rewrite. The fold keeps the running
# segmentation as a \\x1f-joined string so Spark's aggregate() and
# DuckDB's list_reduce() execute the IDENTICAL algorithm (list_reduce's
# accumulator must have the element type, so both engines fold strings).
# ---------------------------------------------------------------------------

# Top-8 merges learned by the trainer on the synthetic corpus (count desc,
# pair asc — the q_bpe_merge_candidates order). ("part","filter") before
# ("filter","hash") exercises rule interaction: a "part filter hash" run
# becomes [part_filter, hash], so rule 8 correctly no longer fires.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("table", "hash"),
    ("part", "filter"),
    ("customer", "join"),
    ("merge", "group"),
    ("slow", "key"),
    ("vector", "small"),
    ("big", "order"),
    ("filter", "hash"),
)
BPE_SEP = "\x1f"  # unit separator: cannot occur in whitespace-split tokens


def bpe_apply_state(text: Column, merges=BPE_MERGES) -> Column:
    """Segment ``text`` with the learned merges; returns the final
    segmentation as a BPE_SEP-joined string (split it to get tokens).
    Leftmost-greedy per rule, rules applied in rank order."""
    # Each rule folds the PREVIOUS state exactly once: the accumulator
    # starts NULL and the first token replaces it, so the fold runs over
    # the whole split array and `state` appears a single time per level.
    # (The natural head/rest formulation references state 3× per level —
    # Catalyst inlines the unshared subtrees and the expression fans out
    # ~3^M, measured 88 s/500 docs at M=8; this shape is linear.)
    def make_step(a: str, b: str):
        merged = F.lit(a + "_" + b)

        def step(acc: Column, x: Column) -> Column:
            hit = (x == F.lit(b)) & (
                (acc == F.lit(a)) | acc.endswith(BPE_SEP + a)
            )
            return F.when(acc.isNull(), x).when(
                hit,
                F.concat(
                    acc.substr(F.lit(1), F.length(acc) - F.lit(len(a))), merged
                ),
            ).otherwise(F.concat(acc, F.lit(BPE_SEP), x))

        return step

    state = F.translate(text, " ", BPE_SEP)
    for a, b in merges:
        state = F.aggregate(
            F.split(state, BPE_SEP),
            F.lit(None).cast("string"),
            make_step(a, b),
        )
    return state


def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    state = bpe_apply_state(F.col("text"))
    return docs.select(
        "doc_id",
        token_count_ws(F.col("text")).cast("bigint").alias("n_tokens_before"),
        F.size(F.split(state, BPE_SEP)).cast("bigint").alias("n_tokens_after"),
    ).select(
        "doc_id",
        "n_tokens_before",
        "n_tokens_after",
        (F.col("n_tokens_before") - F.col("n_tokens_after")).alias("n_merges"),
        F.round(F.col("n_tokens_after") / F.col("n_tokens_before"), 6).alias(
            "compression"
        ),
    )


def _oracle_bpe_apply() -> str:
    ctes = [
        "s0 AS (SELECT doc_id, len(string_split(text, ' ')) AS n_before, "
        "replace(text, ' ', chr(31)) AS st FROM documents)"
    ]
    for i, (a, b) in enumerate(BPE_MERGES, start=1):
        lam = (
            f"(acc, x) -> CASE WHEN x = '{b}' AND (acc = '{a}' OR "
            f"right(acc, {len(a) + 1}) = chr(31) || '{a}') "
            f"THEN left(acc, len(acc) - {len(a)}) || '{a}_{b}' "
            f"ELSE acc || chr(31) || x END"
        )
        ctes.append(
            f"s{i} AS (SELECT doc_id, n_before, "
            f"list_reduce(string_split(st, chr(31)), {lam}) AS st "
            f"FROM s{i - 1})"
        )
    last = f"s{len(BPE_MERGES)}"
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT doc_id,
       CAST(n_before AS BIGINT) AS n_tokens_before,
       CAST(len(string_split(st, chr(31))) AS BIGINT) AS n_tokens_after,
       CAST(n_before - len(string_split(st, chr(31))) AS BIGINT) AS n_merges,
       round(len(string_split(st, chr(31))) / n_before, 6) AS compression
FROM {last}
"""


# ---------------------------------------------------------------------------
# Unigram language-model surprisal — the CCNet/Wenzek-et-al.-style
# perplexity quality signal: score every document by the mean negative
# log-probability of its tokens under a unigram model fit on the corpus
# itself. High-surprisal docs are gibberish/junk candidates; low-surprisal
# docs are boilerplate candidates — both tails are what a 100 TB cleaning
# pipeline buckets on. (CCNet uses a 5-gram KenLM; the unigram model is the
# same signal computable exactly in pure SQL on both engines.)
#
# Scale design: one token explode (linear) → per-(doc, word) counts (one
# shuffle, map-side combined) → join to the vocab frequency table ON word.
# The vocab side is NOT broadcast-hinted: over web-scale corpora the
# unique-token count (typos, URLs, numerals) grows with the corpus, so the
# hint is left to AQE. Per-token surprisal is quantized to 1e-6 nats as a
# BIGINT before the integer sum — exactly associative, immune to shuffle
# combine order (the q_corpus_clean fixed-point trick), and wide enough
# that a ≤1-ulp ln() divergence between the JVM and libm cannot flip a
# quantum except within 1e-9 of a boundary.
# ---------------------------------------------------------------------------


def unigram_model(tok: DataFrame) -> DataFrame:
    """(.., word) → (word, qnll): per-token surprisal −ln(cnt/N) under the
    corpus unigram model, quantized to 1e-6 nats as bigint. The quantized
    value is the cross-engine contract (JVM ``Math.log`` and libm ``log``
    may differ in the last ulp; the 1e-6 quantum absorbs it —
    tests/test_operators.py pins agreement against Python's libm)."""
    vocab = tok.groupBy("word").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("n_total"))  # 1 row: broadcast is exact
    qnll = F.round((F.log(F.col("n_total")) - F.log(F.col("cnt"))) * 1e6).cast(
        "bigint"
    )
    return vocab.crossJoin(F.broadcast(tot)).select("word", qnll.alias("qnll"))


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    scored = unigram_model(tok)
    per_doc = (
        tf.join(scored, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("qnll")).alias("s"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("s") / (F.col("n_tokens") * F.lit(1e6)), 6).alias("avg_nll"),
    )


ORACLE_UNIGRAM_LOGPROB = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
vocab AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM vocab),
q AS (
  SELECT word,
         CAST(round((ln(tot.n_total) - ln(cnt)) * 1e6) AS BIGINT) AS qnll
  FROM vocab, tot
),
pd AS (
  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
         CAST(SUM(tf.tf * q.qnll) AS BIGINT) AS s
  FROM tf JOIN q USING (word) GROUP BY 1
)
SELECT doc_id, n_tokens, round(s / (n_tokens * 1e6), 6) AS avg_nll FROM pd
"""


# ---------------------------------------------------------------------------
# CCNet head/middle/tail buckets — the published pipeline's actual output:
# split each language's documents into perplexity terciles (head = most
# fluent / lowest surprisal, tail = noisiest) so downstream mixing can
# up-weight the head. The cuts are computed as per-lang percentile
# AGGREGATES (no global sort — NTILE-style ranking would funnel each
# language through one sort task, the low-cardinality-window anti-pattern)
# and joined back via a broadcast of the cut table, which is BOUNDED: one
# row per language, and languages do not grow with the corpus — this is
# the legitimate-broadcast case. At 100 TB swap percentile() for
# approx_percentile() on a sample, exactly what CCNet does.
# ---------------------------------------------------------------------------


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", "lang", F.explode(words_col(F.col("text"))).alias("word")
    )
    tf = tok.groupBy("doc_id", "lang", "word").agg(F.count("*").alias("tf"))
    scored = unigram_model(tok.select("word"))
    per_doc = (
        tf.join(scored, "word")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("qnll")).alias("s"),
        )
        .select(
            "doc_id",
            "lang",
            F.round(F.col("s") / (F.col("n_tokens") * F.lit(1e6)), 6).alias(
                "avg_nll"
            ),
        )
    )
    cut = F.percentile("avg_nll", F.array(F.lit(1.0 / 3), F.lit(2.0 / 3)))
    cuts = per_doc.groupBy("lang").agg(
        F.round(F.element_at(cut, 1), 6).alias("c1"),
        F.round(F.element_at(cut, 2), 6).alias("c2"),
    )
    bucketed = per_doc.join(F.broadcast(cuts), "lang").select(
        "lang",
        F.when(F.col("avg_nll") <= F.col("c1"), F.lit("head"))
        .when(F.col("avg_nll") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
        F.round(F.col("avg_nll") * 1e6).cast("bigint").alias("qn"),
    )
    return bucketed.groupBy("lang", "bucket").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum("qn") / (F.count("*") * F.lit(1e6)), 6).alias("mean_nll"),
    )


ORACLE_CCNET_BUCKETS = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, lang, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2, 3),
vocab AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM vocab),
q AS (
  SELECT word,
         CAST(round((ln(tot.n_total) - ln(cnt)) * 1e6) AS BIGINT) AS qnll
  FROM vocab, tot
),
pd AS (
  SELECT tf.doc_id, tf.lang,
         round(SUM(tf.tf * q.qnll) / (SUM(tf.tf) * 1e6), 6) AS avg_nll
  FROM tf JOIN q USING (word) GROUP BY 1, 2
),
cuts AS (
  SELECT lang,
         round(quantile_cont(avg_nll, 1.0/3), 6) AS c1,
         round(quantile_cont(avg_nll, 2.0/3), 6) AS c2
  FROM pd GROUP BY lang
),
b AS (
  SELECT pd.lang,
         CASE WHEN pd.avg_nll <= cuts.c1 THEN 'head'
              WHEN pd.avg_nll <= cuts.c2 THEN 'middle'
              ELSE 'tail' END AS bucket,
         CAST(round(pd.avg_nll * 1e6) AS BIGINT) AS qn
  FROM pd JOIN cuts USING (lang)
)
SELECT lang, bucket, COUNT(*) AS n_docs,
       round(CAST(SUM(qn) AS BIGINT) / (COUNT(*) * 1e6), 6) AS mean_nll
FROM b GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# PMI collocations — phrase mining: rank adjacent word pairs by pointwise
# mutual information, PMI(a,b) = ln( P(ab) / (P(a)·P(b)) ), the classic
# signal for "these two tokens form a unit" (multi-word expressions a
# vocab/tokenizer designer promotes to single tokens; complements
# q_bpe_merge_candidates, which ranks by RAW count and so surfaces
# stopword pairs first). Low-count pairs are floored (c_ab >=
# PMI_MIN_COUNT) — the standard guard against PMI's rare-pair bias.
#
# Scale design: two linear explodes feeding two-phase hash aggregates
# (bigram counts, unigram counts), two equi-joins of the bigram frame
# onto the unigram vocab (corpus-cardinality ⇒ NO broadcast hint, AQE
# decides), scalar totals via 1-row broadcast crossings, and a
# TakeOrderedAndProject top-K (per-partition heaps + driver merge — never
# a global sort). Ranking compares the 1e-6-quantized PMI BIGINT, so both
# engines order identical integers and the (qpmi desc, pair asc) cutoff
# is deterministic cross-engine.
# ---------------------------------------------------------------------------

PMI_TOP_K = 30
PMI_MIN_COUNT = 5


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    bc = (
        docs.select(F.explode(bigrams_col(F.col("text"))).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_COUNT)
    )
    uc = (
        docs.select(F.explode(words_col(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c_w"))
    )
    tot = uc.agg(F.sum("c_w").alias("n_uni"))
    nbi = bc.agg(F.sum("c_ab").alias("n_bi"))  # post-floor bigram mass
    parts = F.split(F.col("pair"), " ")
    w12 = bc.select(
        "pair", "c_ab", parts.getItem(0).alias("w1"), parts.getItem(1).alias("w2")
    )
    joined = (
        w12.join(uc.select(F.col("w").alias("w1"), F.col("c_w").alias("c_a")), "w1")
        .join(uc.select(F.col("w").alias("w2"), F.col("c_w").alias("c_b")), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nbi))
    )
    qpmi = F.round(
        (
            F.log(F.col("c_ab"))
            - F.log(F.col("n_bi"))
            + F.lit(2.0) * F.log(F.col("n_uni"))
            - F.log(F.col("c_a"))
            - F.log(F.col("c_b"))
        )
        * 1e6
    ).cast("bigint")
    return (
        joined.select("pair", "c_ab", qpmi.alias("qpmi"))
        .orderBy(F.col("qpmi").desc(), F.col("pair").asc())
        .limit(PMI_TOP_K)
        .select(
            "pair",
            "c_ab",
            F.round(F.col("qpmi") / F.lit(1e6), 6).alias("pmi"),
        )
    )


ORACLE_PMI_COLLOCATIONS = f"""
WITH w AS (
  SELECT string_split(text, ' ') AS ws FROM documents
),
bi AS (
  SELECT unnest({bigrams_sql('ws')}) AS pair FROM w
),
bc AS (
  SELECT pair, COUNT(*) AS c_ab FROM bi GROUP BY pair
  HAVING COUNT(*) >= {PMI_MIN_COUNT}
),
tok AS (SELECT unnest(ws) AS word FROM w),
uc AS (SELECT word, COUNT(*) AS c_w FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_uni FROM uc),
nbi AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_bi FROM bc),
scored AS (
  SELECT bc.pair, bc.c_ab,
         CAST(round((ln(bc.c_ab) - ln(nbi.n_bi) + 2.0 * ln(tot.n_uni)
                     - ln(a.c_w) - ln(b.c_w)) * 1e6) AS BIGINT) AS qpmi
  FROM bc
  JOIN uc a ON a.word = string_split(bc.pair, ' ')[1]
  JOIN uc b ON b.word = string_split(bc.pair, ' ')[2]
  CROSS JOIN tot CROSS JOIN nbi
)
SELECT pair, c_ab, round(qpmi / 1e6, 6) AS pmi
FROM scored
ORDER BY qpmi DESC, pair ASC
LIMIT {PMI_TOP_K}
"""


# ---------------------------------------------------------------------------
# Filter-funnel ablation report — the table curation teams actually
# publish (Dolma, RefinedWeb, Gopher appendix): for each quality rule, how
# many documents it flags on its own (marginal) and how many are gone
# after applying the rules cumulatively in pipeline order. The marginal
# column shows rule overlap; the cumulative column is the real funnel a
# rule-ordering decision changes. Rules here are the cheap scan-side
# heuristics (length bounds, type-token diversity, stopword density) —
# the same family q_quality_score composites, reported per-rule.
#
# Scale design: ONE linear scan computes every rule flag as a codegen'd
# expression, ONE aggregate row sums all marginal and cumulative
# counters map-side (conditional sums — the shuffle carries a single
# partial-state row per partition), and the per-rule report is an
# unpivot (stack) of that one row. Cost is one pass over the corpus no
# matter how many rules — adding a rule adds a column, not a scan.
# ---------------------------------------------------------------------------

FUNNEL_MIN_TOKENS = 24
FUNNEL_MAX_TOKENS = 88
FUNNEL_MIN_DIVERSITY = 0.35  # distinct/total token ratio
FUNNEL_MIN_STOPWORD = 0.02  # stopword density floor


def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    ws = words_col(F.col("text"))
    n = F.size(ws)
    div = F.size(F.array_distinct(ws)) / n
    sw = stopword_count(F.col("text")) / n
    f1 = (n < FUNNEL_MIN_TOKENS).cast("int")
    f2 = (n > FUNNEL_MAX_TOKENS).cast("int")
    f3 = (div < FUNNEL_MIN_DIVERSITY).cast("int")
    f4 = (sw < FUNNEL_MIN_STOPWORD).cast("int")
    flags = docs.select(
        f1.alias("f1"),
        f2.alias("f2"),
        f3.alias("f3"),
        f4.alias("f4"),
    )
    agg = flags.agg(
        F.sum("f1").alias("m1"),
        F.sum("f2").alias("m2"),
        F.sum("f3").alias("m3"),
        F.sum("f4").alias("m4"),
        F.sum(F.greatest("f1", "f2")).alias("d2"),
        F.sum(F.greatest("f1", "f2", "f3")).alias("d3"),
        F.sum(F.greatest("f1", "f2", "f3", "f4")).alias("d4"),
        F.count("*").alias("n_docs"),
    )
    return agg.select(
        F.expr(
            "stack(4,"
            " 'too_short', m1, m1,"
            " 'too_long', m2, d2,"
            " 'low_diversity', m3, d3,"
            " 'low_stopword', m4, d4"
            ") as (rule, n_flagged, n_cum_dropped)"
        ),
        F.col("n_docs"),
    ).select(
        "rule",
        "n_flagged",
        "n_cum_dropped",
        (F.col("n_docs") - F.col("n_cum_dropped")).alias("n_survivors"),
    )


ORACLE_FILTER_FUNNEL = f"""
WITH f AS (
  SELECT len(string_split(text, ' ')) AS n,
         len(list_distinct(string_split(text, ' ')))::DOUBLE
             / len(string_split(text, ' ')) AS div,
         len(list_filter(string_split(text, ' '), w -> w IN ({_SW_LIST})))::DOUBLE
             / len(string_split(text, ' ')) AS sw
  FROM documents
),
a AS (
  SELECT
    CAST(SUM(CASE WHEN n < {FUNNEL_MIN_TOKENS} THEN 1 ELSE 0 END) AS BIGINT) AS m1,
    CAST(SUM(CASE WHEN n > {FUNNEL_MAX_TOKENS} THEN 1 ELSE 0 END) AS BIGINT) AS m2,
    CAST(SUM(CASE WHEN div < {FUNNEL_MIN_DIVERSITY} THEN 1 ELSE 0 END) AS BIGINT) AS m3,
    CAST(SUM(CASE WHEN sw < {FUNNEL_MIN_STOPWORD} THEN 1 ELSE 0 END) AS BIGINT) AS m4,
    CAST(SUM(CASE WHEN n < {FUNNEL_MIN_TOKENS} OR n > {FUNNEL_MAX_TOKENS}
             THEN 1 ELSE 0 END) AS BIGINT) AS d2,
    CAST(SUM(CASE WHEN n < {FUNNEL_MIN_TOKENS} OR n > {FUNNEL_MAX_TOKENS}
             OR div < {FUNNEL_MIN_DIVERSITY} THEN 1 ELSE 0 END) AS BIGINT) AS d3,
    CAST(SUM(CASE WHEN n < {FUNNEL_MIN_TOKENS} OR n > {FUNNEL_MAX_TOKENS}
             OR div < {FUNNEL_MIN_DIVERSITY} OR sw < {FUNNEL_MIN_STOPWORD}
             THEN 1 ELSE 0 END) AS BIGINT) AS d4,
    COUNT(*) AS n_docs
  FROM f
)
SELECT rule, n_flagged, n_cum_dropped, n_docs - n_cum_dropped AS n_survivors
FROM (
  SELECT 'too_short' AS rule, m1 AS n_flagged, m1 AS n_cum_dropped, n_docs FROM a
  UNION ALL
  SELECT 'too_long', m2, d2, n_docs FROM a
  UNION ALL
  SELECT 'low_diversity', m3, d3, n_docs FROM a
  UNION ALL
  SELECT 'low_stopword', m4, d4, n_docs FROM a
)
"""


# ---------------------------------------------------------------------------
# Vocabulary coverage curve — the tokenizer-design table: what fraction of
# corpus tokens would be in-vocabulary at candidate vocab sizes V (the
# rest become <unk>/byte-fallback)? Read together with
# q_bpe_merge_candidates (what to merge) and q_pmi_collocations (what to
# promote), this is the third input a vocab designer actually looks at.
#
# Scale design: the vocab frame is corpus-growing, but each curve point
# needs only the TOP-V counts — and V is a CONSTANT, so
# `orderBy(cnt desc, word).limit(V)` compiles to TakeOrderedAndProject
# (per-partition V-row heaps, driver merge of V rows) and the coverage
# sum aggregates V rows. No global sort of the vocab, no
# single-partition window rank — the classic "rank the whole table"
# anti-pattern is avoided because the question only ever asks about a
# bounded prefix. Ties at the cutoff break on (cnt desc, word asc), so
# the prefix is identical cross-engine.
# ---------------------------------------------------------------------------

VOCAB_SIZES = (256, 1024, 4096)


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from ..plans.session import cache_tracked, spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    # One token explode + aggregate feeds every curve point and the
    # totals — cached so the union's branches don't re-scan the corpus.
    vocab = cache_tracked(
        docs.select(F.explode(words_col(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    tot = vocab.agg(F.sum("cnt").alias("n_tokens"))
    points = []
    for v in VOCAB_SIZES:
        top = vocab.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(v)
        pt = (
            top.agg(
                F.sum("cnt").alias("covered_tokens"),
                F.count("*").alias("vocab_types"),
            )
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(v).alias("vocab_size"),
                "vocab_types",
                "covered_tokens",
                F.round(F.col("covered_tokens") / F.col("n_tokens"), 6).alias(
                    "coverage"
                ),
            )
        )
        points.append(pt)
    return reduce(lambda a, b: a.unionByName(b), points)


def _oracle_vocab_coverage() -> str:
    pts = "\nUNION ALL\n".join(
        f"""SELECT {v} AS vocab_size,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM
         (SELECT word FROM vocab ORDER BY cnt DESC, word ASC LIMIT {v})) AS vocab_types,
       (SELECT CAST(SUM(cnt) AS BIGINT) FROM
         (SELECT cnt FROM vocab ORDER BY cnt DESC, word ASC LIMIT {v})) AS covered_tokens"""
        for v in VOCAB_SIZES
    )
    return f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
vocab AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tokens FROM vocab),
pts AS (
{pts}
)
SELECT vocab_size, vocab_types, covered_tokens,
       round(covered_tokens / (SELECT n_tokens FROM tot), 6) AS coverage
FROM pts
"""


# ---------------------------------------------------------------------------
# Per-document keywords — doc tagging at corpus scale: each document's
# top-K terms by TF-IDF against the whole corpus (the per-DOC complement
# of q_tfidf_top_terms' per-language rollup; use it to label documents
# for retrieval, mixture design, or cluster naming). Same factoring as
# its sibling: integer tf, idf computed once per word, one int×double
# multiply per (doc, word) — no float summation order anywhere.
#
# Scale design: linear explode → two two-phase hash aggregates (tf per
# (doc, word), df per word) → AQE-decided vocab join (corpus-growing, no
# hint) + scalar doc-count broadcast → rank window keyed on doc_id —
# corpus-cardinality, so window parallelism GROWS with the data (the
# opposite of the ≤5-key window anti-pattern).
# ---------------------------------------------------------------------------

DOC_KEYWORDS_K = 3


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..plans.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("word").agg(F.count("*").alias("df_docs"))
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    # Rank on a 1e-6 fixed-point BIGINT, not the rounded double: a ≤1-ulp
    # ln() divergence between the JVM and DuckDB's libm near a 0.5e-6
    # rounding boundary could otherwise flip the rank cutoff cross-engine
    # (same contract as q_pmi_collocations / q_dsir_weights); the
    # displayed tfidf is derived FROM the quantized value so order and
    # display can never disagree.
    scored = (
        tf.join(df_, "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            "tf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df_docs") + 1))
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("tfidf_q"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf_q").desc(), F.col("word").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DOC_KEYWORDS_K)
        .select(
            "doc_id",
            "word",
            "tf",
            F.round(F.col("tfidf_q") / 1e6, 6).alias("tfidf"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


ORACLE_DOC_KEYWORDS = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT word, COUNT(*) AS df_docs FROM tf GROUP BY 1),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf,
         CAST(round(tf.tf * ln((nd.n_docs + 1) / (dfq.df_docs + 1.0)) * 1e6)
              AS BIGINT) AS tfidf_q
  FROM tf JOIN dfq USING (word) CROSS JOIN nd
),
ranked AS (
  SELECT doc_id, word, tf, tfidf_q,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf_q DESC, word ASC) AS INTEGER) AS rk
  FROM scored
)
SELECT doc_id, word, tf, round(tfidf_q / 1e6, 6) AS tfidf, rk
FROM ranked WHERE rk <= {DOC_KEYWORDS_K}
"""


# ---------------------------------------------------------------------------
# Per-doc feature assembly — the WIDE frame a trained quality classifier
# (fasttext-style filter, DSIR weighting, curriculum scorer) consumes:
# every cheap per-document signal in one row. Real pipelines materialize
# exactly this table once and train/score against it instead of
# re-deriving signals ad hoc.
#
# Scale design: one scan computes all scalar text features (pure
# projection, whole-stage codegen); the corpus-model signal (unigram
# surprisal) is the usual explode → two hash aggregates → vocab join;
# the exact-dup flag is a hash aggregate on the fingerprint joined back
# ON THE SAME KEY (exchange reuse). Near-dup features join from the
# MATERIALIZED pair tables in production (see ensemble_from_pairs) —
# deliberately not recomputed here, so the feature build stays linear.
# ---------------------------------------------------------------------------


def q_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    n_words = token_count_ws(t)
    sw_ratio = stopword_count(t) / n_words
    punct_ratio = F.size(
        F.regexp_extract_all(t, F.lit(PUNCT_PATTERN), F.lit(0))
    ) / F.length(t)
    len_score = F.least(F.length(t) / F.lit(500.0), F.lit(1.0))
    quality = (sw_ratio + (1 - punct_ratio) + len_score) / 3
    rep = 1 - F.size(F.array_distinct(words_col(t))) / n_words
    base = docs.select(
        "doc_id",
        "lang",
        n_words.cast("bigint").alias("n_words"),
        F.length(t).cast("bigint").alias("n_chars"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(quality, 6).alias("quality"),
        F.round(rep, 6).alias("repetition"),
        fingerprint(t).alias("fp"),
    )
    dupes = base.groupBy("fp").agg(F.count("*").alias("n_copies"))
    tok = docs.select("doc_id", F.explode(words_col(t)).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    surp = (
        tf.join(unigram_model(tok), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("nt"),
            F.sum(F.col("tf") * F.col("qnll")).alias("s"),
        )
        .select(
            "doc_id",
            F.round(F.col("s") / (F.col("nt") * F.lit(1e6)), 6).alias("avg_nll"),
        )
    )
    return (
        base.join(dupes, "fp")
        .join(surp, "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_words",
            "n_chars",
            "stopword_ratio",
            "punct_ratio",
            "quality",
            "repetition",
            (F.col("n_copies") >= 2).cast("int").alias("is_exact_dup"),
            "avg_nll",
        )
    )


ORACLE_DOC_FEATURES = f"""
WITH base AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(length(text) AS BIGINT) AS n_chars,
         len(list_filter(string_split(text, ' '), w -> w IN ({_SW_LIST})))::DOUBLE
             / len(string_split(text, ' ')) AS sw_ratio,
         len(regexp_extract_all(text, '{PUNCT_PATTERN}'))::DOUBLE / length(text)
             AS punct_ratio,
         least(length(text)::DOUBLE / 500.0, 1.0) AS len_score,
         1 - len(list_distinct(string_split(text, ' ')))::DOUBLE
             / len(string_split(text, ' ')) AS rep,
         {fingerprint_sql("text")} AS fp
  FROM documents
),
dup AS (SELECT fp, COUNT(*) AS n_copies FROM base GROUP BY 1),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
vocab AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM vocab),
q AS (
  SELECT word,
         CAST(round((ln(tot.n_total) - ln(cnt)) * 1e6) AS BIGINT) AS qnll
  FROM vocab, tot
),
pd AS (
  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS nt,
         CAST(SUM(tf.tf * q.qnll) AS BIGINT) AS s
  FROM tf JOIN q USING (word) GROUP BY 1
)
SELECT b.doc_id, b.lang, b.n_words, b.n_chars,
       round(b.sw_ratio, 6) AS stopword_ratio,
       round(b.punct_ratio, 6) AS punct_ratio,
       round((b.sw_ratio + (1 - b.punct_ratio) + b.len_score) / 3, 6) AS quality,
       round(b.rep, 6) AS repetition,
       CAST(dup.n_copies >= 2 AS INTEGER) AS is_exact_dup,
       round(pd.s / (pd.nt * 1e6), 6) AS avg_nll
FROM base b JOIN dup USING (fp) JOIN pd ON pd.doc_id = b.doc_id
"""


# ---------------------------------------------------------------------------
# Length-quality correlation — per language, the Pearson r between doc
# length and composite quality: the sanity check behind every length
# filter (if r is strongly positive the "quality" score is just a length
# proxy and the filter double-counts). corr() is NOT used: windowed/
# aggregated FLOAT moments are engine-implementation-defined — instead
# both engines accumulate INTEGER moments (x = word count, y = quality
# quantized to 1e-4) whose sums are exact and associative, then evaluate
# the closed-form r from the same integers. The 1e4 quantum keeps y² sums
# within int64 out to ~10^10 docs per language.
# ---------------------------------------------------------------------------


def q_length_quality_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    n_words = token_count_ws(t)
    sw_ratio = stopword_count(t) / n_words
    punct_ratio = F.size(
        F.regexp_extract_all(t, F.lit(PUNCT_PATTERN), F.lit(0))
    ) / F.length(t)
    len_score = F.least(F.length(t) / F.lit(500.0), F.lit(1.0))
    quality = (sw_ratio + (1 - punct_ratio) + len_score) / 3
    xy = docs.select(
        "lang",
        n_words.cast("bigint").alias("x"),
        F.round(quality * F.lit(1e4)).cast("bigint").alias("y"),
    )
    m = xy.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n_docs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    r = F.when(den == 0, F.lit(None).cast("double")).otherwise(
        (n * sxy - sx * sy) / den
    )
    return m.select("lang", "n_docs", F.round(r, 6).alias("len_quality_corr"))


ORACLE_LENGTH_QUALITY_CORR = f"""
WITH xy AS (
  SELECT lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
         CAST(round((
             len(list_filter(string_split(text, ' '), w -> w IN ({_SW_LIST})))::DOUBLE
                 / len(string_split(text, ' '))
             + (1 - len(regexp_extract_all(text, '{PUNCT_PATTERN}'))::DOUBLE
                   / length(text))
             + least(length(text)::DOUBLE / 500.0, 1.0)
           ) / 3 * 1e4) AS BIGINT) AS y
  FROM documents
),
m AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM xy GROUP BY lang
)
SELECT lang, n_docs,
       round(CASE WHEN sqrt((n_docs::DOUBLE * sxx - sx::DOUBLE * sx)
                            * (n_docs::DOUBLE * syy - sy::DOUBLE * sy)) = 0
                  THEN NULL
                  ELSE (n_docs::DOUBLE * sxy - sx::DOUBLE * sy)
                       / sqrt((n_docs::DOUBLE * sxx - sx::DOUBLE * sx)
                              * (n_docs::DOUBLE * syy - sy::DOUBLE * sy))
             END, 6) AS len_quality_corr
FROM m
"""


# ---------------------------------------------------------------------------
# Interpolated bigram surprisal — the CCNet-fidelity upgrade of the
# unigram filter: per-doc mean −ln P under a corpus-fit bigram model
# with unigram backoff, P(w2|w1) = λ·c(w1w2)/c(w1) + (1−λ)·c(w2)/N
# (Jelinek-Mercer smoothing; the lambda is a module literal so both
# engines share the exact double). Wenzek et al.'s CCNet uses a 5-gram
# KenLM for exactly this per-doc score; a bigram JM model is the
# largest order whose counts stay join-shaped (no backoff recursion).
#
# Scale: two explodes (tokens, bigrams) + three hash aggregates (vocab,
# bigram counts, per-doc tf) + equi-joins on word/bigram keys — the
# model frames grow with the VOCABULARY, not the corpus, and carry no
# broadcast hints (AQE decides); the only hinted broadcast is the
# single-row total. Per-bigram surprisal quantizes to 1e-6 nats as
# BIGINT before the doc sum, so shuffle combine order cannot move the
# 6-dp mean. Docs with <2 words have no bigrams and drop out — in both
# engines, via the shared guarded bigram helpers (round-5 contract).
# ---------------------------------------------------------------------------

BIGRAM_LAMBDA = 0.75  # weight on the bigram MLE; 1-λ backs off to unigram


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    bg = docs.select(
        "doc_id", F.explode(bigrams_col(F.col("text"))).alias("bg")
    )
    tf = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("tf"))
    tok = docs.select(F.explode(words_col(F.col("text"))).alias("word"))
    vocab = tok.groupBy("word").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("n_total"))  # 1 row: broadcast is exact
    bgc = bg.groupBy("bg").agg(F.count("*").alias("cb"))
    arr = F.split(F.col("bg"), " ")
    m = (
        bgc.withColumn("w1", arr.getItem(0))
        .withColumn("w2", arr.getItem(1))
        .join(vocab.select(F.col("word").alias("w1"), F.col("cnt").alias("c1")), "w1")
        .join(vocab.select(F.col("word").alias("w2"), F.col("cnt").alias("c2")), "w2")
        .crossJoin(F.broadcast(tot))
    )
    p = F.lit(BIGRAM_LAMBDA) * (
        F.col("cb").cast("double") / F.col("c1").cast("double")
    ) + F.lit(1.0 - BIGRAM_LAMBDA) * (
        F.col("c2").cast("double") / F.col("n_total").cast("double")
    )
    model = m.select(
        "bg", F.round((-F.log(p)) * 1e6).cast("bigint").alias("qnll")
    )
    per_doc = (
        tf.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("qnll")).alias("s"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("s") / (F.col("n_bigrams") * F.lit(1e6)), 6).alias("avg_nll"),
    )


def _oracle_bigram_logprob() -> str:
    lam = repr(BIGRAM_LAMBDA)
    one_minus = repr(1.0 - BIGRAM_LAMBDA)
    return f"""
WITH bg AS (
  SELECT doc_id,
         unnest({bigrams_sql("string_split(text, ' ')")}) AS bg
  FROM documents
),
tf AS (SELECT doc_id, bg, COUNT(*) AS tf FROM bg GROUP BY 1, 2),
tok AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
vocab AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM vocab),
bgc AS (SELECT bg, COUNT(*) AS cb FROM bg GROUP BY 1),
m AS (
  SELECT bgc.bg,
         CAST(round(-ln(({lam})::DOUBLE * (cb::DOUBLE / v1.cnt::DOUBLE)
                        + ({one_minus})::DOUBLE
                          * (v2.cnt::DOUBLE / tot.n_total::DOUBLE)) * 1e6)
              AS BIGINT) AS qnll
  FROM bgc
  JOIN vocab v1 ON v1.word = string_split(bgc.bg, ' ')[1]
  JOIN vocab v2 ON v2.word = string_split(bgc.bg, ' ')[2]
  CROSS JOIN tot
),
pd AS (
  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
         CAST(SUM(tf.tf * m.qnll) AS BIGINT) AS s
  FROM tf JOIN m USING (bg) GROUP BY 1
)
SELECT doc_id, n_bigrams, round(s / (n_bigrams * 1e6), 6) AS avg_nll FROM pd
"""


# ---------------------------------------------------------------------------
# Model-based quality filter — the APPLY step q_doc_features was built to
# train (the Dolma/RefinedWeb "model-based filtering" stage): a
# fixed-weight logistic scorer over the per-doc feature frame, evaluated
# as a pure JVM expression, plus the threshold ablation a pipeline owner
# reads to pick the operating point (keep-rate vs kept-cohort quality at
# each cut). The weights stand in for a trained classifier's
# coefficients; swapping in real fasttext/logreg weights changes only the
# literals, not the plan.
#
# Determinism: every feature enters pre-rounded (the 6-dp q_doc_features
# contract), the logit quantizes to a 1e-6 BIGINT before any comparison,
# and each probability threshold is pre-mapped to logit space in PYTHON
# (round(ln(p/(1-p))*1e6) — one shared integer literal per engine), so
# keep/drop is an exact integer compare and the kept-cohort means are
# fixed-point sums. exp() never runs inside either engine.
#
# Scale: one linear pass over the feature frame; the threshold dim is a
# 4-row broadcast cross join (bounded by construction) and the rollup a
# map-side-combined hash aggregate on the 4-value threshold key.
# ---------------------------------------------------------------------------

# (intercept, per-feature weights) — module literal, shared verbatim by
# the Spark plan and the DuckDB oracle so the arithmetic matches bitwise.
QUALITY_LOGIT_WEIGHTS: dict[str, float] = {
    "intercept": -1.2,
    "stopword_ratio": 3.0,
    "punct_ratio": -8.0,
    "repetition": -2.5,
    "avg_nll": -0.35,
    "ln_n_words": 0.25,
    "is_exact_dup": -1.5,
}

QUALITY_LOGIT_THRESHOLDS = (0.3, 0.5, 0.7, 0.9)


def _logit_thr_q(p: float) -> int:
    import math

    return round(math.log(p / (1 - p)) * 1e6)


def q_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Row

    w = QUALITY_LOGIT_WEIGHTS
    feat = q_doc_features(spark, sf_dir)
    logit = (
        F.lit(w["intercept"])
        + F.lit(w["stopword_ratio"]) * F.col("stopword_ratio")
        + F.lit(w["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(w["repetition"]) * F.col("repetition")
        + F.lit(w["avg_nll"]) * F.col("avg_nll")
        + F.lit(w["ln_n_words"]) * F.log(F.col("n_words").cast("double"))
        + F.lit(w["is_exact_dup"]) * F.col("is_exact_dup").cast("double")
    )
    scored = feat.select(
        F.round(logit * F.lit(1e6)).cast("bigint").alias("logit_q"),
        F.round(F.col("quality") * F.lit(1e6)).cast("bigint").alias("quality_q"),
        F.round(F.col("avg_nll") * F.lit(1e6)).cast("bigint").alias("nll_q"),
    )
    thr = spark.createDataFrame(
        [Row(p_threshold=p, thr_q=_logit_thr_q(p)) for p in QUALITY_LOGIT_THRESHOLDS]
    )
    kept = F.col("logit_q") >= F.col("thr_q")
    return (
        scored.crossJoin(F.broadcast(thr))  # 4 rows — bounded by construction
        .groupBy("p_threshold")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept.cast("bigint")).alias("n_kept"),
            F.sum(F.when(kept, F.col("quality_q"))).alias("sq"),
            F.sum(F.when(kept, F.col("nll_q"))).alias("sn"),
        )
        .select(
            "p_threshold",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_docs"), 6).alias("keep_rate"),
            F.round(F.col("sq") / (F.col("n_kept") * F.lit(1e6)), 6).alias(
                "kept_mean_quality"
            ),
            F.round(F.col("sn") / (F.col("n_kept") * F.lit(1e6)), 6).alias(
                "kept_mean_nll"
            ),
        )
    )


def _oracle_quality_logit() -> str:
    w = QUALITY_LOGIT_WEIGHTS
    thr_rows = ", ".join(
        f"({p!r}, {_logit_thr_q(p)})" for p in QUALITY_LOGIT_THRESHOLDS
    )
    logit = (
        f"({w['intercept']!r})::DOUBLE"
        f" + ({w['stopword_ratio']!r})::DOUBLE * stopword_ratio"
        f" + ({w['punct_ratio']!r})::DOUBLE * punct_ratio"
        f" + ({w['repetition']!r})::DOUBLE * repetition"
        f" + ({w['avg_nll']!r})::DOUBLE * avg_nll"
        f" + ({w['ln_n_words']!r})::DOUBLE * ln(n_words::DOUBLE)"
        f" + ({w['is_exact_dup']!r})::DOUBLE * is_exact_dup::DOUBLE"
    )
    return f"""
WITH feat AS (
  SELECT * FROM ({ORACLE_DOC_FEATURES})
),
scored AS (
  SELECT CAST(round(({logit}) * 1e6) AS BIGINT) AS logit_q,
         CAST(round(quality * 1e6) AS BIGINT) AS quality_q,
         CAST(round(avg_nll * 1e6) AS BIGINT) AS nll_q
  FROM feat
),
thr(p_threshold, thr_q) AS (VALUES {thr_rows})
SELECT p_threshold,
       CAST(SUM(CASE WHEN logit_q >= thr_q THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       round(SUM(CASE WHEN logit_q >= thr_q THEN 1 ELSE 0 END)::DOUBLE
             / COUNT(*), 6) AS keep_rate,
       round(SUM(CASE WHEN logit_q >= thr_q THEN quality_q END)::DOUBLE
             / (SUM(CASE WHEN logit_q >= thr_q THEN 1 ELSE 0 END) * 1e6), 6)
           AS kept_mean_quality,
       round(SUM(CASE WHEN logit_q >= thr_q THEN nll_q END)::DOUBLE
             / (SUM(CASE WHEN logit_q >= thr_q THEN 1 ELSE 0 END) * 1e6), 6)
           AS kept_mean_nll
FROM scored CROSS JOIN thr
GROUP BY p_threshold
"""


# ---------------------------------------------------------------------------
# Tokenizer fertility — the tokenizer-evaluation table (tokens emitted
# per whitespace word, chars per token) per (lang, source) stratum,
# under BOTH the regex pre-tokenizer and the learned BPE merges. This is
# the metric a tokenizer designer reads NEXT TO q_vocab_coverage (what
# the vocab covers) and q_bpe_merge_candidates (what to merge): fertility
# >> 1 on a stratum means the tokenizer fragments that stratum's text,
# which inflates its effective training cost and shrinks its effective
# context window — the standard multilingual-tokenizer-bias measurement.
#
# Scale design: the BPE fold is the same single-reference-per-level
# higher-order aggregate as q_bpe_apply (linear, codegen'd, no Python);
# everything else is one partial+final hash aggregate on (lang, source).
# Ratios divide exact integer sums, so the 6dp rounding is combine-order
# free without fixed-point quantization.
# ---------------------------------------------------------------------------


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    state = bpe_apply_state(F.col("text"))
    per_doc = docs.select(
        "lang",
        "source",
        F.length("text").cast("bigint").alias("chars"),
        token_count_ws(F.col("text")).cast("bigint").alias("words"),
        token_count_bpe(F.col("text")).cast("bigint").alias("pre_tokens"),
        F.size(F.split(state, BPE_SEP)).cast("bigint").alias("bpe_tokens"),
    )
    return per_doc.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("words").alias("n_words"),
        F.sum("pre_tokens").alias("n_pre_tokens"),
        F.sum("bpe_tokens").alias("n_bpe_tokens"),
        F.round(F.sum("bpe_tokens") / F.sum("words"), 6).alias("fertility"),
        F.round(F.sum("chars") / F.sum("bpe_tokens"), 6).alias(
            "chars_per_token"
        ),
    )


def _oracle_tokenizer_fertility() -> str:
    ctes = [
        "s0 AS (SELECT lang, source, length(text) AS chars, "
        "len(string_split(text, ' ')) AS n_words, "
        f"len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS pre_tokens, "
        "replace(text, ' ', chr(31)) AS st FROM documents)"
    ]
    for i, (a, b) in enumerate(BPE_MERGES, start=1):
        lam = (
            f"(acc, x) -> CASE WHEN x = '{b}' AND (acc = '{a}' OR "
            f"right(acc, {len(a) + 1}) = chr(31) || '{a}') "
            f"THEN left(acc, len(acc) - {len(a)}) || '{a}_{b}' "
            f"ELSE acc || chr(31) || x END"
        )
        ctes.append(
            f"s{i} AS (SELECT lang, source, chars, n_words, pre_tokens, "
            f"list_reduce(string_split(st, chr(31)), {lam}) AS st "
            f"FROM s{i - 1})"
        )
    joined = ",\n".join(ctes)
    last = f"s{len(BPE_MERGES)}"
    return f"""
WITH {joined},
per AS (
  SELECT lang, source, chars, n_words, pre_tokens,
         len(string_split(st, chr(31))) AS bpe_tokens
  FROM {last}
)
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(pre_tokens) AS BIGINT) AS n_pre_tokens,
       CAST(SUM(bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       round(SUM(bpe_tokens)::DOUBLE / SUM(n_words), 6) AS fertility,
       round(SUM(chars)::DOUBLE / SUM(bpe_tokens), 6) AS chars_per_token
FROM per GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# Context-window chunking — the splitting counterpart of q_sequence_pack:
# long documents become overlapping fixed-width training windows
# (CHUNK_WORDS words, stride CHUNK_STRIDE, so consecutive chunks share
# CHUNK_WORDS − CHUNK_STRIDE words of context), each with its word
# offset and length. This is the transform every context-window-bounded
# training/embedding pipeline runs between curation and packing.
#
# Scale design: a PURE PROJECTION — one scan, zero shuffles. All chunks
# of a doc are built inside one higher-order transform over the
# materialized word array (the array is a bare column reference inside
# the lambda — constructed once per doc in its own projection, the
# winnowing boundary lesson), then exploded; the fanned rows carry only
# the chunk payload, never the full word array. Output volume is the
# inherent chunking overhead (~WORDS/STRIDE × corpus). The trailing
# filter on chunk_text both drops degenerate all-empty-word chunks and
# makes result cardinality depend on the reconstructed text, so a
# count()-only consumer cannot prune the slice/join work.
# ---------------------------------------------------------------------------

CHUNK_WORDS = 64
CHUNK_STRIDE = 48


def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width word chunks per document: (doc_id,
    chunk_id, start_tok, n_tok, chunk_text), stride CHUNK_STRIDE."""
    from ..plans.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", words_col(F.col("text")).alias("ws")
    ).select("doc_id", "ws", F.size("ws").alias("n"))
    chunk = lambda ci: F.struct(
        ci.cast("bigint").alias("chunk_id"),
        (ci * CHUNK_STRIDE).cast("bigint").alias("start_tok"),
        F.least(
            F.lit(CHUNK_WORDS).cast("bigint"),
            (F.col("n") - ci * CHUNK_STRIDE).cast("bigint"),
        ).alias("n_tok"),
        F.array_join(
            F.slice(F.col("ws"), ci * CHUNK_STRIDE + 1, CHUNK_WORDS), " "
        ).alias("chunk_text"),
    )
    chunks_arr = F.transform(
        F.expr(f"sequence(CAST(0 AS BIGINT), (n - 1) div {CHUNK_STRIDE})"),
        chunk,
    )
    return (
        base.select("doc_id", F.explode(chunks_arr).alias("c"))
        .select("doc_id", "c.*")
        .filter(F.col("chunk_text") != "")
    )


def _oracle_doc_chunking() -> str:
    return f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
n AS (SELECT doc_id, ws, len(ws) AS n FROM w),
c AS (
  SELECT doc_id, ws, n,
         unnest(generate_series(0, (n - 1) // {CHUNK_STRIDE})) AS chunk_id
  FROM n
)
SELECT doc_id, chunk_id,
       chunk_id * {CHUNK_STRIDE} AS start_tok,
       LEAST({CHUNK_WORDS}, n - chunk_id * {CHUNK_STRIDE}) AS n_tok,
       COALESCE(array_to_string(
         ws[(chunk_id * {CHUNK_STRIDE} + 1)::INT
            : (chunk_id * {CHUNK_STRIDE} + {CHUNK_WORDS})::INT], ' '), '')
           AS chunk_text
FROM c
WHERE COALESCE(array_to_string(
        ws[(chunk_id * {CHUNK_STRIDE} + 1)::INT
           : (chunk_id * {CHUNK_STRIDE} + {CHUNK_WORDS})::INT], ' '), '')
      <> ''
"""


QUERIES = {
    "q_udtf_trigrams": q_udtf_trigrams,
    "q_denylist_redact": q_denylist_redact,
    "q_tfidf_top_terms": q_tfidf_top_terms,
    "q_repetition_ratio": q_repetition_ratio,
    "q_text_stats": q_text_stats,
    "q_quality_score": q_quality_score,
    "q_lang_id": q_lang_id,
    "q_langid_confusion": q_langid_confusion,
    "q_doc_fingerprint": q_doc_fingerprint,
    "q_lang_rollup": q_lang_rollup,
    "q_rolling_hash": q_rolling_hash,
    "q_top_terms": q_top_terms,
    "q_bpe_merge_candidates": q_bpe_merge_candidates,
    "q_bpe_apply": q_bpe_apply,
    "q_unigram_logprob": q_unigram_logprob,
    "q_bigram_logprob": q_bigram_logprob,
    "q_ccnet_buckets": q_ccnet_buckets,
    "q_pmi_collocations": q_pmi_collocations,
    "q_filter_funnel": q_filter_funnel,
    "q_vocab_coverage": q_vocab_coverage,
    "q_doc_keywords": q_doc_keywords,
    "q_doc_features": q_doc_features,
    "q_quality_logit": q_quality_logit,
    "q_length_quality_corr": q_length_quality_corr,
    "q_tokenizer_fertility": q_tokenizer_fertility,
    "q_doc_chunking": q_doc_chunking,
}

ORACLES = {
    "q_udtf_trigrams": ORACLE_UDTF_TRIGRAMS,
    "q_denylist_redact": _oracle_denylist_redact(),
    "q_tfidf_top_terms": ORACLE_TFIDF_TOP_TERMS,
    "q_repetition_ratio": ORACLE_REPETITION_RATIO,
    "q_text_stats": ORACLE_TEXT_STATS,
    "q_quality_score": ORACLE_QUALITY_SCORE,
    "q_lang_id": _oracle_lang_id(),
    "q_langid_confusion": _oracle_langid_confusion(),
    "q_doc_fingerprint": ORACLE_DOC_FINGERPRINT,
    "q_lang_rollup": ORACLE_LANG_ROLLUP,
    "q_rolling_hash": ORACLE_ROLLING_HASH,
    "q_top_terms": ORACLE_TOP_TERMS,
    "q_bpe_merge_candidates": ORACLE_BPE_MERGE_CANDIDATES,
    "q_bpe_apply": _oracle_bpe_apply(),
    "q_unigram_logprob": ORACLE_UNIGRAM_LOGPROB,
    "q_bigram_logprob": _oracle_bigram_logprob(),
    "q_ccnet_buckets": ORACLE_CCNET_BUCKETS,
    "q_pmi_collocations": ORACLE_PMI_COLLOCATIONS,
    "q_filter_funnel": ORACLE_FILTER_FUNNEL,
    "q_vocab_coverage": _oracle_vocab_coverage(),
    "q_doc_keywords": ORACLE_DOC_KEYWORDS,
    "q_doc_features": ORACLE_DOC_FEATURES,
    "q_quality_logit": _oracle_quality_logit(),
    "q_length_quality_corr": ORACLE_LENGTH_QUALITY_CORR,
    "q_tokenizer_fertility": _oracle_tokenizer_fertility(),
    "q_doc_chunking": _oracle_doc_chunking(),
}
