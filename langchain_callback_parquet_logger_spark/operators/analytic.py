"""Analytic query surface beyond the reference's own operators.

The reference has no window functions, set ops, grouping sets, pivots or
percentiles (SURVEY.md §2.6 — "absent from the reference"); Spark supplies
them natively, and an engine claiming to replace the reference's read-side
analysis story (reference README.md:211-225 "Analyze token usage") needs
them first-class. Every query is pure DataFrame API — no UDFs, fully
whole-stage-codegen'd — with a value-level DuckDB oracle (since round 8
that includes the HLL sketch, rebuilt as an explicit fixed-hash HLL whose
estimate is a pure function of the data).

Scale notes per query; the common theme: one shuffle per logical
repartitioning, partial aggregation everywhere Catalyst can, window
functions only over keyed partitions (never a global ORDER BY window except
the explicitly-global decile ranking, which at 100 TB would swap to
approx quantile bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.session import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# ---------------------------------------------------------------------------
# Exact interpolated percentiles (p50/p90/p99), grouped.
# Scale: F.percentile is a JVM sort-based exact aggregate with partial
# merge; for 100 TB switch to approx_percentile (t-digest) — same shape.
# ---------------------------------------------------------------------------
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pcts = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return events.groupBy("event_type").agg(
        F.round(F.element_at(pcts, 1), 6).alias("p50"),
        F.round(F.element_at(pcts, 2), 6).alias("p90"),
        F.round(F.element_at(pcts, 3), 6).alias("p99"),
        F.count("*").alias("n"),
    )


ORACLE_PERCENTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Pivot: long → wide event counts per user. Values are enumerated
# explicitly — an implicit pivot would scan once just to discover them.
# Scale: single hash aggregate; output width fixed by the value list.
# ---------------------------------------------------------------------------
def q_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    )


ORACLE_EVENT_PIVOT = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# CUBE: all 2^2 grouping sets in ONE pass (complements q_priority_rollup's
# ROLLUP). Scale: Catalyst expands the cube to a single Expand + hash
# aggregate — one shuffle regardless of the number of grouping sets.
# ---------------------------------------------------------------------------
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


ORACLE_CUBE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines,
       round(SUM(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# GROUPING SETS: the general form behind cube/rollup — an explicit,
# non-hierarchical set list ((flag, status), (flag), (linenumber)) that neither
# CUBE nor ROLLUP can express. Same scale shape: one Expand node
# replicates each input row once per set, one shuffle, one hash
# aggregate; grouping_id() disambiguates the NULL produced by Expand
# from a NULL in the data.
# ---------------------------------------------------------------------------
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, l_linenumber,
               CAST(grouping_id(l_returnflag, l_linestatus, l_linenumber) AS BIGINT)
                   AS gid,
               COUNT(*) AS n_lines,
               round(SUM(l_extendedprice), 2) AS sum_price
        FROM li_gs
        GROUP BY GROUPING SETS (
            (l_returnflag, l_linestatus), (l_returnflag), (l_linenumber)
        )
        """
    )


ORACLE_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus, l_linenumber,
       grouping_id(l_returnflag, l_linestatus, l_linenumber) AS gid,
       COUNT(*) AS n_lines,
       round(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS (
    (l_returnflag, l_linestatus), (l_returnflag), (l_linenumber)
)
"""


# ---------------------------------------------------------------------------
# Running total: per-customer cumulative spend over order history.
# Deterministic accumulation order (date, then key) keeps the float
# cumsum bit-stable across engines. Scale: window partitioned by
# customer — shuffles once on o_custkey, linear scan per partition.
# ---------------------------------------------------------------------------
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("cum_spend"),
        F.row_number()
        .over(W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("order_seq"),
    )


ORACLE_RUNNING_TOTAL = """
SELECT o_orderkey, o_custkey,
       round(SUM(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend,
       ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
"""


# ---------------------------------------------------------------------------
# Lead/lag: inter-event gaps per user (the primitive under sessionization
# and funnel timing). Scale: one shuffle on user_id; both offsets share
# one window spec → one sort.
# ---------------------------------------------------------------------------
def q_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return events.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_prev_us"),
        (F.lead(us).over(w) - us).alias("gap_next_us"),
    )


ORACLE_LEAD_LAG = """
SELECT event_id, user_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_prev_us,
       lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_next_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# NTILE deciles of order value → per-decile stats. The global ORDER BY
# window is the honest cost here; at 100 TB the same answer comes from
# approx_percentile cutpoints + a bucketing join (no global sort).
# ---------------------------------------------------------------------------
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


ORACLE_NTILE = """
SELECT decile, COUNT(*) AS n_orders,
       round(MIN(o_totalprice), 2) AS lo,
       round(MAX(o_totalprice), 2) AS hi
FROM (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
) GROUP BY decile
"""


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT user segments (distinct semantics).
# Scale: both compile to hash aggregates + a shuffle on user_id; the two
# branches reuse the same filtered scans.
# ---------------------------------------------------------------------------
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purch = events.filter(F.col("event_type") == "purchase").select("user_id")
    err = events.filter(F.col("event_type") == "error").select("user_id")
    both = purch.intersect(err).select("user_id", F.lit("both").alias("segment"))
    only = purch.subtract(err).select(
        "user_id", F.lit("purchase_only").alias("segment")
    )
    return both.unionByName(only)


ORACLE_SET_OPS = """
SELECT user_id, 'both' AS segment FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'error')
UNION ALL
SELECT user_id, 'purchase_only' AS segment FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'error')
"""


# ---------------------------------------------------------------------------
# TPC-H Q12 shape (adapted: no shipmode column in the driver schema):
# fact⋈fact equi join + conditional aggregation by priority class.
# Scale: shuffle hash/sort-merge join on orderkey; the CASE aggregates
# fold into one pass with partial aggregation.
# ---------------------------------------------------------------------------
def q_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


ORACLE_PRIORITY_CLASS = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
       round(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# HLL sketch: approximate distinct users per event type, built as an
# EXPLICIT HyperLogLog over the shared md5-based hash60 rather than
# `approx_count_distinct` — the built-in's HLL++ estimate is
# implementation-defined (Spark vs DuckDB disagree by design), which
# for rounds 1-7 made this the registry's only rows-only entry. The
# explicit sketch is a pure function of the data, so both engines
# produce the IDENTICAL estimate and the query carries a full value
# oracle like its KMV/CMS siblings below.
#
# Construction (classic Flajolet HLL, m = 2^9 = 512 registers):
#   idx  = low 9 hash bits;  w = remaining 51 bits
#   rho  = (trailing zeros of w) + 1, capped 52 at w = 0 — computed as
#          bit_count((w & -w) - 1) + 1, a pure-integer expression with
#          the same geometric(1/2) distribution as the leading-zero
#          rank (Flajolet-Martin's least-significant-1 form)
#   M_j  = max rho per register;  Σ 2^(-M_j) is carried as the EXACT
#          integer Σ 2^(52 - M_j) (≤ 512·2^52 < 2^63, no overflow and
#          no combine-order float nondeterminism)
#   E    = α·m²·2^52 / S, with the standard linear-counting fallback
#          m·ln(m/V) when E ≤ 2.5m and V (empty registers) > 0
#
# Scale: register build = one hash aggregate on (event_type, idx) —
# 512 rows per group, the mergeable partial-sketch union production HLL
# relies on; no raw-value shuffle. The exact COUNT(DISTINCT) leg exists
# for calibration only (at 100 TB the sketch runs precisely to avoid
# it); rel_err makes the sketch's accuracy a graded value.
# ---------------------------------------------------------------------------

HLL_P = 9
HLL_M = 1 << HLL_P  # 512 registers → rsd ≈ 1.04/√512 ≈ 4.6%
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# numerator of the raw estimate α·m²·2^52 (S carries the 2^52 scaling)
_HLL_C = _HLL_ALPHA * HLL_M * HLL_M * float(1 << 52)


def q_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import hash60

    events = load_table(spark, sf_dir, "events")
    h = hash60(F.concat(F.lit("hll:"), F.col("user_id").cast("string")))
    reg = events.select("event_type", h.alias("h")).select(
        "event_type",
        (F.col("h") % HLL_M).alias("idx"),
        F.expr(
            f"CASE WHEN h div {HLL_M} = 0 THEN 52 "
            f"ELSE bit_count(((h div {HLL_M}) & -(h div {HLL_M})) - 1) + 1 "
            f"END"
        ).alias("rho"),
    )
    regs = reg.groupBy("event_type", "idx").agg(F.max("rho").alias("m_j"))
    sk = regs.groupBy("event_type").agg(
        F.count("*").alias("m_present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 52 - m_j)")).alias(
            "s_present"
        ),
    )
    v = F.lit(HLL_M) - F.col("m_present")  # occupied registers have M_j ≥ 1
    s = F.col("s_present") + v * F.lit(1 << 52)
    raw = F.lit(_HLL_C) / s
    # libm assumption (the registry's one cross-engine float dependency
    # beyond plain IEEE division): the linear-counting branch evaluates
    # ln(m/v) via Spark's java.lang.Math.log vs DuckDB's libm log.  Both
    # are correctly-rounded-to-≤1ulp on this argument range (m/v ∈
    # (1, 512]); an estimate landing within 1 ulp of a 2dp/6dp rounding
    # boundary could in principle flip est_users/rel_err between engines.
    # Accepted: the branch only fires at raw ≤ 2.5m (tiny cohorts), the
    # fixtures sit nowhere near a boundary, and the alternative (a
    # fixed-point integer ln) would obscure the textbook estimator shape.
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(raw)
    ex = events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return sk.join(ex, "event_type").select(
        "event_type",
        "n_events",
        "exact_users",
        F.round(est, 2).alias("est_users"),
        F.round(F.abs(est - F.col("exact_users")) / F.col("exact_users"), 6)
        .alias("rel_err"),
    )


def _oracle_hll_users() -> str:
    from .dedup import _hash60_sql

    hsql = _hash60_sql("'hll:' || CAST(user_id AS VARCHAR)")
    est = (
        f"CASE WHEN ({_HLL_C!r} / s) <= {2.5 * HLL_M!r} AND v > 0 "
        f"THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v) "
        f"ELSE {_HLL_C!r} / s END"
    )
    return f"""
WITH reg AS (
  SELECT event_type, h % {HLL_M} AS idx,
         CASE WHEN h // {HLL_M} = 0 THEN 52
              ELSE bit_count(((h // {HLL_M}) & -(h // {HLL_M})) - 1) + 1
         END AS rho
  FROM (SELECT event_type, {hsql} AS h FROM events)
),
regs AS (SELECT event_type, idx, MAX(rho) AS m_j FROM reg GROUP BY 1, 2),
sk AS (
  SELECT event_type, COUNT(*) AS m_present,
         CAST(SUM(1::BIGINT << (52 - m_j)) AS BIGINT) AS s_present
  FROM regs GROUP BY 1
),
scored AS (
  SELECT event_type,
         ({HLL_M} - m_present) AS v,
         s_present + ({HLL_M} - m_present) * (1::BIGINT << 52) AS s
  FROM sk
),
ex AS (
  SELECT event_type, COUNT(*) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY 1
)
SELECT ex.event_type, ex.n_events, ex.exact_users,
       round({est}, 2) AS est_users,
       round(abs(({est}) - exact_users) / exact_users, 6) AS rel_err
FROM scored JOIN ex ON scored.event_type = ex.event_type
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the VALUE-CHECKABLE sketch:
# unlike HLL (whose estimate is implementation-defined, see q_hll_users),
# the KMV estimate (k-1)/v_k is a pure function of the hash function and
# the data, so Spark and DuckDB produce the IDENTICAL estimate from the
# shared md5-based hash60 — a cardinality sketch with a full value
# oracle, plus its own calibration (relative error vs exact count).
#
# Scale: the k smallest distinct hashes are a TakeOrderedAndProject —
# per-partition k-heaps merged on the driver, never a global sort; the
# partial heaps merge associatively exactly like production KMV sketch
# unions. The exact COUNT(DISTINCT) leg exists for calibration (at
# 100 TB you run the sketch precisely to avoid it).
# ---------------------------------------------------------------------------

KMV_K = 256
_TWO_POW_60 = float(1 << 60)


def q_kmv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import hash60

    events = load_table(spark, sf_dir, "events")
    h = hash60(F.concat(F.lit("user:"), F.col("user_id").cast("string")))
    hashes = events.select(h.alias("h")).distinct()
    sk = hashes.orderBy("h").limit(KMV_K).agg(
        F.max("h").alias("vk"), F.count("*").alias("m")
    )
    exact = events.agg(F.countDistinct("user_id").alias("n_exact"))
    est = F.when(F.col("m") < KMV_K, F.col("m").cast("double")).otherwise(
        F.lit(float(KMV_K - 1)) * F.lit(_TWO_POW_60) / F.col("vk")
    )
    return sk.crossJoin(exact).select(  # both sides are single rows
        F.lit(KMV_K).alias("k"),
        "n_exact",
        F.round(est, 2).alias("est_distinct"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_err"
        ),
    )


def _oracle_kmv_users() -> str:
    from .dedup import _hash60_sql

    hsql = _hash60_sql("'user:' || CAST(user_id AS VARCHAR)")
    est = (
        f"CASE WHEN m < {KMV_K} THEN m::DOUBLE "
        f"ELSE ({float(KMV_K - 1)!r} * {_TWO_POW_60!r}) / vk END"
    )
    return f"""
WITH h AS (SELECT DISTINCT {hsql} AS h FROM events),
tk AS (SELECT h FROM h ORDER BY h LIMIT {KMV_K}),
sk AS (SELECT MAX(h) AS vk, COUNT(*) AS m FROM tk),
ex AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact FROM events)
SELECT {KMV_K} AS k, n_exact,
       round({est}, 2) AS est_distinct,
       round(abs(({est}) - n_exact) / n_exact, 6) AS rel_err
FROM sk, ex
"""


# ---------------------------------------------------------------------------
# Count-Min heavy hitters — the third mergeable sketch, again with a
# FULL value oracle: a d×w Count-Min sketch built from the shared
# md5-based hash60 is a pure function of the data, so both engines
# produce identical bucket counts and identical estimates. The query
# reports, for the exact top-K words, the CMS estimate beside the true
# count — the calibration that tells a 100 TB pipeline how much
# overestimate its chosen (d, w) costs before it replaces exact
# counting with the sketch.
#
# Scale: the token explode ×d is linear; the sketch is a bounded
# d·w-row table (4×1024 here) — the legitimate-broadcast case — and the
# exact leg exists only for calibration. Sketch rows merge additively
# across partitions/batches, the production union.
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 1024  # buckets per row
CMS_TOP = 20


def _cms_bucket(word, i):
    from .dedup import hash60

    return (
        hash60(F.concat(F.lit("cms"), i.cast("string"), F.lit(":"), word))
        % CMS_W
    )


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.session import spread
    from .text import words_col

    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select(F.explode(words_col(F.col("text"))).alias("word"))
    exact = tok.groupBy("word").agg(F.count("*").alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), F.asc("word")).limit(CMS_TOP)
    rows_i = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("i")
    bucketed = tok.select("word", rows_i).select(
        "i", _cms_bucket(F.col("word"), F.col("i")).alias("bucket")
    )
    sketch = bucketed.groupBy("i", "bucket").agg(F.count("*").alias("cnt"))
    cand = top.select("word", "exact_cnt", rows_i).withColumn(
        "bucket", _cms_bucket(F.col("word"), F.col("i"))
    )
    return (
        # the sketch is d·w rows, bounded by construction: broadcast
        cand.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("word", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
        .select(
            "word",
            "exact_cnt",
            "est_cnt",
            F.round(F.col("est_cnt") / F.col("exact_cnt"), 6).alias("inflation"),
        )
    )


def _oracle_cms_heavy_hitters() -> str:
    from .dedup import _hash60_sql

    bucket = _hash60_sql("'cms' || CAST(i AS VARCHAR) || ':' || word")
    return f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
exact AS (SELECT word, COUNT(*) AS exact_cnt FROM tok GROUP BY 1),
top AS (
  SELECT word, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, word ASC LIMIT {CMS_TOP}
),
rows_i AS (SELECT unnest(range(0, {CMS_D})) AS i),
bucketed AS (
  SELECT i, {bucket} % {CMS_W} AS bucket FROM tok CROSS JOIN rows_i
),
sketch AS (SELECT i, bucket, COUNT(*) AS cnt FROM bucketed GROUP BY 1, 2),
cand AS (
  SELECT word, exact_cnt, i, {bucket} % {CMS_W} AS bucket
  FROM top CROSS JOIN rows_i
)
SELECT c.word, c.exact_cnt, MIN(s.cnt) AS est_cnt,
       round(MIN(s.cnt) / c.exact_cnt, 6) AS inflation
FROM cand c JOIN sketch s ON c.i = s.i AND c.bucket = s.bucket
GROUP BY c.word, c.exact_cnt
"""


# ---------------------------------------------------------------------------
# Sketch-union proof — the property the 100 TB story RESTS on, graded:
# KMV sketches built per day and max-merged (union the k-min sets, re-take
# the k smallest) must yield the IDENTICAL estimate as one sketch built
# over the whole corpus, because each of the k globally-smallest distinct
# hashes is necessarily within its own day's k smallest. This is the
# associative partial-merge that lets a fleet sketch per partition/batch
# and combine without ever shuffling raw values; the query computes both
# paths, asserts equality in-process, and grades the shared estimate.
#
# Scale: per-day k-min is a rank window over the per-day DISTINCT hash
# sets (production form: per-partition k-heaps, same result); the union
# re-rank runs over ≤ k·n_days surviving rows — bounded, driver-free.
# ---------------------------------------------------------------------------
def q_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.session import cache_tracked
    from .dedup import hash60

    events = load_table(spark, sf_dir, "events")
    h = hash60(F.concat(F.lit("user:"), F.col("user_id").cast("string")))
    daily = cache_tracked(  # consumed twice: n_days count + union re-rank
        events.select(F.to_date("ts").alias("day"), h.alias("h"))
        .distinct()  # (day, h) pairs: a hash survives once per day seen
        .withColumn(
            "rk", F.row_number().over(W.partitionBy("day").orderBy("h"))
        )
        .filter(F.col("rk") <= KMV_K)
    )
    n_days = daily.select("day").distinct().count()
    merged = (
        daily.select("h").distinct().orderBy("h").limit(KMV_K).agg(
            F.max("h").alias("vk_union"), F.count("*").alias("m_union")
        )
    )
    direct = (
        events.select(h.alias("h")).distinct().orderBy("h").limit(KMV_K).agg(
            F.max("h").alias("vk_direct"), F.count("*").alias("m_direct")
        )
    )

    def _est(m, vk):
        return F.when(m < KMV_K, m.cast("double")).otherwise(
            F.lit(float(KMV_K - 1)) * F.lit(_TWO_POW_60) / vk
        )

    row = merged.crossJoin(direct).select(  # both sides single rows
        F.lit(KMV_K).alias("k"),
        F.lit(n_days).alias("n_days"),
        F.round(_est(F.col("m_union"), F.col("vk_union")), 2).alias(
            "est_union"
        ),
        F.round(_est(F.col("m_direct"), F.col("vk_direct")), 2).alias(
            "est_direct"
        ),
        (F.col("vk_union") == F.col("vk_direct")).alias("merge_exact"),
    )
    vals = row.collect()[0]  # single summary row: bounded driver fetch
    if not vals.merge_exact or vals.est_union != vals.est_direct:
        raise AssertionError(
            f"KMV union is not lossless: est_union={vals.est_union} "
            f"est_direct={vals.est_direct}"
        )
    return spark.createDataFrame([vals], row.schema)


def _oracle_sketch_union() -> str:
    from .dedup import _hash60_sql

    hsql = _hash60_sql("'user:' || CAST(user_id AS VARCHAR)")
    est_u = (
        f"CASE WHEN m_union < {KMV_K} THEN m_union::DOUBLE "
        f"ELSE ({float(KMV_K - 1)!r} * {_TWO_POW_60!r}) / vk_union END"
    )
    est_d = (
        f"CASE WHEN m_direct < {KMV_K} THEN m_direct::DOUBLE "
        f"ELSE ({float(KMV_K - 1)!r} * {_TWO_POW_60!r}) / vk_direct END"
    )
    return f"""
WITH dh AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, {hsql} AS h FROM events
),
daily AS (
  SELECT day, h,
         row_number() OVER (PARTITION BY day ORDER BY h) AS rk
  FROM dh
),
survivors AS (SELECT DISTINCT h FROM daily WHERE rk <= {KMV_K}),
merged AS (
  SELECT MAX(h) AS vk_union, COUNT(*) AS m_union
  FROM (SELECT h FROM survivors ORDER BY h LIMIT {KMV_K}) t
),
direct AS (
  SELECT MAX(h) AS vk_direct, COUNT(*) AS m_direct
  FROM (SELECT DISTINCT {hsql} AS h FROM events ORDER BY 1 LIMIT {KMV_K}) t
),
days AS (SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days FROM events)
SELECT {KMV_K} AS k, CAST(n_days AS INT) AS n_days,
       round({est_u}, 2) AS est_union,
       round({est_d}, 2) AS est_direct,
       vk_union = vk_direct AS merge_exact
FROM merged, direct, days
"""


# ---------------------------------------------------------------------------
# Robust outlier detection (median / MAD / modified z-score) per event
# type — the data-quality screen a value column gets before training
# statistics trust it; mean/stddev-based z-scores (q_anomaly_zscore) are
# themselves dragged by the outliers they hunt, MAD is not.
#
# Exactness: values quantize to 1e-6 fixed point, then BOTH medians come
# from the COUNTING form — per-(type, value) counts, one cumulative-count
# window over the DISTINCT-value rows, interpolated median read off the
# two middle ranks — carried as exact integers (med2 = 2·median of
# v_ppm, mad4 = 4·MAD) so the modified z-score threshold
# 0.6745·|v-med|/MAD > 3.5 becomes the pure-integer predicate
# 13490·dev2 > 35000·mad4. The DuckDB oracle states the same quantities
# via plain median() — the cross-engine agreement proves the counting
# form IS the interpolated median.
#
# Scale: medians-by-counting shuffle (type, value)-COUNT rows, never raw
# rows — the exact-median analogue of a low-cardinality GROUP BY; the
# cumulative windows run over distinct-value rows only. Per-type stats
# are a bounded dim (event-type enum), broadcast back for the outlier
# count. Worst case (all values distinct) degenerates to the per-type
# sort any exact median needs — at which point production switches to
# approx_percentile, same plan shape.
# ---------------------------------------------------------------------------

MAD_Z_NUM = 13490  # 2 × 6745: modified z-score 0.6745·dev/MAD, dev = dev2/2
MAD_Z_DEN = 35000  # 4 × 8750: threshold 3.5, MAD = mad4/4


def _median2_from_counts(counts: DataFrame, key: str, vcol: str) -> DataFrame:
    """(key, med2, n): 2× the interpolated median of `vcol` weighted by
    count column `c`, as an exact BIGINT (sum of the two middle-rank
    values), via one cumulative window over the distinct-value rows."""
    x = counts.withColumn(
        "cum", F.sum("c").over(W.partitionBy(key).orderBy(vcol))
    ).withColumn("n", F.sum("c").over(W.partitionBy(key)))
    lo = F.col(vcol).cast("long")
    return (
        x.groupBy(key)
        .agg(
            F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), lo)).alias(
                "v_lo"
            ),
            F.min(F.when(F.col("cum") >= F.expr("(n + 2) div 2"), lo)).alias(
                "v_hi"
            ),
            F.max("n").alias("n"),
        )
        .select(key, (F.col("v_lo") + F.col("v_hi")).alias("med2"), "n")
    )


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.session import cache_tracked

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 1e6) AS BIGINT)").alias("v"),
    ).filter(F.col("v").isNotNull())
    vc = ev.groupBy("event_type", "v").agg(F.count("*").alias("c"))
    med = _median2_from_counts(vc, "event_type", "v")
    # Per-type stats are bounded by the event-type enum: broadcast. The
    # outlier count comes from the DISTINCT-deviation count table `dc`
    # (sum of counts under the predicate), never a third pass over raw
    # rows; n/med2 ride along so no subtree is re-consumed (each extra
    # consumer of a derived frame re-executes its whole subtree — this
    # shape scans events exactly twice, the honest exact-MAD cost).
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "n",
        "med2",
        F.abs(F.lit(2) * F.col("v") - F.col("med2")).alias("dev2"),
    )
    dc = cache_tracked(  # consumed twice: the MAD median and the verdict
        dev.groupBy("event_type", "dev2").agg(
            F.count("*").alias("c"),
            F.max("n").alias("n"),
            F.max("med2").alias("med2"),
        )
    )
    mad = _median2_from_counts(
        dc.select("event_type", "dev2", "c"), "event_type", "dev2"
    ).select("event_type", F.col("med2").alias("mad4"))
    out = (
        dc.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            F.max("med2").alias("med2"),
            F.max("mad4").alias("mad4"),
            F.sum(
                F.when(
                    F.lit(MAD_Z_NUM) * F.col("dev2")
                    > F.lit(MAD_Z_DEN) * F.col("mad4"),
                    F.col("c"),
                ).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
    )
    return out.select(
        "event_type",
        "n_events",
        F.round(F.col("med2") / F.lit(2000000.0), 6).alias("median_value"),
        F.round(F.col("mad4") / F.lit(4000000.0), 6).alias("mad"),
        "n_outliers",
        F.expr("(1000000 * n_outliers) div n_events").alias("outlier_ppm"),
    )


def _oracle_mad_outliers() -> str:
    return f"""
WITH q AS (
  SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT event_type, CAST(2 * median(v) AS BIGINT) AS med2,
         COUNT(*) AS n_events
  FROM q GROUP BY 1
),
dev AS (
  SELECT q.event_type, n_events, med2, abs(2 * v - med2) AS dev2
  FROM q JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, CAST(2 * median(dev2) AS BIGINT) AS mad4
  FROM dev GROUP BY 1
)
SELECT d.event_type,
       MAX(n_events) AS n_events,
       round(MAX(med2) / 2000000.0, 6) AS median_value,
       round(MAX(mad4) / 4000000.0, 6) AS mad,
       CAST(SUM(CASE WHEN {MAD_Z_NUM} * dev2 > {MAD_Z_DEN} * mad4
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       (1000000 * CAST(SUM(CASE WHEN {MAD_Z_NUM} * dev2 > {MAD_Z_DEN} * mad4
                       THEN 1 ELSE 0 END) AS BIGINT)) // MAX(n_events)
         AS outlier_ppm
FROM dev d JOIN mad USING (event_type)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Distribution-drift detection: exact two-sample Kolmogorov–Smirnov
# statistic between the first and second half of the month, per event
# type — the distribution-level companion to q_dataset_diff's key-level
# reconcile; the test a pipeline runs before concluding "this batch's
# value distribution still looks like production". KS = max |CDF_a -
# CDF_b|, computed from per-(type, value) COHORT COUNTS: one cumulative
# window over the distinct-value rows, the sup carried as the exact
# integer |cum_a·nb - cum_b·na| (cross-multiplied so no float CDFs),
# one double division at the very end. The drift verdict compares
# against the α=0.05 two-sample critical value 1.358·√((na+nb)/(na·nb)).
#
# Scale: identical shape to q_mad_outliers — per-(type, value) hash
# aggregate, windows over distinct values only, never a raw-row
# shuffle. The exact integer cross-product holds to ~3·10^9 rows per
# side (2^63 headroom); beyond that production switches the CDF to
# fixed bins or a sampled sup, same plan.
# ---------------------------------------------------------------------------

KS_ALPHA_C_PPM = 1_358_000  # 1.358 (α = 0.05 two-sample KS) in ppm


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 1e6) AS BIGINT)").alias("v"),
        F.when(F.dayofmonth("ts") <= 15, F.lit(1))
        .otherwise(F.lit(0))
        .alias("in_a"),
    ).filter(F.col("v").isNotNull())
    counts = ev.groupBy("event_type", "v").agg(
        F.sum("in_a").alias("ca"),
        F.sum(F.lit(1) - F.col("in_a")).alias("cb"),
    )
    w = W.partitionBy("event_type").orderBy("v")
    x = (
        counts.withColumn("cum_a", F.sum("ca").over(w))
        .withColumn("cum_b", F.sum("cb").over(w))
        .withColumn("na", F.sum("ca").over(W.partitionBy("event_type")))
        .withColumn("nb", F.sum("cb").over(W.partitionBy("event_type")))
    )
    agg = x.groupBy("event_type").agg(
        F.max(
            F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na"))
        ).alias("d"),
        F.max("na").alias("n_first_half"),
        F.max("nb").alias("n_second_half"),
    )
    # One-sided guard: a type with an empty cohort has no two-sample
    # statistic (the division is 0/0 — NULL/NaN depending on engine and
    # ANSI mode), and a NULL verdict would read as "no drift" to a gate
    # consumer exactly when the check can't certify anything. Emit NULL
    # metrics but drifted = TRUE (flag for investigation) in that case.
    one_sided = (F.col("n_first_half") == 0) | (F.col("n_second_half") == 0)
    ks = F.when(
        ~one_sided,
        F.expr(
            "CAST(round(d / (CAST(n_first_half AS DOUBLE) * n_second_half)"
            " * 1e6) AS BIGINT)"
        ),
    )
    crit = F.when(
        ~one_sided,
        F.expr(
            f"CAST(round({KS_ALPHA_C_PPM} * sqrt((n_first_half +"
            f" n_second_half) / (CAST(n_first_half AS DOUBLE) *"
            f" n_second_half))) AS BIGINT)"
        ),
    )
    return agg.select(
        "event_type",
        "n_first_half",
        "n_second_half",
        ks.alias("ks_ppm"),
        crit.alias("crit_ppm"),
        F.when(one_sided, F.lit(True)).otherwise(ks > crit).alias("drifted"),
    )


ORACLE_KS_DRIFT = f"""
WITH q AS (
  SELECT event_type, CAST(round(value * 1e6) AS BIGINT) AS v,
         CASE WHEN date_part('day', ts) <= 15 THEN 1 ELSE 0 END AS in_a
  FROM events WHERE value IS NOT NULL
),
counts AS (
  SELECT event_type, v, SUM(in_a) AS ca, SUM(1 - in_a) AS cb
  FROM q GROUP BY 1, 2
),
x AS (
  SELECT event_type,
         SUM(ca) OVER (PARTITION BY event_type ORDER BY v) AS cum_a,
         SUM(cb) OVER (PARTITION BY event_type ORDER BY v) AS cum_b,
         SUM(ca) OVER (PARTITION BY event_type) AS na,
         SUM(cb) OVER (PARTITION BY event_type) AS nb
  FROM counts
),
agg AS (
  SELECT event_type,
         CAST(MAX(abs(cum_a * nb - cum_b * na)) AS BIGINT) AS d,
         CAST(MAX(na) AS BIGINT) AS n_first_half,
         CAST(MAX(nb) AS BIGINT) AS n_second_half
  FROM x GROUP BY 1
)
SELECT event_type, n_first_half, n_second_half,
       CASE WHEN n_first_half = 0 OR n_second_half = 0 THEN NULL
            ELSE CAST(round(d / (CAST(n_first_half AS DOUBLE)
                 * n_second_half) * 1e6) AS BIGINT) END AS ks_ppm,
       CASE WHEN n_first_half = 0 OR n_second_half = 0 THEN NULL
            ELSE CAST(round({KS_ALPHA_C_PPM} * sqrt((n_first_half
                 + n_second_half) / (CAST(n_first_half AS DOUBLE)
                 * n_second_half))) AS BIGINT) END AS crit_ppm,
       CASE WHEN n_first_half = 0 OR n_second_half = 0 THEN TRUE
            ELSE CAST(round(d / (CAST(n_first_half AS DOUBLE)
                 * n_second_half) * 1e6) AS BIGINT)
                 > CAST(round({KS_ALPHA_C_PPM} * sqrt((n_first_half
                 + n_second_half) / (CAST(n_first_half AS DOUBLE)
                 * n_second_half))) AS BIGINT) END AS drifted
FROM agg
"""


# ---------------------------------------------------------------------------
# Funnel: view → click → purchase, strictly ordered per user. Each stage
# is "earliest qualifying event after the previous stage's time" — a
# conditional min aggregate, NOT a pattern-match UDF. Scale: three hash
# aggregates on user_id that reuse one partitioning. The per-stage time
# tables (s1/s2) are one-row-per-USER frames — their cardinality grows
# with the corpus, so they must NOT carry a hard broadcast hint (at 100×
# event scale a forced broadcast of tens of millions of users OOMs the
# driver). AQE picks broadcast at small SF and sort-merge/shuffled-hash
# at scale; all three joins/aggs share the user_id partitioning so the
# shuffle is reused.
# ---------------------------------------------------------------------------
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s1 = events.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    s2 = (
        events.join(s1, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.join(s2, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    totals = events.select(F.countDistinct("user_id").alias("n_users"))
    return (
        totals.crossJoin(s1.select(F.count("*").alias("n_viewed")))
        .crossJoin(s2.select(F.count("*").alias("n_clicked")))
        .crossJoin(s3.select(F.count("*").alias("n_purchased")))
    )


ORACLE_FUNNEL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
       (SELECT COUNT(*) FROM s1) AS n_viewed,
       (SELECT COUNT(*) FROM s2) AS n_clicked,
       (SELECT COUNT(*) FROM s3) AS n_purchased
"""


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-seen date; day-1/day-7 return
# rates. Scale: the (user, day) activity table is a distinct aggregate on
# user_id+date; the cohort assignment is a min aggregate on the same
# user_id partitioning; the final rollup is tiny (one row per cohort
# day). No window over the whole history, no self-join on raw events.
# ---------------------------------------------------------------------------
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    user_days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    cohorts = user_days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = user_days.join(cohorts, "user_id").select(
        "user_id",
        "cohort_day",
        F.datediff(F.col("day"), F.col("cohort_day")).alias("age"),
    )
    return joined.groupBy("cohort_day").agg(
        F.countDistinct("user_id").alias("cohort_size"),
        F.countDistinct(F.when(F.col("age") == 1, F.col("user_id"))).alias(
            "retained_d1"
        ),
        F.countDistinct(F.when(F.col("age") == 7, F.col("user_id"))).alias(
            "retained_d7"
        ),
    )


ORACLE_COHORT_RETENTION = """
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
cohorts AS (
  SELECT user_id, MIN(day) AS cohort_day FROM user_days GROUP BY user_id
),
aged AS (
  SELECT u.user_id, c.cohort_day, u.day - c.cohort_day AS age
  FROM user_days u JOIN cohorts c ON u.user_id = c.user_id
)
SELECT cohort_day,
       COUNT(DISTINCT user_id) AS cohort_size,
       COUNT(DISTINCT CASE WHEN age = 1 THEN user_id END) AS retained_d1,
       COUNT(DISTINCT CASE WHEN age = 7 THEN user_id END) AS retained_d7
FROM aged GROUP BY cohort_day
"""


# ---------------------------------------------------------------------------
# Z-score anomaly counts: two-pass mean/stddev then threshold — the cheap
# outlier screen a pipeline runs before expensive per-row scoring. Scale:
# first pass is a tiny per-type aggregate that broadcasts back; second
# pass is scan-side arithmetic. stddev_samp is the same two-moment
# formula in both engines; comparisons sit far from float boundaries for
# continuous data.
# ---------------------------------------------------------------------------
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count_if(
                F.abs(F.col("value") - F.col("mu")) > 2 * F.col("sigma")
            ).alias("n_outliers"),
            F.round(F.max(F.abs(F.col("value") - F.col("mu")) / F.col("sigma")), 6)
            .alias("max_z"),
        )
    )


ORACLE_ANOMALY_ZSCORE = """
WITH stats AS (
  SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_type, COUNT(*) AS n,
       COUNT(*) FILTER (WHERE ABS(e.value - s.mu) > 2 * s.sigma) AS n_outliers,
       round(MAX(ABS(e.value - s.mu) / s.sigma), 6) AS max_z
FROM events e JOIN stats s ON e.event_type = s.event_type
GROUP BY e.event_type
"""


# ---------------------------------------------------------------------------
# Histogram: fixed-width bins over [0, 600), overflow clamped into the
# last bin. The bucket expression is the identical floor arithmetic in
# both engines (DuckDB has no width_bucket), so bucketing is exactly
# reproducible. Scale: one two-phase hash aggregate on (type, bucket);
# bin count bounds the output, not the data.
# ---------------------------------------------------------------------------
HIST_BINS = 12
HIST_WIDTH = 50.0


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.floor(F.col("value") / F.lit(HIST_WIDTH)).cast("bigint"),
        F.lit(HIST_BINS - 1),
    )
    return (
        events.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count("*").alias("n"), F.round(F.min("value"), 6).alias("lo"),
             F.round(F.max("value"), 6).alias("hi"))
        .orderBy("event_type", "bucket")
    )


ORACLE_VALUE_HISTOGRAM = f"""
SELECT event_type,
       least(floor(value / {HIST_WIDTH})::BIGINT, {HIST_BINS - 1}) AS bucket,
       COUNT(*) AS n,
       round(MIN(value), 6) AS lo,
       round(MAX(value), 6) AS hi
FROM events GROUP BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# Gaps & islands: maximal runs of the same event_type per user via the
# two-row_number difference trick — run id = rn_overall − rn_within_type,
# constant exactly while the type repeats. Scale: the user_id exchange
# satisfies BOTH window partitionings (user_id ⊆ (user_id, event_type)),
# so the plan is one shuffle + two in-partition sorts, then a two-phase
# rollup on the run key.
# ---------------------------------------------------------------------------
def q_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = events.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    per_run = runs.groupBy("user_id", "event_type", "grp").agg(
        F.count("*").alias("run_len")
    )
    return per_run.groupBy("user_id").agg(
        F.count("*").alias("n_runs"),
        F.max("run_len").alias("longest_run"),
    )


ORACLE_EVENT_RUNS = """
WITH runs AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS grp
  FROM events
),
per_run AS (
  SELECT user_id, event_type, grp, COUNT(*) AS run_len
  FROM runs GROUP BY user_id, event_type, grp
)
SELECT user_id, COUNT(*) AS n_runs, MAX(run_len) AS longest_run
FROM per_run GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Bitmap-index distinct counting — the Druid/ClickHouse groupBitmap
# technique: pack each group's user-id SET into fixed-width bit words
# (word w holds users [32w, 32w+32)), OR the words per group, and read
# the EXACT distinct count off popcounts. Unlike the sketch family
# (q_hll_users/q_kmv_users) this is exact AND mergeable: daily word
# tables OR together into weekly/monthly rollups without rescanning raw
# events — the classic pre-aggregated distinct-count serving layer.
#
# Scale design: two stacked hash aggregates, both map-side combinable —
# (event_type, day, bucket)→bit_or is the only corpus-cardinality
# shuffle and its output is bounded by |users|/32 words per group; the
# popcount rollup is sublinear. The calibration join against the exact
# COUNT(DISTINCT) runs on the same (event_type, day) key (exchange
# reuse); at production scale the calibration leg is dropped and ONLY
# the word table persists. 32-bit words inside BIGINTs keep every value
# positive, so Java and DuckDB shift/popcount semantics agree exactly.
# Reference has no aggregation surface at all (SURVEY §2.4); this is
# north-star surface for the serving layer.
# ---------------------------------------------------------------------------

BITMAP_WORD_BITS = 32


def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per (event_type, day) via a 32-bit bitmap
    word table, with the bitmap count calibrated against the exact
    distinct aggregate (equal by construction — the proof the bitmap
    layer can replace the raw scan)."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_type",
        F.to_date("ts").alias("day"),
        "user_id",
        F.expr(f"user_id div {BITMAP_WORD_BITS}").alias("bucket"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {BITMAP_WORD_BITS} AS INT))"
        ).alias("bit"),
    )
    words = ev.groupBy("event_type", "day", "bucket").agg(
        F.bit_or("bit").alias("word")
    )
    bitmap = words.groupBy("event_type", "day").agg(
        F.sum(F.bit_count("word")).alias("n_users_bitmap"),
        F.count("*").alias("n_words"),
    )
    exact = ev.groupBy("event_type", "day").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return bitmap.join(exact, ["event_type", "day"]).select(
        "event_type",
        "day",
        "n_users_bitmap",
        "n_users_exact",
        "n_words",
        (F.col("n_users_bitmap") == F.col("n_users_exact")).alias("calibrated"),
    )


ORACLE_BITMAP_DISTINCT = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day, user_id,
         user_id // {BITMAP_WORD_BITS} AS bucket,
         (1::BIGINT << (user_id % {BITMAP_WORD_BITS})::INT) AS bit
  FROM events
),
words AS (
  SELECT event_type, day, bucket, bit_or(bit) AS word
  FROM ev GROUP BY 1, 2, 3
),
bitmap AS (
  SELECT event_type, day,
         CAST(SUM(bit_count(word)) AS BIGINT) AS n_users_bitmap,
         COUNT(*) AS n_words
  FROM words GROUP BY 1, 2
),
exact AS (
  SELECT event_type, day, COUNT(DISTINCT user_id) AS n_users_exact
  FROM ev GROUP BY 1, 2
)
SELECT b.event_type, b.day, b.n_users_bitmap, e.n_users_exact, b.n_words,
       b.n_users_bitmap = e.n_users_exact AS calibrated
FROM bitmap b JOIN exact e
  ON b.event_type = e.event_type AND b.day = e.day
"""


# ---------------------------------------------------------------------------
# Session transition matrix — the Markov "bigram model" of user behavior:
# within each gap-delimited session (q_sessionize's rule), count every
# consecutive event_type -> event_type transition, then per source type
# emit the transition count, row total, integer-ppm transition
# probability, and the rank of each destination. This is the
# next-event-prediction baseline / funnel-discovery table (which step
# follows which, with what probability) — the event-stream analogue of
# the text bigram LM (q_bigram_logprob).
#
# Scale design: ONE shuffle on user_id serves sessionization AND the
# within-session lead (the (user_id, sid) window is a refinement —
# Spark reuses the exchange and re-sorts locally); the transition rollup
# is a map-side-combinable hash aggregate onto |event_types|^2 cells,
# and the probability/rank windows run on that bounded cell frame.
# Integer-div ppm keeps the value hash exact.
# ---------------------------------------------------------------------------


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session event_type transition matrix with integer-ppm
    probabilities and per-source destination ranks."""
    from .queries import SESSION_GAP_US

    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > SESSION_GAP_US), 1
    ).otherwise(0)
    sid = F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0))
    sess = events.select("user_id", "ts", "event_id", "event_type").withColumn(
        "sid", sid
    )
    w_s = W.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    trans = sess.withColumn("to_type", F.lead("event_type").over(w_s)).filter(
        F.col("to_type").isNotNull()
    )
    cell = trans.groupBy(
        F.col("event_type").alias("from_type"), "to_type"
    ).agg(F.count("*").alias("n_transitions"))
    w_from = W.partitionBy("from_type")
    w_rank = W.partitionBy("from_type").orderBy(
        F.col("n_transitions").desc(), F.col("to_type").asc()
    )
    return (
        cell.withColumn("from_total", F.sum("n_transitions").over(w_from))
        .withColumn("rk", F.row_number().over(w_rank).cast("int"))
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            "from_total",
            F.expr("n_transitions * 1000000 div from_total").alias("prob_ppm"),
            "rk",
        )
    )


def _oracle_event_transitions() -> str:
    from .queries import SESSION_GAP_US

    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
trans AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS to_type
  FROM sess
),
cell AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM trans WHERE to_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS BIGINT)
           AS from_total,
       n_transitions * 1000000
           // CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS BIGINT)
           AS prob_ppm,
       (ROW_NUMBER() OVER (PARTITION BY from_type
                           ORDER BY n_transitions DESC, to_type ASC))::INT
           AS rk
FROM cell
"""


# ---------------------------------------------------------------------------
# Session funnel paths — the full-path complement of q_event_transitions:
# each session's first PATH_LEN event types joined into a path string,
# rolled up to (path, session count, mean session length, rank). The
# "what do users actually do" discovery table behind every designed
# funnel (q_funnel checks ONE hypothesized order; this emits the
# empirical orders ranked).
#
# Scale design: sessionization, the within-session row_number, AND the
# per-session aggregate all run off ONE shuffle on user_id (the
# (user, sid) aggregate keys are a refinement of the window partitioning,
# and collect_list(when(rn<=PATH_LEN, ...)) skips nulls, so the prefix
# and the full-session count come out of the SAME aggregate — no second
# pass, no self-join). The path rollup is a hash aggregate onto at most
# |event_types|^PATH_LEN cells — bounded by construction, as is the
# final single-partition rank window over those cells.
# ---------------------------------------------------------------------------

PATH_LEN = 4


def q_session_funnel_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked empirical session paths: first PATH_LEN event types per
    session, session counts, and integer-ppm mean session length."""
    from .queries import SESSION_GAP_US

    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > SESSION_GAP_US), 1
    ).otherwise(0)
    sid = F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0))
    sess = events.select("user_id", "ts", "event_id", "event_type").withColumn(
        "sid", sid
    )
    w_s = W.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    ranked = sess.withColumn("rn", F.row_number().over(w_s))
    per_session = ranked.groupBy("user_id", "sid").agg(
        F.count("*").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") <= PATH_LEN,
                            F.struct("rn", "event_type"),
                        )
                    )
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path"),
    )
    w_rank = W.orderBy(F.col("n_sessions").desc(), F.col("path").asc())
    return (
        per_session.groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events_total"),
        )
        .withColumn(
            "mean_len_ppm",
            F.expr("n_events_total * 1000000 div n_sessions"),
        )
        .withColumn("rk", F.row_number().over(w_rank).cast("int"))
    )


def _oracle_session_funnel_paths() -> str:
    from .queries import SESSION_GAP_US

    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
ranked AS (
  SELECT user_id, sid, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS rn
  FROM sess
),
per_session AS (
  SELECT user_id, sid, COUNT(*) AS n_events,
         array_to_string(
           list(event_type ORDER BY rn) FILTER (WHERE rn <= {PATH_LEN}),
           '>') AS path
  FROM ranked GROUP BY user_id, sid
),
rolled AS (
  SELECT path, COUNT(*) AS n_sessions,
         CAST(SUM(n_events) AS BIGINT) AS n_events_total
  FROM per_session GROUP BY path
)
SELECT path, n_sessions, n_events_total,
       n_events_total * 1000000 // n_sessions AS mean_len_ppm,
       (ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path ASC))::INT AS rk
FROM rolled
"""


# ---------------------------------------------------------------------------
# Burst detection — per-user hourly event-rate spikes against the
# trailing 7-day PEAK: flag every (user, hour) whose count reaches
# BURST_FACTOR x the user's maximum hourly count over the previous
# BURST_WINDOW_HOURS, given at least BURST_MIN_HISTORY_HOURS of
# active-hour history. Peak-relative (not average-relative) baselines
# stay meaningful on sparse streams — an average-rate rule degenerates
# when most active hours hold a single event (measured on the fixture:
# a 3x-average rule flagged 8401/8402 eligible buckets; this rule flags
# ~2.6%). The ops-monitoring read of the log (a runaway agent loop, a
# stuck retry storm) and the rate-anomaly complement of
# q_anomaly_zscore's value anomalies.
#
# Scale design: one hash aggregate onto (user, epoch-hour) buckets
# (map-side combinable — the only corpus-cardinality shuffle), then two
# aggregates over ONE RANGE window on integer epoch-hours inside the
# same user partition (no second shuffle). The flag predicate is pure
# integer arithmetic, so both engines agree exactly; cold-start hours
# are not flaggable. Output cardinality depends on the detection, so
# count() cannot prune the window.
# ---------------------------------------------------------------------------

BURST_FACTOR = 2
BURST_WINDOW_HOURS = 168
BURST_MIN_HISTORY_HOURS = 5


def q_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagged (user, hour) buckets whose event count reaches
    BURST_FACTOR x the trailing 7-day hourly peak (with minimum
    history); integer-ppm peak ratio."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.select(
        "user_id",
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
    ).groupBy("user_id", "h").agg(F.count("*").alias("cnt"))
    w_trail = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rangeBetween(-BURST_WINDOW_HOURS, -1)
    )
    trailed = hourly.withColumn(
        "trailing_peak", F.max("cnt").over(w_trail)
    ).withColumn("n_history_hours", F.count("*").over(w_trail))
    return (
        trailed.filter(
            (F.col("n_history_hours") >= BURST_MIN_HISTORY_HOURS)
            & (F.col("cnt") >= BURST_FACTOR * F.col("trailing_peak"))
        )
        .select(
            "user_id",
            (F.col("h") * 3_600_000_000).alias("hour_us"),
            "cnt",
            "trailing_peak",
            "n_history_hours",
            F.expr("cnt * 1000000 div trailing_peak").alias("peak_ratio_ppm"),
        )
    )


ORACLE_BURST_DETECTION = f"""
WITH hourly AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS h, COUNT(*) AS cnt
  FROM events GROUP BY user_id, h
),
trailed AS (
  SELECT user_id, h, cnt,
         MAX(cnt) OVER w AS trailing_peak,
         COUNT(*) OVER w AS n_history_hours
  FROM hourly
  WINDOW w AS (PARTITION BY user_id ORDER BY h
               RANGE BETWEEN {BURST_WINDOW_HOURS} PRECEDING
                     AND 1 PRECEDING)
)
SELECT user_id, h * 3600000000 AS hour_us, cnt, trailing_peak,
       n_history_hours,
       cnt * 1000000 // trailing_peak AS peak_ratio_ppm
FROM trailed
WHERE n_history_hours >= {BURST_MIN_HISTORY_HOURS}
  AND cnt >= {BURST_FACTOR} * trailing_peak
"""


QUERIES = {
    "q_percentiles": q_percentiles,
    "q_event_pivot": q_event_pivot,
    "q_cube": q_cube,
    "q_grouping_sets": q_grouping_sets,
    "q_running_total": q_running_total,
    "q_lead_lag": q_lead_lag,
    "q_ntile": q_ntile,
    "q_set_ops": q_set_ops,
    "q_funnel": q_funnel,
    "q_cohort_retention": q_cohort_retention,
    "q_anomaly_zscore": q_anomaly_zscore,
    "q_value_histogram": q_value_histogram,
    "q_event_runs": q_event_runs,
    "q_priority_class": q_priority_class,
    "q_hll_users": q_hll_users,
    "q_kmv_users": q_kmv_users,
    "q_sketch_union": q_sketch_union,
    "q_mad_outliers": q_mad_outliers,
    "q_ks_drift": q_ks_drift,
    "q_cms_heavy_hitters": q_cms_heavy_hitters,
    "q_bitmap_distinct": q_bitmap_distinct,
    "q_event_transitions": q_event_transitions,
    "q_session_funnel_paths": q_session_funnel_paths,
    "q_burst_detection": q_burst_detection,
}

ORACLES = {
    "q_percentiles": ORACLE_PERCENTILES,
    "q_event_pivot": ORACLE_EVENT_PIVOT,
    "q_cube": ORACLE_CUBE,
    "q_grouping_sets": ORACLE_GROUPING_SETS,
    "q_running_total": ORACLE_RUNNING_TOTAL,
    "q_lead_lag": ORACLE_LEAD_LAG,
    "q_ntile": ORACLE_NTILE,
    "q_set_ops": ORACLE_SET_OPS,
    "q_funnel": ORACLE_FUNNEL,
    "q_cohort_retention": ORACLE_COHORT_RETENTION,
    "q_anomaly_zscore": ORACLE_ANOMALY_ZSCORE,
    "q_value_histogram": ORACLE_VALUE_HISTOGRAM,
    "q_event_runs": ORACLE_EVENT_RUNS,
    "q_priority_class": ORACLE_PRIORITY_CLASS,
    # Full value oracle since round 8: the explicit fixed-hash HLL is a
    # pure function of the data, unlike the approx_count_distinct HLL++
    # it replaced (whose estimate was implementation-defined and kept
    # this entry rows-only for rounds 1-7).
    "q_hll_users": _oracle_hll_users(),
    "q_kmv_users": _oracle_kmv_users(),
    "q_sketch_union": _oracle_sketch_union(),
    "q_mad_outliers": _oracle_mad_outliers(),
    "q_ks_drift": ORACLE_KS_DRIFT,
    "q_cms_heavy_hitters": _oracle_cms_heavy_hitters(),
    "q_bitmap_distinct": ORACLE_BITMAP_DISTINCT,
    "q_event_transitions": _oracle_event_transitions(),
    "q_session_funnel_paths": _oracle_session_funnel_paths(),
    "q_burst_detection": ORACLE_BURST_DETECTION,
}
