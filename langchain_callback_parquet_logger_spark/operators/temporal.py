"""Temporal join operators: as-of join and banded range join.

The reference has no join surface at all (SURVEY.md §2.5 — its only
join-shaped op is the checkpoint anti-join, `background_retrieval.py:133-144`),
but event-log analytics at scale constantly needs time-travel joins:
"attach the most recent X before this event" (as-of) and "count/collect
the Y within a time window around this event" (range). Spark has no
native as-of or range join, so both are re-expressed as shuffle-friendly
compositions of equi-joins and windows — never a cross/theta join.

Scale design:

- **As-of join** (`q_asof_join`): the union-and-carry-forward plan.
  Tag right rows 0 and left rows 1, union, then one window
  ``last(match, ignorenulls=True) OVER (PARTITION BY key ORDER BY ts, side)``
  carries the latest right-side payload onto every left row. Cost: ONE
  shuffle on the join key + a linear in-partition scan. No pairwise
  blowup, no per-row probe; skew on the key is AQE-splittable. This is
  how you as-of join two 100 TB tables.

- **Banded range join** (`q_range_join_banded`): the bucketing technique
  that turns a theta join into an equi join. Each right row is exploded
  into its time bucket and the next one; each left row probes exactly its
  own bucket, so every in-window pair co-locates under one (key, bucket)
  hash key, then the exact interval predicate filters within the bucket
  pair. Cost: one equi shuffle join with 2× fan-out of the right side —
  versus Spark's default BroadcastNestedLoopJoin for inequality joins,
  which is O(|L|·|R|) and undeployable at scale.

Determinism: the right side is pre-deduplicated to one row per
(key, ts) (keep max event_id), so at-equal-timestamp matches are exact
and the DuckDB oracle is value-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.session import cache_tracked, load_table

ASOF_LEFT_TYPE = "purchase"
ASOF_RIGHT_TYPE = "click"
RANGE_LEFT_TYPE = "error"
RANGE_WINDOW_US = 3600 * 1_000_000  # 1 hour, microseconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Generic as-of join: every ``left`` row gains the payload of the
    latest ``right`` row with ``right.ts <= left.ts`` for the same key
    (left rows with no prior right row keep nulls).

    ``right`` must already be unique per (on, ts); callers dedup first.
    Returns left's columns plus ``matched`` (struct of payload_cols) and
    relies on the single-shuffle union+window plan described above.
    """
    payload_cols = payload_cols or [c for c in right.columns if c not in (on, ts)]
    match = F.struct(
        F.col(ts).alias("_ts"), *[F.col(c) for c in payload_cols]
    ).alias("matched")
    match_type = right.select(match).schema["matched"].dataType.simpleString()

    left_cols = [c for c in left.columns if c not in (on, ts)]
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        match,
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
    )
    l = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(match_type).alias("matched"),
        *left_cols,
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        r.unionByName(l)
        .withColumn("matched", F.last("matched", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase event → most recent click (same user, at-or-before),
    with the match's event_id and the exact gap in microseconds."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == ASOF_LEFT_TYPE).select(
        "user_id", "ts", "event_id"
    )
    clicks = (
        events.filter(F.col("event_type") == ASOF_RIGHT_TYPE)
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    joined = asof_join(purchases, clicks, on="user_id")
    return joined.select(
        "event_id",
        "user_id",
        F.col("matched.click_event_id").alias("matched_click_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("matched._ts"))).alias(
            "gap_us"
        ),
    )


ORACLE_ASOF_JOIN = f"""
WITH clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_event_id
  FROM events WHERE event_type = '{ASOF_RIGHT_TYPE}' GROUP BY 1, 2
),
purch AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = '{ASOF_LEFT_TYPE}'
)
SELECT p.event_id, p.user_id, c.click_event_id AS matched_click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM purch p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: how many clicks by the same user in the hour up to
    (and including) the error. Banded-bucket equi join, exact predicate
    applied inside the bucket pair."""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == RANGE_LEFT_TYPE).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("e_us"),
        (F.unix_micros("ts") / F.lit(RANGE_WINDOW_US)).cast("bigint").alias("bucket"),
    )
    # Each click lands in its own bucket and the next: any left row whose
    # 1h-trailing window covers the click probes one of the two.
    clicks = (
        events.filter(F.col("event_type") == ASOF_RIGHT_TYPE)
        .select(
            "user_id",
            F.unix_micros("ts").alias("c_us"),
            (F.unix_micros("ts") / F.lit(RANGE_WINDOW_US)).cast("bigint").alias("b"),
        )
        .select(
            "user_id",
            "c_us",
            F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("bucket"),
        )
    )
    in_window = (F.col("c_us") <= F.col("e_us")) & (
        F.col("c_us") >= F.col("e_us") - RANGE_WINDOW_US
    )
    return (
        errors.join(clicks, ["user_id", "bucket"], "left")
        .groupBy("event_id", "user_id")
        .agg(F.count(F.when(in_window, 1)).alias("n_recent_clicks"))
    )


ORACLE_RANGE_JOIN = f"""
WITH err AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = '{RANGE_LEFT_TYPE}'
),
cl AS (
  SELECT user_id, ts FROM events WHERE event_type = '{ASOF_RIGHT_TYPE}'
)
SELECT e.event_id, e.user_id, COUNT(c.ts) AS n_recent_clicks
FROM err e LEFT JOIN cl c
  ON e.user_id = c.user_id
 AND c.ts <= e.ts
 AND epoch_us(c.ts) >= epoch_us(e.ts) - {RANGE_WINDOW_US}
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# SCD2 dimension build — the slowly-changing-dimension type-2 table every
# warehouse derives from an event log: for each entity (user), one row per
# VERSION of a tracked attribute (the user's current event_type "state"),
# with [valid_from, valid_to) validity intervals and an is_current flag.
# The reference's log model stores raw immutable events
# (logger.py:418-440 appends only); SCD2 is the standard read-side
# derivation that turns that log into a point-in-time-joinable dimension.
#
# Versions are contiguous runs of the attribute under the deterministic
# event order (ts, event_id) — the gaps-and-islands double-row_number
# trick (same construction as q_event_runs, which rolls runs UP into
# per-user stats; here the runs themselves are the output, with their
# validity timestamps). valid_to of version k = valid_from of version
# k+1 (half-open intervals tile the timeline exactly); the last version
# is open (NULL) and flagged current.
#
# Scale design: one shuffle on user_id serves every window (the
# (user_id, event_type) and (user_id, event_type, grp) partitions are
# strict refinements sharing the user_id prefix, so Spark reuses the
# exchange and only re-sorts); the version-level windows run on the
# boundary rows only (one row per run — corpus-sublinear). Timestamps
# are emitted as epoch microseconds (the q_asof_join convention) so the
# cross-engine value hash is exact integers.
# ---------------------------------------------------------------------------


def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension of each user's event_type state:
    one row per (user, version) with half-open validity interval in epoch
    micros, the version's event count, and the is_current flag."""
    events = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    w_run = Window.partitionBy("user_id", "event_type", "grp").orderBy(
        "ts", "event_id"
    )
    w_run_all = w_run.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    boundary = (
        runs.withColumn("rn", F.row_number().over(w_run))
        .withColumn("n_events", F.count("*").over(w_run_all))
        .filter(F.col("rn") == 1)
    )
    w_ver = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        boundary.withColumn("version", F.row_number().over(w_ver).cast("int"))
        .withColumn("valid_from_us", F.unix_micros("ts"))
        .withColumn("valid_to_us", F.lead(F.unix_micros("ts")).over(w_ver))
        .select(
            "user_id",
            "version",
            F.col("event_type").alias("state"),
            "valid_from_us",
            "valid_to_us",
            "n_events",
            F.col("valid_to_us").isNull().alias("is_current"),
        )
    )


ORACLE_SCD2_DIMENSION = """
WITH runs AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS grp
  FROM events
),
boundary AS (
  SELECT user_id, event_type, ts, event_id, n_events FROM (
    SELECT user_id, event_type, ts, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type, grp
                              ORDER BY ts, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY user_id, event_type, grp) AS n_events
    FROM runs
  ) WHERE rn = 1
),
ver AS (
  SELECT user_id, event_type, n_events,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)::INT
             AS version,
         epoch_us(ts) AS valid_from_us,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to_us
  FROM boundary
)
SELECT user_id, version, event_type AS state, valid_from_us, valid_to_us,
       n_events, valid_to_us IS NULL AS is_current
FROM ver
"""


# ---------------------------------------------------------------------------
# Interval concurrency — the sweep-line "how many sessions were open at
# once" query: sessionize the event log (the q_sessionize gap rule),
# treat each session as a half-open interval [first_us, last_us + 1),
# and report, per day, every sweep position that achieves that day's
# PEAK concurrent-session count. This is the capacity-planning read of
# the log (max simultaneous conversations ≈ max simultaneous LLM
# sessions the reference's callback stream implies).
#
# Scale design — the distributed prefix sum: a naive sweep is a running
# sum over ALL boundary events in one global order, i.e. a
# single-partition window (the one shape that cannot scale). Instead:
#   1. net boundary deltas per position (hash aggregate, map-side
#      combinable — starts +1, ends −1),
#   2. running sum WITHIN each day partition (shuffle on day, local
#      sort),
#   3. carry-in offsets: one running sum over the per-day TOTALS — a
#      frame with day-cardinality rows (bounded by the calendar, not
#      the corpus), the only single-partition window in the plan,
#   4. concurrency = carry + local running sum; per-day argmax filter.
# Steps 1-2-4 are corpus-linear and partition-parallel; step 3 is the
# classic two-phase scan trick (Blelloch prefix sum on a cluster).
# The argmax filter also makes result CARDINALITY depend on the sweep
# values, so a count()-only consumer cannot prune the running sum
# (SURVEY round-7 pruning lesson).
#
# Determinism: positions are unique after the delta aggregate, so the
# running sum needs no tie rule; everything is integer microseconds.
# Half-open [s, e+1) keeps single-event sessions (s == e) occupying
# their instant, and an end never cancels a start at the same position
# before it is counted — DuckDB's global running sum and the
# day-partitioned reconstruction agree exactly.
# ---------------------------------------------------------------------------

from .queries import SESSION_GAP_US  # shared gap rule (30 min)


def session_intervals(events: DataFrame) -> DataFrame:
    """events → one half-open interval per (user, session):
    (user_id, sid, s_us, e_us) with e_us = last event + 1 µs."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    new_session = F.when(prev.isNull() | ((us - prev) > SESSION_GAP_US), 1).otherwise(0)
    sid = F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        events.select("user_id", "ts", "event_id")
        .withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.min(F.unix_micros("ts")).alias("s_us"),
            (F.max(F.unix_micros("ts")) + F.lit(1)).alias("e_us"),
        )
    )


def q_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day peak concurrent sessions: every boundary position whose
    running open-session count equals its day's maximum."""
    events = load_table(spark, sf_dir, "events")
    ivl = session_intervals(events)
    # one pass over ivl: explode each interval into its ±1 boundary pair
    # (a union of two projections would recompute the sessionize subtree)
    bnd = ivl.select(
        F.explode(
            F.array(
                F.struct(F.col("s_us").alias("pos"), F.lit(1).alias("d")),
                F.struct(F.col("e_us").alias("pos"), F.lit(-1).alias("d")),
            )
        ).alias("b")
    ).select("b.pos", "b.d")
    # net feeds BOTH the per-day running sum and the carry pass — cache it
    # so the sessionize pipeline runs once (released via release_caches)
    net = cache_tracked(
        bnd.groupBy("pos")
        .agg(F.sum("d").alias("delta"))
        .withColumn("day", F.to_date(F.timestamp_micros(F.col("pos"))))
    )

    w_day = Window.partitionBy("day").orderBy("pos")
    local = net.withColumn("local_run", F.sum("delta").over(w_day))

    day_tot = net.groupBy("day").agg(F.sum("delta").alias("day_delta"))
    w_days = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )  # day-cardinality frame: the only single-partition window
    carry = day_tot.select(
        "day", F.coalesce(F.sum("day_delta").over(w_days), F.lit(0)).alias("carry")
    )

    run = local.join(F.broadcast(carry), "day").withColumn(
        "concurrency", F.col("carry") + F.col("local_run")
    )
    w_peak = Window.partitionBy("day")
    return (
        run.withColumn("peak", F.max("concurrency").over(w_peak))
        .filter(F.col("concurrency") == F.col("peak"))
        .select("day", F.col("pos").alias("pos_us"), "concurrency")
    )


ORACLE_INTERVAL_CONCURRENCY = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, epoch_us(ts) AS us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
ivl AS (
  SELECT user_id, sid, MIN(us) AS s_us, MAX(us) + 1 AS e_us
  FROM sess GROUP BY user_id, sid
),
bnd AS (
  SELECT s_us AS pos, 1 AS d FROM ivl
  UNION ALL
  SELECT e_us AS pos, -1 AS d FROM ivl
),
net AS (
  SELECT pos, SUM(d) AS delta FROM bnd GROUP BY pos
),
run AS (
  SELECT pos, CAST(make_timestamp(pos) AS DATE) AS day,
         SUM(delta) OVER (ORDER BY pos) AS concurrency
  FROM net
)
SELECT day, pos AS pos_us, CAST(concurrency AS BIGINT) AS concurrency
FROM (
  SELECT day, pos, concurrency,
         MAX(concurrency) OVER (PARTITION BY day) AS peak
  FROM run
) WHERE concurrency = peak
"""


QUERIES = {
    "q_asof_join": q_asof_join,
    "q_range_join_banded": q_range_join_banded,
    "q_scd2_dimension": q_scd2_dimension,
    "q_interval_concurrency": q_interval_concurrency,
}

ORACLES = {
    "q_asof_join": ORACLE_ASOF_JOIN,
    "q_range_join_banded": ORACLE_RANGE_JOIN,
    "q_scd2_dimension": ORACLE_SCD2_DIMENSION,
    "q_interval_concurrency": ORACLE_INTERVAL_CONCURRENCY,
}
