"""As-of join and banded range join: semantic edge cases the sf-scale
oracle sweep can't isolate — exact-tie matching, no-prior-match nulls,
window boundary inclusivity — plus the plan shape that makes the range
join deployable (equi join, not BroadcastNestedLoop)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from langchain_callback_parquet_logger_spark.operators.temporal import (
    RANGE_WINDOW_US,
    asof_join,
    q_range_join_banded,
)

UTC = dt.timezone.utc


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, second, tzinfo=UTC)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 101), (1, _ts(30), 102), (2, _ts(5), 201)],
        "user_id bigint, ts timestamp, event_id bigint",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 11), (1, _ts(10), 12), (1, _ts(20), 13), (2, _ts(50), 21)],
        "user_id bigint, ts timestamp, click_event_id bigint",
    )
    out = {
        r["event_id"]: r["matched"]
        for r in asof_join(left, right, on="user_id").collect()
    }
    # exact tie (right.ts == left.ts) matches — the 10:10 click, not 10:00
    assert out[101]["click_event_id"] == 12
    # strictly the latest prior right row
    assert out[102]["click_event_id"] == 13
    # user 2's only click is AFTER the purchase → no match, null payload
    assert out[201] is None


def test_asof_join_keeps_all_left_rows(spark):
    left = spark.createDataFrame(
        [(7, _ts(1), 1), (8, _ts(2), 2)],
        "user_id bigint, ts timestamp, event_id bigint",
    )
    right = spark.createDataFrame(
        [(7, _ts(0), 10)], "user_id bigint, ts timestamp, click_event_id bigint"
    )
    assert asof_join(left, right, on="user_id").count() == 2


def test_range_join_window_boundaries(spark, tmp_path):
    """Clicks exactly 1h before (inclusive) and just outside the window."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=UTC)
    rows = [
        (1, base, 100, "error", 0.0, "{}"),
        # exactly at the window edge: counted
        (2, base - dt.timedelta(microseconds=RANGE_WINDOW_US), 100, "click", 0.0, "{}"),
        # 1 microsecond outside: not counted
        (
            3,
            base - dt.timedelta(microseconds=RANGE_WINDOW_US + 1),
            100,
            "click",
            0.0,
            "{}",
        ),
        # same instant as the error: counted
        (4, base, 100, "click", 0.0, "{}"),
        # after the error: not counted
        (5, base + dt.timedelta(seconds=1), 100, "click", 0.0, "{}"),
        # different user: not counted
        (6, base, 200, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")
    out = q_range_join_banded(spark, sf_dir).collect()
    assert len(out) == 1
    assert out[0]["n_recent_clicks"] == 2


def test_range_join_is_equi_join_not_nested_loop(spark, sf_dir):
    plan = q_range_join_banded(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "Join" in plan, plan


def test_scd2_dimension_intervals_tile(spark, sf_dir):
    """SCD2 contract: per user, versions are 1..V consecutive, intervals
    are half-open and tile the timeline exactly (valid_to(k) ==
    valid_from(k+1)), adjacent versions change state, exactly one open
    current version, and version event counts partition the user's
    events."""
    from collections import defaultdict

    from langchain_callback_parquet_logger_spark.operators.temporal import (
        q_scd2_dimension,
    )
    from langchain_callback_parquet_logger_spark.plans.session import load_table

    rows = q_scd2_dimension(spark, sf_dir).collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    counts = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(per_user) == set(counts)
    for uid, vs in per_user.items():
        vs.sort(key=lambda r: r.version)
        assert [v.version for v in vs] == list(range(1, len(vs) + 1))
        assert sum(v.n_events for v in vs) == counts[uid]
        assert sum(v.is_current for v in vs) == 1
        assert vs[-1].is_current and vs[-1].valid_to_us is None
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.valid_from_us < a.valid_to_us or a.n_events >= 1
            assert a.state != b.state


# ---------------------------------------------------------------------------
# q_interval_concurrency — sweep-line peak concurrency
# ---------------------------------------------------------------------------

_EPOCH = dt.datetime(1970, 1, 1)


def _sweep_ref(evts, gap):
    """Pure-Python sweep-line reference: (user_id, us, event_id) triples →
    {(day, pos_us, concurrency)} argmax rows, same session gap rule and
    half-open [s, e+1) interval semantics as the Spark plan / oracle."""
    from collections import defaultdict

    per_user = defaultdict(list)
    for u, us, eid in evts:
        per_user[u].append((us, eid))
    intervals = []
    for u, es in per_user.items():
        es.sort()
        start = prev = None
        for us, _ in es:
            if prev is None or us - prev > gap:
                if start is not None:
                    intervals.append((start, prev + 1))
                start = us
            prev = us
        intervals.append((start, prev + 1))
    delta = defaultdict(int)
    for s, e in intervals:
        delta[s] += 1
        delta[e] -= 1
    run = 0
    rows = []
    for pos in sorted(delta):
        run += delta[pos]
        day = (_EPOCH + dt.timedelta(microseconds=pos)).date()
        rows.append((day, pos, run))
    peaks = {}
    for day, pos, c in rows:
        peaks[day] = max(peaks.get(day, 0), c)
    return {(day, pos, c) for day, pos, c in rows if c == peaks[day]}


def test_interval_concurrency_matches_python_sweep(spark, sf_dir):
    """The distributed two-phase prefix sum (per-day running sums + a
    day-cardinality carry pass) must equal the sequential global sweep."""
    from langchain_callback_parquet_logger_spark.operators.queries import (
        SESSION_GAP_US,
    )
    from langchain_callback_parquet_logger_spark.operators.temporal import (
        q_interval_concurrency,
    )
    from langchain_callback_parquet_logger_spark.plans.session import load_table

    from langchain_callback_parquet_logger_spark.plans.session import (
        release_caches,
    )

    evts = [
        (r.user_id, r.us, r.event_id)
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", F.unix_micros("ts").alias("us"), "event_id")
        .collect()
    ]
    ref = _sweep_ref(evts, SESSION_GAP_US)
    try:
        got = {
            (r.day, r.pos_us, r.concurrency)
            for r in q_interval_concurrency(spark, sf_dir).collect()
        }
    finally:
        release_caches()
    assert got == ref


def test_interval_concurrency_edge_semantics(spark, tmp_path):
    """Half-open intervals: a single-event session occupies exactly its
    instant; a session ending where another starts never double-counts;
    simultaneous single-event sessions from different users stack."""
    from langchain_callback_parquet_logger_spark.operators.queries import (
        SESSION_GAP_US,
    )
    from langchain_callback_parquet_logger_spark.operators.temporal import (
        q_interval_concurrency,
    )

    base = dt.datetime(2024, 3, 1, 12, 0, 0, tzinfo=UTC)
    us = lambda micros: base + dt.timedelta(microseconds=micros)
    rows = [
        # user 1: one session [0, gap] (events exactly gap apart stay joined)
        (1, us(0), 1),
        (1, us(SESSION_GAP_US), 2),
        # user 1: second session starting gap+1 after the last event
        (1, us(2 * SESSION_GAP_US + 1), 3),
        # users 2+3: single-event sessions at the same instant
        (2, us(100), 4),
        (3, us(100), 5),
    ]
    df = spark.createDataFrame(
        [(eid, ts, uid, "click", 0.0, "{}") for uid, ts, eid in rows],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    from langchain_callback_parquet_logger_spark.plans.session import (
        release_caches,
    )

    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")
    try:
        out = {
            (r.pos_us, r.concurrency)
            for r in q_interval_concurrency(spark, sf_dir).collect()
        }
    finally:
        release_caches()
    base_us = int((base.replace(tzinfo=None) - _EPOCH).total_seconds()) * 1_000_000
    # peak = 3: user 1's long session plus both instant sessions at +100
    assert out == {(base_us + 100, 3)}


def test_interval_concurrency_duckdb_oracle_matches_python():
    """JVM-free seeded-fuzz differential: the DuckDB oracle equals the
    Python sweep on random event soups that hammer the gap boundary
    (== gap joins, gap+1 splits) and same-instant collisions."""
    import random

    import duckdb

    from langchain_callback_parquet_logger_spark.operators.queries import (
        SESSION_GAP_US,
    )
    from langchain_callback_parquet_logger_spark.operators.temporal import (
        ORACLES,
    )

    rng = random.Random(742)
    for trial in range(12):
        evts = []
        eid = 0
        for u in range(rng.randint(1, 4)):
            t = rng.randint(0, 3) * 86_400_000_000 + rng.randint(0, 10**6)
            for _ in range(rng.randint(1, 12)):
                eid += 1
                evts.append((u, t, eid))
                t += rng.choice(
                    [0, 1, 17, SESSION_GAP_US, SESSION_GAP_US + 1,
                     2 * SESSION_GAP_US, 86_399_999_999]
                )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT unnest(?) AS user_id, "
            "make_timestamp(unnest(?)) AS ts, unnest(?) AS event_id",
            [[u for u, _, _ in evts], [t for _, t, _ in evts],
             [e for _, _, e in evts]],
        )
        duck = {
            (r[0], r[1], r[2])
            for r in con.execute(ORACLES["q_interval_concurrency"]).fetchall()
        }
        con.close()
        assert duck == _sweep_ref(evts, SESSION_GAP_US), (trial, evts)


def test_scd2_duckdb_oracle_matches_python_fuzz():
    """JVM-free seeded-fuzz differential: the SCD2 DuckDB oracle equals a
    sequential Python run-compressor on random event soups with
    same-instant ties (event_id ordering) and immediate state flips."""
    import random

    import duckdb

    from langchain_callback_parquet_logger_spark.operators.temporal import (
        ORACLES,
    )

    rng = random.Random(4711)
    for trial in range(12):
        evts = []
        eid = 0
        for u in range(rng.randint(1, 4)):
            t = rng.randint(0, 2) * 86_400_000_000
            for _ in range(rng.randint(1, 15)):
                eid += 1
                evts.append((u, t, eid, rng.choice(["a", "b", "c"])))
                t += rng.choice([0, 1, 999, 10**7])
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT unnest(?) AS user_id, "
            "make_timestamp(unnest(?)) AS ts, unnest(?) AS event_id, "
            "unnest(?) AS event_type",
            [[e[0] for e in evts], [e[1] for e in evts],
             [e[2] for e in evts], [e[3] for e in evts]],
        )
        duck = {
            tuple(r) for r in con.execute(ORACLES["q_scd2_dimension"]).fetchall()
        }
        con.close()

        ref = set()
        per_user = {}
        for u, t, e, ty in evts:
            per_user.setdefault(u, []).append((t, e, ty))
        for u, es in per_user.items():
            es.sort()
            runs = []  # (state, first_us, n)
            for t, e, ty in es:
                if runs and runs[-1][0] == ty:
                    runs[-1][2] += 1
                else:
                    runs.append([ty, t, 1])
            for i, (ty, t, n) in enumerate(runs):
                nxt = runs[i + 1][1] if i + 1 < len(runs) else None
                ref.add((u, i + 1, ty, t, nxt, n, nxt is None))
        assert duck == ref, (trial, evts)
