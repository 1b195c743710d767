"""Analytic query surface (operators/analytic.py) + the decontamination and
streaming-dedup additions: shape/invariant tests at sf0.001; value-level
correctness is the DuckDB oracle gate (tools/check_oracle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from langchain_callback_parquet_logger_spark.operators import analytic as A
from langchain_callback_parquet_logger_spark.operators import dedup as D
from langchain_callback_parquet_logger_spark.plans.session import load_table


@pytest.mark.parametrize("name", sorted(A.QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = A.QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.limit(3).collect() is not None


def test_registry_oracle_alignment():
    # Every query carries an oracle (q_hll_users included since round 8:
    # the explicit fixed-hash HLL estimate is a pure function of the data).
    assert set(A.ORACLES) == set(A.QUERIES)


def test_percentiles_ordered(spark, sf_dir):
    for r in A.q_percentiles(spark, sf_dir).collect():
        assert r.p50 <= r.p90 <= r.p99


def test_pivot_counts_consistent(spark, sf_dir):
    wide = A.q_event_pivot(spark, sf_dir)
    total_wide = wide.select(
        sum(F.sum(f"n_{t}") for t in A.EVENT_TYPES).alias("n")
    ).collect()[0].n
    assert total_wide == load_table(spark, sf_dir, "events").count()


def test_cube_has_all_grouping_sets(spark, sf_dir):
    rows = A.q_cube(spark, sf_dir).collect()
    grand = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    assert len(grand) == 1
    li_count = load_table(spark, sf_dir, "lineitem").count()
    assert grand[0].n_lines == li_count


def test_running_total_monotone_per_customer(spark, sf_dir):
    df = A.q_running_total(spark, sf_dir)
    bad = (
        df.withColumn(
            "prev",
            F.lag("cum_spend").over(
                Window.partitionBy("o_custkey").orderBy("order_seq")
            ),
        )
        .filter(F.col("prev").isNotNull() & (F.col("cum_spend") < F.col("prev")))
        .count()
    )
    assert bad == 0


def test_ntile_partitions_all_orders(spark, sf_dir):
    rows = A.q_ntile(spark, sf_dir).collect()
    assert {r.decile for r in rows} == set(range(1, 11))
    assert sum(r.n_orders for r in rows) == load_table(
        spark, sf_dir, "orders"
    ).count()


def test_set_ops_segments_disjoint(spark, sf_dir):
    df = A.q_set_ops(spark, sf_dir)
    per_user = df.groupBy("user_id").count().filter("count > 1").count()
    assert per_user == 0  # a user is 'both' or 'purchase_only', never both


def test_hll_close_to_exact(spark, sf_dir):
    """512-register HLL carries ~1.04/√512 ≈ 4.6% rsd; require every
    per-type estimate within 15% of exact (loose enough to never flake,
    tight enough to catch a broken register/estimator), and the reported
    rel_err must equal the recomputed ratio."""
    rows = A.q_hll_users(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        assert abs(r.est_users - r.exact_users) <= max(2, 0.15 * r.exact_users)
        expected = abs(r.est_users - r.exact_users) / r.exact_users
        assert abs(r.rel_err - expected) < 1e-2  # est_users is 2dp-rounded


def test_hll_duckdb_oracle_matches_python_fuzz():
    """JVM-free seeded-fuzz differential: the HLL oracle must reproduce a
    pure-Python HyperLogLog built from the SAME module constants (md5
    hash60, 512 registers, trailing-zero rank, exact-integer register
    sum, linear-counting fallback). One trial uses >1280 distinct users
    so BOTH estimator branches are exercised."""
    import hashlib
    import math
    import random
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    from langchain_callback_parquet_logger_spark.operators.analytic import (
        HLL_M,
        ORACLES,
        _HLL_C,
    )

    def round_half_up(x: float, nd: int) -> float:
        return float(
            Decimal(repr(x)).quantize(
                Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP
            )
        )

    def hll_estimate(users: list[int]) -> float:
        regs: dict[int, int] = {}
        for u in set(users):
            h = int(hashlib.md5(f"hll:{u}".encode()).hexdigest()[:15], 16)
            idx, w = h % HLL_M, h // HLL_M
            rho = 52 if w == 0 else ((w & -w).bit_length() - 1) + 1
            regs[idx] = max(regs.get(idx, 0), rho)
        v = HLL_M - len(regs)
        s = sum(1 << (52 - m) for m in regs.values()) + v * (1 << 52)
        raw = _HLL_C / s
        if raw <= 2.5 * HLL_M and v > 0:
            return float(HLL_M) * math.log(float(HLL_M) / v)
        return raw

    rng = random.Random(2509)
    for trial in range(8):
        if trial == 0:
            # dense trial: >2.5m distinct users → raw-estimate branch
            users = list(range(3000))
            rows = [(u, "x") for u in users] + [
                (rng.randrange(3000), "x") for _ in range(500)
            ]
        else:
            rows = [
                (rng.randrange(1, 400), rng.choice(["x", "y", "z"]))
                for _ in range(rng.randint(5, 600))
            ]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT unnest(?) AS user_id, "
            "unnest(?) AS event_type",
            [[r[0] for r in rows], [r[1] for r in rows]],
        )
        duck = {
            r[0]: tuple(r[1:])
            for r in con.execute(ORACLES["q_hll_users"]).fetchall()
        }
        con.close()

        by_type: dict[str, list[int]] = {}
        for u, ty in rows:
            by_type.setdefault(ty, []).append(u)
        assert set(duck) == set(by_type), trial
        for ty, us in by_type.items():
            est = hll_estimate(us)
            exact = len(set(us))
            ref = (
                len(us),
                exact,
                round_half_up(est, 2),
                round_half_up(abs(est - exact) / exact, 6),
            )
            assert duck[ty] == ref, (trial, ty, duck[ty], ref)


def test_kmv_estimate_close_to_exact_and_self_consistent(spark, sf_dir):
    """KMV with k=256 carries ~1/sqrt(k-2) ≈ 6% standard error; require
    the estimate within 25% of exact (loose enough to never flake, tight
    enough to catch a broken estimator), and the reported rel_err must
    equal the recomputed one."""
    row = A.q_kmv_users(spark, sf_dir).collect()[0]
    assert row.k == A.KMV_K
    assert row.n_exact > 0
    assert row.rel_err <= 0.25
    expected = abs(row.est_distinct - row.n_exact) / row.n_exact
    assert abs(row.rel_err - expected) < 1e-2  # est_distinct is 2dp-rounded


def test_cms_estimates_dominate_exact_counts(spark, sf_dir):
    """Count-Min never underestimates (each bucket sums a superset of
    the word's occurrences), top rows are the exact top-K, and the
    inflation column is the recomputed ratio."""
    rows = A.q_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == A.CMS_TOP
    for r in rows:
        assert r.est_cnt >= r.exact_cnt > 0
        assert abs(r.inflation - round(r.est_cnt / r.exact_cnt, 6)) < 1e-9


def test_decontaminate_excludes_benchmark_docs(spark, sf_dir):
    df = D.q_decontaminate(spark, sf_dir)
    assert df.filter(F.col("doc_id") % 97 == 0).count() == 0
    assert df.filter("n_bench_hits < 1 or n_shared_shingles < 1").count() == 0


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir):
    plan = D.q_decontaminate(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_knn_lsh_finds_planted_near_duplicate(spark, sf_dir):
    """LSH's actual contract: a high-cosine near-duplicate collides with
    the query in ≥1 band with probability ≈0.999 (sign-agreement law),
    and with fixed hyperplanes the outcome is deterministic. Plant a
    0.99-cosine copy of the query among the corpus and require LSH to
    surface it as the top hit; also every LSH result must appear in the
    exact ranking with the identical similarity."""
    from pyspark.sql import functions as F

    from langchain_callback_parquet_logger_spark.operators.similarity import (
        QUERY_VEC_ID,
        _as_double,
        knn_bruteforce,
        knn_lsh,
    )
    from langchain_callback_parquet_logger_spark.plans.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    near = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.lit(999_999).alias("vec_id"),
        F.transform(
            "emb", lambda x, i: F.when(i == 0, x + F.lit(0.25)).otherwise(x)
        ).alias("emb"),
    )
    corpus = emb.unionByName(near)
    top = knn_lsh(corpus, QUERY_VEC_ID, k=5).collect()
    assert top[0].vec_id == 999_999 and top[0].sim > 0.9

    exact = {
        r.vec_id: r.sim
        for r in knn_bruteforce(
            corpus.filter(F.col("vec_id") != QUERY_VEC_ID).withColumnRenamed(
                "emb", "embedding"
            ),
            corpus.filter(F.col("vec_id") == QUERY_VEC_ID).withColumnRenamed(
                "emb", "embedding"
            ),
            k=1000,
        ).collect()
    }
    for r in top:
        assert exact[r.vec_id] == r.sim


def test_stream_join_matches_batch_range_join(spark, sf_dir):
    """The drained stream-stream join equals the batch interval join
    (inner: only purchases with ≥1 click in the trailing hour appear)."""
    from langchain_callback_parquet_logger_spark.streaming.ingest import q_stream_join
    from langchain_callback_parquet_logger_spark.operators.temporal import (
        q_range_join_banded,
    )

    got = {r.purchase_id: r.n_clicks_1h for r in q_stream_join(spark, sf_dir).collect()}
    # q_range_join_banded counts clicks per ERROR event; recompute its
    # purchase-side analog directly for the cross-check
    from pyspark.sql import functions as F

    from langchain_callback_parquet_logger_spark.plans.session import load_table

    events = load_table(spark, sf_dir, "events")
    p = events.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
    )
    c = events.filter("event_type = 'click'").select(
        "user_id", F.unix_micros("ts").alias("c_us")
    )
    want = {
        r.purchase_id: r.n
        for r in p.join(c, "user_id")
        .filter("c_us <= p_us and c_us >= p_us - 3600000000")
        .groupBy("purchase_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_no_python_eval_in_analytic_plans(spark, sf_dir):
    for name, q in A.QUERIES.items():
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_quantize_error_bounded_by_half_scale(spark, sf_dir):
    """Scalar quantization's contract: max reconstruction error per vector
    is at most scale/2 = (max-min)/(2*QUANT_LEVELS)."""
    from pyspark.sql import functions as F

    from langchain_callback_parquet_logger_spark.operators.similarity import (
        QUANT_LEVELS,
        _as_double,
        quantize_error,
    )
    from langchain_callback_parquet_logger_spark.plans.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        _as_double(F.col("embedding")).alias("emb")
    )
    checked = emb.select(
        quantize_error(F.col("emb")).alias("err"),
        (
            (F.array_max("emb") - F.array_min("emb"))
            / F.lit(2.0 * QUANT_LEVELS)
        ).alias("bound"),
    )
    assert checked.filter(F.col("err") > F.col("bound") * 1.0000001).count() == 0


def test_kmeans_fit_partitions_all_vectors(spark, sf_dir):
    """The fit must yield exactly K non-empty clusters covering every
    vector, and the IVF result's similarities must agree with the exact
    ranking (IVF may miss neighbors outside probed clusters, never
    misscore them)."""
    from pyspark.sql import functions as F

    from langchain_callback_parquet_logger_spark.operators.similarity import (
        KMEANS_K,
        QUERY_VEC_ID,
        _as_double,
        kmeans_fit,
        q_kmeans_ivf,
        q_knn_bruteforce,
    )
    from langchain_callback_parquet_logger_spark.plans.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    centroids = kmeans_fit(emb)
    assert centroids.count() == KMEANS_K
    dims = {r[0] for r in centroids.select(F.size("c_emb")).collect()}
    assert dims == {64}

    exact = {r.vec_id: r.sim for r in q_knn_bruteforce(spark, sf_dir).limit(1000).collect()}
    ivf = q_kmeans_ivf(spark, sf_dir).collect()
    assert len(ivf) == 10
    for r in ivf:
        if r.vec_id in exact:
            assert exact[r.vec_id] == r.sim


def test_bitmap_distinct_is_exact_and_mergeable(spark, sf_dir):
    """The bitmap count equals the exact distinct count on every row
    (calibrated by construction), and the word table MERGES: OR-ing the
    per-day words up to event_type level reproduces the event_type-level
    distinct count without touching raw events."""
    rows = A.q_bitmap_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.calibrated
        assert r.n_users_bitmap == r.n_users_exact
        assert r.n_words <= r.n_users_exact  # words are packed sets

    from langchain_callback_parquet_logger_spark.plans.session import load_table

    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_type",
        F.to_date("ts").alias("day"),
        "user_id",
        F.expr(f"user_id div {A.BITMAP_WORD_BITS}").alias("bucket"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(user_id % {A.BITMAP_WORD_BITS} AS INT))"
        ).alias("bit"),
    )
    daily_words = ev.groupBy("event_type", "day", "bucket").agg(
        F.bit_or("bit").alias("word")
    )
    merged = (
        daily_words.groupBy("event_type", "bucket")
        .agg(F.bit_or("word").alias("word"))
        .groupBy("event_type")
        .agg(F.sum(F.bit_count("word")).alias("n_users"))
    )
    got = {r.event_type: r.n_users for r in merged.collect()}
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_centroid_confusion_invariants(spark, sf_dir):
    """Confusion-matrix contract: cell counts partition the corpus,
    exactly one majority cell per cluster (ties to the lowest label),
    and purity_ppm is the integer-ppm majority share on every row of
    its cluster."""
    from collections import defaultdict

    from langchain_callback_parquet_logger_spark.operators.similarity import (
        KMEANS_K,
        q_centroid_confusion,
    )
    from langchain_callback_parquet_logger_spark.plans.session import load_table

    rows = q_centroid_confusion(spark, sf_dir).collect()
    emb_n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n for r in rows) == emb_n

    by_cid = defaultdict(list)
    for r in rows:
        by_cid[r.cid].append(r)
    assert 0 < len(by_cid) <= KMEANS_K
    for cid, cells in by_cid.items():
        total = cells[0].cid_total
        assert sum(c.n for c in cells) == total
        majors = [c for c in cells if c.is_majority]
        assert len(majors) == 1
        maj = majors[0]
        assert maj.n == max(c.n for c in cells)
        assert maj.label == min(c.label for c in cells if c.n == maj.n)
        for c in cells:
            assert c.cid_total == total
            assert c.purity_ppm == maj.n * 1_000_000 // total
            assert 0 < c.purity_ppm <= 1_000_000


def test_event_transitions_matches_python_reference(spark, sf_dir):
    """Full differential vs a sequential Python reference: sessionize
    with the shared gap rule, pair consecutive events per session, and
    reproduce every (from, to) cell with counts, ppm probabilities, and
    lowest-to_type-tie ranks."""
    from collections import defaultdict

    from langchain_callback_parquet_logger_spark.operators.analytic import (
        q_event_transitions,
    )
    from langchain_callback_parquet_logger_spark.operators.queries import (
        SESSION_GAP_US,
    )
    from langchain_callback_parquet_logger_spark.plans.session import load_table

    evts = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id", "event_type"
    ).collect()
    per_user = defaultdict(list)
    for r in evts:
        per_user[r.user_id].append((r.us, r.event_id, r.event_type))
    cells = defaultdict(int)
    for u, es in per_user.items():
        es.sort(key=lambda t: (t[0], t[1]))
        prev_us = None
        prev_type = None
        for us, _, et in es:
            if prev_us is not None and us - prev_us <= SESSION_GAP_US:
                cells[(prev_type, et)] += 1
            prev_us, prev_type = us, et
    totals = defaultdict(int)
    for (f_t, _), n in cells.items():
        totals[f_t] += n
    ranks = {}
    for f_t in totals:
        dests = sorted(
            ((t, n) for (f, t), n in cells.items() if f == f_t),
            key=lambda tn: (-tn[1], tn[0]),
        )
        for i, (t, _) in enumerate(dests, 1):
            ranks[(f_t, t)] = i
    ref = {
        (f, t, n, totals[f], n * 1_000_000 // totals[f], ranks[(f, t)])
        for (f, t), n in cells.items()
    }
    got = {
        (r.from_type, r.to_type, r.n_transitions, r.from_total, r.prob_ppm, r.rk)
        for r in q_event_transitions(spark, sf_dir).collect()
    }
    assert got == ref


def test_event_transitions_duckdb_oracle_matches_python_fuzz():
    """JVM-free seeded-fuzz differential for the transition-matrix
    oracle: random event soups hammering the session-gap boundary and
    same-instant ties must reproduce a sequential Python reference."""
    import random

    import duckdb

    from langchain_callback_parquet_logger_spark.operators.analytic import (
        ORACLES,
    )
    from langchain_callback_parquet_logger_spark.operators.queries import (
        SESSION_GAP_US,
    )

    rng = random.Random(1318)
    for trial in range(10):
        evts = []
        eid = 0
        for u in range(rng.randint(1, 4)):
            t = rng.randint(0, 10**6)
            for _ in range(rng.randint(1, 14)):
                eid += 1
                evts.append((u, t, eid, rng.choice(["x", "y", "z"])))
                t += rng.choice([0, 1, SESSION_GAP_US, SESSION_GAP_US + 1])
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT unnest(?) AS user_id, "
            "make_timestamp(unnest(?)) AS ts, unnest(?) AS event_id, "
            "unnest(?) AS event_type",
            [[e[0] for e in evts], [e[1] for e in evts],
             [e[2] for e in evts], [e[3] for e in evts]],
        )
        duck = {
            tuple(r)
            for r in con.execute(ORACLES["q_event_transitions"]).fetchall()
        }
        con.close()

        from collections import defaultdict

        cells = defaultdict(int)
        per_user = defaultdict(list)
        for u, t, e, ty in evts:
            per_user[u].append((t, e, ty))
        for u, es in per_user.items():
            es.sort()
            prev_t = prev_ty = None
            for t, e, ty in es:
                if prev_t is not None and t - prev_t <= SESSION_GAP_US:
                    cells[(prev_ty, ty)] += 1
                prev_t, prev_ty = t, ty
        totals = defaultdict(int)
        for (f, _), n in cells.items():
            totals[f] += n
        ref = set()
        for f in totals:
            dests = sorted(
                ((t, n) for (ff, t), n in cells.items() if ff == f),
                key=lambda tn: (-tn[1], tn[0]),
            )
            for i, (t, n) in enumerate(dests, 1):
                ref.add((f, t, n, totals[f], n * 1_000_000 // totals[f], i))
        assert duck == ref, (trial, evts)


def test_bitmap_distinct_duckdb_oracle_matches_python_fuzz():
    """JVM-free seeded-fuzz differential: the bitmap-word oracle's exact
    distinct counts equal Python set counts on random soups with heavy
    per-word collisions (user ids packed into few 32-bit buckets)."""
    import random

    import duckdb

    from langchain_callback_parquet_logger_spark.operators.analytic import (
        BITMAP_WORD_BITS,
        ORACLES,
    )

    rng = random.Random(9042)
    for trial in range(10):
        n = rng.randint(5, 60)
        evts = [
            (
                rng.choice(["a", "b"]),
                rng.randint(0, 1) * 86_400_000_000 + rng.randint(0, 10**6),
                rng.randint(0, 70),  # spans >2 words, dense collisions
            )
            for _ in range(n)
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT unnest(?) AS event_type, "
            "make_timestamp(unnest(?)) AS ts, unnest(?) AS user_id",
            [[e[0] for e in evts], [e[1] for e in evts],
             [e[2] for e in evts]],
        )
        duck = {
            (r[0], r[1], r[2], r[3], r[4], r[5])
            for r in con.execute(ORACLES["q_bitmap_distinct"]).fetchall()
        }
        con.close()

        from collections import defaultdict
        import datetime as dt

        users = defaultdict(set)
        for et, t, u in evts:
            day = (dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=t)).date()
            users[(et, day)].add(u)
        ref = {
            (
                et,
                day,
                len(us),
                len(us),
                len({u // BITMAP_WORD_BITS for u in us}),
                True,
            )
            for (et, day), us in users.items()
        }
        assert duck == ref, (trial, evts)


def test_session_funnel_paths_matches_python_reference(spark, sf_dir):
    """Full differential vs a sequential Python reference: session path
    prefixes, session counts, ppm mean lengths, and ranks."""
    from collections import defaultdict

    from langchain_callback_parquet_logger_spark.operators.analytic import (
        PATH_LEN,
        q_session_funnel_paths,
    )
    from langchain_callback_parquet_logger_spark.operators.queries import (
        SESSION_GAP_US,
    )
    from langchain_callback_parquet_logger_spark.plans.session import load_table

    evts = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id", "event_type"
    ).collect()
    per_user = defaultdict(list)
    for r in evts:
        per_user[r.user_id].append((r.us, r.event_id, r.event_type))
    sessions = []  # (path, n_events)
    for u, es in per_user.items():
        es.sort()
        cur = []
        prev = None
        for us, _, ty in es:
            if prev is not None and us - prev > SESSION_GAP_US:
                sessions.append(cur)
                cur = []
            cur.append(ty)
            prev = us
        sessions.append(cur)
    rolled = defaultdict(lambda: [0, 0])
    for s in sessions:
        key = ">".join(s[:PATH_LEN])
        rolled[key][0] += 1
        rolled[key][1] += len(s)
    ordered = sorted(rolled.items(), key=lambda kv: (-kv[1][0], kv[0]))
    ref = {
        (path, n, tot, tot * 1_000_000 // n, i)
        for i, (path, (n, tot)) in enumerate(ordered, 1)
    }
    got = {
        (r.path, r.n_sessions, r.n_events_total, r.mean_len_ppm, r.rk)
        for r in q_session_funnel_paths(spark, sf_dir).collect()
    }
    assert got == ref


def test_burst_detection_matches_python_reference(spark, sf_dir):
    """Full differential vs a brute-force Python reference: hourly
    buckets, trailing-window peaks/history (inclusive RANGE boundaries),
    and the integer flag rule."""
    from collections import defaultdict

    from langchain_callback_parquet_logger_spark.operators.analytic import (
        BURST_FACTOR,
        BURST_MIN_HISTORY_HOURS,
        BURST_WINDOW_HOURS,
        q_burst_detection,
    )
    from langchain_callback_parquet_logger_spark.plans.session import load_table

    evts = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    ).collect()
    buckets = defaultdict(int)
    for r in evts:
        buckets[(r.user_id, r.us // 3_600_000_000)] += 1
    by_user = defaultdict(dict)
    for (u, h), c in buckets.items():
        by_user[u][h] = c
    ref = set()
    for u, hs in by_user.items():
        for h, c in hs.items():
            window = [
                hs[k]
                for k in hs
                if h - BURST_WINDOW_HOURS <= k <= h - 1
            ]
            if len(window) >= BURST_MIN_HISTORY_HOURS and c >= BURST_FACTOR * max(window):
                ref.add(
                    (
                        u,
                        h * 3_600_000_000,
                        c,
                        max(window),
                        len(window),
                        c * 1_000_000 // max(window),
                    )
                )
    got = {
        (
            r.user_id,
            r.hour_us,
            r.cnt,
            r.trailing_peak,
            r.n_history_hours,
            r.peak_ratio_ppm,
        )
        for r in q_burst_detection(spark, sf_dir).collect()
    }
    assert got == ref
    assert got  # the fixture must actually exercise the detector


def test_session_funnel_paths_duckdb_oracle_matches_python_fuzz():
    """JVM-free seeded-fuzz differential for the funnel-path oracle:
    random event soups with gap-boundary and same-instant collisions
    must reproduce the sequential reference (paths, counts, ppm means,
    ranks)."""
    import random

    import duckdb

    from langchain_callback_parquet_logger_spark.operators.analytic import (
        ORACLES,
        PATH_LEN,
    )
    from langchain_callback_parquet_logger_spark.operators.queries import (
        SESSION_GAP_US,
    )

    rng = random.Random(6021)
    for trial in range(10):
        evts = []
        eid = 0
        for u in range(rng.randint(1, 4)):
            t = rng.randint(0, 10**6)
            for _ in range(rng.randint(1, 12)):
                eid += 1
                evts.append((u, t, eid, rng.choice(["p", "q", "r"])))
                t += rng.choice([0, 1, SESSION_GAP_US, SESSION_GAP_US + 1])
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT unnest(?) AS user_id, "
            "make_timestamp(unnest(?)) AS ts, unnest(?) AS event_id, "
            "unnest(?) AS event_type",
            [[e[0] for e in evts], [e[1] for e in evts],
             [e[2] for e in evts], [e[3] for e in evts]],
        )
        duck = {
            tuple(r)
            for r in con.execute(ORACLES["q_session_funnel_paths"]).fetchall()
        }
        con.close()

        from collections import defaultdict

        per_user = defaultdict(list)
        for u, t, e, ty in evts:
            per_user[u].append((t, e, ty))
        sessions = []
        for u, es in per_user.items():
            es.sort()
            cur = []
            prev = None
            for t, e, ty in es:
                if prev is not None and t - prev > SESSION_GAP_US:
                    sessions.append(cur)
                    cur = []
                cur.append(ty)
                prev = t
            sessions.append(cur)
        rolled = defaultdict(lambda: [0, 0])
        for s in sessions:
            key = ">".join(s[:PATH_LEN])
            rolled[key][0] += 1
            rolled[key][1] += len(s)
        ordered = sorted(rolled.items(), key=lambda kv: (-kv[1][0], kv[0]))
        ref = {
            (p, n, tot, tot * 1_000_000 // n, i)
            for i, (p, (n, tot)) in enumerate(ordered, 1)
        }
        assert duck == ref, (trial, evts)


def test_burst_detection_duckdb_oracle_matches_python_fuzz():
    """JVM-free seeded-fuzz differential for the burst oracle: clustered
    hour buckets that straddle the 168h RANGE boundary and the minimum-
    history threshold must reproduce the brute-force reference."""
    import random

    import duckdb

    from langchain_callback_parquet_logger_spark.operators.analytic import (
        BURST_FACTOR,
        BURST_MIN_HISTORY_HOURS,
        BURST_WINDOW_HOURS,
        ORACLES,
    )

    rng = random.Random(777)
    HOUR = 3_600_000_000
    for trial in range(10):
        evts = []
        for u in range(rng.randint(1, 3)):
            # clustered active hours incl. exact 168h-window edges
            hours = set()
            base = rng.randint(0, 50)
            for _ in range(rng.randint(3, 20)):
                hours.add(base + rng.choice(
                    [0, 1, 2, 3, 4, 5, BURST_WINDOW_HOURS,
                     BURST_WINDOW_HOURS + 1, rng.randint(0, 200)]
                ))
            for h in hours:
                for _ in range(rng.randint(1, 4)):
                    evts.append((u, h * HOUR + rng.randint(0, HOUR - 1)))
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT unnest(?) AS user_id, "
            "make_timestamp(unnest(?)) AS ts",
            [[e[0] for e in evts], [e[1] for e in evts]],
        )
        duck = {
            tuple(r)
            for r in con.execute(ORACLES["q_burst_detection"]).fetchall()
        }
        con.close()

        from collections import defaultdict

        buckets = defaultdict(int)
        for u, us in evts:
            buckets[(u, us // HOUR)] += 1
        by_user = defaultdict(dict)
        for (u, h), c in buckets.items():
            by_user[u][h] = c
        ref = set()
        for u, hs in by_user.items():
            for h, c in hs.items():
                win = [hs[k] for k in hs if h - BURST_WINDOW_HOURS <= k <= h - 1]
                if len(win) >= BURST_MIN_HISTORY_HOURS and c >= BURST_FACTOR * max(win):
                    ref.add((u, h * HOUR, c, max(win), len(win),
                             c * 1_000_000 // max(win)))
        assert duck == ref, (trial, sorted(buckets.items()))


def test_sketch_union_is_lossless(spark, sf_dir):
    """Per-day KMV sketches max-merged must reproduce the whole-corpus
    sketch exactly — the associativity the 100 TB merge story rests on
    (the query also asserts this in-process)."""
    row = A.q_sketch_union(spark, sf_dir).collect()[0]
    assert row.merge_exact
    assert row.est_union == row.est_direct
    assert row.k == A.KMV_K and row.n_days > 1


def test_mad_outliers_matches_python_reference(spark, sf_dir):
    """The counting-median form must equal a plain sorted-list median/MAD
    reference computed from the same fixed-point values."""
    import statistics

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("CAST(round(value * 1e6) AS BIGINT)").alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.v)
    rows = {r.event_type: r for r in A.q_mad_outliers(spark, sf_dir).collect()}
    assert set(rows) == set(by_type)
    for ty, vals in by_type.items():
        med = statistics.median(vals)  # exact: .5 at worst on integers
        devs = [abs(2 * v - int(2 * med)) for v in vals]
        mad2 = statistics.median(devs)
        r = rows[ty]
        assert r.n_events == len(vals)
        assert abs(r.median_value - round(med / 1e6, 6)) < 1e-9, ty
        assert abs(r.mad - round(mad2 / 2e6, 6)) < 1e-9, ty
        n_out = sum(
            1 for d in devs if A.MAD_Z_NUM * d > A.MAD_Z_DEN * int(2 * mad2)
        )
        assert r.n_outliers == n_out, ty
        assert r.outlier_ppm == 1_000_000 * n_out // len(vals)


def test_mad_outliers_duckdb_oracle_matches_python_fuzz():
    """JVM-free seeded-fuzz differential for the median/MAD oracle:
    random integer-valued soups (heavy ties, odd/even group sizes,
    planted spikes) vs a sorted-list Python reference."""
    import random
    import statistics
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    from langchain_callback_parquet_logger_spark.operators.analytic import (
        MAD_Z_DEN,
        MAD_Z_NUM,
        ORACLES,
    )

    def round_half_up(x: float, nd: int) -> float:
        return float(
            Decimal(repr(x)).quantize(
                Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP
            )
        )

    rng = random.Random(6229)
    for trial in range(10):
        rows = []
        for ty in ("x", "y"):
            base = rng.randint(-3, 3)
            for _ in range(rng.randint(1, 80)):
                v = base + rng.choice([0, 0, 0, 1, -1, rng.randint(-40, 40)])
                rows.append((ty, v * 250_000))
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT unnest(?) AS event_type, "
            "unnest(?) / 1e6 AS value",
            [[r[0] for r in rows], [float(r[1]) for r in rows]],
        )
        duck = {
            r[0]: tuple(r[1:])
            for r in con.execute(ORACLES["q_mad_outliers"]).fetchall()
        }
        con.close()

        by_type: dict = {}
        for ty, v in rows:
            by_type.setdefault(ty, []).append(v)
        for ty, vals in by_type.items():
            med2 = int(2 * statistics.median(vals))
            devs = [abs(2 * v - med2) for v in vals]
            mad4 = int(2 * statistics.median(devs))
            n_out = sum(1 for d in devs if MAD_Z_NUM * d > MAD_Z_DEN * mad4)
            ref = (
                len(vals),
                round_half_up(med2 / 2e6, 6),
                round_half_up(mad4 / 4e6, 6),
                n_out,
                1_000_000 * n_out // len(vals),
            )
            assert duck[ty] == ref, (trial, ty, duck[ty], ref)


def test_ks_drift_bounds_and_null_case(spark, sf_dir):
    """KS is a ppm in [0, 1e6]; the fixture's two month-halves draw from
    the same generator, so no event type should drift at α=0.05 (a
    failure here means the statistic, not the data, broke)."""
    rows = A.q_ks_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.ks_ppm <= 1_000_000
        assert r.n_first_half > 0 and r.n_second_half > 0
        assert r.drifted == (r.ks_ppm > r.crit_ppm)


def test_ks_drift_duckdb_oracle_matches_python_fuzz():
    """JVM-free seeded-fuzz differential: the counting-CDF KS oracle vs a
    sorted two-sample reference (scipy-free: sup over pooled support of
    |F_a - F_b| with exact rational arithmetic). Includes a planted-shift
    trial that must flag drifted."""
    import random
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    from langchain_callback_parquet_logger_spark.operators.analytic import (
        KS_ALPHA_C_PPM,
        ORACLES,
    )

    def round_half_up_int(x: float) -> int:
        return int(
            Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    rng = random.Random(7331)
    for trial in range(11):
        rows = []
        shift = 5 if trial == 0 else 0  # planted drift in trial 0
        for _ in range(rng.randint(40, 300)):
            # trial 10: all rows in one half — the one-sided guard case
            day = rng.randint(1, 14) if trial == 10 else rng.randint(1, 28)
            v = rng.randint(-4, 4) + (shift if day > 15 else 0)
            rows.append((day, "x", v * 250_000))
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT "
            "make_timestamp(2024, 1, unnest(?), 0, 0, 0.0) AS ts, "
            "unnest(?) AS event_type, unnest(?) / 1e6 AS value",
            [[r[0] for r in rows], [r[1] for r in rows],
             [float(r[2]) for r in rows]],
        )
        duck = con.execute(ORACLES["q_ks_drift"]).fetchall()
        con.close()
        assert len(duck) == 1
        _, na, nb, ks_ppm, crit_ppm, drifted = duck[0]

        a = sorted(v for d, _, v in rows if d <= 15)
        b = sorted(v for d, _, v in rows if d > 15)
        assert (len(a), len(b)) == (na, nb)
        if not a or not b:
            # one-sided cohort: NULL metrics, drifted must flag TRUE
            assert (ks_ppm, crit_ppm, drifted) == (None, None, True), trial
            continue
        support = sorted(set(a) | set(b))
        d_int = 0
        for s in support:
            ca = sum(1 for v in a if v <= s)
            cb = sum(1 for v in b if v <= s)
            d_int = max(d_int, abs(ca * len(b) - cb * len(a)))
        ref_ks = round_half_up_int(d_int / (len(a) * len(b)) * 1e6)
        ref_crit = round_half_up_int(
            KS_ALPHA_C_PPM
            * ((len(a) + len(b)) / (len(a) * len(b))) ** 0.5
        )
        assert ks_ppm == ref_ks, (trial, ks_ppm, ref_ks)
        assert crit_ppm == ref_crit
        assert drifted == (ref_ks > ref_crit)
        if trial == 0:
            assert drifted, "planted shift must be detected"
