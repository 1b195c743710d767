"""Read-side query surface: every declared query runs and returns sane rows
at sf0.001. Value-level correctness is enforced by tools/check_oracle.py and
the driver's DuckDB gate; these tests pin shapes and a few hand-checked
invariants so pytest stays fast."""

from __future__ import annotations

import pytest

from langchain_callback_parquet_logger_spark.operators import queries as Q


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    rows = df.limit(5).collect()
    assert df.columns, name
    assert rows is not None


def test_registry_oracle_alignment():
    assert set(Q.ORACLES) <= set(Q.QUERIES)


def test_filter_event_type_only_selected(spark, sf_dir):
    df = Q.q_filter_event_type(spark, sf_dir)
    kinds = {r.event_type for r in df.select("event_type").distinct().collect()}
    assert kinds <= set(Q.FILTER_EVENT_TYPES)


def test_dedup_keep_last_unique_keys(spark, sf_dir):
    df = Q.q_dedup_keep_last(spark, sf_dir)
    assert df.count() == df.select("user_id", "event_type").distinct().count()


def test_anti_join_excludes_checkpoint(spark, sf_dir):
    df = Q.q_anti_join_checkpoint(spark, sf_dir)
    assert df.filter("event_id % 10 = 0").count() == 0


def test_topk_is_sorted_limit(spark, sf_dir):
    rows = Q.q_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_token_rollup_matches_manual(spark, sf_dir):
    from pyspark.sql import functions as F

    from langchain_callback_parquet_logger_spark.plans.session import load_table

    events = load_table(spark, sf_dir, "events")
    expected = events.groupBy("user_id").count().count()
    assert Q.q_token_rollup(spark, sf_dir).count() == expected


def test_cost_attribution_exact_money_recompute(spark, sf_dir):
    """Cost is exact fixed-point end to end: recompute every group's
    micro-dollar cost from raw events with Python integer arithmetic
    (same derivations) and require equality — no float ever touches a
    dollar. Also pins the dim join: every output model exists in
    MODEL_PRICE_DIM and every group's tokens reconcile."""
    import json
    from decimal import ROUND_HALF_UP, Decimal

    from langchain_callback_parquet_logger_spark.plans.session import load_table

    price = {i: (m, p, c) for i, m, p, c in Q.MODEL_PRICE_DIM}
    want: dict = {}
    for r in load_table(spark, sf_dir, "events").collect():
        k = int(json.loads(r.props)["k"])
        model, p_mic, c_mic = price[k % len(Q.MODEL_PRICE_DIM)]
        # half-away-from-zero like Spark/DuckDB round, not banker's
        pt = int(
            Decimal(repr(r.value * 100)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        key = (model, r.ts.date(), f"u-{r.user_id}")
        n, sp, sc, numer = want.get(key, (0, 0, 0, 0))
        want[key] = (n + 1, sp + pt, sc + k, numer + pt * p_mic + k * c_mic)
    got = {
        (r.model, r.event_date, r.custom_id): (
            r.n_calls,
            r.prompt_tokens,
            r.completion_tokens,
            r.cost_micros,
        )
        for r in Q.q_cost_attribution(spark, sf_dir).collect()
    }
    assert got == {
        key: (n, sp, sc, _trunc_div(numer, 1000))
        for key, (n, sp, sc, numer) in want.items()
    }


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — what Spark `div` and
    DuckDB `//` both do (verified: -1501 div 1000 = -1 in BOTH; Python's
    `//` floors to -2, so a Python twin must not use it on values that
    can go negative)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_cost_attribution_duckdb_oracle_matches_python_fuzz():
    """JVM-free seeded-fuzz differential: the DuckDB cost oracle vs a
    Python integer-arithmetic reference on adversarial inputs —
    including NEGATIVE k (pins the ((k % m) + m) % m ≡ pmod parity fix
    AND the truncating `div`/`//` on a negative cost numerator) and
    values whose ×100 lands near .5 (rounding is half-away in both
    engines and in the Decimal reference)."""
    import random
    from decimal import ROUND_HALF_UP, Decimal

    import duckdb

    m = len(Q.MODEL_PRICE_DIM)
    price = {i: (mm, p, c) for i, mm, p, c in Q.MODEL_PRICE_DIM}
    rng = random.Random(9042)
    for trial in range(10):
        # deterministic adversarial row: pt=1, k=-7 → group numerator
        # 800 - 7·4000 = -27200 → cost = trunc(-27.2) = -27, where a
        # floor-division twin would say -28
        rows = [(10_000, "2024-01-01 00:00:00", 9, "click", 0.01,
                 '{"k": -7}')]
        for i in range(rng.randint(5, 80)):
            k = rng.randint(-7, 120)  # negatives exercise the pmod leg
            val = rng.choice(
                [
                    round(rng.uniform(0.01, 500.0), 2),
                    rng.randint(0, 500) + 0.005,  # ×100 lands near .5
                    rng.randint(0, 500) + 0.015,
                ]
            )
            rows.append(
                (i, f"2024-0{rng.randint(1, 9)}-01 00:00:00",
                 rng.randint(0, 5), "click", val, '{"k": %d}' % k)
            )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT unnest(?) AS event_id, "
            "CAST(unnest(?) AS TIMESTAMP) AS ts, unnest(?) AS user_id, "
            "unnest(?) AS event_type, unnest(?) AS value, "
            "unnest(?) AS props",
            [list(c) for c in zip(*rows)],
        )
        duck = {
            (r[0], str(r[1]), r[2]): tuple(r[3:])
            for r in con.execute(Q.ORACLES["q_cost_attribution"]).fetchall()
        }
        con.close()

        want: dict = {}
        for _, ts, uid, _, val, props in rows:
            k = int(props[6:-1])
            model, p_mic, c_mic = price[k % m]  # Python % IS pmod here
            pt = int(
                Decimal(repr(val * 100)).quantize(
                    Decimal("1"), rounding=ROUND_HALF_UP
                )
            )
            key = (model, ts.split(" ")[0], f"u-{uid}")
            n, sp, sc, numer = want.get(key, (0, 0, 0, 0))
            want[key] = (
                n + 1, sp + pt, sc + k, numer + pt * p_mic + k * c_mic
            )
        # the oracle's cost = TRUNCATING div of the summed numerator
        # (Spark div and DuckDB // both truncate toward zero; Python //
        # floors and diverges on the negative-numerator group)
        ref = {
            key: (n, sp, sc, _trunc_div(numer, 1000))
            for key, (n, sp, sc, numer) in want.items()
        }
        assert duck == ref, (trial, duck, ref)


def test_priority_rollup_has_grand_total(spark, sf_dir):
    rows = Q.q_priority_rollup(spark, sf_dir).collect()
    totals = [r for r in rows if r.o_orderpriority is None and r.o_orderstatus is None]
    assert len(totals) == 1
    assert totals[0].n_orders == sum(
        r.n_orders for r in rows if r.o_orderpriority is not None and r.o_orderstatus is not None
    )


def test_sessionize_bounds(spark, sf_dir):
    for r in Q.q_sessionize(spark, sf_dir).collect():
        assert 1 <= r.n_sessions <= r.n_events


def test_revenue_by_nation_covers_all_lineitems(spark, sf_dir):
    from langchain_callback_parquet_logger_spark.plans.session import load_table

    total = Q.q_revenue_by_nation(spark, sf_dir).agg(
        {"n_lineitems": "sum"}
    ).first()[0]
    assert total == load_table(spark, sf_dir, "lineitem").count()


def test_stream_hourly_counts_total(spark, sf_dir):
    from langchain_callback_parquet_logger_spark.plans.session import load_table
    from langchain_callback_parquet_logger_spark.streaming.ingest import (
        q_stream_hourly_counts,
    )

    df = q_stream_hourly_counts(spark, sf_dir)
    assert df.agg({"n": "sum"}).first()[0] == load_table(spark, sf_dir, "events").count()
