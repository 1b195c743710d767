"""End-to-end corpus-curation pipeline (operators/pipeline.py) plus
property-based tests (hypothesis) for the pure helpers — exceeding the
reference's test strategy (SURVEY.md §5: no property testing there)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from langchain_callback_parquet_logger_spark.ingest import (
    extract_custom_id_from_tags,
    with_tags,
)
from langchain_callback_parquet_logger_spark.operators import pipeline as P
from langchain_callback_parquet_logger_spark.plans.session import load_table
from langchain_callback_parquet_logger_spark.schema import CUSTOM_ID_PREFIX


def test_corpus_clean_runs(spark, sf_dir):
    rows = P.q_corpus_clean(spark, sf_dir).collect()
    assert rows and all(r.n_docs > 0 and r.total_tokens > 0 for r in rows)


def test_clean_corpus_quality_gate_and_dedup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cleaned = P.clean_corpus(docs)
    assert cleaned.filter(F.col("quality") < P.QUALITY_THRESHOLD).count() == 0
    # exact dedup: no two surviving docs share a fingerprint
    from langchain_callback_parquet_logger_spark.operators.text import fingerprint

    fps = (
        cleaned.join(docs.select("doc_id", "text"), "doc_id")
        .select(fingerprint(F.col("text")).alias("fp"))
    )
    assert fps.count() == fps.distinct().count()


def test_clean_corpus_fuses_scan_stages(spark, sf_dir):
    """Stages 1-2 must fuse into the scan projection: exactly ONE exchange
    (the fingerprint rank-1 window) before the final aggregate's, and no
    SortAggregate — the min(struct) argmin variant was A/B-measured 1.7×
    slower at 10× (fingerprints are ~unique, so its partial leg collapses
    nothing and it double-sorts the heavy scored rows; see clean_corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    plan = P.q_corpus_clean(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 3  # fp window + lang agg (+AQE read)
    assert "SortAggregate" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hash_sample_deterministic_and_near_rate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = P.hash_sample(docs, F.col("doc_id")).select("doc_id")
    b = P.hash_sample(docs, F.col("doc_id")).select("doc_id")
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
    rate = a.count() / docs.count()
    assert 0.03 <= rate <= 0.25  # ~10% with small-sample slack


def test_training_order_shards_tile_and_conserve(spark, sf_dir):
    """Shards partition the corpus: ids 0..NUM_SHARDS-1, doc/token totals
    conserved, key ranges within the 60-bit hash space, and the order key
    is reproducible (salted md5 — recompute one doc in Python)."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents")
    rows = P.q_training_order(spark, sf_dir).collect()
    assert {r.shard for r in rows} <= set(range(P.NUM_SHARDS))
    assert sum(r.n_docs for r in rows) == docs.count()
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.col("text"), " ")))
    ).first()[0]
    assert sum(r.n_tokens for r in rows) == total_tokens
    for r in rows:
        assert 0 <= r.first_key <= r.last_key < (1 << 60)
        assert r.first_key % P.NUM_SHARDS == r.shard
        assert r.last_key % P.NUM_SHARDS == r.shard

    some_id = docs.select("doc_id").first()[0]
    expect = int(hashlib.md5(f"order:{some_id}".encode()).hexdigest()[:15], 16)
    got = docs.filter(F.col("doc_id") == some_id).select(
        P.training_order_key(F.col("doc_id"))
    ).first()[0]
    assert got == expect


def test_leakage_safe_split_no_fingerprint_spans_splits(spark, sf_dir):
    """The invariant the operator exists for: recompute the per-doc split
    tags and assert no duplicate group has members in both splits, and
    that the rollup conserves docs/groups."""
    from langchain_callback_parquet_logger_spark.operators.dedup import hash60
    from langchain_callback_parquet_logger_spark.operators.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
    canon = keyed.groupBy("fp").agg(F.min("doc_id").alias("cid"))
    bucket = hash60(F.concat(F.lit("split:"), F.col("cid").cast("string")))
    tagged = keyed.join(canon, "fp").select(
        "fp", F.when(bucket % 100 < P.TRAIN_PCT, "train").otherwise("val").alias("s")
    )
    spanning = (
        tagged.groupBy("fp")
        .agg(F.countDistinct("s").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert spanning == 0

    rows = P.q_leakage_safe_split(spark, sf_dir).collect()
    assert {r.split for r in rows} <= {"train", "val"}
    assert sum(r.n_docs for r in rows) == docs.count()
    n_groups_total = keyed.select("fp").distinct().count()
    # fingerprint groups are lang-pure in this corpus (fingerprint includes
    # the text; dupes share lang), so per-(split,lang) groups sum to total
    assert sum(r.n_groups for r in rows) == n_groups_total


def test_domain_cap_enforced(spark, sf_dir):
    rows = P.q_domain_cap(spark, sf_dir).collect()
    assert rows and all(r.n_kept <= P.DOMAIN_CAP for r in rows)


# ---------------------------------------------------------------------------
# Property-based: with_tags / custom-id round trip (reference
# tagging.py:7-98 semantics, pinned over arbitrary inputs).
# ---------------------------------------------------------------------------

_tag = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters=":\x00"),
    min_size=0,
    max_size=20,
)
_custom_id = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    min_size=1,
    max_size=30,
)


@given(tags=st.lists(_tag, max_size=5), custom_id=_custom_id)
@settings(max_examples=50, deadline=None)
def test_with_tags_embed_extract_roundtrip_python(tags, custom_id):
    cfg = with_tags(*tags, custom_id=custom_id)
    embedded = [t for t in cfg["tags"] if t.startswith(CUSTOM_ID_PREFIX)]
    assert embedded == [f"{CUSTOM_ID_PREFIX}{custom_id}"]
    # plain tags that don't collide with the prefix survive in order
    assert [t for t in cfg["tags"][: len(tags)]] == list(tags)


def test_custom_id_roundtrip_spark(spark):
    """The Spark-side extraction inverts the Python-side embedding for a
    sampled set of ids (one Spark job for the whole sample)."""
    ids = ["a", "id-42", "x y z", "Ä", "trailing ", " lead", "a:b"]
    rows = [(i, with_tags("t0", custom_id=i)["tags"]) for i in ids]
    df = spark.createDataFrame(rows, "custom_id string, tags array<string>")
    out = df.select(
        "custom_id", extract_custom_id_from_tags(F.col("tags")).alias("extracted")
    )
    assert out.filter(F.col("custom_id") != F.col("extracted")).count() == 0


# ---------------------------------------------------------------------------
# Property-based: as-of join vs naive per-row maximum (small random data).
# ---------------------------------------------------------------------------

_ts = st.integers(min_value=0, max_value=50)
_key = st.integers(min_value=0, max_value=3)


@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=12),
    right=st.lists(st.tuples(_key, _ts), min_size=0, max_size=12),
)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_naive(spark, left, right):
    from langchain_callback_parquet_logger_spark.operators.temporal import asof_join

    # right must be unique per (key, ts) — the operator's documented contract
    right = list({(k, t): None for k, t in right}.keys())
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k bigint, ts bigint, lid bigint"
    )
    rdf = spark.createDataFrame(
        [(k, t, 100 + i) for i, (k, t) in enumerate(right)],
        "k bigint, ts bigint, rid bigint",
    )
    got = {
        r.lid: r.matched.rid if r.matched else None
        for r in asof_join(ldf, rdf, on="k").collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, 100 + j) for j, (rk, rt) in enumerate(right) if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (k, t, cands)


def test_dsir_weights_separate_target_domain(spark, sf_dir):
    """One score per doc, n_feats = unigrams + bigrams = 2n-1, and docs
    from the target source score higher on average than the rest (their
    own features define the target distribution)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n")
    ).collect()
    src = {r.doc_id: r.source for r in docs}
    nw = {r.doc_id: r.n for r in docs}
    from langchain_callback_parquet_logger_spark.plans.session import release_caches

    try:
        rows = P.q_dsir_weights(spark, sf_dir).collect()
    finally:
        release_caches()
    assert len(rows) == len(docs)
    for r in rows:
        assert r.n_feats == 2 * nw[r.doc_id] - 1
    t = [r.dsir_logratio for r in rows if src[r.doc_id] == P.DSIR_TARGET_SOURCE]
    o = [r.dsir_logratio for r in rows if src[r.doc_id] != P.DSIR_TARGET_SOURCE]
    assert t and o
    assert sum(t) / len(t) > sum(o) / len(o)


def test_mixture_sample_rates_and_membership(spark, sf_dir):
    """Each stratum's kept set must equal the md5-bucket rule at its own
    rate: rate-100 keeps everything, absent strata drop to default_pct,
    and membership is a subset of the global hash_sample at a higher
    rate (consistency across operators)."""
    from pyspark.sql import functions as F

    from langchain_callback_parquet_logger_spark.operators.pipeline import (
        hash_sample,
        mixture_sample,
    )
    from langchain_callback_parquet_logger_spark.plans.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 100, "fr": 0, "de": 30}
    kept = mixture_sample(docs, F.col("doc_id"), "lang", rates)
    by_lang = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}

    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("en") == totals["en"]          # rate 100 keeps all
    assert "fr" not in by_lang                        # rate 0 drops all
    assert "es" not in by_lang and "zh" not in by_lang  # absent strata drop
    assert 0 < by_lang.get("de", 0) < totals["de"]    # partial rate

    # membership consistency: de@30 is exactly hash_sample@30 restricted to de
    de_mix = {r.doc_id for r in kept.filter(F.col("lang") == "de").select("doc_id").collect()}
    de_hash = {
        r.doc_id
        for r in hash_sample(docs.filter(F.col("lang") == "de"), F.col("doc_id"), 30)
        .select("doc_id")
        .collect()
    }
    assert de_mix == de_hash

    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_integer_div_parity_spark_duckdb_python():
    """q_token_budget_plan's planned-token arithmetic relies on Spark
    `div` == DuckDB `//` == Python `//` for non-negative BIGINTs —
    pin it on a seeded grid including budget-boundary edges."""
    import random

    import duckdb

    rng = random.Random(21)
    cases = [(0, 1, 1), (1, 1, 1), (5, 3, 2), (10**12, 7, 210)] + [
        (rng.randrange(0, 10**12), rng.randrange(1, 10**4), rng.randrange(1, 500))
        for _ in range(200)
    ]
    con = duckdb.connect()
    for tot, w, wsum in cases:
        ref = (tot // 2) * w // wsum
        duck = con.execute(
            "SELECT (?::BIGINT // 2) * ?::BIGINT // ?::BIGINT", [tot, w, wsum]
        ).fetchone()[0]
        assert duck == ref, (tot, w, wsum, duck, ref)
    # NEGATIVE dividends: DuckDB // (and Spark div — verified -1501 div
    # 1000 = -1) TRUNCATES toward zero, while Python // floors.  Pin the
    # divergence so no Python twin ever uses `//` on a value that can go
    # negative (q_cost_attribution's numerator contract).
    for a, b, trunc in [(-1501, 1000, -1), (-999, 1000, 0), (-1000, 1000, -1)]:
        duck = con.execute("SELECT ?::BIGINT // ?::BIGINT", [a, b]).fetchone()[0]
        assert duck == trunc, (a, b, duck)
    assert -1501 // 1000 == -2  # Python floors — the twin trap


def test_token_budget_plan_invariants(spark, sf_dir):
    """Planner outputs: planned tokens never exceed the budget in total
    (floor division under-allocates only), rates are positive, epochs =
    ceil(rate), and target shares sum to ~1."""
    from langchain_callback_parquet_logger_spark.operators import (
        pipeline as P,
    )

    rows = P.q_token_budget_plan(spark, sf_dir).collect()
    assert rows
    tot_tokens = sum(r.n_tokens for r in rows)
    budget = tot_tokens // 2
    assert sum(r.planned_tokens for r in rows) <= budget
    assert abs(sum(r.target_share for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert r.planned_tokens >= 0 and r.sample_rate >= 0
        want_epochs = -(-r.planned_tokens // r.n_tokens)
        assert r.epochs == want_epochs, (r.source, r.epochs, want_epochs)


def test_data_quality_checks_metrics_recompute(spark, sf_dir):
    """Every verdict row's metric must equal the directly-recomputed
    ratio, and passed must equal metric >= threshold; the clean driver
    fixture passes all eight constraints."""
    rows = {r.check_name: r for r in P.q_data_quality_checks(spark, sf_dir).collect()}
    assert set(rows) == set(P.DQ_THRESHOLDS)
    for name, r in rows.items():
        assert r.threshold_ppm == P.DQ_THRESHOLDS[name]
        assert r.passed == (r.metric_ppm >= r.threshold_ppm), name
        assert 0 <= r.metric_ppm <= 1_000_000, name
        assert r.passed, f"clean fixture should satisfy {name}"
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    nn_value = ev.filter(F.col("value").isNotNull()).count()
    assert rows["events_completeness_value"].metric_ppm == 1_000_000 * nn_value // n


def test_data_quality_checks_flags_dirty_batch(spark, tmp_path):
    """A batch with nulls, a duplicate id and an out-of-enum type must
    fail the matching constraints — the gate actually gates.  NULLs,
    however, are the COMPLETENESS checks' business: a NULL user_id /
    NULL text row is tolerated by the 1M-ppm consistency checks (round-9
    advice fix — the exact ppm values below pin that a NULL counts as
    consistent, not as a violation)."""
    import os

    dirty_dir = str(tmp_path / "dirty")
    os.makedirs(dirty_dir)
    spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "click", 1.0, "{}"),
            (1, "2024-01-01 00:00:01", 11, "zzz-bad", None, "{}"),
            (2, "2024-01-01 00:00:02", -5, "view", 2.0, None),
            (3, "2024-01-01 00:00:03", None, "view", 3.0, "{}"),
        ],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        os.path.join(dirty_dir, "events.parquet")
    )
    spark.createDataFrame(
        [
            (1, "", "en", "web", 0),
            (2, "hello", "en", "web", 99),
            (3, None, "en", "web", 7),
            (4, "abcd", "en", "web", None),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(os.path.join(dirty_dir, "documents.parquet"))
    rows = {
        r.check_name: r
        for r in P.q_data_quality_checks(spark, dirty_dir).collect()
    }
    verdicts = {name: r.passed for name, r in rows.items()}
    assert not verdicts["events_completeness_value"]
    assert not verdicts["events_uniqueness_event_id"]
    assert not verdicts["events_containment_event_type"]
    assert not verdicts["events_nonneg_user_id"]
    assert not verdicts["docs_consistency_n_chars"]
    assert not verdicts["docs_nonempty_text"]
    # The NULLs the consistency checks now tolerate are caught by the
    # matching completeness checks — the policy fails CLOSED overall:
    assert not verdicts["events_completeness_user_id"]  # 3/4 < 990k
    assert not verdicts["docs_completeness_text"]  # 3/4 < 990k
    assert not verdicts["docs_completeness_n_chars"]  # 3/4 < 990k
    # NULL tolerance, exactly: 3 of 4 events pass nonneg (only -5
    # fails; the NULL user_id is completeness's problem), 3 of 4 docs
    # pass n_chars consistency (only the 99≠5 mismatch fails — NULL
    # text AND NULL n_chars are both tolerated here).
    assert rows["events_nonneg_user_id"].metric_ppm == 1_000_000 * 3 // 4
    assert rows["docs_consistency_n_chars"].metric_ppm == 1_000_000 * 3 // 4


def test_dataset_diff_classes_tile_and_reconcile(spark, sf_dir):
    """Diff classes partition the key universe: added+removed+changed+
    unchanged row counts reconcile with the snapshot definitions, and
    drift is nonzero only for added/removed/changed."""
    rows = P.q_dataset_diff(spark, sf_dir).collect()
    by_status: dict = {}
    for r in rows:
        by_status[r.status] = by_status.get(r.status, 0) + r.n_keys
        if r.status == "unchanged":
            assert r.sum_abs_drift_ppm == 0
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    n_old = ev.filter(F.col("event_id") % 10 != 7).count()
    n_new = ev.filter(F.col("event_id") % 10 != 3).count()
    assert by_status.get("removed", 0) == n - n_new
    assert by_status.get("added", 0) == n - n_old
    both = n_old + n_new - n
    assert by_status.get("changed", 0) + by_status.get("unchanged", 0) == both


def test_dataset_diff_duckdb_oracle_matches_python_fuzz():
    """JVM-free seeded-fuzz differential: the full-outer classify oracle
    vs a dict-based Python reference on random key soups (dup-free keys,
    random membership, random value bumps)."""
    import random

    import duckdb

    rng = random.Random(4117)
    for trial in range(10):
        n = rng.randint(1, 200)
        rows = [
            (
                i,
                rng.choice(["a", "b"]),
                # NULL values are in-domain: membership, not value
                # nullability, must drive the classification
                None if rng.random() < 0.1 else rng.randint(-5, 5) * 250_000,
            )
            for i in range(n)
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT unnest(?) AS event_id, "
            "unnest(?) AS event_type, unnest(?) / 1e6 AS value",
            [[r[0] for r in rows], [r[1] for r in rows],
             [None if r[2] is None else float(r[2]) for r in rows]],
        )
        duck = {
            (r[0], r[1]): (r[2], r[3])
            for r in con.execute(P.ORACLES["q_dataset_diff"]).fetchall()
        }
        con.close()

        agg: dict = {}
        for eid, ty, v in rows:
            in_old = eid % 10 != 7
            in_new = eid % 10 != 3
            old_v = v if in_old else None
            new_v = (
                (None if v is None else v + 1_000_000)
                if eid % 5 == 0
                else v
            ) if in_new else None
            if not in_old:
                status = "added"
            elif not in_new:
                status = "removed"
            elif old_v != new_v:  # None != int and None == None work here
                status = "changed"
            else:
                status = "unchanged"
            drift = abs((new_v or 0) - (old_v or 0))
            k = (ty, status)
            cnt, dr = agg.get(k, (0, 0))
            agg[k] = (cnt + 1, dr + drift)
        assert duck == agg, (trial, duck, agg)


def test_vocab_overlap_bounds_and_symmetric_pairs(spark, sf_dir):
    """Jaccard ppm in [0, 1e6]; common <= min(na, nb); each unordered
    source pair appears exactly once with source_a < source_b — and the
    output enumerates the FULL pair universe (zero-overlap pairs are
    explicit jaccard_ppm=0 rows, round-9 advice fix)."""
    rows = P.q_vocab_overlap(spark, sf_dir).collect()
    assert rows
    sources = set()
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        sources.update((r.source_a, r.source_b))
        assert 0 <= r.common <= min(r.na, r.nb)
        assert 0 <= r.jaccard_ppm <= 1_000_000
        assert r.jaccard_ppm == 1_000_000 * r.common // (r.na + r.nb - r.common)
    n = len(sources)
    assert len(rows) == n * (n - 1) // 2, "pair universe must be complete"


def test_quota_resample_exact_balance(spark, sf_dir):
    """Every language keeps exactly quota = min(class size) documents —
    the exact-balance contract rate-based sampling can't give."""
    rows = P.q_quota_resample(spark, sf_dir).collect()
    assert rows
    quota = min(r.n_total for r in rows)
    for r in rows:
        assert r.n_kept == quota, r.lang
        assert r.kept_chars > 0 and r.min_hash >= 0


def test_quota_resample_survivors_are_hash_minimal(spark, sf_dir):
    """The kept set per language must be exactly the quota smallest
    (hash, doc_id) pairs — deterministic selection, not arbitrary."""
    from langchain_callback_parquet_logger_spark.operators.dedup import (
        hash60,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        hash60(
            F.concat(F.lit("quota:"), F.col("doc_id").cast("string"))
        ).alias("h"),
    )
    by_lang: dict = {}
    for r in docs.collect():
        by_lang.setdefault(r.lang, []).append((r.h, r.doc_id, r.n_chars))
    quota = min(len(v) for v in by_lang.values())
    want = {
        lang: (
            quota,
            sum(c for _, _, c in sorted(v)[:quota]),
            min(h for h, _, _ in sorted(v)[:quota]),
        )
        for lang, v in by_lang.items()
    }
    got = {
        r.lang: (r.n_kept, r.kept_chars, r.min_hash)
        for r in P.q_quota_resample(spark, sf_dir).collect()
    }
    assert got == want


def test_vocab_overlap_duckdb_oracle_matches_python_fuzz():
    """JVM-free seeded-fuzz differential: the posting-join vocabulary
    Jaccard oracle vs Python set arithmetic on random word soups
    (includes empty-text docs — split('') yields [''] in both engines,
    and the round-9 advice fix EXCLUDES '' from the vocabulary, so the
    twin must too; zero-overlap pairs are explicit common=0 rows)."""
    import random

    import duckdb

    rng = random.Random(9041)
    words = [f"w{i}" for i in range(30)]
    for trial in range(10):
        docs = []
        for i in range(rng.randint(2, 60)):
            src = rng.choice(["s1", "s2", "s3"])
            text = (
                ""
                if rng.random() < 0.05
                else " ".join(
                    rng.choice(words)
                    for _ in range(rng.randint(1, 12))
                )
            )
            docs.append((i, src, text))
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT unnest(?) AS doc_id, "
            "unnest(?) AS source, unnest(?) AS text",
            [[d[0] for d in docs], [d[1] for d in docs],
             [d[2] for d in docs]],
        )
        duck = {
            (r[0], r[1]): tuple(r[2:])
            for r in con.execute(P.ORACLES["q_vocab_overlap"]).fetchall()
        }
        con.close()

        vocab: dict = {}
        for _, src, text in docs:
            vocab.setdefault(src, set()).update(
                w for w in text.split(" ") if w != ""
            )
        ref = {}
        for a in sorted(vocab):
            for b in sorted(vocab):
                if a >= b:
                    continue
                if not vocab[a] or not vocab[b]:
                    continue  # empty-vocab source: absent from sizes
                common = len(vocab[a] & vocab[b])
                union = len(vocab[a] | vocab[b])
                ref[(a, b)] = (
                    len(vocab[a]),
                    len(vocab[b]),
                    common,
                    1_000_000 * common // union,
                )
        assert duck == ref, (trial, duck, ref)


def test_langid_confusion_duckdb_oracle_parses():
    """The confusion oracle nests the full lang-ID oracle as a CTE; make
    sure it stays executable DuckDB SQL against a tiny synthetic table
    (value agreement is covered by the oracle gate + the Spark-side
    tiling test)."""
    import duckdb

    from langchain_callback_parquet_logger_spark.operators.text import (
        ORACLES as TEXT_ORACLES,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT 1 AS doc_id, "
        "'the quick fox' AS text, 'en' AS lang, 's' AS source, "
        "13 AS n_chars"
    )
    rows = con.execute(TEXT_ORACLES["q_langid_confusion"]).fetchall()
    con.close()
    assert rows == [("en", "en", 1, 1_000_000)]
