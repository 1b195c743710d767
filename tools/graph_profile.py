"""Per-stage profile of the graph family (round-13 verdict #2):
q_label_propagation / q_dedup_clusters / q_dup_centrality all pay the
MinHash edge input first; this times the edge stage vs the iteration
tail separately so the optimization target is named by measurement.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/graph_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_callback_parquet_logger_spark.plans.session import (
    get_spark,
    release_caches,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))


def main() -> None:
    from pyspark.sql import functions as F

    from langchain_callback_parquet_logger_spark.operators.dedup import (
        q_minhash_dedup,
    )
    from langchain_callback_parquet_logger_spark.operators.graph import (
        connected_components,
        label_propagation,
        pagerank_integer,
        q_dedup_clusters,
        q_dup_centrality,
        q_label_propagation,
    )

    spark = get_spark("graph-profile")
    spark.range(1).count()
    out: dict[str, list[float]] = {}

    def t(name: str, thunk) -> None:
        t0 = time.perf_counter()
        thunk()
        out.setdefault(name, []).append(round(time.perf_counter() - t0, 3))
        release_caches()

    for _ in range(REPS):
        # stage 1: the MinHash edge input alone
        t("edges_minhash", lambda: q_minhash_dedup(spark, SF_DIR).count())

        # LPA tail: edges materialized first (cached), then the 4 rounds
        def lpa_tail():
            pairs = q_minhash_dedup(spark, SF_DIR).select("doc_a", "doc_b")
            pairs = pairs.localCheckpoint(eager=True)  # edge cost paid here
            t0 = time.perf_counter()
            label_propagation(pairs, src="doc_a", dst="doc_b").groupBy(
                "label"
            ).count().count()
            out.setdefault("lpa_iterations_only", []).append(
                round(time.perf_counter() - t0, 3)
            )

        t("lpa_total_with_edges", lpa_tail)

        def cc_tail():
            pairs = q_minhash_dedup(spark, SF_DIR).select("doc_a", "doc_b")
            pairs = pairs.localCheckpoint(eager=True)
            t0 = time.perf_counter()
            connected_components(pairs, src="doc_a", dst="doc_b").groupBy(
                "label"
            ).count().count()
            out.setdefault("cc_iterations_only", []).append(
                round(time.perf_counter() - t0, 3)
            )

        t("cc_total_with_edges", cc_tail)

        def pr_tail():
            pairs = q_minhash_dedup(spark, SF_DIR).select("doc_a", "doc_b")
            pairs = pairs.localCheckpoint(eager=True)
            t0 = time.perf_counter()
            pagerank_integer(pairs, src="doc_a", dst="doc_b").count()
            out.setdefault("pr_iterations_only", []).append(
                round(time.perf_counter() - t0, 3)
            )

        t("pr_total_with_edges", pr_tail)

        # whole queries, bench-style
        t("q_label_propagation", lambda: q_label_propagation(spark, SF_DIR).count())
        t("q_dedup_clusters", lambda: q_dedup_clusters(spark, SF_DIR).count())
        t("q_dup_centrality", lambda: q_dup_centrality(spark, SF_DIR).count())

    import statistics

    med = {k: statistics.median(v) for k, v in out.items()}
    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "median": med, "runs": out}, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
