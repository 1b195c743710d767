"""Per-stage profile of the round-13 verdict #4 trio:
q_lsh_pair_audit / q_dedup_threshold_sweep / q_winnow_matches.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/text_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_callback_parquet_logger_spark.plans.session import (
    get_spark,
    load_table,
    release_caches,
    spread,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))


def main() -> None:
    from pyspark.sql import functions as F

    from langchain_callback_parquet_logger_spark.operators import dedup as D

    spark = get_spark("text-profile")
    spark.range(1).count()
    out: dict[str, list[float]] = {}

    def t(name: str, thunk) -> None:
        t0 = time.perf_counter()
        thunk()
        out.setdefault(name, []).append(round(time.perf_counter() - t0, 3))
        release_caches()

    for _ in range(REPS):
        # --- q_lsh_pair_audit legs ---
        t("audit_exact_leg", lambda: D.q_ngram_jaccard(spark, SF_DIR).count())
        t("audit_lsh_leg", lambda: D.q_minhash_dedup(spark, SF_DIR).count())
        t("q_lsh_pair_audit", lambda: D.q_lsh_pair_audit(spark, SF_DIR).count())
        # shingle sub-stage: the per-doc shingle arrays alone
        t(
            "shingles_only",
            lambda: spread(load_table(spark, SF_DIR, "documents"))
            .select("doc_id", D.shingles(F.col("text")).alias("sh"))
            .select(F.sum(F.size("sh")))
            .count(),
        )
        # minhash signatures alone (shingle + 16-way hash, no bands/join)
        t(
            "minhash_sigs_only",
            lambda: D.minhash_signatures(
                spread(load_table(spark, SF_DIR, "documents"))
            ).count(),
        )

        # --- q_dedup_threshold_sweep stages ---
        t(
            "sweep_pairs_at_floor",
            lambda: D.ngram_jaccard_pairs(
                spread(load_table(spark, SF_DIR, "documents")), D.SWEEP_FLOOR
            ).count(),
        )
        t("q_dedup_threshold_sweep", lambda: D.q_dedup_threshold_sweep(spark, SF_DIR).count())

        # --- q_winnow_matches stages ---
        t(
            "winnow_fp_rows",
            lambda: D.winnow_fingerprint_rows(
                spread(load_table(spark, SF_DIR, "documents"))
            ).count(),
        )
        t("q_winnow_matches", lambda: D.q_winnow_matches(spark, SF_DIR).count())

    import statistics

    med = {k: statistics.median(v) for k, v in out.items()}
    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "median": med, "runs": out}, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
