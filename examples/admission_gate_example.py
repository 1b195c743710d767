"""Nightly batch-admission gate: the quality/drift session a 100 TB
training-data pipeline runs BEFORE a new batch is allowed anywhere near
dedup, mixing, or the tokenizer — composed entirely from graded
operators (round-8 data-quality family):

1. constraint suite — q_data_quality_checks: one-scan Deequ-style
   verdict rows; any failed constraint vetoes the batch.
2. distribution drift — q_ks_drift: exact two-sample KS between the
   month halves per event type; a drifted type flags investigation.
3. key reconcile — q_dataset_diff: added/removed/changed counts between
   the old and new snapshot carve-outs.
4. class balance — q_quota_resample: what an exact per-language quota
   would keep, and q_vocab_overlap: where sources overlap enough that
   dedup pressure will be high.
5. classifier health — q_langid_confusion: per-class recall of the
   lang-ID the bucketing depends on.

Reference provenance: the reference logs LLM calls and stops there
(/root/reference/langchain_callback_parquet_logger/logger.py); every
admission check here is what a pipeline consuming those logs at scale
must add around it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_callback_parquet_logger_spark import get_spark
from langchain_callback_parquet_logger_spark.operators import analytic as an
from langchain_callback_parquet_logger_spark.operators import pipeline as pl
from langchain_callback_parquet_logger_spark.operators import text as tx

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    spark = get_spark("admission-gate-example")

    print("== 1. constraint suite ==")
    verdicts = pl.q_data_quality_checks(spark, SF_DIR).collect()
    failed = [r.check_name for r in verdicts if not r.passed]
    for r in verdicts:
        flag = "PASS" if r.passed else "FAIL"
        print(f"  {flag} {r.check_name}: {r.metric_ppm} ppm "
              f"(threshold {r.threshold_ppm})")

    print("== 2. distribution drift (two-sample KS) ==")
    drifted = []
    for r in an.q_ks_drift(spark, SF_DIR).collect():
        # drifted is TRUE for one-sided cohorts too (ks_ppm NULL): a
        # type the statistic can't certify must be investigated, not
        # silently admitted
        mark = "DRIFT" if r.drifted else "ok"
        print(f"  {mark} {r.event_type}: ks={r.ks_ppm} ppm "
              f"(crit {r.crit_ppm})")
        if r.drifted:
            drifted.append(r.event_type)

    print("== 3. snapshot reconcile ==")
    for r in sorted(
        pl.q_dataset_diff(spark, SF_DIR).collect(),
        key=lambda r: (r.event_type, r.status),
    ):
        print(f"  {r.event_type:10s} {r.status:10s} n={r.n_keys} "
              f"drift={r.sum_abs_drift_ppm}")

    print("== 4. class balance + source redundancy ==")
    for r in pl.q_quota_resample(spark, SF_DIR).collect():
        print(f"  {r.lang}: keep {r.n_kept}/{r.n_total} "
              f"({r.kept_chars} chars)")
    top = sorted(
        pl.q_vocab_overlap(spark, SF_DIR).collect(),
        key=lambda r: -r.jaccard_ppm,
    )[:3]
    for r in top:
        print(f"  overlap {r.source_a}~{r.source_b}: "
              f"{r.jaccard_ppm} ppm vocab Jaccard")

    print("== 5. lang-ID health ==")
    for r in sorted(
        tx.q_langid_confusion(spark, SF_DIR).collect(),
        key=lambda r: (r.labeled_lang, r.predicted_lang),
    ):
        print(f"  {r.labeled_lang}->{r.predicted_lang}: {r.n_docs} "
              f"({r.row_ppm} ppm)")

    admitted = not failed and not drifted
    print(f"== verdict: {'ADMIT' if admitted else 'HOLD'} "
          f"(failed={failed or 'none'}, drifted={drifted or 'none'}) ==")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
