"""Quality-classifier feature session: materialize the wide per-document
feature table, fit per-language feature moments (the scaler a classifier
trainer needs), and bucket the corpus by a composite signal — each step
one declarative Spark plan.

1. feature table  — q_doc_features: every cheap per-doc signal in one
                    row (text stats, ratios, surprisal, exact-dup flag).
2. scaler fit     — per-lang mean/std of each feature: two-phase hash
                    aggregate, one row per (lang, feature).
3. policy buckets — docs bucketed by quality × surprisal quadrant, the
                    keep/review/drop decision surface.

The feature table is what a real pipeline writes once and trains
against; at 100 TB every stage here stays scan + hash-aggregate shaped.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from langchain_callback_parquet_logger_spark import get_spark
from langchain_callback_parquet_logger_spark.operators.text import q_doc_features

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

FEATURES = ["stopword_ratio", "punct_ratio", "quality", "repetition", "avg_nll"]


def main() -> None:
    spark = get_spark("example-quality-features")

    feats = q_doc_features(spark, SF_DIR)
    # Materialize once (in production: write to the feature table);
    # both downstream consumers read the same cached frame.
    feats = feats.persist()
    try:
        print("1. per-document feature table (first rows):")
        feats.show(5)

        print("2. per-language feature moments (the scaler fit):")
        feats.groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            *[F.round(F.avg(c), 4).alias(f"mean_{c}") for c in FEATURES],
            *[F.round(F.stddev_pop(c), 4).alias(f"std_{c}") for c in FEATURES],
        ).orderBy("lang").show()

        print("3. quality x surprisal policy buckets:")
        med_q, med_nll = feats.agg(
            F.expr("percentile(quality, 0.5)"),
            F.expr("percentile(avg_nll, 0.5)"),
        ).first()
        feats.select(
            F.when(F.col("quality") >= med_q, "hi_q")
            .otherwise("lo_q")
            .alias("quality_band"),
            F.when(F.col("avg_nll") >= med_nll, "hi_surprisal")
            .otherwise("lo_surprisal")
            .alias("surprisal_band"),
        ).groupBy("quality_band", "surprisal_band").count().orderBy(
            "quality_band", "surprisal_band"
        ).show()
    finally:
        feats.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
