"""Training-data curation example (beyond the reference — the north-star
operators): quality-gate + language-ID + exact dedup in one fused plan,
near-dup clustering, and embedding top-k — over the driver testdata.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_callback_parquet_logger_spark import get_spark, load_table
from langchain_callback_parquet_logger_spark.operators.graph import q_dedup_clusters
from langchain_callback_parquet_logger_spark.operators.pipeline import clean_corpus
from langchain_callback_parquet_logger_spark.operators.similarity import (
    q_knn_bruteforce,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example-curation")

    docs = load_table(spark, SF_DIR, "documents")
    cleaned = clean_corpus(docs)
    print(f"corpus: {docs.count()} docs -> {cleaned.count()} after quality+dedup")
    cleaned.groupBy("lang").count().show()

    clusters = q_dedup_clusters(spark, SF_DIR)
    print(f"near-dup clusters: {clusters.count()}")

    knn = q_knn_bruteforce(spark, SF_DIR)
    knn.show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
