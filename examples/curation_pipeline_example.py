"""Training-data curation example (beyond the reference — the north-star
operators): quality-gate + language-ID + exact dedup in one fused plan,
near-dup clustering, and embedding top-k — over the driver testdata.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_callback_parquet_logger_spark import get_spark, load_table
from langchain_callback_parquet_logger_spark.plans.session import release_caches
from langchain_callback_parquet_logger_spark.operators.graph import q_dedup_clusters
from langchain_callback_parquet_logger_spark.operators.pipeline import clean_corpus
from langchain_callback_parquet_logger_spark.operators.dedup import (
    q_substring_dedup,
)
from langchain_callback_parquet_logger_spark.operators.similarity import (
    q_knn_bruteforce,
    q_semdedup,
)
from langchain_callback_parquet_logger_spark.operators.text import (
    q_unigram_logprob,
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

    # span-level signal: docs with verbatim 8-token windows shared across
    # the corpus (copied boilerplate even when the doc is not a near-dup)
    spans = q_substring_dedup(spark, SF_DIR)
    print(f"docs with duplicated spans: {spans.count()}")

    # semantic dedup: intra-cluster cosine prune over the embedding space
    # (q_semdedup caches its cluster assignment; release after the action)
    pruned = q_semdedup(spark, SF_DIR)
    print(f"vectors pruned by SemDeDup: {pruned.count()}")
    release_caches()

    # unigram-surprisal quality tails: gibberish (high) / boilerplate (low)
    nll = q_unigram_logprob(spark, SF_DIR)
    nll.orderBy("avg_nll").limit(3).show()
    nll.orderBy(nll.avg_nll.desc()).limit(3).show()

    knn = q_knn_bruteforce(spark, SF_DIR)
    knn.show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
