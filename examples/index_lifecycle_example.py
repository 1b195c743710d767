"""Stored-index session: the nightly-build / online-serve split that a
100 TB dedup + retrieval deployment actually runs.

1. build    — materialize the MinHash band + shingle tables and the
              ANN (hyperplane-LSH band + normalized vector) tables.
2. ingest   — dedup a new document batch against the STORED dedup
              index (corpus never recomputed), then fold the accepted
              docs into the index.
3. retrieve — serve a kNN probe batch from the STORED ANN index.

Every step reads/writes plain parquet; at warehouse scale the same
layout is a table format with transactional appends + compaction.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from langchain_callback_parquet_logger_spark import get_spark
from langchain_callback_parquet_logger_spark.operators import indexes as ix
from langchain_callback_parquet_logger_spark.operators.dedup import (
    INCREMENTAL_BATCH_MOD,
)
from langchain_callback_parquet_logger_spark.plans.session import (
    load_table,
    release_caches,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("example-index-lifecycle")
    work = tempfile.mkdtemp(prefix="index_lifecycle_")
    dedup_dir = os.path.join(work, "dedup_index")
    ann_dir = os.path.join(work, "ann_index")

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    is_new = F.col("doc_id") % INCREMENTAL_BATCH_MOD == 0

    print("1. building stored indexes (corpus side, done once):")
    ix.materialize_dedup_index(docs.filter(~is_new), dedup_dir)
    vecs = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    ix.materialize_ann_index(vecs, ann_dir)
    print(f"   wrote {dedup_dir} and {ann_dir}")

    print("2. deduping an ingest batch against the stored index:")
    batch = docs.filter(is_new)
    try:
        verdicts = ix.dedup_against_index(spark, dedup_dir, batch)
        verdicts.orderBy("new_doc_id").show(5)
        flagged = {r.new_doc_id for r in verdicts.collect()}
    finally:
        release_caches()
    accepted = batch.filter(~F.col("doc_id").isin(list(flagged) or [-1]))
    ix.append_to_dedup_index(accepted, dedup_dir)
    print(
        f"   batch={batch.count()} flagged={len(flagged)} "
        f"accepted+appended={accepted.count()}"
    )

    print("3. serving kNN probes from the stored ANN index:")
    probes = vecs.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    try:
        ix.knn_against_index(spark, ann_dir, probes, k=3).orderBy(
            "query_id", "rank"
        ).show()
    finally:
        release_caches()

    spark.stop()


if __name__ == "__main__":
    main()
