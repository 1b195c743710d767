"""Simhash banding probe at the sf1 corpus (500k docs) — the acceptance
measurement for the third banding step (combined sub-band pairs,
dedup.SIMHASH_XWIDE_CUTOFF).

At 500k docs the production config is the WIDE family (60-bit
fingerprint, 4x15-bit bands, 32,768 buckets per band); the xwide
combined-pair banding (15 bands of 20-bit keys, 1,048,576 buckets) is
what a >5M-doc corpus would run.  This probe measures, at the SAME
corpus and the SAME fingerprints:

  - raw band-bucket census (max bucket, over-cap bucket count),
  - capped candidate-pair volume entering the hamming filter,
  - q_simhash_pairs wall time + result count,

for wide vs xwide-forced, plus the engine/oracle checksum agreement of
the xwide result (the graded SFs never exercise this branch; the wide
branch's sf1 value check lives in the sf1 audit).

    python tools/simhash_band_probe.py [sf_dir]   # default /tmp/sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from langchain_callback_parquet_logger_spark.operators import dedup as D  # noqa: E402
from langchain_callback_parquet_logger_spark.plans import session as sess  # noqa: E402


def _measure(spark, sf_dir: str, force_xwide: bool) -> dict:
    sess.release_caches()
    orig = D.SIMHASH_XWIDE_CUTOFF
    if force_xwide:
        D.SIMHASH_XWIDE_CUTOFF = 1
    try:
        t0 = time.time()
        docs = sess.spread(sess.load_table(spark, sf_dir, "documents"))
        n_docs = docs.count()
        bits = D._simhash_bits(n_docs)
        fp = D.simhash(docs, bits)
        bands = fp.select(
            F.posexplode(D._simhash_band_arr(n_docs, bits)).alias(
                "band_id", "band_bits"
            )
        )
        census = bands.groupBy("band_id", "band_bits").count()
        stats = census.agg(
            F.max("count").alias("mx"),
            F.sum(
                F.when(F.col("count") > D.SIMHASH_BUCKET_CAP, 1).otherwise(0)
            ).alias("over"),
            F.sum(
                F.when(
                    F.col("count") <= D.SIMHASH_BUCKET_CAP,
                    F.col("count") * (F.col("count") - 1) / 2,
                ).otherwise(0)
            ).alias("capped_pairs"),
        ).first()
        t_census = time.time() - t0
        t1 = time.time()
        n_pairs = D.q_simhash_pairs(spark, sf_dir).count()
        t_pairs = time.time() - t1
    finally:
        D.SIMHASH_XWIDE_CUTOFF = orig
        sess.release_caches()
    return {
        "n_docs": n_docs,
        "banding": "xwide_pairs" if force_xwide else "contiguous",
        "max_bucket": stats.mx,
        "over_cap_buckets": int(stats.over),
        "capped_candidate_pairs": int(stats.capped_pairs),
        "t_census_s": round(t_census, 2),
        "result_pairs": n_pairs,
        "t_pairs_s": round(t_pairs, 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = sess.get_spark("simhash-band-probe")
    out: dict[str, dict] = {}
    for force in (False, True):
        key = "xwide_forced" if force else "production"
        out[key] = _measure(spark, sf_dir, force)
        print(json.dumps({key: out[key]}), flush=True)
    print(json.dumps({"simhash_band_probe": out}))
    spark.stop()


if __name__ == "__main__":
    main()
