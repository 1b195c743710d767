"""Per-consumer A/B of plans.session.spread() on the non-banded embedding
scans (round-13, VERDICT item #6).

Round 12 (commit 1a63fc1) added the size-gated spread() to all ten
non-banded embedding scans wholesale, on the strength of a q_semdedup
single-task serialization caught at sf1 — without a per-consumer A/B. The
judge's spot-check showed it HELPS iterative/heavy consumers (kmeans) and
HURTS cheap single-pass scans (knn_bruteforce: the exchange costs more
than one TakeOrdered scan gains). This measures each consumer both ways
and prints the keep/drop table for SCALING.md.

Toggling: spread is bound into operators.similarity at import time
(`from ..plans.session import ... spread`), so the no-spread arm patches
the MODULE BINDING (similarity.spread) to identity; plans.session.spread
is patched too for the function-local imports (_banded_emb — not in this
A/B's query set, but harmless and future-proof).

Run:  python tools/spread_ab.py [reps] [q ...]   -> table + one JSON line
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_callback_parquet_logger_spark.operators import similarity as S
from langchain_callback_parquet_logger_spark.plans import session as sess

QUERIES = [
    "q_knn_bruteforce",
    "q_knn_ivf",
    "q_knn_lsh",
    "q_knn_per_label",
    "q_embedding_quantize",
    "q_kmeans_ivf",
    "q_semdedup",
    "q_pq_quantize",
    "q_centroid_confusion",
]


def run_query(spark, sf_dir: str, name: str) -> float:
    fn = getattr(S, name)
    t = time.monotonic()
    fn(spark, sf_dir).count()
    dt = time.monotonic() - t
    sess.release_caches()
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = sess.get_spark("spread-ab")
    real_spread = sess.spread
    identity = lambda df, min_bytes=0: df  # noqa: E731
    out = {"sf_dir": sf_dir, "reps": reps, "queries": {}}
    for name in names:
        res = {}
        for arm in ("spread", "nospread"):
            if arm == "nospread":
                S.spread = identity
                sess.spread = identity
            else:
                S.spread = real_spread
                sess.spread = real_spread
            try:
                run_query(spark, sf_dir, name)  # warm
                times = [run_query(spark, sf_dir, name) for _ in range(reps)]
            finally:
                S.spread = real_spread
                sess.spread = real_spread
            res[arm] = {
                "median_s": round(statistics.median(times), 3),
                "times": [round(t, 3) for t in times],
            }
        keep = res["spread"]["median_s"] <= res["nospread"]["median_s"]
        res["verdict"] = "keep" if keep else "drop"
        out["queries"][name] = res
        print(
            f"{name:22s} spread {res['spread']['median_s']:7.3f}s  "
            f"nospread {res['nospread']['median_s']:7.3f}s  -> {res['verdict']}",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
