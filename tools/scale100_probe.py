"""100x-scale shape probe: does the 10x verdict hold another decade up?

The per-round SCALE probe (tools/scale_probe.py) measures sf0.1 vs a 10x
replica. A quadratic term that is still hiding under fixed overheads at
10x emerges unmistakably at 100x: between the 10x and 100x replicas the
data grows 10x, so a linear plan shows big100/big10 ~ 10 (less, while
fixed overheads still amortize) and a pairwise plan shows ~100. This
probe builds BOTH replicas with the same bijective-relabeling
construction (ids offset, tokens suffixed per replica — within-replica
similarity structure exact, cross-replica overlap zero, so output volume
scales ~K and the ratio measures plan shape), then interleaves per-query
timings in one session.

The probe list is the risk set, not the full registry: every query whose
round-9 10x ratio was >= 2.5 (the watch zone), plus the five most
expensive bench entries and the banded-dedup/ANN family heads. Streaming
drains are excluded (state-store lifecycle dominates; their 10x rows are
flat and certified separately).

    python tools/scale100_probe.py              # writes SCALE100_r{N}.json
    SCALE100_REPS=2 python tools/scale100_probe.py

At 100x the corpus is ~sf10-equivalent (60M lineitem, 5M documents,
5M embeddings on 32 local cores) — 1000x the driver's correctness-gate
scale factor.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("SCALE100_REPS", "2"))

import tools.scale_probe as sp  # noqa: E402  (reuses build + best_of)
import __spark_entry__ as entrymod  # noqa: E402
from langchain_callback_parquet_logger_spark.plans.session import (  # noqa: E402
    get_spark,
    release_caches,
)

BIG10 = "/tmp/sfbig_x10"
BIG100 = "/tmp/sfbig_x100"

# Round-9 10x ratio >= 2.5 (watch zone) ...
WATCH = [
    "q_zorder_layout",
    "q_semdedup",
    "q_user_value_median",
    "q_key_skew_report",
    "q_substring_clean",
    "q_ngram_jaccard",
    "q_event_runs",
    "q_winnow_matches",
    "q_bigram_logprob",
    "q_tfidf_top_terms",
    "q_lsh_pair_audit",
    "q_sequence_pack",
    "q_minhash_estimate_error",
    "q_incremental_dedup",
    "q_user_value_p90",
    "q_funnel",
    "q_doc_keywords",
    "q_dataset_diff",
    "q_cohort_retention",
    "q_format_roundtrip",
    "q_pmi_collocations",
    "q_corpus_clean",
    "q_ann_recall_audit",
    "q_decontaminate",
    "q_sessionize",
]
# ... plus the bench top-5 and the banded family heads.
HEADS = [
    "q_index_ann",
    "q_label_propagation",
    "q_ensemble_dedup",
    "q_index_compaction",
    "q_paraphrase_candidates",
    "q_minhash_dedup",
    "q_dedup_clusters",
    "q_dup_centrality",
    "q_embedding_dedup",
    "q_knn_bruteforce",
    "q_ann_join",
]
QUERIES = WATCH + [q for q in HEADS if q not in WATCH]


def best_of(fn, reps=REPS):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
        release_caches()
    return min(runs)


def _current_round() -> int:
    if os.environ.get("SPARK_GRAFT_ROUND"):
        return int(os.environ["SPARK_GRAFT_ROUND"])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for fn in os.listdir(root)
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", fn))
    ]
    return (max(rounds) if rounds else 0) + 1


def main() -> None:
    spark = get_spark("scale100-probe")
    # Build both replicas with the SAME construction (sp.build keys off
    # module globals K/BIG; _OK sentinel makes rebuilds no-ops).
    for k, path in ((10, BIG10), (100, BIG100)):
        sp.K, sp.BIG = k, path
        sp.build(spark)
    qs = entrymod.queries()
    spark.range(1).count()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(root, f"SCALE100_r{_current_round():02d}.json")
    record: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            record = json.load(f).get("queries", {})
    only = {s for s in os.environ.get("SCALE100_ONLY", "").split(",") if s}
    run_list = [q for q in QUERIES if q in only] if only else QUERIES
    for name in run_list:
        t10 = best_of(lambda: qs[name](spark, BIG10).count())
        t100 = best_of(lambda: qs[name](spark, BIG100).count())
        ratio = t100 / t10 if t10 > 0 else float("inf")
        record[name] = {
            "big10_sec": round(t10, 3),
            "big100_sec": round(t100, 3),
            "ratio_100_over_10": round(ratio, 2),
        }
        print(
            f"| {name} | {t10:.2f} | {t100:.2f} | {ratio:.1f}x (target ~10) |",
            file=sys.stderr,
        )
        with open(out_path, "w") as f:
            json.dump(
                {
                    "base": "sf0.1 replicas",
                    "k_small": 10,
                    "k_big": 100,
                    "reps": REPS,
                    "stat": "min",
                    "target_ratio": 10,
                    "complete": False,
                    "queries": record,
                },
                f,
                indent=2,
            )
    complete = all(name in record for name in QUERIES)
    with open(out_path, "w") as f:
        json.dump(
            {
                "base": "sf0.1 replicas",
                "k_small": 10,
                "k_big": 100,
                "reps": REPS,
                "stat": "min",
                "target_ratio": 10,
                "complete": complete,
                "queries": record,
            },
            f,
            indent=2,
        )
    print(f"wrote {out_path} (complete={complete})")
    spark.stop()


if __name__ == "__main__":
    main()
