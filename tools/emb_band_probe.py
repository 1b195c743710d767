"""Embedding-LSH candidate-volume probe across replica scale K.

The round-10 finding (SCALING.md "keyspace-saturation"): with the fixed
4x8-bit band family, candidate pairs grow ~n^2/1024 once the corpus
outgrows the 1,024-bucket keyspace — the K=4 v2-replica validation
measured 16x candidates for 4x data, and the sf1 audit measured 1.2e10
candidates at 500k vectors. Round 11's fix is the ADAPTIVE band family
(similarity.EMB_WIDE_CUTOFF): corpora past 50k vectors switch to
4x16-bit bands, restoring expected bucket size to O(1).

This probe is the fix's acceptance test, prescribed by the round-10
verdict: at K in {1, 10, 100} v2 replicas of the sf0.1 embeddings
(2k / 20k / 200k vectors — K=100 crosses the cutoff), measure the
banded candidate-pair count and the q_embedding_dedup wall time under
(a) the adaptive family and (b) the narrow family forced, and show the
adaptive candidates return to ~linear in K where narrow stays
~quadratic.

    python tools/emb_band_probe.py          # prints one JSON line, and
                                            # appends nothing — paste
                                            # results into SCALING.md
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.scale_probe as sp  # noqa: E402  (replica build machinery)
from langchain_callback_parquet_logger_spark.operators import (  # noqa: E402
    similarity as S,
)
from langchain_callback_parquet_logger_spark.plans import session as sess  # noqa: E402

BASE = "/root/testdata/sf0.1"
REPLICAS = {1: BASE, 10: "/tmp/sfbig_x10", 100: "/tmp/sfbig_x100"}


_FAMILY_NAMES = {
    S.DEDUP_LSH_BITS: "narrow",
    S.DEDUP_LSH_BITS_WIDE: "wide",
    S.DEDUP_LSH_BITS_XWIDE: "xwide",
}

# (EMB_WIDE_CUTOFF, EMB_XWIDE_CUTOFF) overrides that pin each family
# regardless of corpus size — the A/B lever for the probe.
_FORCE = {
    "adaptive": None,
    "narrow": (1 << 62, 1 << 62),
    "wide": (1, 1 << 62),
    "xwide": (1, 1),
}


def _measure(spark, sf_dir: str, force: str = "adaptive") -> dict:
    """Candidate count + dedup wall time for the given family config."""
    sess.release_caches()  # never reuse a frame banded under another config
    orig = (S.EMB_WIDE_CUTOFF, S.EMB_XWIDE_CUTOFF)
    if _FORCE[force] is not None:
        S.EMB_WIDE_CUTOFF, S.EMB_XWIDE_CUTOFF = _FORCE[force]
    try:
        t0 = time.time()
        emb, capped = S._banded_emb(spark, sf_dir)
        n_vec = emb.count()
        fam = _FAMILY_NAMES[len(S._dedup_band_family(n_vec))]
        cand = S._lsh_candidate_pairs(capped, symmetric=False).count()
        t_cand = time.time() - t0
        t1 = time.time()
        n_pairs = S.q_embedding_dedup(spark, sf_dir).count()
        t_dedup = time.time() - t1
    finally:
        S.EMB_WIDE_CUTOFF, S.EMB_XWIDE_CUTOFF = orig
        sess.release_caches()
    return {
        "n_vectors": n_vec,
        "family": fam,
        "candidates": cand,
        "t_candidates_s": round(t_cand, 2),
        "dedup_pairs": n_pairs,
        "t_dedup_s": round(t_dedup, 2),
    }


def main() -> None:
    from langchain_callback_parquet_logger_spark.plans.session import get_spark

    spark = get_spark("emb-band-probe")
    for k, path in ((10, "/tmp/sfbig_x10"), (100, "/tmp/sfbig_x100")):
        sp.K, sp.BIG = k, path
        sp.build(spark)

    out: dict[str, dict] = {}
    for k, path in sorted(REPLICAS.items()):
        row: dict[str, dict] = {}
        row["adaptive"] = _measure(spark, path)
        row["narrow_forced"] = _measure(spark, path, force="narrow")
        if k == max(REPLICAS):
            # Second-cutoff A/B at the largest replica corpus: wide vs
            # xwide at the SAME n isolates the 16-bit -> 24-bit step the
            # way narrow_forced isolates the first one.  (A true >5M
            # corpus is out of local reach; the family mechanics and the
            # candidate-mass ratio are what this measures.)
            row["wide_forced"] = _measure(spark, path, force="wide")
            row["xwide_forced"] = _measure(spark, path, force="xwide")
        out[f"K={k}"] = row
        print(json.dumps({f"K={k}": row}), flush=True)
    print(json.dumps({"emb_band_probe": out}))
    spark.stop()


if __name__ == "__main__":
    main()
