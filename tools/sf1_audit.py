"""sf1 (100x-gate-scale) value audit runner — round-11 extension.

Wraps tools/check_oracle.py's compare loop with the two mechanics the
round-10 audit lacked (its header's own exclusion list):

1. **Materialized MinHash CTE.**  Six banded-dedup consumers were
   excluded at sf1 because each DuckDB oracle recomputes the shared
   sh/sig/bands CTE chain (~35M shingles, ~10 min per query).  This
   runner computes those three frames ONCE via DuckDB COPY TO parquet,
   patches ``dedup._minhash_bands_cte`` to read them back, and rebuilds
   the affected oracle strings — identical SQL semantics, one shared
   materialization (exactly how a production DuckDB would stage it).

2. **Checksum mode for collect-breaking outputs.**  Queries whose sf1
   result exceeds the driver collect ceiling (q_embedding_dedup's
   wide-family pair list) compare via tools/big_oracle_check.py's
   engine-side row-count + order-insensitive modular checksum.

Usage:
    python tools/sf1_audit.py /tmp/sf1 [--big q1,q2] [--mh] q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

MH_DIR = "/tmp/sf1_mh"


def _materialize_minhash(con, sf_dir: str) -> None:
    """COPY the sh/sig/bands CTE results to parquet, once."""
    from langchain_callback_parquet_logger_spark.operators import dedup as D

    os.makedirs(MH_DIR, exist_ok=True)
    done = os.path.join(MH_DIR, "_OK")
    if os.path.exists(done):
        return
    cte = D._minhash_bands_cte()
    for name in ("sh", "sig", "bands"):
        t0 = time.time()
        con.execute(
            f"COPY (WITH {cte} SELECT * FROM {name}) TO "
            f"'{MH_DIR}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(f"materialized {name} ({time.time() - t0:.0f}s)", flush=True)
    with open(done, "w") as f:
        f.write("v1")


def _patch_minhash_oracles() -> None:
    """Point _minhash_bands_cte at the materialized parquet and rebuild
    every oracle string that embeds it (directly or via
    _oracle_minhash)."""
    from langchain_callback_parquet_logger_spark.operators import dedup as D
    from langchain_callback_parquet_logger_spark.operators import graph as G
    from langchain_callback_parquet_logger_spark.operators import indexes as I
    from langchain_callback_parquet_logger_spark.streaming import ingest as SI

    def patched() -> str:
        return f"""sh AS (
  SELECT doc_id, sh FROM read_parquet('{MH_DIR}/sh.parquet')
),
sig AS (
  SELECT * FROM read_parquet('{MH_DIR}/sig.parquet')
),
bands AS (
  SELECT doc_id, band_id, band_key FROM read_parquet('{MH_DIR}/bands.parquet')
)"""

    D._minhash_bands_cte = patched
    rebuilds = [
        (D.ORACLES, {
            "q_minhash_dedup": D._oracle_minhash,
            "q_lsh_pair_audit": getattr(D, "_oracle_lsh_pair_audit", None),
            "q_cross_source_dupes": getattr(D, "_oracle_cross_source_dupes", None),
            "q_incremental_dedup": getattr(D, "_oracle_incremental_dedup", None),
            "q_ensemble_dedup": getattr(D, "_oracle_ensemble_dedup", None),
            "q_minhash_estimate_error": getattr(
                D, "_oracle_minhash_estimate_error", None
            ),
            "q_paraphrase_candidates": getattr(
                D, "_oracle_paraphrase_candidates", None
            ),
        }),
        (G.ORACLES, {
            "q_dedup_clusters": getattr(G, "_oracle_dedup_clusters", None),
            "q_dup_centrality": getattr(G, "_oracle_dup_centrality", None),
            "q_label_propagation": getattr(G, "_oracle_label_propagation", None),
        }),
        (I.ORACLES, {
            "q_index_incremental_dedup": getattr(
                I, "_oracle_index_incremental_dedup", None
            ),
            "q_index_compaction": getattr(I, "_oracle_index_compaction", None),
        }),
        (SI.ORACLES, {
            "q_stream_incremental_dedup": getattr(
                SI, "_oracle_stream_incremental_dedup", None
            ),
        }),
    ]
    for dct, fns in rebuilds:
        for name, fn in fns.items():
            if fn is not None and name in dct:
                dct[name] = fn()


def main() -> int:
    sf_dir = sys.argv[1]
    args = sys.argv[2:]
    big: set[str] = set()
    use_mh = False
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--big":
            big = set(args[i + 1].split(","))
            i += 2
        elif args[i] == "--mh":
            use_mh = True
            i += 1
        else:
            names.append(args[i])
            i += 1

    con = duckdb.connect()
    from langchain_callback_parquet_logger_spark.plans.session import (
        TABLES,
        get_spark,
        release_caches,
    )

    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    if use_mh:
        _materialize_minhash(con, sf_dir)
        _patch_minhash_oracles()

    import __spark_entry__ as entrymod
    import tools.big_oracle_check as B
    from tools.check_oracle import _canon

    spark = get_spark("sf1-audit")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name in names:
        t0 = time.time()
        if name in big:
            try:
                sn, sck = B._spark_fingerprint(qs[name](spark, sf_dir))
            except Exception as e:  # noqa: BLE001
                print(f"FAIL  {name}: spark error: {e}", flush=True)
                failures += 1
                continue
            finally:
                release_caches()
            try:
                on, ock = B._duck_fingerprint(con, oracles[name])
            except Exception as e:  # noqa: BLE001
                print(f"FAIL  {name}: duckdb error: {e}", flush=True)
                failures += 1
                continue
            ok = (sn, sck) == (on, ock)
            print(
                f"{'PASS' if ok else 'FAIL'}  {name}: rows={sn} "
                f"checksum={sck} vs oracle rows={on} checksum={ock} "
                f"[checksum mode] ({time.time() - t0:.1f}s)",
                flush=True,
            )
            failures += 0 if ok else 1
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}", flush=True)
            failures += 1
            continue
        finally:
            release_caches()
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}", flush=True)
            failures += 1
            continue
        dt = time.time() - t0
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(ocols)}")
            failures += 1
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            failures += 1
        elif _canon(srows, scols) != _canon(orows, ocols):
            a, b = _canon(srows, scols), _canon(orows, ocols)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            failures += 1
        else:
            print(f"PASS  {name}: rows={len(srows)} ({dt:.1f}s)", flush=True)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
