"""Deterministic synthetic fixture generator (CI / laptop fallback).

The driver container ships read-only parquet fixtures under
/root/testdata/sf*/ ; on any machine without them (CI, a contributor
laptop) this module materializes schema-compatible tables so the unit
suite and the oracle gate can run anywhere. Distributions mirror the
driver data where tests depend on them: a 5-region/25-nation TPC-H-ish
star, word-soup documents over a small vocabulary with seeded exact- and
near-duplicates (the dedup operators must find SOMETHING at every SF),
label-clustered 64-dim embeddings, and a 5-type event stream with
per-user session gaps. Values are NOT the driver's — only shapes and
invariants; correctness is still judged against the DuckDB oracle over
whichever tables are loaded, so the gate is self-consistent on either
dataset.

Usage:
    python tools/make_testdata.py OUT_DIR [SF]      # default SF 0.001

Seeded numpy + pyarrow only — no Spark, no network.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
LANGS = ["en", "fr", "es", "de", "zh"]
LANG_W = [0.38, 0.17, 0.16, 0.14, 0.15]
VOCAB = (
    "the a spark data table scan filter join merge sort hash agg group "
    "window batch stream row column key value query part line customer "
    "order big small fast slow dup vector"
).split()

EPOCH_US = 1704067200_000_000  # 2024-01-01T00:00:00Z in micros


def _ts_col(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))


def _soup(rng: np.random.Generator, n_words: int) -> str:
    return " ".join(rng.choice(VOCAB, size=n_words))


def make_tables(sf: float) -> dict[str, pa.Table]:
    rng = np.random.default_rng(SEED)
    n_cust = max(int(150_000 * sf), 30)
    n_supp = max(int(10_000 * sf), 5)
    n_part = max(int(200_000 * sf), 40)
    n_ord = max(int(1_500_000 * sf), 300)
    n_line_target = int(6_000_000 * sf)
    n_events = max(int(1_000_000 * sf), 200)
    n_docs = max(int(500_000 * sf), 100)
    n_vecs = n_docs

    tables: dict[str, pa.Table] = {}

    tables["region"] = pa.table(
        {
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": REGIONS,
        }
    )
    tables["nation"] = pa.table(
        {
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": NATIONS,
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }
    )
    tables["customer"] = pa.table(
        {
            "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
            "c_nationkey": pa.array(
                rng.integers(0, 25, n_cust), pa.int32()
            ),
            "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
            "c_mktsegment": list(rng.choice(SEGMENTS, n_cust)),
        }
    )
    tables["supplier"] = pa.table(
        {
            "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
            "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
        }
    )
    brands = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
    types = [
        f"{a} {b} {c}"
        for a in ("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
        for b in ("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
        for c in ("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
    ]
    tables["part"] = pa.table(
        {
            "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
            "p_name": [
                " ".join(rng.choice(VOCAB, 3)) for _ in range(n_part)
            ],
            "p_brand": list(rng.choice(brands, n_part)),
            "p_type": list(rng.choice(types, n_part)),
            "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
            "p_retailprice": np.round(rng.uniform(900.0, 2100.0, n_part), 2),
        }
    )

    # TPC-H-style order dates (driver range 1995-2001): queries filter on
    # the classic l_shipdate <= 1998-09-02 cutoff, which must stay
    # selective-but-nonempty.
    year_us = 365 * 24 * 3600 * 1_000_000
    orders_epoch_us = 788918400_000_000  # 1995-01-01T00:00:00Z
    o_date = orders_epoch_us + rng.integers(0, int(6.5 * year_us), n_ord)
    tables["orders"] = pa.table(
        {
            "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
            "o_custkey": pa.array(
                rng.integers(1, n_cust + 1, n_ord), pa.int64()
            ),
            "o_orderstatus": list(rng.choice(["O", "F", "P"], n_ord)),
            "o_totalprice": np.round(rng.uniform(900.0, 350000.0, n_ord), 2),
            "o_orderdate": _ts_col(o_date),
            "o_orderpriority": list(rng.choice(PRIORITIES, n_ord)),
        }
    )

    lines_per = rng.integers(1, 8, n_ord)
    while lines_per.sum() < n_line_target:
        lines_per[rng.integers(0, n_ord)] += 1
    l_orderkey = np.repeat(np.arange(1, n_ord + 1), lines_per)
    n_line = len(l_orderkey)
    linenum = np.concatenate([np.arange(1, c + 1) for c in lines_per])
    ship = np.repeat(o_date, lines_per) + rng.integers(
        1, 120, n_line
    ) * (24 * 3600 * 1_000_000)
    tables["lineitem"] = pa.table(
        {
            "l_orderkey": pa.array(l_orderkey, pa.int64()),
            "l_partkey": pa.array(
                rng.integers(1, n_part + 1, n_line), pa.int64()
            ),
            "l_suppkey": pa.array(
                rng.integers(1, n_supp + 1, n_line), pa.int64()
            ),
            "l_linenumber": pa.array(linenum, pa.int32()),
            "l_quantity": rng.integers(1, 51, n_line).astype("float64"),
            "l_extendedprice": np.round(
                rng.uniform(900.0, 105000.0, n_line), 2
            ),
            "l_discount": np.round(rng.integers(0, 11, n_line) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_line) / 100.0, 2),
            "l_returnflag": list(rng.choice(["A", "N", "R"], n_line)),
            "l_linestatus": list(rng.choice(["O", "F"], n_line)),
            "l_shipdate": _ts_col(ship),
        }
    )

    n_users = max(int(15_000 * sf), 8)
    ev_user = rng.integers(1, n_users + 1, n_events)
    # per-user increasing timestamps with occasional >30 min session gaps
    ev_ts = (
        EPOCH_US
        + ev_user * 7_000_000
        + np.cumsum(
            rng.choice(
                [30_000_000, 120_000_000, 2_400_000_000],
                n_events,
                p=[0.6, 0.3, 0.1],
            )
        )
    )
    tables["events"] = pa.table(
        {
            "event_id": pa.array(range(1, n_events + 1), pa.int64()),
            "ts": _ts_col(ev_ts),
            "user_id": pa.array(ev_user, pa.int64()),
            "event_type": list(rng.choice(EVENT_TYPES, n_events)),
            "value": np.round(rng.uniform(0.01, 350.0, n_events), 2),
            "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_events)],
        }
    )

    # documents: word soup + seeded exact dups (~2%) and near dups (~4%,
    # one token appended) so every dedup operator has true positives.
    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    for i in range(n_docs):
        r = rng.random()
        # dup/near-dup rows inherit the source doc's lang: fingerprint
        # groups are lang-pure in the driver corpus and tests pin that
        # invariant (per-(split,lang) group counts sum to the total).
        if i > 10 and r < 0.02:
            j = int(rng.integers(0, i))
            texts.append(texts[j])
            langs.append(langs[j])
        elif i > 10 and r < 0.06:
            j = int(rng.integers(0, i))
            texts.append(texts[j] + " " + str(rng.choice(VOCAB)))
            langs.append(langs[j])
        else:
            texts.append(_soup(rng, int(rng.integers(20, 120))))
            langs.append(str(rng.choice(LANGS, p=LANG_W)))
        sources.append(f"src{int(rng.integers(0, 20))}")
    tables["documents"] = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": texts,
            "lang": langs,
            "source": sources,
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )

    # embeddings: 10 gaussian clusters in 64-d (kNN/IVF/kmeans structure)
    labels = rng.integers(0, 10, n_vecs)
    centers = rng.normal(0, 1, (10, 64))
    vecs = (centers[labels] + rng.normal(0, 0.35, (n_vecs, 64))).astype(
        "float32"
    )
    tables["embeddings"] = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                list(vecs), pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    return tables


def write_dir(out_dir: str, sf: float) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, tbl in make_tables(sf).items():
        pq.write_table(
            tbl, os.path.join(out_dir, f"{name}.parquet"), compression="snappy"
        )


if __name__ == "__main__":
    out = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.001
    write_dir(out, sf)
    print(f"wrote sf={sf} fixtures to {out}")
