"""Value-oracle compare for queries whose output is too big to collect.

tools/check_oracle.py collects both result sets and compares canonical
row tuples — exact, but driver-bound: q_embedding_dedup at sf1 under
the round-11 wide band family recovers the dense-core near-dup pairs
the round-10 bucket cap had dropped, and its output (tens of millions
of pairs) blows spark.driver.maxResultSize long before any engine
limit. The scalable audit shape is to push the comparison INTO each
engine: row count plus an order-insensitive modular checksum over the
exact fixed-point row image, computed as an aggregate on both sides.

Checksum: every result column is mapped to a BIGINT (strings via a
portable polynomial hash, doubles via round(x*1e6) — all graded
queries already emit 6-dp-rounded doubles, so this is exact), the row
image is a weighted sum mod M, and the aggregate is SUM(row_image) mod
M with M = 2^31 - 1 (sum of <= 2^32 terms < 2^31 stays under 2^63 —
no overflow on either engine). Order-insensitive by construction;
collision probability ~1/M per divergent pair of result sets, which is
ample for an audit that also checks exact row counts.

    python tools/big_oracle_check.py /tmp/sf1 q_embedding_dedup ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from langchain_callback_parquet_logger_spark.plans.session import (
    TABLES,
    get_spark,
    release_caches,
)

M = (1 << 31) - 1
# per-column-position weights (any fixed odd constants work)
W = [1000003, 999983, 924793, 826669, 743111, 655217, 557041, 424243]


def _spark_fingerprint(df):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = sorted(df.columns)
    parts = []
    for i, c in enumerate(cols):
        dt = dict(df.dtypes)[c]
        col = F.col(c)
        if dt in ("double", "float"):
            v = F.round(col * 1e6).cast("long")
        elif dt in ("bigint", "int", "smallint", "tinyint", "boolean"):
            v = col.cast("long")
        elif dt == "date":
            v = F.datediff(col, F.lit("1970-01-01")).cast("long")
        elif dt.startswith("decimal"):
            v = F.round(col.cast("double") * 1e6).cast("long")
        else:  # string fallback: portable polynomial hash
            v = F.aggregate(
                F.filter(
                    F.split(F.coalesce(col.cast("string"), F.lit("")), ""),
                    lambda ch: ch != "",
                ),
                F.lit(0).cast("long"),
                lambda acc, ch: (acc * 131 + F.ascii(ch).cast("long")) % M,
            )
        parts.append(((v % M + M) % M) * W[i % len(W)])
    row_img = parts[0]
    for p in parts[1:]:
        row_img = row_img + p
    row_img = row_img % M
    agg = df.select(row_img.alias("img")).agg(
        F.count("*").alias("n"), (F.sum("img") % M).alias("ck")
    )
    r = agg.first()
    return r.n, r.ck % M


def _duck_fingerprint(con, sql: str):
    # DBAPI descriptors collapse every numeric to 'NUMBER' — DESCRIBE
    # gives the real DuckDB types.
    desc = con.execute(f"DESCRIBE SELECT * FROM ({sql}) q").fetchall()
    cols = sorted(r[0] for r in desc)
    types = {r[0]: str(r[1]) for r in desc}
    parts = []
    for i, c in enumerate(cols):
        t = types[c].upper()
        q = f'"{c}"'
        if t in ("DOUBLE", "FLOAT") or "DECIMAL" in t:
            v = f"CAST(round({q} * 1e6) AS BIGINT)"
        elif t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "BOOLEAN", "HUGEINT", "UBIGINT"):
            v = f"CAST({q} AS BIGINT)"
        elif t == "DATE":
            v = f"datediff('day', DATE '1970-01-01', {q})"
        else:
            v = (
                f"list_aggregate(list_transform(string_split(coalesce(CAST({q} AS VARCHAR), ''), ''),"
                f" x -> ascii(x)), 'sum')"
            )
            # polynomial hash needs an ordered fold; duckdb lacks one in
            # SQL easily — use reduce via list_reduce (duckdb >= 0.9)
            v = (
                f"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
                f"string_split(coalesce(CAST({q} AS VARCHAR), ''), ''),"
                f" x -> CAST(ascii(x) AS BIGINT))),"
                f" (acc, x) -> (acc * 131 + x) % {M})"
            )
        parts.append(
            f"(((CAST({v} AS BIGINT)) % {M} + {M}) % {M}) * {W[i % len(W)]}"
        )
    row_img = "(" + " + ".join(parts) + f") % {M}"
    n, ck = con.execute(
        f"SELECT COUNT(*), SUM(img) % {M} FROM "
        f"(SELECT {row_img} AS img FROM ({sql}) q)"
    ).fetchone()
    return n, (ck or 0) % M


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    spark = get_spark("big-oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sn, sck = _spark_fingerprint(qs[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            release_caches()
        ts = time.time() - t0
        try:
            on, ock = _duck_fingerprint(con, oracles[name])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        dt = time.time() - t0 - ts
        if (sn, sck) != (on, ock):
            print(
                f"FAIL  {name}: spark (n={sn}, ck={sck}) != "
                f"oracle (n={on}, ck={ock}) [spark {ts:.1f}s, duck {dt:.1f}s]"
            )
            failures += 1
        else:
            print(
                f"PASS  {name}: rows={sn} checksum={sck} "
                f"[spark {ts:.1f}s, duck {dt:.1f}s]",
                flush=True,
            )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
