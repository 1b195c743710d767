"""Strict driver-hash emulation: catch dtype-unstable oracles.

The driver's correctness gate converts both the Spark result and the DuckDB
oracle result to pandas, sorts columns by name, and hashes stringified cell
values.  That hash is *dtype-sensitive*: DuckDB ``SUM(int)`` returns HUGEINT
(pandas ``float64``/``object`` → ``"3.0"``) while Spark returns ``bigint``
(``"3"``), so value-identical results can hash-differ.  ``check_oracle.py``
normalizes numerics and therefore cannot catch this.

This tool emulates the strict comparison: every cell on both sides is
rendered with ``str()`` (floats via ``repr``) and compared exactly.  A
query that passes here should hash-match under the driver.

Usage: python tools/check_dtypes.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from langchain_callback_parquet_logger_spark.plans.session import TABLES, get_spark


def _cell(v, date_shaped: bool = False) -> str:
    # Strict stringification: no numeric normalization at all.  One
    # evidence-based exception: DuckDB exports DATE as datetime64 (pandas has
    # no date dtype) while Spark gives datetime.date, yet the driver's hash
    # MATCHED on both date-valued r1 queries (q_date_partition_agg,
    # q_cohort_retention in CORRECTNESS_r01.json) — so the driver normalizes
    # midnight timestamps to dates and this checker must too.  The
    # truncation applies ONLY to date-shaped columns (datetime64 dtype AND
    # every value midnight) — a genuine timestamp column that happens to
    # contain a midnight value, or a string cell shaped like one, must stay
    # verbatim or this checker would report STRICT-OK where the driver
    # hash-differs.
    s = str(v)
    if date_shaped and s.endswith(" 00:00:00") and len(s) == 19:
        return s[:10]
    return s


def _date_shaped(col) -> bool:
    """True for datetime64 columns whose every non-null value is midnight
    (i.e. DuckDB's DATE-as-datetime64 export, not a real timestamp col)."""
    import pandas as pd

    if not pd.api.types.is_datetime64_any_dtype(col.dtype):
        return False
    nn = col.dropna()
    if nn.empty:
        return False
    return bool((nn.dt.normalize() == nn).all())


def _frame_cells(df):
    """pandas DataFrame -> (sorted colnames, sorted list of str-tuples, dtypes)."""
    cols = sorted(df.columns)
    d = df[cols]
    shaped = [_date_shaped(d[c]) for c in cols]
    rows = [
        tuple(_cell(v, shaped[i]) for i, v in enumerate(rec))
        for rec in d.itertuples(index=False, name=None)
    ]
    rows.sort()
    dtypes = {c: str(d[c].dtype) for c in cols}
    return cols, rows, dtypes


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark("dtype-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: SKIP (no oracle)")
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
            ordf = con.execute(sql).fetch_df()
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            continue
        scols, srows, sdt = _frame_cells(spdf)
        ocols, orows, odt = _frame_cells(ordf)
        dt = time.time() - t0
        if scols != ocols:
            failures += 1
            print(f"{name}: COLS MISMATCH spark={scols} oracle={ocols}")
            continue
        if srows == orows:
            print(f"{name}: STRICT-OK rows={len(srows)} ({dt:.1f}s)")
            continue
        failures += 1
        # Diagnose: first differing cell + dtype table.
        print(f"{name}: STRICT-FAIL rows spark={len(srows)} oracle={len(orows)}")
        print(f"  spark dtypes:  {sdt}")
        print(f"  oracle dtypes: {odt}")
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                for c, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"  first diff row {i} col {scols[c]}: spark={x!r} oracle={y!r}")
                        break
                break
        else:
            if len(srows) != len(orows):
                print("  row-count mismatch only")
    print(f"\nstrict failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
