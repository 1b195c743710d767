"""The CI fixture generator must stay schema-identical to the driver
tables and deterministic — a drift here silently changes what CI tests.
No Spark needed: pyarrow + DuckDB only."""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow.parquet as pq
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

from make_testdata import make_tables, write_dir  # noqa: E402

# (column, duckdb type) per table — the contract the driver data obeys
# (captured from /root/testdata/sf0.001 in round 6).
EXPECTED = {
    "region": [("r_regionkey", "INTEGER"), ("r_name", "VARCHAR")],
    "nation": [
        ("n_nationkey", "INTEGER"),
        ("n_name", "VARCHAR"),
        ("n_regionkey", "INTEGER"),
    ],
    "customer": [
        ("c_custkey", "BIGINT"),
        ("c_name", "VARCHAR"),
        ("c_nationkey", "INTEGER"),
        ("c_acctbal", "DOUBLE"),
        ("c_mktsegment", "VARCHAR"),
    ],
    "supplier": [
        ("s_suppkey", "BIGINT"),
        ("s_name", "VARCHAR"),
        ("s_nationkey", "INTEGER"),
        ("s_acctbal", "DOUBLE"),
    ],
    "part": [
        ("p_partkey", "BIGINT"),
        ("p_name", "VARCHAR"),
        ("p_brand", "VARCHAR"),
        ("p_type", "VARCHAR"),
        ("p_size", "INTEGER"),
        ("p_retailprice", "DOUBLE"),
    ],
    "orders": [
        ("o_orderkey", "BIGINT"),
        ("o_custkey", "BIGINT"),
        ("o_orderstatus", "VARCHAR"),
        ("o_totalprice", "DOUBLE"),
        ("o_orderdate", "TIMESTAMP"),
        ("o_orderpriority", "VARCHAR"),
    ],
    "lineitem": [
        ("l_orderkey", "BIGINT"),
        ("l_partkey", "BIGINT"),
        ("l_suppkey", "BIGINT"),
        ("l_linenumber", "INTEGER"),
        ("l_quantity", "DOUBLE"),
        ("l_extendedprice", "DOUBLE"),
        ("l_discount", "DOUBLE"),
        ("l_tax", "DOUBLE"),
        ("l_returnflag", "VARCHAR"),
        ("l_linestatus", "VARCHAR"),
        ("l_shipdate", "TIMESTAMP"),
    ],
    "events": [
        ("event_id", "BIGINT"),
        ("ts", "TIMESTAMP"),
        ("user_id", "BIGINT"),
        ("event_type", "VARCHAR"),
        ("value", "DOUBLE"),
        ("props", "VARCHAR"),
    ],
    "documents": [
        ("doc_id", "BIGINT"),
        ("text", "VARCHAR"),
        ("lang", "VARCHAR"),
        ("source", "VARCHAR"),
        ("n_chars", "BIGINT"),
    ],
    "embeddings": [
        ("vec_id", "BIGINT"),
        ("embedding", "FLOAT[]"),
        ("label", "INTEGER"),
    ],
}


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synth") / "sf0.001")
    write_dir(d, 0.001)
    return d


def test_generated_schemas_match_driver_contract(gen_dir):
    con = duckdb.connect()
    for table, cols in EXPECTED.items():
        got = [
            (r[0], r[1])
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{gen_dir}/{table}.parquet')"
            ).fetchall()
        ]
        assert got == cols, (table, got, cols)


def test_generation_is_deterministic():
    a = make_tables(0.001)
    b = make_tables(0.001)
    for name in a:
        assert a[name].equals(b[name]), name


def test_invariants_tests_depend_on(gen_dir):
    con = duckdb.connect()
    docs = f"read_parquet('{gen_dir}/documents.parquet')"
    # exact-dup groups exist (dedup operators need true positives) and
    # fingerprint groups are lang-pure (leakage-split test invariant)
    n_dup_groups, n_mixed = con.execute(
        f"""
        WITH g AS (SELECT text, COUNT(*) AS n, COUNT(DISTINCT lang) AS nl
                   FROM {docs} GROUP BY text)
        SELECT COUNT(*) FILTER (n >= 2), COUNT(*) FILTER (nl > 1)
        FROM g
        """
    ).fetchone()
    assert n_dup_groups >= 1
    assert n_mixed == 0
    # order dates inside the TPC-H-style window queries filter on
    lo, hi = con.execute(
        f"SELECT min(l_shipdate), max(l_shipdate) "
        f"FROM read_parquet('{gen_dir}/lineitem.parquet')"
    ).fetchone()
    assert lo.year >= 1995 and hi.year <= 2002
    # embeddings: fixed dim, labels 0..9
    dim, lmin, lmax = con.execute(
        f"SELECT DISTINCT len(embedding), min(label) OVER (), max(label) OVER () "
        f"FROM read_parquet('{gen_dir}/embeddings.parquet') LIMIT 1"
    ).fetchone()
    assert dim == 64 and 0 <= lmin and lmax <= 9
