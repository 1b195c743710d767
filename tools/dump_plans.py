"""Dump explain("formatted") for a set of queries to plans/r{N}/ files.

    python tools/dump_plans.py r14 before q_ann_recall_audit q_ann_join ...
    python tools/dump_plans.py r14 after  q_ann_recall_audit ...

Writes plans/<round>/<query>_<tag>.txt per query.  Queries whose builder
performs actions (index lifecycles, graph iterations) execute those
actions while building — expected; the dumped plan is the final returned
frame's.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_callback_parquet_logger_spark.plans.session import (
    get_spark,
    release_caches,
)

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rnd, tag, *names = sys.argv[1:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    qs = entrymod.queries()
    for name in names:
        buf = io.StringIO()
        try:
            df = qs[name](spark, SF_DIR)
            with redirect_stdout(buf):
                df.explain("formatted")
        except Exception as e:  # noqa: BLE001
            buf.write(f"ERROR building/explaining {name}: {type(e).__name__}: {e}\n")
        finally:
            release_caches()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} ({tag}, sf_dir={SF_DIR})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
