"""The driver records only the TAIL of bench.py's stdout — measured at
exactly 2,000 characters (BENCH_r02/r07/r08 all came back "parsed": null
when the summary line outgrew it). bench.py enforces the budget at
runtime by trimming; these JVM-free tests make the contract a tripwire
at pytest time instead of a silent trim at bench time: registry growth
that would push the WORST-CASE line past the budget fails here first."""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def _worst_case_summary() -> dict:
    """Every headline entry timed at maximum realistic width (99.99 —
    wider means a >100 s sf0.1 query, which the bench gate would flag
    long before the line width matters) plus every scalar field at its
    widest plausible rendering."""
    return {
        "metric": "headline_queries_total_time",
        "value": 99999.99,
        "unit": "sec",
        "queries": {name: 99.99 for name in bench.HEADLINE},
        "sf": 0.01,
        "n_timed": 9999,
        "total_all_sec": 99999.999,
        "stat": "median_of_99_after_warmup",
        "ref_scan_sec": 99.999,
        "n_errors": 999,
        "headline_truncated": True,
    }


def test_headline_worst_case_fits_capture_budget():
    line = json.dumps(_worst_case_summary(), separators=(",", ":"))
    assert len(line) <= bench.MAX_SUMMARY_BYTES, (
        f"worst-case bench summary is {len(line)}B > "
        f"{bench.MAX_SUMMARY_BYTES}B — trim HEADLINE before the runtime "
        f"trim has to drop entries (BENCHFULL keeps everything)"
    )


def test_headline_budget_is_under_the_measured_capture():
    # the driver capture is 2,000 chars; the budget must leave margin
    assert bench.MAX_SUMMARY_BYTES <= 1900


def test_headline_names_resolve_and_cover_every_module():
    registry = entrymod.queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert not missing, f"HEADLINE names not in the registry: {missing}"
    # every operator module with graded queries keeps ≥1 representative
    from langchain_callback_parquet_logger_spark.operators import (
        analytic,
        dedup,
        graph,
        maintenance,
        multimodal,
        pipeline,
        queries,
        similarity,
        temporal,
        text,
    )
    from langchain_callback_parquet_logger_spark.streaming import ingest

    headline = set(bench.HEADLINE)
    for mod in (
        queries,
        analytic,
        text,
        dedup,
        similarity,
        temporal,
        multimodal,
        pipeline,
        graph,
        maintenance,
        ingest,
    ):
        assert headline & set(mod.QUERIES), (
            f"no headline representative for {mod.__name__}"
        )
