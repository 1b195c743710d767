"""Round-over-round bench diff: BENCHFULL.json (or any two bench
records) compared per query, normalized by the measured noise floor.

The scale probe diffs 10x RATIOS (plan shape); this diffs sf0.1
WALL-TIME (constant-factor regressions the ratio can't see). A query is
flagged only when its delta exceeds both a relative threshold and the
run's reference-scan noise floor, so uniform VM drift (firecracker CPU
steal inflates whole passes) doesn't read as a regression.

Usage:
    python tools/bench_compare.py                 # BENCHFULL vs git HEAD's
    python tools/bench_compare.py OLD.json NEW.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REL_THRESHOLD = 1.3  # flag >= 30% slower
ABS_FLOOR_MULT = 3.0  # ... and >= 3x the ref-scan noise floor in absolute terms


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _head_benchfull() -> dict | None:
    out = subprocess.run(
        ["git", "-C", ROOT, "show", "HEAD:BENCHFULL.json"],
        capture_output=True,
        text=True,
    )
    return json.loads(out.stdout) if out.returncode == 0 and out.stdout else None


def _queries(rec: dict) -> dict[str, float]:
    return rec.get("queries") or rec.get("all_queries") or {}


def main() -> int:
    if len(sys.argv) == 3:
        old, new = _load(sys.argv[1]), _load(sys.argv[2])
        old_name, new_name = sys.argv[1], sys.argv[2]
    else:
        new = _load(os.path.join(ROOT, "BENCHFULL.json"))
        old = _head_benchfull()
        old_name, new_name = "HEAD:BENCHFULL.json", "BENCHFULL.json"
        if old is None:
            print("no committed BENCHFULL.json to compare against")
            return 1
    oq, nq = _queries(old), _queries(new)
    shared = sorted(k for k in nq if k in oq)
    floor = float(
        new.get("ref_scan_median_sec") or new.get("ref_scan_sec") or 0.1
    )
    # Floor-ratio normalization: when BOTH records carry a reference-scan
    # median, divide the new run's times by (new_floor / old_floor) before
    # flagging. Ambient CPU steal inflates entire passes (the round-9
    # second-half runs measured floor 0.131 s -> 0.167 s and EVERY query
    # ~+20% uniformly); without this, a pass taken in a noisier window
    # flags dozens of untouched queries. ALL printed seconds stay RAW
    # (flag lines additionally show the normalized value in brackets);
    # only the flagging decision uses the normalized times, against a
    # matching normalized absolute floor (floor/drift == old_floor's
    # scale, so both sides of the absolute gate live in old-run units).
    old_floor = float(
        old.get("ref_scan_median_sec") or old.get("ref_scan_sec") or 0.0
    )
    drift = floor / old_floor if old_floor > 0 else 1.0
    print(f"compare {old_name} -> {new_name}")
    print(
        f"shared {len(shared)} queries | old total "
        f"{sum(oq[k] for k in shared):.1f}s -> new "
        f"{sum(nq[k] for k in shared):.1f}s | noise floor {floor:.3f}s"
        + (f" | floor drift x{drift:.2f} (flagging normalized)"
           if abs(drift - 1.0) > 0.05 else "")
    )
    normalized = abs(drift - 1.0) > 0.05
    nqn = {k: v / drift for k, v in nq.items()} if normalized else nq
    eff_floor = floor / drift if normalized else floor
    new_only = sorted(k for k in nq if k not in oq)
    if new_only:
        tot = sum(nq[k] for k in new_only)
        print(f"new queries ({len(new_only)}, {tot:.1f}s raw): "
              + ", ".join(f"{k}={nq[k]:.2f}s" for k in new_only))
    flags = []
    for k in shared:
        d = nqn[k] - oq[k]
        if nqn[k] >= oq[k] * REL_THRESHOLD and d >= eff_floor * ABS_FLOOR_MULT:
            flags.append((d, k))
    if flags:
        print("REGRESSION CANDIDATES (>=30% and >=3x noise floor, drift-normalized):")
        for d, k in sorted(flags, reverse=True):
            norm = f" [norm {nqn[k]:.2f}s]" if normalized else ""
            print(f"  {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s raw{norm} (+{d:.2f}s norm)")
    else:
        print("regression candidates: NONE")
    improved = sorted(
        (
            (oq[k] - nqn[k], k)
            for k in shared
            if oq[k] - nqn[k] >= eff_floor * ABS_FLOOR_MULT
        ),
        reverse=True,
    )[:5]
    if improved:
        print("biggest improvements (raw): "
              + "; ".join(f"{k} {oq[k]:.2f}->{nq[k]:.2f}s" for _, k in improved))
    return 2 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
