#!/bin/bash
# Test runner mirroring the reference repo's run_tests.sh: run the unit
# suite, then (optionally) the local correctness gate against DuckDB.
#
#   ./run_tests.sh            # pytest only
#   ./run_tests.sh --gate     # pytest + full oracle gate at sf0.01
set -u
cd "$(dirname "$0")"

echo "Running unit tests..."
python -m pytest tests/ -x -q
rc=$?
if [ $rc -ne 0 ]; then
    echo "Unit tests FAILED"
    exit $rc
fi

if [ "${1:-}" = "--gate" ]; then
    echo "Running full oracle gate at sf0.01..."
    python tools/check_oracle.py "${SPARK_GRAFT_GATE_DIR:-/root/testdata/sf0.01}"
    rc=$?
    if [ $rc -ne 0 ]; then
        echo "Oracle gate FAILED"
        exit $rc
    fi
fi

echo "All tests passed"
