#!/usr/bin/env bash
# Pre-commit / end-of-round gate: everything the driver will check, run
# locally at HEAD. Usage: bash tools/preflight.sh [--quick]
#   full : oracle check @ sf0.01 + whole pytest suite (four quarters, so
#          no leg trips a 10-minute harness timeout) + bench @ sf0.01
#   quick: oracle check only
set -uo pipefail
cd "$(dirname "$0")/.."
rc=0

echo "== oracle check (sf0.01) =="
python tools/check_oracles.py /root/testdata/sf0.01 2>/dev/null | tail -3 || rc=1

if [[ "${1:-}" != "--quick" ]]; then
  echo "== double-run hash stability (sf0.01) =="
  python tools/hash_stability.py /root/testdata/sf0.01 2>/dev/null | tail -3 || rc=1
  echo "== pytest (quarter 1) =="
  python -m pytest $(ls tests/test_*.py | head -11) -q 2>&1 | tail -2 || rc=1
  echo "== pytest (quarter 2) =="
  python -m pytest $(ls tests/test_*.py | sed -n '12,23p') -q 2>&1 | tail -2 || rc=1
  echo "== pytest (quarter 3) =="
  python -m pytest $(ls tests/test_*.py | sed -n '24,34p') -q 2>&1 | tail -2 || rc=1
  echo "== pytest (quarter 4) =="
  python -m pytest $(ls tests/test_*.py | tail -n +35) -q 2>&1 | tail -2 || rc=1
  echo "== bench (sf0.01) =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py 2>/dev/null | tail -1 || rc=1
fi

exit $rc
