#!/bin/bash
# Pre-snapshot gate — run before ANY end-of-session commit. One command
# that catches every past end-of-round failure mode:
#   round 6 + 7: a final snapshot commit landed with sbt test RED
#     (doc-inventory drift, a wrong assertion, a plan-gate regression)
#     → step 1 now runs the FULL suite, not just the doc-sync specs,
#       and `set -e` refuses the snapshot on any failure.
#   round 6: a pathological oracle zeroed the driver's correctness
#     artifact → check_oracle.py enforces a per-oracle wall-time budget,
#     so a bad oracle fails ITSELF, visibly, here — not the round.
#
# Usage: tools/gate.sh [sfDir]   (default /root/testdata/sf0.01)
set -e
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT=$(mktemp -d /tmp/gate_out.XXXXXX)
echo "== FULL test suite (snapshot refused on red) =="
sbt -batch test 2>&1 | tee /tmp/gate_sbt_test.log \
  | grep -E "Total number|All tests passed|Tests:|\*\*\* FAILED|error" | tail -6
grep -q "All tests passed" /tmp/gate_sbt_test.log || {
  echo "GATE FAILED: sbt test is red — DO NOT SNAPSHOT"; exit 1; }
echo "== full verify dump ($SF) =="
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -E "success|\[verify\]" | tail -3
echo "== budgeted DuckDB oracle compare =="
python3 tools/check_oracle.py "$SF" "$OUT"
