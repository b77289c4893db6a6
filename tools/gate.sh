#!/bin/bash
# Pre-snapshot gate — run before ANY end-of-session commit. One command
# that catches both round-6 failure modes: doc-inventory drift (DocSyncSpec/
# EntrySpec red at HEAD) and a pathological oracle zeroing the driver's
# correctness artifact (check_oracle.py enforces a per-oracle wall-time
# budget, so a bad oracle fails ITSELF, visibly, here — not the round).
#
# Usage: tools/gate.sh [sfDir]   (default /root/testdata/sf0.01)
set -e
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT=$(mktemp -d /tmp/gate_out.XXXXXX)
echo "== doc-sync + contract specs =="
sbt -batch "testOnly graft.DocSyncSpec graft.EntrySpec" 2>&1 \
  | grep -E "Tests:|FAILED" | tail -3
echo "== full verify dump ($SF) =="
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -E "success|\[verify\]" | tail -3
echo "== budgeted DuckDB oracle compare =="
python3 tools/check_oracle.py "$SF" "$OUT"
