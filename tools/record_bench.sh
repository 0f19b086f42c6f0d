#!/usr/bin/env bash
# Chunked/resumable bench recording (r16 verdict item 1).
#
# The hostile-host problem: quiet windows on this box are shorter than
# one 12-14 min full-board recording, so 13/13 r16 attempts failed the
# whole-run steal/IO guard. This loop runs graft.Bench in LEDGER mode:
# each attempt is a fresh JVM that re-runs ONLY the queries whose
# previous windows were dirty (per-query steal/iowait sampled over the
# query's own wall), folds the clean ones into bench_ledger.json, and
# stops when every query on the board has a guard-clean cold + all-warm
# record — then Bench assembles bench_full.json with per-query attempt
# provenance embedded.
#
# Usage: tools/record_bench.sh [max_attempts] [sf_dir]
#
# Resumes an existing bench_ledger.json by default (adopted records
# survive an interrupted campaign); pass FRESH=1 to start over.
set -u
MAX=${1:-20}
SF=${2:-/root/testdata/sf0.1}
cd "$(dirname "$0")/.."
if [ "${FRESH:-0}" = "1" ]; then rm -f bench_ledger.json; fi
for i in $(seq 1 "$MAX"); do
  echo "=== ledger attempt $i/$MAX ==="
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_LEDGER=bench_ledger.json \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E '"metric"|ledger:' | tail -5
  # the ledger is JSONL: meta line first, then one line per adopted
  # query. state 0 = done (complete, all tier-1); 2 = complete but
  # tier-2 colds remain upgradable (artifact already assembled --
  # keep attempting upgrades); 1 = queries still pending.
  python3 - <<'EOF'
import json, sys
try:
    meta = json.loads(open("bench_ledger.json").readline())
except Exception:
    sys.exit(1)
if meta.get("pending", True):
    sys.exit(1)
sys.exit(2 if meta.get("upgradable_n", 0) > 0 else 0)
EOF
  state=$?
  if [ "$state" = "0" ]; then
    echo "=== ledger complete after $i attempt(s); bench_full.json assembled, all colds tier-1 ==="
    exit 0
  elif [ "$state" = "2" ]; then
    echo "=== board complete; tier-2 colds remain — attempting upgrades ==="
  fi
done
python3 - <<'EOF'
import json, sys
try:
    meta = json.loads(open("bench_ledger.json").readline())
except Exception:
    sys.exit(1)
sys.exit(0 if not meta.get("pending", True) else 1)
EOF
if [ $? = 0 ]; then
  echo "=== ledger complete (tier-2 colds remain; see bench_full.json cold_tier2) ==="
  exit 0
fi
echo "=== ledger INCOMPLETE after $MAX attempts — see bench_ledger.json ==="
exit 1
