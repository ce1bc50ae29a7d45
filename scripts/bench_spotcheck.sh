#!/usr/bin/env bash
# Spot-check the bench harness against cross-query contamination:
# take the N slowest queries from a BENCH json and re-run each in its
# own fresh JVM, then print recorded vs isolated side by side. The
# harness is trustworthy when isolated is within ~30% of recorded for
# every spot-checked query.
#
# Usage: scripts/bench_spotcheck.sh BENCH_rN.json [N=5] [SF_DIR=/root/testdata/sf0.1]
set -euo pipefail
BENCH_JSON="${1:?usage: bench_spotcheck.sh BENCH_rN.json [N] [SF_DIR]}"
TOP_N="${2:-5}"
SF_DIR="${3:-/root/testdata/sf0.1}"
cd "$(dirname "$0")/.."

SLOWEST=$(python3 - "$BENCH_JSON" "$TOP_N" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
qs = sorted(d["queries"].items(), key=lambda kv: -kv[1])
print("\n".join(f"{k} {v}" for k, v in qs[: int(sys.argv[2])]))
EOF
)

echo "query recorded_sec isolated_sec ratio"
while read -r name recorded; do
  out=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_ONLY="$name" \
    sbt --error "runMain graft.Bench" 2>/dev/null | grep '"metric"' | tail -1)
  isolated=$(python3 -c "import json,sys; print(json.loads(sys.argv[1])['queries']['$name'])" "$out")
  ratio=$(python3 -c "print(f'{$recorded/$isolated:.2f}')" 2>/dev/null || echo "n/a")
  echo "$name $recorded $isolated $ratio"
done <<< "$SLOWEST"
