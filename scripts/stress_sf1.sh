#!/usr/bin/env bash
# sf1 stress probe (round-7 verdict ask #7): build a 10x-upsampled sf1
# corpus (graft.StressGen), then run the N slowest headline queries
# once each, one fresh JVM per query, and write BENCH_STRESS.json.
# A query whose sf1 time exceeds 10x its sf0.1 time is a scale cliff.
#
# Usage: scripts/stress_sf1.sh [BENCH_rN.json=BENCH_r07.json] [N=10]
set -euo pipefail
BENCH_JSON="${1:-BENCH_r07.json}"
TOP_N="${2:-10}"
STRESS_DIR=/tmp/graft_stress/sf1
cd "$(dirname "$0")/.."

sbt --error "runMain graft.StressGen $STRESS_DIR" >/dev/null

# slowest N with a valid sf0.1 time; fall back to the previous round's
# numbers for queries the given file recorded as errored (-1)
SLOWEST=$(python3 - "$BENCH_JSON" "$TOP_N" <<'EOF'
import json, sys, glob
def queries(path):
    d = json.load(open(path))
    return ((d.get("parsed") or d).get("queries") or {})  # driver wraps under "parsed"
merged = dict(queries(sys.argv[1]))
for f in sorted(glob.glob("BENCH_r0*.json"), reverse=True):
    for k, v in queries(f).items():
        if merged.get(k, -1.0) <= 0 and v > 0:
            merged[k] = v
qs = sorted(((k, v) for k, v in merged.items() if v > 0), key=lambda kv: -kv[1])
print("\n".join(f"{k} {v}" for k, v in qs[: int(sys.argv[2])]))
EOF
)

echo "query sf01_sec sf1_sec ratio"
RESULTS="{"
SEP=""
while read -r name sf01; do
  out=$(SPARK_GRAFT_SF_DIR="$STRESS_DIR" SPARK_GRAFT_BENCH_ONLY="$name" \
    SPARK_GRAFT_BENCH_RUNS=1 sbt --error "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | tail -1)
  sf1=$(python3 -c "import json,sys; print(json.loads(sys.argv[1])['queries']['$name'])" "$out")
  ratio=$(python3 -c "print(f'{$sf1/$sf01:.2f}')" 2>/dev/null || echo "n/a")
  echo "$name $sf01 $sf1 $ratio"
  RESULTS="$RESULTS$SEP\"$name\":{\"sf01\":$sf01,\"sf1\":$sf1,\"ratio\":$ratio}"
  SEP=","
done <<< "$SLOWEST"
echo "$RESULTS}" | python3 -c "
import json, sys
d = json.load(sys.stdin)
out = {\"metric\": \"stress_sf1\", \"unit\": \"sec\",
       \"note\": \"10x key-shifted upsample of sf0.1; one JVM per query, single sample\",
       \"queries\": d}
json.dump(out, open(\"BENCH_STRESS.json\", \"w\"), indent=1)
print(\"wrote BENCH_STRESS.json\")"
