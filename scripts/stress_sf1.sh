#!/usr/bin/env bash
# sf1 stress probe (round-7 verdict ask #7): build a 10x-upsampled sf1
# corpus (graft.StressGen), then run the N slowest headline queries
# once each, one fresh JVM per query, and write BENCH_STRESS.json.
# A query whose sf1 time exceeds 10x its sf0.1 time is a scale cliff.
#
# Usage: scripts/stress_sf1.sh [BENCH.json=BENCH_LATEST.json] [N=10]
# EXTRA_QUERIES adds named queries beyond the slowest N (round-9 ask:
# join_interval_bucket + geo_clip ride along by default).
set -euo pipefail
DEFAULT_JSON=BENCH_LATEST.json
[ -f "$DEFAULT_JSON" ] || DEFAULT_JSON=BENCH_r08.json
BENCH_JSON="${1:-$DEFAULT_JSON}"
TOP_N="${2:-10}"
EXTRA_QUERIES="${EXTRA_QUERIES:-join_interval_bucket geo_clip}"
STRESS_DIR=/tmp/graft_stress/sf1
cd "$(dirname "$0")/.."

sbt --error "runMain graft.StressGen $STRESS_DIR" >/dev/null

# slowest N with a valid sf0.1 time; fall back to the previous round's
# numbers for queries the given file recorded as errored (-1)
SLOWEST=$(python3 - "$BENCH_JSON" "$TOP_N" "$EXTRA_QUERIES" <<'EOF'
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
picked = qs[: int(sys.argv[2])]
names = {k for k, _ in picked}
for extra in sys.argv[3].split():
    if extra not in names and merged.get(extra, -1.0) > 0:
        picked.append((extra, merged[extra]))
print("\n".join(f"{k} {v}" for k, v in picked))
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
