#!/bin/bash
# Cross-process FileRateLimitStore contention measurement (round-12
# VERDICT item 8): launches N independent JVMs hammering incr() on one
# shared store file and sums per-process throughput. Usage:
#   tools/rate_limit_contention.sh <nProcs> <seconds> [storeFile]
# Classpath needs only the scala-library jar (the store is pure JDK)
# plus the repo's compiled classes.
set -euo pipefail
N="${1:-2}"
SECS="${2:-10}"
STORE="${3:-/tmp/rl_contention_$$.txt}"
CP="/opt/spark/jars/*:target/scala-2.13/classes:target/scala-2.13/test-classes"
rm -f "$STORE"
pids=()
outs=()
for i in $(seq 1 "$N"); do
  out="/tmp/rl_probe_$$_$i.json"
  outs+=("$out")
  java -cp "$CP" graft.RateLimitContentionProbe "$STORE" "$SECS" > "$out" &
  pids+=($!)
done
for p in "${pids[@]}"; do wait "$p"; done
python3 - "$N" "$SECS" "${outs[@]}" <<'EOF'
import json, sys
n, secs, files = int(sys.argv[1]), float(sys.argv[2]), sys.argv[3:]
rows = [json.load(open(f)) for f in files]
total = sum(r["ops"] for r in rows)
print(json.dumps({
    "procs": n, "seconds": secs,
    "total_ops": total, "agg_ops_per_sec": round(total / secs, 1),
    "per_proc_ops_per_sec": [round(r["opsPerSec"], 1) for r in rows],
    "admits": sum(r["admits"] for r in rows),
    "denies": sum(r["denies"] for r in rows)}))
EOF
rm -f "${outs[@]}" "$STORE"
