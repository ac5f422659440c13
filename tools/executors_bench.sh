#!/bin/bash
# Multi-executor scaling evidence, the faithful form: a Spark cluster's
# "4N executors" is 4x separate executor JVMs, not 4x threads in one heap.
# N = one local[8] executor JVM; 4N = FOUR concurrent local[8] executor
# JVMs over disjoint quarters of the same input (each JVM has its own heap
# and GC, like real executors). Aggregate throughput = total docs / max
# wall. Writes/append results for BENCH/BASELINE.md.
#
# Usage: tools/executors_bench.sh [sfDir] [replicatePerJvm]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
REP=${2:-64}
if [ ! -s /tmp/graft_cp.txt ]; then
  sbt -batch "export Runtime/fullClasspath" 2>/dev/null | tail -1 > /tmp/graft_cp.txt
fi
CP=$(cat /tmp/graft_cp.txt)
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JFLAGS="-Xmx20g -XX:+UseParallelGC -XX:ParallelGCThreads=6 -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

run_one() { # cores replicate logfile
  java $OPENS $JFLAGS -cp "$CP" graft.ScalingBench "$1" "$SF" "$2" 2>/dev/null | grep -o '{"cores".*}' | tail -1 > "$3"
}

echo "== N: one local[8] executor JVM =="
run_one 8 "$REP" /tmp/ex_n.json
cat /tmp/ex_n.json

echo "== 4N: four concurrent local[8] executor JVMs =="
T0=$(date +%s.%N)
for i in 1 2 3 4; do run_one 8 "$REP" "/tmp/ex_4n_$i.json" & done
wait
T1=$(date +%s.%N)
cat /tmp/ex_4n_*.json

python3 - "$T0" "$T1" <<'EOF'
import json, sys
t0, t1 = float(sys.argv[1]), float(sys.argv[2])
n = json.load(open('/tmp/ex_n.json'))
four = [json.load(open(f'/tmp/ex_4n_{i}.json')) for i in (1, 2, 3, 4)]
# each JVM reports min-of-3 timed passes after warmup; the concurrent
# aggregate uses the per-JVM throughputs (all four ran simultaneously,
# so their timed passes overlapped under full 4-JVM contention)
agg = sum(s['docs_per_sec'] for s in four)
eff = agg / (4 * n['docs_per_sec'])
print(f"N(one executor): {n['docs_per_sec']:.0f} docs/s")
print(f"4N(four executors, concurrent): {agg:.0f} docs/s aggregate")
print(f"executors_scaling_efficiency={eff:.3f}")
json.dump({'n_docs_per_sec': n['docs_per_sec'], 'agg4_docs_per_sec': agg,
           'efficiency': eff,
           'four': [s['docs_per_sec'] for s in four]},
          open('/tmp/ex_result.json', 'w'))
EOF
