#!/bin/bash
# Multi-executor scaling evidence, the faithful form: a Spark cluster's
# "4N executors" is 4x separate executor JVMs, not 4x threads in one heap.
# N = one local[8] executor JVM; 4N = FOUR concurrent local[8] executor
# JVMs over disjoint quarters of the same input (each JVM has its own heap
# and GC, like real executors). Efficiency is reported from BOTH the
# per-JVM min-of-3 (least-contended sample) and the per-JVM median-of-3
# (robust to JVMs drifting out of phase and landing a min in a
# low-contention window). Writes/append results for BENCH/BASELINE.md.
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

# N again AFTER the 4N phase: the solo baseline varies ~14% across
# otherwise-identical clean windows (thermal/turbo state the guest can't
# see), which swings the ratio in both directions. Bracketing the 4N
# phase with two N samples and averaging cancels the drift.
echo "== N (post): one local[8] executor JVM =="
run_one 8 "$REP" /tmp/ex_n2.json
cat /tmp/ex_n2.json

python3 - "$T0" "$T1" <<'EOF'
import json, sys
t0, t1 = float(sys.argv[1]), float(sys.argv[2])
n = json.load(open('/tmp/ex_n.json'))
n2 = json.load(open('/tmp/ex_n2.json'))
four = [json.load(open(f'/tmp/ex_4n_{i}.json')) for i in (1, 2, 3, 4)]
# two estimators per JVM (warmup, then 3 timed passes, all four JVMs
# running simultaneously):
#  - min-of-3: the least-contended sample — can overstate efficiency if a
#    JVM's fastest pass lands in a window where the other JVMs idle
#  - median-of-3: robust to that phase drift; the honest headline number
agg_min = sum(s['docs_per_sec'] for s in four)
agg_med = sum(s.get('median_docs_per_sec', s['docs_per_sec']) for s in four)
n_min = n['docs_per_sec']
n_med = n.get('median_docs_per_sec', n_min)
eff_min = agg_min / (4 * n_min)
eff_med = agg_med / (4 * n_med)
print(f"N(one executor): {n_min:.0f} docs/s (median {n_med:.0f})")
print(f"4N(four executors, concurrent): {agg_min:.0f} docs/s aggregate (median {agg_med:.0f})")
print(f"4N window wall: {t1 - t0:.1f}s incl. startup+warmup (context only)")
print(f"executors_scaling_efficiency_min={eff_min:.3f}")
print(f"executors_scaling_efficiency_median={eff_med:.3f}")
# bracketed estimator: baseline = mean of the pre- and post-4N N samples
nb_min = (n_min + n2['docs_per_sec']) / 2
nb_med = (n_med + n2.get('median_docs_per_sec', n2['docs_per_sec'])) / 2
print(f"N(post): {n2['docs_per_sec']:.0f} docs/s (median {n2.get('median_docs_per_sec', 0):.0f})")
print(f"executors_scaling_efficiency_bracketed_min={agg_min / (4 * nb_min):.3f}")
print(f"executors_scaling_efficiency_bracketed_median={agg_med / (4 * nb_med):.3f}")
json.dump({'n_docs_per_sec': n_min, 'n_median_docs_per_sec': n_med,
           'agg4_docs_per_sec': agg_min, 'agg4_median_docs_per_sec': agg_med,
           'efficiency_min': eff_min, 'efficiency_median': eff_med,
           'four': [s['docs_per_sec'] for s in four],
           'four_median': [s.get('median_docs_per_sec') for s in four]},
          open('/tmp/ex_result.json', 'w'))
EOF
