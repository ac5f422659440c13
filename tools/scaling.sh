#!/bin/bash
# Scaling-efficiency evidence (north rule: N vs 4N executors; local[8] vs
# local[32] stand-in). One JVM per measurement; the host VM shows ±30%
# CPU-steal variance over minutes, so each level is sampled in ITER
# alternating JVMs and the least-contended (min-wall) sample per level is
# reported, with all samples listed for transparency.
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
REP=${2:-256}
ITER=${3:-2}
export SPARK_DRIVER_MEM=48g
run() {
  sbt -batch "runMain graft.ScalingBench $1 $SF $REP" 2>&1 | grep -o '{"cores".*}' | tail -1
}
SAMPLES=()
for i in $(seq 1 "$ITER"); do
  SAMPLES+=("$(run 8)")
  SAMPLES+=("$(run 32)")
done
printf '%s\n' "${SAMPLES[@]}"
python3 - "$SF" "${SAMPLES[@]}" <<'EOF'
import json, sys
sf = sys.argv[1]
samples = [json.loads(s) for s in sys.argv[2:]]
best = {}
for s in samples:
    c = s['cores']
    if c not in best or s['wall_sec'] < best[c]['wall_sec']:
        best[c] = s
r8, r32 = best[8], best[32]
eff = r32['docs_per_sec'] / (4 * r8['docs_per_sec'])
rows = '\n'.join(f"| local[{s['cores']}] | {s['wall_sec']:.2f} | {s['docs_per_sec']:.0f} |"
                 for s in samples)
md = f"""# BENCH/SCALING_THREADS — thread-scaling samples (secondary evidence; primary = executors_bench.sh in BENCH/BASELINE.md)

End-to-end extraction pipeline (synthesize interleaved corpus ->
boilerplate strip -> block parse -> contract rows) on `{sf}`
({r8['docs']} docs incl. ~1% mega-doc skew tail, ~25x span fan-out).
Methodology: one JVM per measurement (same-JVM sequencing distorts GC/JIT
state); per JVM, min of 3 timed passes after a warmup pass; per level,
min across {len(samples)//2} alternating JVM runs — the host VM shows
±30% CPU-steal variance over minutes, so the least-contended sample is
the stable estimator. local[8] vs local[32] = N vs 4N executor slots on
identical input (no real cluster in this sandbox; 32 physical cores, no
SMT).

All samples:

| parallelism | wall (s) | throughput (docs/s) |
| --- | --- | --- |
{rows}

Best per level:

| parallelism | wall (s) | throughput (docs/s) |
| --- | --- | --- |
| local[8]  (N)  | {r8['wall_sec']:.2f} | {r8['docs_per_sec']:.0f} |
| local[32] (4N) | {r32['wall_sec']:.2f} | {r32['docs_per_sec']:.0f} |

**Scaling efficiency (N -> 4N): {eff:.2f}** (target >= 0.8, BASELINE.json
north rule).

Reference single-node baseline (/root/repo/BASELINE.md): 0.067-1 docs/s
(sequential per-doc API calls). This engine exceeds it by >4 orders of
magnitude per node; the target at 100 TB is the scaling curve above.
"""
# Raw output only: the curated evidence doc (BENCH/SCALING_THREADS.md)
# carries the cross-round history and window notes and is maintained by
# hand — a contended-window rerun must not clobber it.
open('BENCH/scaling_threads_latest.md', 'w').write(md)
with open('BENCH/scaling_samples.log', 'a') as f:
    for s in samples:
        f.write(json.dumps(s) + '\n')
print(f'scaling_efficiency={eff:.3f}')
EOF
