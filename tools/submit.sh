#!/bin/bash
# The north-rule launch shape, literally: the job goes through
# spark-submit, the way a real multi-executor cluster run would
# (sandbox stand-in: a local[N] master replaces the cluster manager;
# 8 vs 32 cores = the N vs 4N executor-slot levels used for the scaling
# evidence in BENCH/BASELINE.md).
#
# Usage: tools/submit.sh [mainClass] [cores] [args...]
#   tools/submit.sh graft.Demo 32 /root/testdata/sf0.001 /tmp/graft-demo
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/submit.sh graft.Bench 32
set -e
cd "$(dirname "$0")/.."
CLASS=${1:-graft.Bench}
CORES=${2:-32}
shift 2 2>/dev/null || shift $# 2>/dev/null || true
# keep the build log: under set -e a silent compile failure would kill
# the script with no diagnostics at all
SBT_LOG=$(mktemp /tmp/graft-sbt-package.XXXXXX.log)
if ! sbt -batch package > "$SBT_LOG" 2>&1; then
  echo "sbt package failed; last 30 log lines ($SBT_LOG):" >&2
  tail -30 "$SBT_LOG" >&2
  exit 1
fi
JAR=$(ls target/scala-2.13/graft*.jar 2>/dev/null | head -1)
[ -z "$JAR" ] && JAR=$(ls target/scala-2.13/*.jar | head -1)
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}
export SPARK_GRAFT_CPUS=$CORES
exec /opt/spark/bin/spark-submit \
  --master "local[$CORES]" \
  --driver-memory 20g \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --class "$CLASS" "$JAR" "$@"
