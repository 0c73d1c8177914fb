#!/bin/bash
# North-rule two-cluster-size scaling protocol: interleaved local[8] /
# local[32] pairs of the IDENTICAL CrawlBench job (same seed/config/plan),
# best-of-N per level (unloaded-capability estimator under the sandbox's
# co-tenant noise — see BENCH.md). Usage:
#   tools/scaling_bench.sh <scale> <pairs> <outfile> [cpu list]
# default pair is "8 32"; the BENCH.md 2->8 rows used "2 8".
set -u
SCALE=${1:-64}
PAIRS=${2:-3}
OUT=${3:-/tmp/scaling_${SCALE}.jsonl}
CPU_LIST=${4:-"8 32"}
: > "$OUT"
for i in $(seq 1 "$PAIRS"); do
  for CPUS in $CPU_LIST; do
    echo "[pair $i] local[$CPUS] scale=$SCALE ..." >&2
    RUNLOG=/tmp/crawlbench_${SCALE}_${CPUS}_$i.log
    echo "== pair $i cpus $CPUS $(date +%T) loadavg $(cut -d' ' -f1-3 /proc/loadavg)" >> "$OUT"
    SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_CRAWL_SCALE=$SCALE \
      SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-20g} SPARK_GRAFT_CRAWL_VERBOSE=1 \
      sbt -batch "runMain graft.CrawlBench" > "$RUNLOG" 2>&1
    echo "== end $(date +%T) loadavg $(cut -d' ' -f1-3 /proc/loadavg)" >> "$OUT"
    grep -o '{"metric".*}' "$RUNLOG" >> "$OUT"
    tail -1 "$OUT" >&2
  done
done
echo "done -> $OUT" >&2
