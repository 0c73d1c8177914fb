#!/bin/bash
# Same-window commit bisect (BENCH.md round 4): run CrawlBench at one
# parallelism level across a list of commits, interleaved over N passes,
# so co-tenant noise hits every commit equally. Uses a detached worktree
# so the working tree is untouched.
#
#   tools/bisect_bench.sh "<commit> <commit> ..." [passes=2] [cpus=32] \
#     [scale=64] [out=/tmp/bisect.jsonl]
#
# Run inside tmux — this sandbox kills detached (setsid/nohup) processes,
# and a full protocol takes ~10 min per commit per pass.
set -u
COMMITS=${1:?"usage: bisect_bench.sh \"<commit> ...\" [passes] [cpus] [scale] [out]"}
PASSES=${2:-2}
CPUS=${3:-32}
SCALE=${4:-64}
OUT=${5:-/tmp/bisect.jsonl}
WT=$(mktemp -d /tmp/bisect-wt.XXXX)
git worktree add "$WT" $(echo $COMMITS | awk '{print $1}') >/dev/null
trap 'git worktree remove --force "$WT"' EXIT
: > "$OUT"
for pass in $(seq 1 "$PASSES"); do
  for c in $COMMITS; do
    git -C "$WT" checkout -q "$c"
    echo "== pass $pass commit $c $(date +%T) loadavg $(cut -d' ' -f1 /proc/loadavg)" >> "$OUT"
    (cd "$WT" && SPARK_DRIVER_MEM=20g SPARK_GRAFT_CRAWL_SCALE=$SCALE SPARK_GRAFT_CPUS=$CPUS \
      sbt -batch "runMain graft.CrawlBench" 2>&1 | grep -o '{"metric".*}') >> "$OUT"
  done
done
echo DONE >> "$OUT"
