#!/bin/bash
# VERDICT r14 #1 probe: settle pl_dedup_apply_incr's sf10-only ~2x cost
# doubling. Dedicated JVM per run (java -cp, no sbt), >=3 fresh runs per
# side, current code (/root/repo) vs the pre-r14 checkout (/tmp/graft_r13
# at 0d4fa54), same fixture (/tmp/graft_sf10), warm loop skipped
# (WARM_CAP=0) so each run is one cold execution + sentinels.
# Usage: probe_dedup_incr_r15.sh <side:r15|r13> <runIdx>
set -e
SIDE=$1; IDX=$2; HEAP=${3:-96g}
case $SIDE in
  r15) CLASSES=/root/repo/target/scala-2.13/classes ;;
  r13) CLASSES=/tmp/graft_r13/target/scala-2.13/classes ;;
  *) echo "side r15|r13"; exit 2 ;;
esac
OUT=/root/repo/bench_out/probe_incr_${SIDE}_run${IDX}_${HEAP}.json
TIMEF=/root/repo/bench_out/probe_incr_${SIDE}_run${IDX}_${HEAP}.time
cd /root/repo
export SPARK_GRAFT_SF_DIR=/tmp/graft_sf10
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_QUERIES=pl_dedup_apply_incr
export SPARK_GRAFT_WARM_CAP=0
export SPARK_GRAFT_BENCH_OUT=$OUT
# bash-builtin time (no GNU time in this container): user+sys cover the
# whole JVM = query + sentinels + warmup; the r13 side's Bench predates
# the in-artifact cpu_sec field, so this is its cpu evidence
TIMEFORMAT="  time: real %R user %U sys %S"
time java -Xmx$HEAP -cp "$CLASSES:/opt/spark/jars/*" graft.Bench 2>/dev/null | grep -E "BENCHQ|metric"

python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
q = d["queries"]["pl_dedup_apply_incr"]
sent = min(d.get('sentinel_start_agg_sec') or [-1])
print(f"  -> fresh={q['fresh_sec']}s cpu={q.get('cpu_sec','n/a')} "
      f"steal={q.get('steal_sec','n/a')} gc_ms={q.get('gc_ms','n/a')} "
      f"load={q.get('load','n/a')} sentinel_agg_min={sent}")
EOF
