#!/bin/bash
# VERDICT r14 #1 probe: settle pl_dedup_apply_incr's sf10-only ~2x cost
# doubling. Dedicated JVM per run (java -cp, no sbt), >=3 fresh runs per
# side, current code (/root/repo) vs the pre-r14 checkout (/tmp/graft_r13
# at 0d4fa54), same fixture (/tmp/graft_sf10), warm loop skipped
# (WARM_CAP=0) so each run is one cold execution + sentinels.
# Usage: probe_dedup_incr_r15.sh <side:r15|r13> <runIdx>
set -e
SIDE=$1; IDX=$2
case $SIDE in
  r15) CLASSES=/root/repo/target/scala-2.13/classes ;;
  r13) CLASSES=/tmp/graft_r13/target/scala-2.13/classes ;;
  *) echo "side r15|r13"; exit 2 ;;
esac
OUT=/root/repo/bench_out/probe_incr_${SIDE}_run${IDX}.json
cd /root/repo
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QUERIES=pl_dedup_apply_incr \
SPARK_GRAFT_WARM_CAP=0 \
SPARK_GRAFT_BENCH_OUT=$OUT \
java -Xmx96g -cp "$CLASSES:/opt/spark/jars/*" graft.Bench 2>/dev/null | grep -E "BENCHQ|metric"
python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
q = d["queries"]["pl_dedup_apply_incr"]
print(f"  -> fresh={q['fresh_sec']}s cpu={q['cpu_sec']} steal={q['steal_sec']} "
      f"gc_ms={q['gc_ms']} load={q['load']} sentinel_agg_min={min(d['sentinel_start_agg_sec'])}")
EOF
