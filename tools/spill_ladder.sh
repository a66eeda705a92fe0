#!/bin/bash
# Memory-pressure ladder (SCALE_LADDER.md "Memory-pressure rung"):
# measure spill behavior and failure floors of the heavy shuffle queries
# under squeezed unified pools. Pressure runs use repeat=1 — back-to-back
# repeats in one JVM race the ASYNC ContextCleaner's broadcast reclaim
# and can fail where each cold run passes. Controls use the default
# repeat=2. Requires the x10 rung staged (tools of graft.ScaleLadder):
#   sbt "runMain graft.ScaleLadder /root/testdata/sf0.1 /tmp/graft_sf1"
set -eo pipefail
cd "$(dirname "$0")/.."
SF=${SPILL_SF_DIR:-/tmp/graft_sf1}
QUERIES=${SPILL_QUERIES:-dedup_ssjoin_exact,rel_item_cooccur_sim,rel_basket_pairs,rel_weighted_quantiles}
IFS=',' read -ra QS <<< "$QUERIES"
for q in "${QS[@]}"; do
  echo "== control 8g $q"
  SPARK_DRIVER_MEM=8g SPARK_GRAFT_BENCH_SPILL=1 SPARK_GRAFT_BENCH_ONLY=$q \
    SPARK_GRAFT_SF_DIR=$SF sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -oE '\{"metric".*' | tail -1
  echo "== pressure 2g fraction=0.4 rep=1 $q"
  SPARK_DRIVER_MEM=2g SPARK_GRAFT_BENCH_SPILL=1 \
    SPARK_GRAFT_BENCH_CONF="spark.memory.fraction=0.4" \
    SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_REPEAT=1 \
    SPARK_GRAFT_SF_DIR=$SF sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -oE '\{"metric".*' | tail -1
done
