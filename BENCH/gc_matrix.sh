#!/bin/bash
# GC / heap-shape experiment matrix at local[32] on the 150k-page corpus.
# Motivation: event logs show jvmGcTime inflating 22 s -> 1111 s going
# local[8] -> local[32] (same job, same input) — GC is a first-class part
# of the on-box 8->32 scaling gap, separate from the DRAM-bandwidth ceiling
# BENCH/membw.py measures.  Each config runs run_one.py (prewarm + 2
# repeats, min = steady state); results append to BENCH/gc_matrix.log.
set -u
cd "$(dirname "$0")/.."
INPUT=${GC_INPUT:-BENCH/data/pages_150000_x4}
CORES=${GC_CORES:-32}
LOG=BENCH/gc_matrix.log

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S))" | tee -a "$LOG"
  env "$@" python BENCH/run_one.py --cores "$CORES" --input "$INPUT" --repeat 2 \
    2>/dev/null | tee -a "$LOG"
}

python BENCH/prewarm.py >/dev/null 2>&1
# session.py defaults an unset SPARK_DRIVER_JAVA_OPTS to ParallelGC, so
# the G1 rows must request G1 explicitly or they'd measure ParallelGC
run "base_g1_64g" SPARK_DRIVER_JAVA_OPTS="-XX:+UseG1GC"
run "parallel_gc" SPARK_DRIVER_JAVA_OPTS="-XX:+UseParallelGC"
run "g1_32g_heap" SPARK_DRIVER_JAVA_OPTS="-XX:+UseG1GC" SPARK_DRIVER_MEMORY=32g
run "parallel_gc_32g" SPARK_DRIVER_JAVA_OPTS="-XX:+UseParallelGC" SPARK_DRIVER_MEMORY=32g
run "offheap16_g1_32g" SPARK_DRIVER_JAVA_OPTS="-XX:+UseG1GC" SPARK_DRIVER_MEMORY=32g \
  SPARK_EXTRA_CONF="spark.memory.offHeap.enabled=true;spark.memory.offHeap.size=16g"
echo "=== done ($(date +%H:%M:%S))" | tee -a "$LOG"
