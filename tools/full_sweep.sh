#!/bin/bash
# Full scaling sweep at one commit: 3x sf0.1 + 3x sf1 + decode share.
# Outputs land in bench_runs/; run from a quiet machine, never edit
# src/main while this is running (each sbt invocation recompiles).
cd /root/repo
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | sed 's/^\[info\] //' > bench_runs/sf0.1_run$i.json
  echo "=== sf0.1 run $i done: $(date)"
done
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | sed 's/^\[info\] //' > bench_runs/sf1_run$i.json
  echo "=== sf1 run $i done: $(date)"
done
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.DecodeShareBench /tmp/sf1" 2>/dev/null \
  | grep '"metric"' | sed 's/^\[info\] //' > bench_runs/decode_share_sf1.json
echo "=== SWEEP COMPLETE: $(date)"
