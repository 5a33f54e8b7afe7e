#!/bin/bash
# Round-13 close: {10,20,80}x scale points for the final 130-query binary.
set -e
cd /root/repo
for f in 10 20 80; do
  echo "=== ${f}x cap64 $(date +%T)"
  SPARK_GRAFT_SCALE_FACTOR=$f SPARK_GRAFT_IVF_K_CAP=64 \
    sbt -batch "runMain graft.ScaleBench" > /tmp/scale_${f}x_r13_130q.log 2>&1
  cp target/scale_bench.json dev/records/scale_bench_${f}x_cap64_130q_r13_final.json
done
echo "=== CHAIN_DONE $(date +%T)"
