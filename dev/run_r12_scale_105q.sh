#!/bin/bash
# Round-12 close, second pass: {10,20}x scale points for the final
# 105-query binary (adds m6 + t15 over the 103q chain; 80x kept from
# the 103q series — the two new ops are t8-shaped (t15) and d3-shaped
# (m6), both with measured siblings at 80x).
set -e
cd /root/repo
for f in 10 20; do
  echo "=== ${f}x cap64 $(date +%T)"
  SPARK_GRAFT_SCALE_FACTOR=$f SPARK_GRAFT_IVF_K_CAP=64 \
    sbt -batch "runMain graft.ScaleBench" > /tmp/scale_${f}x_r12_105q.log 2>&1
  cp target/scale_bench.json dev/records/scale_bench_${f}x_cap64_105q_r12_final.json
done
echo "=== CHAIN_DONE $(date +%T)"
