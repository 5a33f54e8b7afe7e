#!/bin/bash
# Round-12 close, third pass: {10,20}x scale points for the final
# 107-query binary (adds k6 + t16 over the 105q chain). k6 is
# q4-word-count-shaped (one token exchange with map-side combine) and
# t16 is t1-shaped (pure narrow map) — both have measured siblings at
# 80x, so the 80x leg is kept from the 103q series unless re-run.
set -e
cd /root/repo
for f in 10 20; do
  echo "=== ${f}x cap64 $(date +%T)"
  SPARK_GRAFT_SCALE_FACTOR=$f SPARK_GRAFT_IVF_K_CAP=64 \
    sbt -batch "runMain graft.ScaleBench" > /tmp/scale_${f}x_r12_107q.log 2>&1
  cp target/scale_bench.json dev/records/scale_bench_${f}x_cap64_107q_r12_final.json
done
echo "=== CHAIN_DONE $(date +%T)"
