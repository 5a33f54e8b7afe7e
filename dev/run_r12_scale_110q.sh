#!/bin/bash
# Round-12 close, last pass: {10,20}x scale points for the truly-final
# 110-query binary (adds st10 over the 109q chain). st10 is a
# corpus-free narrow map (t16/t1/t3-shaped) with measured siblings at
# every factor, so the 80x leg keeps the 109q record.
set -e
cd /root/repo
for f in 10 20; do
  echo "=== ${f}x cap64 $(date +%T)"
  SPARK_GRAFT_SCALE_FACTOR=$f SPARK_GRAFT_IVF_K_CAP=64 \
    sbt -batch "runMain graft.ScaleBench" > /tmp/scale_${f}x_r12_110q.log 2>&1
  cp target/scale_bench.json dev/records/scale_bench_${f}x_cap64_110q_r12_final.json
done
echo "=== CHAIN_DONE $(date +%T)"
