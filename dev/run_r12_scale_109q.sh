#!/bin/bash
# Round-12 close, final pass: {10,20,80}x scale points for the final
# 109-query binary (adds t17 + e5 over the 107q chain; t17 is
# t15-shaped scoring plus score-domain-bounded tiering, e5 composes
# t16/t17/d10 with zero extra scans). The 80x leg re-runs here so the
# round's deepest scale point covers the full final surface.
set -e
cd /root/repo
for f in 10 20 80; do
  echo "=== ${f}x cap64 $(date +%T)"
  SPARK_GRAFT_SCALE_FACTOR=$f SPARK_GRAFT_IVF_K_CAP=64 \
    sbt -batch "runMain graft.ScaleBench" > /tmp/scale_${f}x_r12_109q.log 2>&1
  cp target/scale_bench.json dev/records/scale_bench_${f}x_cap64_109q_r12_final.json
done
echo "=== CHAIN_DONE $(date +%T)"
