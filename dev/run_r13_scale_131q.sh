#!/bin/bash
# Round-13 truly-final binary: {10,20}x points for 131q (adds k8 — a
# routing-columns-only narrow panel — and d13's cheaper rank-window
# spelling over the 130q chain). The 80x leg keeps the 130q record:
# both deltas have measured siblings at every factor (the r12 st10
# precedent).
set -e
cd /root/repo
for f in 10 20; do
  echo "=== ${f}x cap64 $(date +%T)"
  SPARK_GRAFT_SCALE_FACTOR=$f SPARK_GRAFT_IVF_K_CAP=64 \
    sbt -batch "runMain graft.ScaleBench" > /tmp/scale_${f}x_r13_131q.log 2>&1
  cp target/scale_bench.json dev/records/scale_bench_${f}x_cap64_131q_r13_final.json
done
echo "=== CHAIN_DONE $(date +%T)"
