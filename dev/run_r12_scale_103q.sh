#!/bin/bash
# Round-12 close: final-binary 103-query chain — fresh 1x bench, then
# {10,20,80}x full-suite ScaleBench with the IVF quantizer pinned at
# k = 64 (the production budget trade, matching the earlier r12 series).
set -e
cd /root/repo
echo "=== 1x bench (sf0.1) $(date +%T)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_r12_103q.log 2>&1
cp target/bench.json dev/records/bench_sf0.1_103q_r12_final.json
cp target/bench_passes.json dev/records/bench_passes_sf0.1_103q_r12_final.json
for f in 10 20 80; do
  echo "=== ${f}x cap64 $(date +%T)"
  SPARK_GRAFT_SCALE_FACTOR=$f SPARK_GRAFT_IVF_K_CAP=64 \
    sbt -batch "runMain graft.ScaleBench" > /tmp/scale_${f}x_r12_103q.log 2>&1
  cp target/scale_bench.json dev/records/scale_bench_${f}x_cap64_103q_r12_final.json
done
echo "=== CHAIN_DONE $(date +%T)"
