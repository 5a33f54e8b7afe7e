#!/bin/bash
# Round-16 ritual: the full 151q surface (r15's 146 + t4d, d16, t23,
# st14, e10 + the d4/d15 auto-dispatch + e2/e4 real-token packs) at
# 1x/10x/20x/80x. 80x runs first after the base bench (the record
# leg); 20x/10x refresh behind it.
set -e
cd /root/repo
echo "=== bench sf0.1 $(date +%T)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_sf01_r16_151q.log 2>&1
cp target/bench.json dev/records/bench_sf0.1_151q_r16.json
cp target/bench_passes.json dev/records/bench_passes_sf0.1_151q_r16.json
for f in 80 20 10; do
  echo "=== ${f}x cap64 $(date +%T)"
  SPARK_GRAFT_SCALE_FACTOR=$f SPARK_GRAFT_IVF_K_CAP=64 \
    sbt -batch "runMain graft.ScaleBench" > /tmp/scale_${f}x_r16_151q.log 2>&1
  cp target/scale_bench.json dev/records/scale_bench_${f}x_cap64_151q_r16.json
done
echo "=== CHAIN_DONE $(date +%T)"
