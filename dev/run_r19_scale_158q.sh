#!/bin/bash
# Round-19 ritual (the r18 "keep the measurement ritual" ask): the full
# 158q surface at 1x/10x/20x/80x under the round-19 optimizations
# (capstone plan-size reduction: fused sheet stages, shared lang-scoring
# pass, t17 out of the funnel, t17 scoring persisted). 80x runs first
# after the base bench (the record leg); 20x/10x refresh behind it.
set -e
cd /root/repo
echo "=== bench sf0.1 $(date +%T)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_sf01_r19_158q.log 2>&1
cp target/bench.json dev/records/bench_sf0.1_158q_r19.json
cp target/bench_passes.json dev/records/bench_passes_sf0.1_158q_r19.json
for f in 80 20 10; do
  echo "=== ${f}x cap64 $(date +%T)"
  SPARK_GRAFT_SCALE_FACTOR=$f SPARK_GRAFT_IVF_K_CAP=64 \
    sbt -batch "runMain graft.ScaleBench" > /tmp/scale_${f}x_r19_158q.log 2>&1
  cp target/scale_bench.json dev/records/scale_bench_${f}x_cap64_158q_r19.json
done
echo "=== rprobe $(date +%T)"
sbt -batch "Test/runMain graft.RProbe" 2>/dev/null | grep RPROBE \
  | tee dev/records/rprobe_r19.txt || true
echo "=== CHAIN_DONE $(date +%T)"
