#!/bin/bash
# Round-14 ritual (final surface): sf0.1 builder bench + {10,20,80}x
# scale legs, all on the FULL 139q binary (adds p9, m11, t22 over the
# session's earlier 136q; that script is superseded). The 80x leg runs
# the full registered set — VERDICT r13 item 5: no operator's worst
# case extrapolated from siblings this round.
set -e
cd /root/repo
echo "=== bench sf0.1 $(date +%T)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_sf01_r14.log 2>&1
cp target/bench.json dev/records/bench_sf0.1_139q_r14.json
cp target/bench_passes.json dev/records/bench_passes_sf0.1_139q_r14.json
for f in 10 20 80; do
  echo "=== ${f}x cap64 $(date +%T)"
  SPARK_GRAFT_SCALE_FACTOR=$f SPARK_GRAFT_IVF_K_CAP=64 \
    sbt -batch "runMain graft.ScaleBench" > /tmp/scale_${f}x_r14_139q.log 2>&1
  cp target/scale_bench.json dev/records/scale_bench_${f}x_cap64_139q_r14.json
done
echo "=== CHAIN_DONE $(date +%T)"
