#!/bin/bash
# Round-14 FINAL ritual: the surface froze at 140q (st13 landed after
# the 139q series), so the full-surface series re-runs. The 80x leg
# runs FIRST after the base bench — it is the record VERDICT r13 item 5
# asks for; 20x/10x refresh behind it.
set -e
cd /root/repo
echo "=== bench sf0.1 $(date +%T)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_sf01_r14_140q.log 2>&1
cp target/bench.json dev/records/bench_sf0.1_140q_r14_final.json
cp target/bench_passes.json dev/records/bench_passes_sf0.1_140q_r14_final.json
for f in 80 20 10; do
  echo "=== ${f}x cap64 $(date +%T)"
  SPARK_GRAFT_SCALE_FACTOR=$f SPARK_GRAFT_IVF_K_CAP=64 \
    sbt -batch "runMain graft.ScaleBench" > /tmp/scale_${f}x_r14_140q.log 2>&1
  cp target/scale_bench.json dev/records/scale_bench_${f}x_cap64_140q_r14.json
done
echo "=== CHAIN_DONE $(date +%T)"
