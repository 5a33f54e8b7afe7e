#!/bin/bash
# Round-8 scale chain: fresh 1x bench (same-binary fit base), then the
# {10,20,40}x full-suite ScaleBench runs with the IVF quantizer pinned
# at k = 64 (SPARK_GRAFT_IVF_K_CAP) to re-fit the s2/s4 exponents with
# the production k-pinning fix active. Records land in dev/records/.
set -e
cd /root/repo
echo "=== 1x bench (sf0.1) $(date +%T)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_r8.log 2>&1
cp target/bench.json dev/records/bench_sf0.1_r8.json
for f in 10 20 40; do
  echo "=== ${f}x cap64 $(date +%T)"
  SPARK_GRAFT_SCALE_FACTOR=$f SPARK_GRAFT_IVF_K_CAP=64 \
    sbt -batch "runMain graft.ScaleBench" > /tmp/scale_${f}x_cap64.log 2>&1
  cp target/scale_bench.json dev/records/scale_bench_${f}x_cap64_r8.json
done
echo "=== CHAIN_DONE $(date +%T)"
