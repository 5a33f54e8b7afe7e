#!/bin/bash
# Round-17 ritual: the full 157q surface (r16's 151 + h1, t24, t25,
# d1n, p10, e11 + the t24-extended e5/e7/e9/e10 and versioned cut
# roots) at 1x/10x/20x/80x. 80x runs first after the base bench (the
# record leg); 20x/10x refresh behind it. R statistic recorded per
# factor afterwards (RProbe — the dispatch guard's live value).
set -e
cd /root/repo
echo "=== bench sf0.1 $(date +%T)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_sf01_r17_157q.log 2>&1
cp target/bench.json dev/records/bench_sf0.1_157q_r17.json
cp target/bench_passes.json dev/records/bench_passes_sf0.1_157q_r17.json
for f in 80 20 10; do
  echo "=== ${f}x cap64 $(date +%T)"
  SPARK_GRAFT_SCALE_FACTOR=$f SPARK_GRAFT_IVF_K_CAP=64 \
    sbt -batch "runMain graft.ScaleBench" > /tmp/scale_${f}x_r17_157q.log 2>&1
  cp target/scale_bench.json dev/records/scale_bench_${f}x_cap64_157q_r17.json
done
echo "=== rprobe $(date +%T)"
sbt -batch "Test/runMain graft.RProbe" 2>/dev/null | grep RPROBE \
  | tee dev/records/rprobe_r17.txt || true
echo "=== CHAIN_DONE $(date +%T)"
