#!/bin/bash
# Post-encryption-corpus scaling batch: windows (2,8) and (4,16), fresh JVM
# per size, heap 2 GiB/core, GC threads = cores, 1.28M pages (sf0.1 x256).
set -e
cd /root/repo
SF=/root/testdata/sf0.1
REP=256
OUT=BENCH/raw_r5
run() {
  local cores=$1
  SPARK_DRIVER_MEM=$((2 * cores))g \
  GRAFT_JAVA_OPTS="-XX:ParallelGCThreads=$cores" \
  sbt -batch "runMain graft.ScalingBench once $cores $SF $REP $OUT/postcrypt_all256_c$cores.json"
}
run 2
run 8
run 4
run 16
sbt -batch "runMain graft.ScalingBench report \
  $OUT/postcrypt_all256_c2.json $OUT/postcrypt_all256_c8.json \
  $OUT/postcrypt_all256_c4.json $OUT/postcrypt_all256_c16.json \
  --note \"Corpus for this batch includes the encrypted-PDF slices (5% of docs decrypt RC4/AES transparently, 0.5% refuse typed as locked; commit e07c2ea). Raw per-run JSONs: BENCH/raw_r5/postcrypt_all256_c{2,8,4,16}.json. Route-sliced attribution of the round-4 drop (pre/post scratch-reuse fix) remains in BENCH/ATTRIBUTION_r5.md with raw runs in BENCH/raw_r5/.\" \
  $SF"
echo BATCH_DONE
