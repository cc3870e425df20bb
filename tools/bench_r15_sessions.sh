#!/bin/bash
# Round-15 clean-session bench protocol: three full back-to-back JVM
# sessions on a quiet machine, run FIRST this session before any
# compile/probe/source-edit (binary = committed HEAD, incremental
# compile is a no-op). Session A is the cold warm-in run (committed,
# discarded from comparisons); C is the round's full-map contract.
set -e
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
for s in A B C; do
  echo "=== session $s start $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) ==="
  SPARK_GRAFT_BENCH_OUT=target/bench_r15_session$s.json \
    sbt "runMain graft.Bench" > target/bench_r15_session$s.log 2>&1
  echo "=== session $s done  $(date -u +%H:%M:%S) ==="
done
cp target/bench_r15_sessionA.json BENCH_r15_sessionA.json
cp target/bench_r15_sessionB.json BENCH_r15_sessionB.json
cp target/bench_r15_sessionC.json BENCH_r15_full.json
echo "ALL THREE SESSIONS COMPLETE"
