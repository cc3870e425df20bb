#!/bin/bash
# Round-15 final bench: two full sessions (D, E) on the final committed
# binary (127 headline lines), machine quiet, back-to-back.
set -e
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
for s in D E; do
  echo "=== session $s start $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) ==="
  SPARK_GRAFT_BENCH_OUT=target/bench_r15_session$s.json \
    sbt "runMain graft.Bench" > target/bench_r15_session$s.log 2>&1
  echo "=== session $s done  $(date -u +%H:%M:%S) ==="
done
echo "FINAL SESSIONS COMPLETE"
