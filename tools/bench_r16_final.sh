#!/bin/bash
# Round-16 final-binary bench: two full sessions (B, C) on the committed
# e24ab3d classes (128 headline lines), cpu_probe before each and after
# the last, quiet box.
set -e
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
for s in B C; do
  echo "=== session $s start $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) ==="
  python3 tools/cpu_probe.py >> BENCH_r16_cpuprobe.jsonl
  SPARK_GRAFT_BENCH_OUT=target/bench_r16_session$s.json \
    sbt "runMain graft.Bench" > target/bench_r16_session$s.log 2>&1
  echo "=== session $s done  $(date -u +%H:%M:%S) ==="
done
python3 tools/cpu_probe.py >> BENCH_r16_cpuprobe.jsonl
echo "R16 FINAL SESSIONS COMPLETE"
