#!/bin/bash
# Round-17 baseline bench: two full sessions (A, B) on the UNCHANGED
# r16-final binary, cpu_probe before each and after the last, quiet box.
# Identical methodology to r16 sessions D-H (128 headline lines,
# median-of-3+ with adaptive warmup; see Bench.scala).
set -e
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
for s in "$@"; do
  echo "=== session $s start $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) ==="
  python3 tools/cpu_probe.py | sed "s/{/{\"session\": \"$s-pre\", /" >> BENCH_r17_cpuprobe.jsonl
  SPARK_GRAFT_BENCH_OUT=BENCH_r17_session$s.json \
    sbt "runMain graft.Bench" > target/bench_r17_session$s.log 2>&1
  echo "=== session $s done  $(date -u +%H:%M:%S) ==="
done
python3 tools/cpu_probe.py | sed "s/{/{\"session\": \"${!#}-post\", /" >> BENCH_r17_cpuprobe.jsonl
echo "R17 SESSIONS COMPLETE: $@"
