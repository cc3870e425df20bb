#!/bin/bash
# Round-16 OPTIMIZATION-phase final bench: two full sessions (F, G) on
# the post-optimization binary (128 headline lines), cpu_probe before
# each and after the last, quiet box. Identical methodology to
# sessions D (pre-change baseline) and E (256KB-floor interim).
set -e
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
for s in F G; do
  echo "=== session $s start $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) ==="
  python3 tools/cpu_probe.py | sed "s/{/{\"session\": \"$s-pre\", /" >> BENCH_r16_cpuprobe.jsonl
  SPARK_GRAFT_BENCH_OUT=BENCH_r16_session$s.json \
    sbt "runMain graft.Bench" > target/bench_r16_session$s.log 2>&1
  echo "=== session $s done  $(date -u +%H:%M:%S) ==="
done
python3 tools/cpu_probe.py | sed 's/{/{"session": "G-post", /' >> BENCH_r16_cpuprobe.jsonl
echo "R16 OPT SESSIONS COMPLETE"
