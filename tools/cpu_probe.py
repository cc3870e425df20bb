#!/usr/bin/env python3
"""Fixed CPU workload timer: single-thread and all-core walls.
Used to adjudicate box-state across bench sessions (same workload,
same box => wall differences are machine state, not code)."""
import time, concurrent.futures, os, json, sys

def burn(n):
    s = 0
    for i in range(n):
        s += i * i % 1000003
    return s

N = 20_000_000
t0 = time.time(); burn(N); single = time.time() - t0
cores = os.cpu_count()
t0 = time.time()
with concurrent.futures.ProcessPoolExecutor(cores) as ex:
    list(ex.map(burn, [N] * cores))
allc = time.time() - t0
print(json.dumps({"ts": time.strftime("%H:%M:%S"), "single_s": round(single, 2),
                  "allcore_s": round(allc, 2), "cores": cores,
                  "load1": os.getloadavg()[0]}))
