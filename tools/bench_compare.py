#!/usr/bin/env python3
"""Compare bench full-map artifacts line by line.

Usage: bench_compare.py OLD.json NEW.json [NEW2.json ...] [--watch q1,q2,...]

Prints, over the queries common to OLD and every NEW file:
  - aggregate old vs per-file new (common lines only) and the ratio
  - per-line ratios for the watched movers (or every line >= 1.3x)
"""
import json, sys


def load(path):
    with open(path) as f:
        d = json.loads(f.readline())
    return d["queries"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--watch")]
    watch = []
    for a in sys.argv[1:]:
        if a.startswith("--watch="):
            watch = a.split("=", 1)[1].split(",")
    old = load(args[0])
    news = {p: load(p) for p in args[1:]}
    common = set(old)
    for q in news.values():
        common &= set(q)
    common = sorted(common)
    print(f"common lines: {len(common)}")
    for p, q in news.items():
        so, sn = sum(old[k] for k in common), sum(q[k] for k in common)
        print(f"{p}: agg {sn:.1f}s vs old {so:.1f}s = {sn / so:.3f}x  "
              f"(median per-line {sorted(q[k] / old[k] for k in common)[len(common) // 2]:.3f}x)")
    rows = watch if watch else [
        k for k in common if any(q[k] / old[k] >= 1.3 for q in news.values())]
    hdr = ["line", "old"] + [p.split("/")[-1] for p in news]
    print("\t".join(hdr))
    for k in sorted(rows, key=lambda k: -max(q[k] / old[k] for q in news.values())):
        cells = [k, f"{old[k]:.2f}"]
        for q in news.values():
            cells.append(f"{q[k]:.2f} ({q[k] / old[k]:.2f}x)")
        print("\t".join(cells))


if __name__ == "__main__":
    main()
