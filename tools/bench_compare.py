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
    # accept both --watch=q1,q2 and --watch q1,q2
    argv, args, watch = sys.argv[1:], [], []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--watch="):
            watch = a.split("=", 1)[1].split(",")
        elif a == "--watch":
            i += 1
            if i >= len(argv):
                sys.exit("--watch needs a comma-separated query list")
            watch = argv[i].split(",")
        else:
            args.append(a)
        i += 1
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
    if watch:
        dropped = [w for w in watch if w not in common]
        if dropped:
            print(f"warning: watched but not in every file, dropped: {', '.join(dropped)}")
        rows = [w for w in watch if w in common]
    else:
        rows = [k for k in common if any(q[k] / old[k] >= 1.3 for q in news.values())]
    hdr = ["line", "old"] + [p.split("/")[-1] for p in news]
    print("\t".join(hdr))
    for k in sorted(rows, key=lambda k: -max(q[k] / old[k] for q in news.values())):
        cells = [k, f"{old[k]:.2f}"]
        for q in news.values():
            cells.append(f"{q[k]:.2f} ({q[k] / old[k]:.2f}x)")
        print("\t".join(cells))


if __name__ == "__main__":
    main()
