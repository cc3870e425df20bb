#!/usr/bin/env python3
"""Compare bench full-map artifacts line by line.

Usage: bench_compare.py OLD.json NEW.json [NEW2.json ...]
           [--watch q1,q2,...] [--probe OLD_S:NEW_S]

Prints, over the queries common to OLD and every NEW file:
  - aggregate old vs per-file new (common lines only) and the ratio
  - per-line ratios for the watched movers (or every line >= 1.3x)

--probe OLD_S:NEW_S normalizes by the cpu_probe single-thread walls
(tools/cpu_probe.py) of the two sessions: every NEW/OLD ratio is
divided by NEW_S/OLD_S, so the box-state term is removed by
ARITHMETIC instead of argued per round (the r15 verdict's ask). A
normalized ratio ~1.0 means the code moved exactly with the box; a
normalized ratio > 1 is a genuine code-side regression.

--probe auto reads the walls embedded in the artifacts themselves
(tools/embed_probe.py writes {"cpu_probe": {"pre_single_s": ...}})
— OLD's wall vs each NEW file's own wall, so a multi-session compare
normalizes each session by its own box state.
"""
import json, sys


def load(path):
    with open(path) as f:
        d = json.loads(f.readline())
    return d["queries"], d.get("cpu_probe", {}).get("pre_single_s")


def main():
    # accept both --watch=q1,q2 and --watch q1,q2 (same for --probe)
    argv, args, watch, probe = sys.argv[1:], [], [], None
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
        elif a.startswith("--probe=") or a == "--probe":
            if a == "--probe":
                i += 1
                if i >= len(argv):
                    sys.exit("--probe needs OLD_S:NEW_S or 'auto'")
                spec = argv[i]
            else:
                spec = a.split("=", 1)[1]
            if spec == "auto":
                probe = "auto"
            else:
                try:
                    o, n = (float(x) for x in spec.split(":"))
                    probe = n / o
                except ValueError:
                    sys.exit(f"bad --probe spec {spec!r}: want OLD_S:NEW_S "
                             "(e.g. 1.31:1.95) or 'auto'")
        else:
            args.append(a)
        i += 1
    old, old_wall = load(args[0])
    news = {p: load(p) for p in args[1:]}
    if probe == "auto":
        if old_wall is None or any(w is None for _, w in news.values()):
            sys.exit("--probe auto needs cpu_probe.pre_single_s embedded in "
                     "every artifact (tools/embed_probe.py)")
    common = set(old)
    for q, _ in news.values():
        common &= set(q)
    common = sorted(common)
    print(f"common lines: {len(common)}")

    def norm_for(wall):
        if probe is None:
            return 1.0
        if probe == "auto":
            return wall / old_wall
        return probe

    for p, (q, wall) in news.items():
        so, sn = sum(old[k] for k in common), sum(q[k] for k in common)
        med = sorted(q[k] / old[k] for k in common)[len(common) // 2]
        norm = norm_for(wall)
        line = (f"{p}: agg {sn:.1f}s vs old {so:.1f}s = {sn / so:.3f}x  "
                f"(median per-line {med:.3f}x)")
        if probe is not None:
            line += (f"  | probe-normalized (box {norm:.3f}x): "
                     f"agg {sn / so / norm:.3f}x, median {med / norm:.3f}x")
        print(line)
    if watch:
        dropped = [w for w in watch if w not in common]
        if dropped:
            print(f"warning: watched but not in every file, dropped: {', '.join(dropped)}")
        rows = [w for w in watch if w in common]
    else:
        rows = [k for k in common
                if any(q[k] / old[k] / norm_for(w) >= 1.3
                       for q, w in news.values())]
    hdr = ["line", "old"] + [p.split("/")[-1] for p in news]
    print("\t".join(hdr))
    for k in sorted(rows, key=lambda k: -max(q[k] / old[k] for q, _ in news.values())):
        cells = [k, f"{old[k]:.2f}"]
        for q, w in news.values():
            cell = f"{q[k]:.2f} ({q[k] / old[k]:.2f}x"
            if probe is not None:
                cell += f", norm {q[k] / old[k] / norm_for(w):.2f}x"
            cell += ")"
            cells.append(cell)
        print("\t".join(cells))


if __name__ == "__main__":
    main()
