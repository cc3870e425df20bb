#!/usr/bin/env python3
"""Embed a session's cpu_probe walls into its committed bench JSON.

Usage: embed_probe.py SESSION.json PRE_SINGLE_S [POST_SINGLE_S]

Adds {"cpu_probe": {"pre_single_s": ..., "post_single_s": ...}} to the
(single-line JSON) bench artifact in place, so every committed session
carries its own box-state evidence and `bench_compare.py --probe auto`
can normalize without hand-typed walls (the r15 verdict's item 5:
arithmetic, not argument).
"""
import json
import sys


def main():
    path = sys.argv[1]
    pre = float(sys.argv[2])
    post = float(sys.argv[3]) if len(sys.argv) > 3 else None
    with open(path) as f:
        d = json.loads(f.readline())
    d["cpu_probe"] = {"pre_single_s": pre}
    if post is not None:
        d["cpu_probe"]["post_single_s"] = post
    with open(path, "w") as f:
        json.dump(d, f)
        f.write("\n")
    print(f"{path}: cpu_probe = {d['cpu_probe']}")


if __name__ == "__main__":
    main()
