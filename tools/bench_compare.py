#!/usr/bin/env python3
"""Compare two graft.Bench JSON records per query.

Usage: python3 tools/bench_compare.py A.json B.json [ratio_lo ratio_hi]

Prints total wall for each, then every query whose B/A ratio falls outside
[ratio_lo, ratio_hi] (default 0.9 .. 1.1), sorted by ratio. Queries under
`floor_sec` (0.5 s) are exempt from the band — sub-second timings on a
shared host are noise-dominated and a 0.3 s -> 0.45 s move is not a
regression signal.
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    lo = float(sys.argv[3]) if len(sys.argv) > 3 else 0.9
    hi = float(sys.argv[4]) if len(sys.argv) > 4 else 1.1
    floor_sec = 0.5
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    print(f"A: {a['value']:.1f}s / {len(qa)} queries   "
          f"B: {b['value']:.1f}s / {len(qb)} queries   shared: {len(shared)}")
    only = sorted(set(qa) ^ set(qb))
    if only:
        print(f"not shared: {only}")
    out = []
    for q in shared:
        ta, tb = qa[q], qb[q]
        if ta <= 0 or tb <= 0:
            print(f"FAILED timing: {q} A={ta} B={tb}")
            continue
        r = tb / ta
        if (r < lo or r > hi) and max(ta, tb) >= floor_sec:
            out.append((r, q, ta, tb))
    out.sort()
    inside = len(shared) - len(out)
    print(f"inside [{lo},{hi}] (or sub-{floor_sec}s): {inside}/{len(shared)}")
    for r, q, ta, tb in out:
        print(f"  {q}: {ta:.2f}s -> {tb:.2f}s  ({r:.2f}x)")


if __name__ == "__main__":
    main()
