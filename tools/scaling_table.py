#!/usr/bin/env python3
"""Dev-only: consolidate per-SF bench sidecars into the single
four-decade SCALING.md table (one row per query).

Usage: python3 tools/scaling_table.py sf0.001.json sf0.01.json sf0.1.json sf1.json[,sf1b.json...]

Each input is a graft.Bench sidecar (target/bench_last.json copied per
sweep). A comma-joined group min-merges several independent sweeps of
the same sf — separate JVMs, so a one-off multi-second host stall in
one sweep (documented in SCALING.md) cannot survive into the table.
Emits a markdown table sorted by query name with the last-decade
ratio, flagging >3x rows. Not part of the shipped library.
"""
import sys, json

def main(paths):
    sfs = []
    for group in paths:
        merged = {}
        for p in group.split(","):
            for k, v in json.load(open(p))["queries"].items():
                merged[k] = min(v, merged.get(k, v))
        sfs.append(merged)
    names = sorted(set().union(*[set(q) for q in sfs]))
    header = ["query", "sf0.001", "sf0.01", "sf0.1", "sf1", "ratio (last decade)"]
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    totals = [0.0] * len(sfs)
    flagged = []
    for n in names:
        vals = [q.get(n) for q in sfs]
        for i, v in enumerate(vals):
            if v is not None:
                totals[i] += v
        cells = ["%.2f" % v if v is not None else "—" for v in vals]
        if vals[-1] is not None and vals[-2]:
            r = vals[-1] / vals[-2]
            mark = " ⚠" if r > 3 else ""
            if r > 3:
                flagged.append((n, r))
            cells.append("%.1f×%s" % (r, mark))
        else:
            cells.append("—")
        print("| " + n + " | " + " | ".join(cells) + " |")
    print("| **total** | " + " | ".join("%.1f" % t for t in totals) + " |  |")
    print()
    print("%d queries; %d exceed 3x on the last decade:" % (len(names), len(flagged)))
    for n, r in sorted(flagged, key=lambda x: -x[1]):
        print("  %-28s %.1fx" % (n, r))

if __name__ == "__main__":
    main(sys.argv[1:5])
