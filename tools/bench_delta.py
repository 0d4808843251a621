#!/usr/bin/env python3
"""Calibration-normalized cross-round bench comparison (dev-only).

Usage: python3 tools/bench_delta.py <old_detail.json> <new_detail.json> [out.md]

Both inputs are graft.Bench detail sidecars carrying a `calibration`
probe (xxhash64 over range(16M), min of 5 post-warm runs — present from
round 10 on). Per-query times in the NEW sidecar are scaled by the
probe ratio old_min/new_min before diffing, so host-day drift (measured
15-40% between days on this box) is divided out and only genuine plan
or code regressions surface.

Output: a markdown table of adjusted per-query deltas (worst first),
plus a regression verdict per query: REGRESSED if the drift-adjusted
time grew more than max(20%, 0.15 s) — both thresholds, so sub-100 ms
queries don't flag on scheduler noise and multi-second queries don't
hide behind the percentage.
"""
import sys, json


def load(path):
    with open(path) as f:
        d = json.load(f)
    cal = d.get("calibration") or {}
    if not cal.get("min"):
        raise SystemExit(f"{path}: no calibration probe (pre-round-10 sidecar?)")
    return d


def main(old_path, new_path, out_path):
    old, new = load(old_path), load(new_path)
    ratio = old["calibration"]["min"] / new["calibration"]["min"]
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(oq) & set(nq)):
        o, n_raw = oq[name], nq[name]
        n_adj = n_raw * ratio
        delta = n_adj - o
        pct = (delta / o * 100.0) if o > 0 else 0.0
        regressed = delta > 0.15 and pct > 20.0
        rows.append((delta, pct, name, o, n_raw, n_adj, regressed))
    rows.sort(reverse=True)
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    regs = [r for r in rows if r[6]]

    lines = [
        f"# Bench delta: {old_path} -> {new_path}",
        "",
        f"- calibration probe min: old {old['calibration']['min']:.4f} s, "
        f"new {new['calibration']['min']:.4f} s -> host-drift ratio "
        f"{ratio:.3f} (new times multiplied by this before diffing)",
        f"- totals (raw): old {old['value']:.1f} s / {len(oq)} q, "
        f"new {new['value']:.1f} s / {len(nq)} q; "
        f"adjusted new total {sum(nq.values()) * ratio:.1f} s",
        f"- common queries: {len(rows)}; added: {len(added)}; removed: {len(removed)}",
        f"- **adjusted regressions (>20% and >0.15 s): {len(regs)}**"
        + (" — " + ", ".join(r[2] for r in regs) if regs else ""),
        "",
        "| query | old s | new raw s | new adj s | delta s | delta % | verdict |",
        "|---|---|---|---|---|---|---|",
    ]
    for delta, pct, name, o, n_raw, n_adj, regressed in rows[:25]:
        v = "REGRESSED" if regressed else ("improved" if delta < -0.15 else "flat")
        lines.append(f"| {name} | {o:.3f} | {n_raw:.3f} | {n_adj:.3f} | "
                     f"{delta:+.3f} | {pct:+.1f}% | {v} |")
    if added:
        lines += ["", "New queries (no old baseline): " +
                  ", ".join(f"{n} ({nq[n]:.2f} s)" for n in added)]
    if removed:
        lines += ["", "Removed queries: " + ", ".join(removed)]
    text = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
