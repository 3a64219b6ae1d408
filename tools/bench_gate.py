#!/usr/bin/env python3
"""Bench regression gate: compare a new bench JSON against a previous
round's on the common query set and flag in-suite regressions.

A regression is flagged when a query is BOTH >2x slower and >1s
absolute delta (the absolute floor keeps timer-floor noise like
0.1s -> 0.25s out of the report). Remember the round 5-7 lesson:
re-measure any flagged query on an idle box before believing it
(BENCH_NOTES_r07.md) -- concurrent JVMs produced 2-6x phantom deltas.

Usage: tools/bench_gate.py PREV.json NEW.json [--out REPORT.json]
Exit code 1 if any regression is flagged (gate semantics).
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", {})


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    prev_path, new_path = args[0], args[1]
    prev, new = load(prev_path), load(new_path)
    common = sorted(set(prev) & set(new))
    flagged, improved = [], []
    for q in common:
        p, n = float(prev[q]), float(new[q])
        ratio = n / p if p > 0 else float("inf")
        if ratio > 2.0 and n - p > 1.0:
            flagged.append({"query": q, "prev_s": round(p, 2),
                            "new_s": round(n, 2), "ratio": round(ratio, 2)})
        elif ratio < 0.5 and p - n > 1.0:
            improved.append({"query": q, "prev_s": round(p, 2),
                             "new_s": round(n, 2), "ratio": round(ratio, 2)})
    report = {
        "prev": prev_path, "new": new_path,
        "n_common": len(common),
        "n_only_prev": len(set(prev) - set(new)),
        "n_only_new": len(set(new) - set(prev)),
        "total_prev_s": round(sum(float(prev[q]) for q in common), 1),
        "total_new_s": round(sum(float(new[q]) for q in common), 1),
        "flagged_regressions": sorted(flagged, key=lambda r: -r["ratio"]),
        "improvements": sorted(improved, key=lambda r: r["ratio"]),
        "note": ("flagged = >2x AND >1s slower on the common set; "
                 "re-measure in isolation before optimizing (concurrent "
                 "JVMs fake 2-6x deltas -- BENCH_NOTES_r07.md)"),
    }
    text = json.dumps(report, indent=2)
    print(text)
    if out:
        with open(out, "w") as f:
            f.write(text + "\n")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
