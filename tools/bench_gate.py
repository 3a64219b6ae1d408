#!/usr/bin/env python3
"""Bench regression gate: compare a new bench JSON against a previous
round's on the common query set and flag in-suite regressions.

A regression is flagged when a query is BOTH >2x slower and >1s
absolute delta (the absolute floor keeps timer-floor noise like
0.1s -> 0.25s out of the report). Remember the round 5-7 lesson:
re-measure any flagged query on an idle box before believing it
(BENCH_NOTES_r07.md) -- concurrent JVMs produced 2-6x phantom deltas.

Round 11: when either file carries the bench's per-query "telemetry"
object, every flagged row is annotated with the diagnosis columns
(BENCH_NOTES_r11.md section 2): identical stage/task/shuffle-row
counts + elevated load_avg / a sys_cpu-proc_cpu gap = environmental
co-tenancy; diverging Spark metrics or spill = a real regression.

Round 12: PREV may be BASELINE.md (the frozen r11-close per-query
table) — the gate parses its markdown rows directly, so the anchor is
a fixed committed artifact instead of round-over-round drift. The
telemetry twin lives at tools/baseline_bench.json.

Usage: tools/bench_gate.py PREV.{json,md} NEW.json [--out REPORT.json]
Exit code 1 if any regression is flagged (gate semantics).
"""
import json
import re
import sys

TELE_KEYS = ["stages", "tasks", "sr_rows", "spill_mem", "spill_disk",
             "gc_ms", "run_ms", "cpu_ms", "load_avg", "sys_cpu",
             "proc_cpu", "heap_mb"]


def load(path):
    if path.endswith(".md"):
        row = re.compile(r"^\| (q\w+) \| ([0-9.]+) \|")
        queries = {}
        with open(path) as f:
            for line in f:
                m = row.match(line)
                if m:
                    queries[m.group(1)] = float(m.group(2))
        # telemetry twin written by the same freeze, if present
        tele = {}
        twin = path.rsplit("/", 1)[0] if "/" in path else "."
        try:
            with open(f"{twin}/tools/baseline_bench.json") as f:
                tele = json.load(f).get("telemetry", {})
        except OSError:
            # a copied/relocated BASELINE.md loses its telemetry twin;
            # say so instead of silently degrading flagged-regression
            # output to wall-only rows (ADVICE r12)
            print(f"WARN: telemetry twin {twin}/tools/baseline_bench.json "
                  "not readable - gate runs without baseline telemetry",
                  file=sys.stderr)
        return queries, tele
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and "queries" not in d:  # driver BENCH_rN wrapper
        d = d["parsed"]
    return d.get("queries", {}), d.get("telemetry", {})


def diagnose(q, prev_t, new_t):
    """Telemetry annotation for one flagged query (None without data)."""
    n = new_t.get(q)
    if not n:
        return None
    d = {"new": {k: n.get(k) for k in TELE_KEYS}}
    p = prev_t.get(q)
    if p:
        d["prev"] = {k: p.get(k) for k in TELE_KEYS}
        same_plan = all(p.get(k) == n.get(k)
                        for k in ("stages", "tasks", "sr_rows"))
        d["same_plan_and_rows"] = same_plan
        if same_plan and not n.get("spill_mem") and not n.get("spill_disk"):
            d["reading"] = ("identical plan/rows, no spill -> check "
                            "load_avg & sys_cpu-proc_cpu gap: likely "
                            "environmental (BENCH_NOTES_r11.md sec 2)")
        else:
            d["reading"] = ("Spark metrics diverge or spill present -> "
                            "treat as a real regression")
    return d


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    prev_path, new_path = args[0], args[1]
    (prev, prev_t), (new, new_t) = load(prev_path), load(new_path)

    # The driver's BENCH_rN "parsed" tail uses bare numeric ids (often
    # a lossy subset); when either side does, key both sides by the
    # query NUMBER so the common subset still gates.
    def qnum(name):
        m = re.match(r"q?0*(\d+)", name)
        return m.group(1) if m else name
    if any(k.isdigit() for k in list(prev) + list(new)):
        prev = {qnum(k): v for k, v in prev.items()}
        new = {qnum(k): v for k, v in new.items()}
        prev_t = {qnum(k): v for k, v in prev_t.items()}
        new_t = {qnum(k): v for k, v in new_t.items()}

    common = sorted(set(prev) & set(new))
    flagged, improved = [], []
    for q in common:
        p, n = float(prev[q]), float(new[q])
        ratio = n / p if p > 0 else float("inf")
        if ratio > 2.0 and n - p > 1.0:
            row = {"query": q, "prev_s": round(p, 2),
                   "new_s": round(n, 2), "ratio": round(ratio, 2)}
            tele = diagnose(q, prev_t, new_t)
            if tele:
                row["telemetry"] = tele
            flagged.append(row)
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
                 "telemetry-annotated flags diagnose themselves "
                 "(BENCH_NOTES_r11.md sec 2); without telemetry, "
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
