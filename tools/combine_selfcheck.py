#!/usr/bin/env python3
"""Combine per-SF selfcheck logs into one multi-SF correctness
artifact (CORRECTNESS_SELF_rN.json) so testdata drift at ANY scale
factor is caught by a committed artifact, not archaeology.

Usage: tools/combine_selfcheck.py OUT.json SF:LOGFILE [SF:LOGFILE ...]
Each LOGFILE is `tools/selfcheck.py` output (PASS/FAIL lines).
"""
import json
import re
import sys


def parse(path):
    res = {}
    with open(path) as f:
        for line in f:
            m = re.match(r"(PASS|FAIL)\s+(\S+)", line.strip())
            if m:
                res[m.group(2)] = m.group(1) == "PASS"
    return res


def main():
    out = sys.argv[1]
    per_sf = {}
    for arg in sys.argv[2:]:
        sf, path = arg.split(":", 1)
        per_sf[sf] = parse(path)
    queries = sorted(set().union(*[set(v) for v in per_sf.values()]))
    combined = {
        q: {sf: per_sf[sf].get(q) for sf in per_sf} for q in queries
    }
    fails = {q: v for q, v in combined.items()
             if not all(r is True for r in v.values())}
    report = {
        "sfs": sorted(per_sf),
        "n_queries": len(queries),
        "n_all_green": sum(1 for v in combined.values()
                           if all(r is True for r in v.values())),
        "failures": fails,
        "queries": combined,
    }
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"{report['n_all_green']}/{report['n_queries']} green at all "
          f"of {report['sfs']}; {len(fails)} with a failure/missing")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
