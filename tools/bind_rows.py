#!/usr/bin/env python3
"""Bind baseline rows for queries that lack them, from a controlled
min-of-2 bench pair.

Usage: python3 tools/bind_rows.py BENCH_runA.json BENCH_runB.json

Prints the BASELINE.md table rows (query, min seconds over both runs)
for every query missing from tools/baseline_rows.json, and updates
baseline_rows.json in place. Dev tool only."""
import json, os, sys

def main(a_path, b_path):
    here = os.path.dirname(os.path.abspath(__file__))
    rows_path = os.path.join(here, "baseline_rows.json")
    base = json.load(open(rows_path))
    a = json.load(open(a_path))["queries"]
    b = json.load(open(b_path))["queries"]
    missing = sorted(set(a) & set(b) - set(base["rows"]))
    for q in missing:
        sec = round(min(a[q], b[q]), 2)
        base["rows"][q] = sec
        print(f"| `{q}` | {sec:.2f} |")
    json.dump(base, open(rows_path, "w"), indent=1, sort_keys=True)
    print(f"-- bound {len(missing)} new rows; total {len(base['rows'])}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
