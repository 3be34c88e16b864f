#!/usr/bin/env python3
"""Machine adjudication of bench-gate breaches against box drift.

Usage: python3 tools/check_bench.py BENCH_FULL.json [more_bench.json ...]

For each bench artifact, compares every per-query time against its
binding baseline row (tools/baseline_rows.json, curated from
BASELINE.md) and flags queries over the 2x gate — but only AFTER
normalizing by the canary drift factor:

    drift      = measured(dedup_exact) / canary_ref
    normalized = (sec / baseline) / max(1.0, drift)

The canary is one hash aggregate whose workload has been frozen since
r5; when the whole box slows (shared-JVM GC pressure, co-tenant load),
the canary moves with it and the normalization cancels the drift.
Genuine regressions move a query WITHOUT moving the canary, so they
still flag. Drift below 1 (a faster box) never loosens ratios — the
factor clamps at 1.0 so a fast box can only make the gate stricter.

Exit status: 0 = no query breaches the gate after normalization,
1 = at least one breach, 2 = usage/input error.
"""
import json
import sys
import os


def load_baseline():
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "baseline_rows.json")) as f:
        return json.load(f)


def prefer_builder(path):
    """BENCH_r{N}.json may be a driver-overwritten truncated tail; the
    builder's structured copy at BENCH_r{N}_builder.json is written to
    a path the driver never touches. Prefer it when present."""
    base, ext = os.path.splitext(path)
    if base.endswith("_builder"):
        return path
    builder = base + "_builder" + ext
    if os.path.exists(builder):
        print(f"{path}: using builder artifact {builder}")
        return builder
    return path


def check(bench_path, baseline):
    bench_path = prefer_builder(bench_path)
    with open(bench_path) as f:
        bench = json.load(f)
    # sf1 artifacts gate against the sf1 standing-pair table (their
    # own canary reference too); everything else against the sf0.1 rows
    is_sf1 = "sf1" in str(bench.get("sf", "")) and "sf0.1" not in str(bench.get("sf", ""))
    if is_sf1 and "sf1" in baseline:
        rows = baseline["sf1"]["rows"]
        canary_ref = baseline["sf1"]["canary_ref"]
    else:
        rows = baseline["rows"]
        canary_ref = baseline["canary"]["ref_seconds"]
    # Streaming gates whose wall-clock is micro-batch scheduling, not
    # data (r17: 2-6x swings on identical code): gate on their
    # deterministic progress totals (stream_metrics in the artifact,
    # EventsStream.gateMetrics in the engine) matching the recorded
    # reference EXACTLY, with wall-clock only a soft ceiling. A loaded
    # box can inflate seconds but cannot change input/state/drop
    # counts; a plan or state regression changes the counts even on a
    # quiet box.
    stream_refs = (baseline["sf1"] if is_sf1 and "sf1" in baseline
                   else baseline).get("stream_refs", {})
    soft_gate = baseline.get("stream_soft_gate", 4.0)
    stream_metrics = bench.get("stream_metrics", {})
    gate = baseline["gate_ratio"]
    canary_q = baseline["canary"]["query"]
    measured_canary = bench.get("canary", bench["queries"].get(canary_q))
    if not measured_canary or measured_canary <= 0:
        print(f"{bench_path}: no usable canary ({canary_q}) in artifact")
        return 2
    drift = measured_canary / canary_ref
    factor = max(1.0, drift)
    print(f"{bench_path}: canary {canary_q} {measured_canary:.3f}s "
          f"vs ref {canary_ref:.3f}s -> drift {drift:.2f}x "
          f"(normalizing by {factor:.2f}x)")
    breaches, missing = [], []
    for q, sec in sorted(bench["queries"].items()):
        if sec < 0:
            breaches.append((q, sec, None, None, "FAILED RUN"))
            continue
        if q not in rows:
            missing.append(q)
            continue
        raw = sec / rows[q]
        norm = raw / factor
        if q in stream_refs:
            got = stream_metrics.get(q)
            if got is None:
                # A stream_refs query that ran but recorded no metrics
                # means the bench stopped instrumenting it (or the
                # artifact predates instrumentation) — the stated
                # metric-equality contract would otherwise be silently
                # unenforced with only the loose soft ceiling applying.
                breaches.append((q, sec, raw, norm,
                    "METRIC MISSING (no stream_metrics entry)"))
            else:
                for k, want in sorted(stream_refs[q].items()):
                    if got.get(k) != want:
                        breaches.append((q, sec, raw, norm,
                            f"METRIC {k}={got.get(k)} want {want}"))
            if norm > soft_gate:
                breaches.append((q, sec, raw, norm, "BREACH(soft-ceiling)"))
            elif norm > gate:
                print(f"  stream-soft: {q} {sec:.2f}s = {raw:.2f}x raw, "
                      f"{norm:.2f}x normalized — within the {soft_gate}x "
                      f"soft ceiling (metric-gated)")
            continue
        if norm > gate:
            breaches.append((q, sec, raw, norm, "BREACH"))
        elif raw > gate:
            print(f"  drift-absolved: {q} {sec:.2f}s = {raw:.2f}x raw, "
                  f"{norm:.2f}x normalized (gate {gate}x)")
    for q in missing:
        print(f"  no binding row: {q} (baseline it in BASELINE.md "
              f"and tools/baseline_rows.json)")
    for q, sec, raw, norm, kind in breaches:
        if kind == "FAILED RUN":
            print(f"  {kind}: {q}")
        else:
            print(f"  {kind}: {q} {sec:.2f}s = {raw:.2f}x raw, "
                  f"{norm:.2f}x normalized (gate {gate}x)")
    n_checked = len([q for q in bench["queries"] if q in rows])
    print(f"  {n_checked} queries checked, {len(breaches)} breach(es), "
          f"{len(missing)} without rows")
    return 1 if breaches else 0


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 2
    baseline = load_baseline()
    worst = 0
    for path in argv[1:]:
        worst = max(worst, check(path, baseline))
    return worst


if __name__ == "__main__":
    sys.exit(main(sys.argv))
