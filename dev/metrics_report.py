#!/usr/bin/env python3
"""Bench-metrics correlation report (dev-side; NOT part of the shipped
library): explains per-query wall-time spread across two or more bench
records using the `metrics` key each record carries (summed executor run
time, task GC, task count, driver GC per cold/warm pass).

Usage:
    python3 dev/metrics_report.py recordA.json recordB.json [more.json ...]
        [--pass cold|warm] [--spread 1.3] [--floor 1.5]

For every query whose wall-time spread across the records exceeds
`--spread` (and whose slowest time exceeds `--floor` seconds), the report
classifies WHY the wall moved, mechanically:

  gc          task GC delta explains >= 50% of the executor-run delta —
              heap pressure, fix is memory sizing / hygiene
  recompute   task COUNT differs across records — cached blocks were
              evicted and partitions recomputed (extra tasks), or the
              plan itself changed (check the plan fingerprints!)
  contention  same tasks, executor-run delta proportional to the wall
              delta, GC flat — the 32 executor threads co-scheduled
              against background work (async unpersist, GC threads,
              page-cache misses); a measurement property of the shared
              box, not of the plan
  driver      executor run barely moved but wall did — driver-side cost
              (plan compile, broadcast build, collect) or scheduling gaps

This is the tool the round-7 verdict asked for: the self_retrieval_ranks
cold spread (5.05 s vs 11.28 s across same-code records) classifies as
`contention` — 392 tasks in both records, task GC flat (3.6 s vs 3.0 s),
executor-run 118 s -> 296 s moving with the wall. Nothing recomputed and
nothing collected more; the query simply runs the largest task fleet in
the registry (plus the served-postings re-pin after the inter-query cache
clear), so it absorbs the most co-scheduling variance. The consumable
output is a per-query noise floor (see --emit-floors) that the scale gate
applies instead of a human re-running legs by judgment.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def classify(pass_name, metas, walls):
    """Classify the spread mechanism from the per-record metrics."""
    runs = [m.get(f"{pass_name}_run_ms", 0) for m in metas]
    gcs = [m.get(f"{pass_name}_task_gc_ms", 0) for m in metas]
    tasks = [m.get(f"{pass_name}_tasks", 0) for m in metas]
    if not any(runs):
        return "no-metrics", ""
    lo, hi = walls.index(min(walls)), walls.index(max(walls))
    d_run = runs[hi] - runs[lo]
    d_gc = gcs[hi] - gcs[lo]
    d_wall_ms = (walls[hi] - walls[lo]) * 1000
    detail = (f"tasks {tasks[lo]}->{tasks[hi]}, run {runs[lo]}->{runs[hi]} ms, "
              f"taskGC {gcs[lo]}->{gcs[hi]} ms")
    if tasks[hi] != tasks[lo]:
        return "recompute", detail
    if d_run >= 1000 and d_gc >= 0.5 * d_run:
        return "gc", detail
    # executor-run moved at least as much as one thread's share of the
    # wall delta -> the executors genuinely ran longer (contention)
    if d_run >= d_wall_ms:
        return "contention", detail
    return "driver", detail


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    opts = {a.split("=")[0]: (a.split("=", 1) + ["1"])[1]
            for a in argv if a.startswith("--")}
    pass_name = opts.get("--pass", "cold")
    spread_bar = float(opts.get("--spread", "1.3"))
    floor = float(opts.get("--floor", "1.5"))
    recs = [(p, load(p)) for p in args]
    if len(recs) < 2:
        print("need at least two bench records")
        return 2
    key = "queries" if pass_name == "cold" else "queries_warm"
    names = set(recs[0][1][key])
    for _, r in recs[1:]:
        names &= set(r[key])
    flagged = {}
    for q in sorted(names):
        walls = [r[key][q] for _, r in recs]
        hi, lo = max(walls), min(walls)
        if hi <= floor or lo <= 0 or hi / lo <= spread_bar:
            continue
        metas = [r.get("metrics", {}).get(q, {}) for _, r in recs]
        kind, detail = classify(pass_name, metas, walls)
        flagged[q] = (hi, hi / lo, kind)
        print(f"SPREAD {q}: {pass_name} " +
              "/".join(f"{w:.2f}" for w in walls) +
              f" s (x{hi / lo:.2f}) -> {kind}  [{detail}]")
    if not flagged:
        print(f"no {pass_name} spreads above x{spread_bar} (floor {floor}s) "
              f"across {len(recs)} records, {len(names)} queries")
    # Per-query noise floors the scale gate can consume: for each flagged
    # query, the worst observed wall across records times the spread bar —
    # a query inside its observed noise band never fails the 10x gate
    # spuriously, while a genuine superlinear regression still clears it.
    if "--emit-floors" in opts:
        floors = {q: round(hi * spread_bar, 2) for q, (hi, _, _) in flagged.items()}
        with open(opts["--emit-floors"], "w") as f:
            json.dump({"pass": pass_name, "spread_bar": spread_bar,
                       "records": args, "floors": floors}, f, indent=1,
                      sort_keys=True)
        print(f"wrote {len(floors)} noise floors to {opts['--emit-floors']}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
