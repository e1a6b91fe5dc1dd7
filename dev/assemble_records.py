#!/usr/bin/env python3
"""Per-round record assembly: extract the bench JSON lines from the
run_records.sh logs, write dev/records/bench_<ROUND>_*.json, build
PLANS_<ROUND>.json (the two sf0.1 runs must agree fingerprint-for-
fingerprint with zero cartesians), emit per-query noise floors, run the
noise + scale gates, and write SCALE_<ROUND>.json.

  ROUND=r12 python3 dev/assemble_records.py
  ROUND=r12 SF1_LOG=/tmp/r12_bench_sf1b.log python3 dev/assemble_records.py
    (after re-running a noisy sf1 leg — point at the replacement log)
"""
import json
import os
import re
import subprocess
import sys

REPO = "/root/repo"
ROUND = os.environ.get("ROUND") or sys.exit("set ROUND, e.g. ROUND=r12")
SF1_LOG = os.environ.get("SF1_LOG", f"/tmp/{ROUND}_bench_sf1.log")


def extract(log_path):
    """The FULL bench JSON line (the compact tail lines lack metrics)."""
    best = None
    for line in open(log_path, errors="replace"):
        m = re.search(r'\{"metric".*', line)
        if not m:
            continue
        try:
            d = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        if "queries" in d and "queries_warm" in d and "metrics" in d:
            best = d
        elif best is None and "queries" in d:
            best = d
    if best is None:
        sys.exit(f"no bench JSON line in {log_path}")
    return best


r1 = extract(f"/tmp/{ROUND}_bench1.log")
r2 = extract(f"/tmp/{ROUND}_bench2.log")
s1 = extract(SF1_LOG)
n = r1["n_queries"]
assert r2["n_queries"] == n and s1["n_queries"] == n, (
    n, r2["n_queries"], s1["n_queries"])
assert r1["n_errors"] == 0 and r2["n_errors"] == 0 and s1["n_errors"] == 0, (
    r1.get("errors"), r2.get("errors"), s1.get("errors"))

for name, rec in ((f"bench_{ROUND}_sf01_run1.json", r1),
                  (f"bench_{ROUND}_sf01_run2.json", r2),
                  (f"bench_{ROUND}_sf1.json", s1)):
    with open(f"{REPO}/dev/records/{name}", "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print("wrote", name, "cold", round(rec["value"], 1),
          "warm", round(rec["value_warm"], 1))

# plans: the two runs must agree fingerprint-for-fingerprint
p1 = json.load(open(f"/tmp/{ROUND}_plans_run1.json"))
p2 = json.load(open(f"/tmp/{ROUND}_plans_run2.json"))
assert set(p1) == set(p2), set(p1) ^ set(p2)
flaps = [q for q in p1 if p1[q]["fp"] != p2[q]["fp"]]
print(f"plans: {len(p1)} queries, {len(flaps)} fingerprint flaps: {flaps}")
cart = [q for q in p1 if p1[q].get("cartesian", 0) > 0]
print("cartesians:", cart)
if flaps or cart:
    sys.exit("PLANS not clean")
with open(f"{REPO}/PLANS_{ROUND}.json", "w") as f:
    json.dump(p1, f, indent=1, sort_keys=True)

# noise floors + gates
floors = f"{REPO}/dev/records/noise_floors_{ROUND}.json"
subprocess.run([
    "python3", f"{REPO}/dev/metrics_report.py",
    f"{REPO}/dev/records/bench_{ROUND}_sf01_run1.json",
    f"{REPO}/dev/records/bench_{ROUND}_sf01_run2.json",
    f"--emit-floors={floors}"], check=True)
noise = subprocess.run([
    "python3", f"{REPO}/dev/check.py", "--noise",
    f"{REPO}/dev/records/bench_{ROUND}_sf01_run1.json",
    f"{REPO}/dev/records/bench_{ROUND}_sf01_run2.json"],
    capture_output=True, text=True)
print(noise.stdout)
scale = subprocess.run([
    "python3", f"{REPO}/dev/check.py", "--scale",
    f"{REPO}/dev/records/bench_{ROUND}_sf01_run1.json,"
    f"{REPO}/dev/records/bench_{ROUND}_sf01_run2.json",
    f"{REPO}/dev/records/bench_{ROUND}_sf1.json",
    floors],
    capture_output=True, text=True)
print(scale.stdout[-4000:])
fails = [l for l in scale.stdout.splitlines() if l.startswith("FAIL")]

maxbase = {q: max(r1["queries"][q], r2["queries"][q]) for q in r1["queries"]}
ratios = {q: round(s1["queries"][q] / maxbase[q], 2)
          for q in maxbase if maxbase[q] > 0}
worst = dict(sorted(ratios.items(), key=lambda kv: -kv[1])[:10])

gate_line = next((l for l in scale.stdout.splitlines()
                  if l.startswith("scale gate:")), "scale gate: ???")
noise_line = next((l for l in noise.stdout.splitlines()
                   if l.startswith("noise gate:")), "noise gate: ???")
n_flags = len([l for l in noise.stdout.splitlines() if l.startswith("FLAG")])

out = {
    "fixture": "sf1 = 10x sf0.1 facts via dev/make_sf1.py",
    "n_queries": n,
    "n_errors": 0,
    "sf01_cold_total_run1": round(r1["value"], 1),
    "sf01_cold_total_run2": round(r2["value"], 1),
    "sf1_cold_total": round(s1["value"], 1),
    "sf01_warm_total_run1": round(r1["value_warm"], 1),
    "sf01_warm_total_run2": round(r2["value_warm"], 1),
    "sf1_warm_total": round(s1["value_warm"], 1),
    "sf01_assets_total": round(max(r1["assets_total"], r2["assets_total"]), 1),
    "sf1_assets_total": round(s1["assets_total"], 1),
    "gate": (f"python3 dev/check.py --scale run1,run2 sf1 noise_floors_{ROUND}"
             ".json (base = element-wise MAX of the two same-code sf0.1 "
             "records, per-query floors from metrics_report --emit-floors; "
             "cold AND warm AND asset builds <= max(10x base, 5s, floor)): "
             + gate_line),
    "gate_failures": fails,
    "noise_protocol": (
        "dev/check.py --noise over the two sf0.1 records: " + noise_line +
        f" ({n_flags} flagged, classified by the metrics correlation; floors "
        f"emitted to dev/records/noise_floors_{ROUND}.json and consumed by "
        "the scale gate)."),
    "worst_cold_ratios_vs_max_base": worst,
}
with open(f"{REPO}/SCALE_{ROUND}.json", "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote SCALE_{ROUND}.json; gate failures: {len(fails)}")
