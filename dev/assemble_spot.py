#!/usr/bin/env python3
"""Assemble SCALE_spot_{ROUND}.json from the two run_spot.sh legs: per
query and per forced asset, the cold/warm walls at sf0.1 and sf10 and the
time-ratio vs the 100x data ratio. A family whose per-query ratio is far
under 100 is the O(batch)/sublinear claim holding at 100x.

Usage: ROUND=r15 python3 dev/assemble_spot.py
"""
import json
import os

round_ = os.environ.get("ROUND", "r15")
base = json.load(open(f"/tmp/{round_}_spot_sf01.json"))
big = json.load(open(f"/tmp/{round_}_spot_sf10.json"))

out = {
    "round": round_,
    "data_ratio": 100.0,
    "method": "SPARK_GRAFT_BENCH_ONLY manifest family + restricted asset farm; "
              "sf10 = 100 disjoint copies of sf0.1 (dev/run_spot.sh)",
    "load": {
        "sf01": [base.get("load_start"), base.get("load_measure_start"),
                 base.get("load_end")],
        "sf10": [big.get("load_start"), big.get("load_measure_start"),
                 big.get("load_end")],
    },
    "queries": {},
    "assets": {},
    "errors": {**base.get("errors", {}), **big.get("errors", {})},
}
for name in sorted(set(base["queries"]) & set(big["queries"])):
    b, s = base["queries"][name], big["queries"][name]
    bw = base.get("queries_warm", {}).get(name)
    sw = big.get("queries_warm", {}).get(name)
    out["queries"][name] = {
        "cold_sf01": b, "cold_sf10": s,
        "cold_ratio": round(s / b, 2) if b > 0 else None,
        "warm_sf01": bw, "warm_sf10": sw,
        "warm_ratio": round(sw / bw, 2) if bw and bw > 0 else None,
    }
for name in sorted(set(base.get("assets", {})) & set(big.get("assets", {}))):
    b, s = base["assets"][name], big["assets"][name]
    out["assets"][name] = {
        "build_sf01": b, "build_sf10": s,
        "build_ratio": round(s / b, 2) if b > 0 else None,
    }
dst = f"SCALE_spot_{round_}.json"
json.dump(out, open(dst, "w"), indent=1)
print(f"wrote {dst}")
for name, q in out["queries"].items():
    print(f"{name}: cold {q['cold_sf01']} -> {q['cold_sf10']} "
          f"(x{q['cold_ratio']}), warm x{q['warm_ratio']}")
