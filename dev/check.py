#!/usr/bin/env python3
"""Dev-side mimic of the driver's correctness gate (NOT part of the shipped
library): runs DuckDB on oracle_sql.json against the sf parquet tables and
compares with the parquet dumps Verify wrote. Usage:
    python3 dev/check.py [sfDir] [outDir]
"""
import glob, json, math, sys

import duckdb


def noise_gate(paths, spread_bar: float = 1.3, floor_s: float = 1.5) -> int:
    """Cross-record noise protocol (round-8: the method_note's manual
    "re-run the whole leg on one outlier" judgment made mechanical): given
    two or more SAME-CODE bench records, flag every query whose cold or
    warm wall spread exceeds `spread_bar` above `floor_s`, with the
    metrics-based mechanism classification from dev/metrics_report.py.
    A clean pair (exit 0) certifies the record; a flagged one names
    exactly which queries need an isolated re-measure
    (SPARK_GRAFT_BENCH_ONLY=<names>) or a noise-floor annotation
    (metrics_report.py --emit-floors), so no leg is ever hand-edited.
    Usage: python3 dev/check.py --noise run1.json run2.json [more.json ...]
    """
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "metrics_report", f"{__file__.rsplit('/', 1)[0]}/metrics_report.py")
    mr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mr)
    recs = [(p, json.load(open(p))) for p in paths]
    bad = 0
    for pass_name, key in (("cold", "queries"), ("warm", "queries_warm")):
        names = set(recs[0][1].get(key, {}))
        for _, r in recs[1:]:
            names &= set(r.get(key, {}))
        for q in sorted(names):
            walls = [r[key][q] for _, r in recs]
            hi, lo = max(walls), min(walls)
            if hi <= floor_s or lo <= 0 or hi / lo <= spread_bar:
                continue
            metas = [r.get("metrics", {}).get(q, {}) for _, r in recs]
            kind, detail = mr.classify(pass_name, metas, walls)
            print(f"FLAG {q}: {pass_name} " +
                  "/".join(f"{w:.2f}" for w in walls) +
                  f" (x{hi / lo:.2f}) -> {kind} [{detail}]")
            bad += 1
    print(f"noise gate: {len(recs)} records, {bad} flagged "
          f"(spread > x{spread_bar} above {floor_s}s)")
    return 1 if bad else 0


def scale_gate(base_path: str, scaled_path: str, factor: float = 10.0,
               floor_s: float = 5.0, floors_path: str = None,
               min_base_s: float = 1.0) -> int:
    """Scale-rehearsal gate: every query's cold time at the scaled fixture
    must stay within `factor`x its cold time at the base fixture (linear
    scaling for a `factor`x corpus), with an absolute `floor_s` allowance so
    sub-second overhead-dominated baselines (where the ratio is mostly
    page-cache noise) don't fire spuriously: fail iff
    scaled > max(factor * base, floor_s). Errors at either scale fail.
    `base_path` may be a comma-separated list of SAME-CODE base records:
    the gate then uses the element-wise MAX per query — the measured
    upper edge of the base noise band (the `--noise` protocol's
    consumable), so a query whose base flapped between 1.0 s and 2.1 s
    is gated against 10x2.1, not whichever leg happened to be base. A
    genuine superlinear regression still exceeds 10x the noisy-high
    base. `floors_path` (metrics_report.py --emit-floors output)
    additionally raises the per-query floor on the SCALED side for
    entries annotated from checked-in records. `min_base_s` clamps the
    base side of the RATIO bound: a sub-second base is mostly fixed
    overhead whose run-to-run jitter is a large fraction of itself
    (r12/r14: `token_counts_bpeish` flagged at 11.9x on a 0.59 s base,
    isolated-clean every time, disjoint flagged sets across unpatched
    legs — the signature of noise, not scaling), so the effective bound
    is factor * max(base, min_base_s): 10 s for any sub-second base. A
    real superlinear regression still trips it.
    Usage: python3 dev/check.py --scale base1.json[,base2.json] scaled.json
               [noise_floors.json]
    """
    bases = [json.load(open(p)) for p in base_path.split(",")]
    base = bases[0]
    for other in bases[1:]:
        for key in ("queries", "queries_warm", "assets"):
            mine, theirs = base.get(key, {}), other.get(key, {})
            for name in set(mine) & set(theirs):
                mine[name] = max(mine[name], theirs[name])
        base.setdefault("errors", {}).update(other.get("errors", {}))
    if len(bases) > 1:
        print(f"base = element-wise max over {len(bases)} same-code records")
    scaled = json.load(open(scaled_path))
    per_query_floor = {}
    if floors_path:
        per_query_floor = json.load(open(floors_path)).get("floors", {})
        print(f"per-query noise floors: {sorted(per_query_floor.items())}")
    bad = 0
    for name, errs in sorted({**base.get("errors", {}),
                              **scaled.get("errors", {})}.items()):
        print(f"FAIL {name}: bench error at one scale: {errs}")
        bad += 1
    common = sorted(set(base["queries"]) & set(scaled["queries"]))
    missing = sorted(set(base["queries"]) ^ set(scaled["queries"]))
    for name in missing:
        print(f"WARN {name}: present at only one scale, not gated")
    worst = (None, 0.0)
    for name in common:
        b, s = base["queries"][name], scaled["queries"][name]
        ratio = s / b if b > 0 else float("inf")
        if ratio > worst[1]:
            worst = (name, ratio)
        if s > max(factor * max(b, min_base_s), floor_s,
                   per_query_floor.get(name, 0.0)):
            print(f"FAIL {name}: cold {s:.2f}s at scale vs {b:.2f}s base "
                  f"(ratio {ratio:.1f}x > {factor:.0f}x, floor {floor_s}s)")
            bad += 1
        else:
            print(f"PASS {name}: {b:.2f}s -> {s:.2f}s (ratio {ratio:.1f}x)")
    # Warm ratios get the same linearity gate when both files carry them:
    # warm time is per-plan execution with caches hot, so a superlinear warm
    # ratio is a REAL plan problem (cold can at least blame asset builds and
    # page-cache misses). Floor stays: sub-second warm baselines are
    # overhead-dominated and their ratios are noise. Reporting mirrors the
    # cold loop exactly (PASS lines, one-file WARNs, labeled worst entry)
    # so the log shows warm WAS exercised.
    warm_base, warm_scaled = base.get("queries_warm", {}), scaled.get("queries_warm", {})
    # Warm eligibility depends ONLY on warm timings existing at both scales —
    # intersecting with the cold `common` set would silently ungate a query
    # whose warm pair is complete but whose cold entry is missing/errored at
    # one scale (it would get neither a gate nor a WARN).
    warm_common = sorted(set(warm_base) & set(warm_scaled))
    for name in sorted(set(warm_base) ^ set(warm_scaled)):
        print(f"WARN {name}: warm timing present at only one scale, not gated")
    for name in sorted(set(warm_common) - set(common)):
        print(f"WARN {name}: warm gated but cold was not ({name} missing from "
              f"cold at one scale)")
    worst = (worst[0], worst[1], "cold")
    for name in warm_common:
        b, s = warm_base[name], warm_scaled[name]
        ratio = s / b if b > 0 else float("inf")
        if ratio > worst[1]:
            worst = (name, ratio, "warm")
        if s > max(factor * max(b, min_base_s), floor_s,
                   per_query_floor.get(name, 0.0)):
            print(f"FAIL {name}: warm {s:.2f}s at scale vs {b:.2f}s base "
                  f"(ratio {ratio:.1f}x > {factor:.0f}x, floor {floor_s}s)")
            bad += 1
        else:
            print(f"PASS {name}: warm {b:.2f}s -> {s:.2f}s (ratio {ratio:.1f}x)")
    # Asset-build times (present since the bench split builds out of query
    # attribution) get the same linearity gate: a build whose cost explodes
    # superlinearly at 10x data is a real scale problem even though no
    # serving query shows it. Same floor reasoning as queries.
    a_base, a_scaled = base.get("assets", {}), scaled.get("assets", {})
    asset_common = sorted(set(a_base) & set(a_scaled))
    for name in sorted(set(a_base) ^ set(a_scaled)):
        print(f"WARN asset {name}: present at only one scale, not gated")
    for name in asset_common:
        b, s = a_base[name], a_scaled[name]
        ratio = s / b if b > 0 else float("inf")
        if ratio > worst[1]:
            worst = (name, ratio, "asset")
        if s > max(factor * max(b, min_base_s), floor_s):
            print(f"FAIL asset {name}: build {s:.2f}s at scale vs {b:.2f}s base "
                  f"(ratio {ratio:.1f}x > {factor:.0f}x, floor {floor_s}s)")
            bad += 1
        else:
            print(f"PASS asset {name}: {b:.2f}s -> {s:.2f}s (ratio {ratio:.1f}x)")
    print(f"scale gate: {len(common)} cold + {len(warm_common)} warm + "
          f"{len(asset_common)} asset gated, {bad} failures; "
          f"worst ratio {worst[1]:.1f}x ({worst[2]} {worst[0]})")
    return 1 if bad else 0


if len(sys.argv) > 1 and sys.argv[1] == "--scale":
    extra = {"floors_path": sys.argv[4]} if len(sys.argv) > 4 else {}
    sys.exit(scale_gate(*sys.argv[2:4], **extra))

if len(sys.argv) > 1 and sys.argv[1] == "--noise":
    sys.exit(noise_gate(sys.argv[2:]))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        gcols = [d[0] for d in con.description]
        want = con.execute(sql).fetchall()
        wcols = [d[0] for d in con.description]
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fail += 1
        continue
    # driver sorts columns by name before hashing values
    gperm = sorted(range(len(gcols)), key=lambda i: gcols[i])
    wperm = sorted(range(len(wcols)), key=lambda i: wcols[i])
    if sorted(gcols) != sorted(wcols):
        print(f"FAIL {name}: schema {sorted(gcols)} != {sorted(wcols)}")
        fail += 1
        continue
    # column types must agree too (e.g. BIGINT vs HUGEINT sums, INT vs
    # BIGINT row_number) — value compare alone can mask these
    gtypes = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()
    wtypes = con.execute(f"DESCRIBE {sql}").fetchall()
    gt = {r[0]: r[1] for r in gtypes}
    wt = {r[0]: r[1] for r in wtypes}
    mismatched = {c for c in gt if gt[c] != wt.get(c)}
    if mismatched:
        print(f"WARN {name}: column type mismatch "
              f"{[(c, gt[c], wt.get(c)) for c in sorted(mismatched)]}")
    g = [tuple(r[i] for i in gperm) for r in got]
    w = [tuple(r[i] for i in wperm) for r in want]

    def norm(rows):
        return [tuple(round(v, 9) if isinstance(v, float) else v for v in r)
                for r in rows]
    g, w = norm(g), norm(w)
    ordered = g == w
    unordered = sorted(map(repr, g)) == sorted(map(repr, w))
    if ordered:
        print(f"PASS {name}: {len(g)} rows (ordered exact)")
    elif unordered:
        print(f"WARN {name}: rows match only after sorting ({len(g)} rows)")
    else:
        fail += 1
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        gs, ws = set(map(repr, g)), set(map(repr, w))
        for d in list(gs - ws)[:3]:
            print(f"   spark-only: {d[:200]}")
        for d in list(ws - gs)[:3]:
            print(f"   duck-only:  {d[:200]}")
sys.exit(1 if fail else 0)
