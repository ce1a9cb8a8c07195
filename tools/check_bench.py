#!/usr/bin/env python3
"""Per-query bench regression gate: fail any query whose best-of-N
exceeds 2x its BASELINE.md best.

Usage: python3 tools/check_bench.py <bench.json> [BASELINE.md] [factor]
Exit 1 on any regression (or a failed/missing query); prints one line
per query outcome class.

Rules:
  - regression: bench best > factor x baseline best          -> FAIL
  - failed:     query errored in the bench run               -> FAIL
  - missing:    baseline query absent from the bench run     -> FAIL
                (unless the artifact declares an `only` filter)
  - no-baseline: new query, no frozen number yet             -> info
  - a filtered artifact (`only` field) gates just its subset.
"""
import json
import re
import sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH.out.json"
base_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md"
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

baseline = {}
for line in open(base_path):
    m = re.match(r"\|\s*(\w+)\s*\|\s*([0-9.]+|null)\s*\|\s*([0-9.]+|null)\s*\|", line)
    if m and m.group(2) != "null":
        baseline[m.group(1)] = float(m.group(2))
if not baseline:
    print(f"ERROR: no baseline rows parsed from {base_path}")
    sys.exit(2)

d = json.load(open(bench_path))
if "queries" not in d:
    # Driver wrapper format (BENCH_r{N}.json): {n, rc, sf, tail, parsed}.
    # Unwrap `parsed` (the driver's own parse of the bench JSON line) or
    # re-parse `tail`; if neither holds a queries dict (tail is a
    # truncated suffix), this is the wrong file for a per-query gate.
    inner = d.get("parsed")
    if not isinstance(inner, dict) or "queries" not in inner:
        try:
            inner = json.loads(d.get("tail", ""))
        except (json.JSONDecodeError, TypeError):
            inner = None
    if not isinstance(inner, dict) or "queries" not in inner:
        # The driver truncates `tail` to a byte suffix, so the full bench
        # line is usually cut — but Bench also prints a COMPACT summary
        # line ({"metric":..., "queries":{headline subset}, "full":...,
        # "ok":...}) near the end precisely so this gate can read the
        # artifact. Scan tail lines back-to-front for it.
        for line in reversed(d.get("tail", "").splitlines()):
            # sbt prefixes the line with "[info] "; strip to the JSON span.
            lo, hi = line.find("{"), line.rfind("}")
            if lo < 0 or hi <= lo:
                continue
            try:
                cand = json.loads(line[lo:hi + 1])
            except json.JSONDecodeError:
                continue
            if isinstance(cand, dict) and "queries" in cand:
                inner = cand
                break
    if not isinstance(inner, dict) or "queries" not in inner:
        print(f"ERROR: {bench_path} is a driver wrapper without a parsable "
              "bench line (truncated `tail`, null `parsed`) — run the gate "
              "on BENCH.out.json from graft.Bench instead")
        sys.exit(2)
    if "full" in inner and "only" not in inner:
        # The compact summary names the FULL per-query artifact in `full`
        # (written by the same bench run, next to the wrapper). Follow it
        # when it exists — gating only the 20-query headline subset masked
        # a real regression in round 12 (d21 at 3.78x went unreported).
        import os
        full_path = os.path.join(os.path.dirname(os.path.abspath(bench_path)),
                                 inner["full"])
        full = None
        try:
            cand = json.load(open(full_path))
            if isinstance(cand, dict) and "queries" in cand:
                full = cand
        except (OSError, json.JSONDecodeError):
            pass
        # same-run check: the compact summary carries the run's total
        # and query count — a stale BENCH.out.json left over from an
        # earlier run must NOT silently become the gate for this one
        if full is not None and (
                full.get("n_queries") != inner.get("n_queries")
                or abs(float(full.get("value", -1)) - float(inner.get("value", -2)))
                > 0.01):
            print(f"[warn] {inner['full']} next to {bench_path} is from a "
                  f"DIFFERENT run (total {full.get('value')}/"
                  f"{full.get('n_queries')}q vs the wrapper's "
                  f"{inner.get('value')}/{inner.get('n_queries')}q) — "
                  "refusing to substitute it")
            full = None
        if full is not None:
            print(f"[info] following compact summary's full artifact "
                  f"{inner['full']}: gating {len(full['queries'])} queries "
                  f"(summary alone covers {len(inner['queries'])})")
            inner = full
        else:
            # Fall back to the headline subset — but SAY so, loudly: a
            # regression outside this subset passes unseen here.
            print(f"[warn] full artifact {inner['full']} not readable next "
                  f"to {bench_path}; gating ONLY the "
                  f"{len(inner['queries'])}-query headline subset — "
                  f"coverage is NARROWED, re-run against {inner['full']}")
            inner["only"] = sorted(inner["queries"])
    d = inner
queries = d["queries"]
only = set(d.get("only", [])) or None

regressions, failed, infos = [], [], []
for name, best in sorted(queries.items()):
    if best is None:
        failed.append(name)
    elif name not in baseline:
        infos.append(f"no-baseline {name}: {best:.3f}s (freeze on next refresh)")
    elif best > factor * baseline[name]:
        regressions.append(
            f"{name}: {best:.3f}s > {factor:g}x baseline {baseline[name]:.3f}s "
            f"({best / baseline[name]:.2f}x)")

missing = sorted(set(baseline) - set(queries))
if only is not None:
    missing = []  # a declared diagnostic subset gates only itself

for msg in infos:
    print(f"[info] {msg}")
for name in failed:
    print(f"[FAIL] {name}: query errored in the bench run")
for name in missing:
    print(f"[FAIL] {name}: in baseline but absent from the bench artifact")
for msg in regressions:
    print(f"[FAIL] regression {msg}")

n_ok = len([q for q in queries if q in baseline and queries[q] is not None
            and queries[q] <= factor * baseline[q]])
print(f"checked {len(queries)} queries vs {base_path}: "
      f"{n_ok} within {factor:g}x, {len(regressions)} regressions, "
      f"{len(failed)} failed, {len(missing)} missing, {len(infos)} unbaselined")
sys.exit(1 if (regressions or failed or missing) else 0)
