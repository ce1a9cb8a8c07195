#!/usr/bin/env python3
"""Freeze a driver bench artifact into BASELINE.md — the per-query
regression reference that makes the "within 2x of BASELINE" gate
mechanical (it was vacuous while no numeric baseline existed).

Usage: python3 tools/freeze_baseline.py [bench.json] [out.md]
Defaults: BENCH.out.json -> BASELINE.md
"""
import json
import re
import sys

args = [a for a in sys.argv[1:] if a != "--extend"]
extend = "--extend" in sys.argv[1:]
src = args[0] if len(args) > 0 else "BENCH.out.json"
out = args[1] if len(args) > 1 else "BASELINE.md"


def load_artifact(p):
    """A driver artifact is either the bench JSON itself or a wrapper
    whose `tail` embeds the bench's single JSON output line."""
    d = json.load(open(p))
    if "queries" not in d and "tail" in d:
        for line in d["tail"].splitlines():
            i = line.find('{"metric"')
            if i >= 0:
                return json.loads(line[i:].rstrip("\\n"))
        raise SystemExit(f"no bench JSON line found in {p}")
    return d


d = load_artifact(src)
queries = d["queries"]
medians = d.get("median", {})

if extend:
    # merge mode: keep every frozen number (regression continuity),
    # append ONLY queries the baseline does not know yet.
    # The merge anchors to the known table HEADER, not "the last line
    # starting with |" — a second table or trailing pipe-bearing notes
    # must never silently receive the new rows.
    body = open(out).read().splitlines()
    try:
        hdr = body.index("| query | best_s | median_s |")
    except ValueError:
        raise SystemExit(f"baseline table header not found in {out}")
    end = hdr + 2  # skip the |---| separator
    existing = set()
    while end < len(body) and body[end].startswith("|"):
        m = re.match(r"\|\s*([^|\s]+)\s*\|", body[end])
        if m:
            existing.add(m.group(1))  # any non-space name, not just \w+
        end += 1
    add = sorted(set(queries) - existing)
    if not add:
        raise SystemExit("nothing to extend: all bench queries already baselined")
    rows = []
    for name in add:
        best, med = queries[name], medians.get(name)
        rows.append(f"| {name} | {best:.4f} | "
                    + ("null" if med is None else f"{med:.4f}") + " |")
    body[end:end] = rows
    with open(out, "w") as f:
        f.write("\n".join(body) + ("\n" if not body[-1] == "" else ""))
    print(f"extended {out}: +{len(add)} queries ({', '.join(add)})")
    raise SystemExit(0)

lines = [
    "# BASELINE — per-query benchmark reference",
    "",
    "Frozen from ONE full-suite bench artifact (`BENCH.out.json`:",
    f"total best {d['value']:.1f} s over {len(queries)} queries, sf0.1,",
    f"local[32], runs={d.get('runs', '?')} + spread-gated retries) —",
    "single provenance, no mixed local/driver rows.",
    "These are the numbers the brief's \"within 2x of BASELINE.md at the",
    "same scale factor\" gate is checked against:",
    "`python3 tools/check_bench.py BENCH_r{N}.json` fails any query whose",
    "best-of-N exceeds 2x its baseline best. Queries added after the",
    "freeze are reported as `no-baseline` (informational) until the next",
    "refreeze; a refreeze must come from a full-suite driver artifact,",
    "never a filtered run (the artifact's `only`/`n_queries` fields make",
    "that mechanical).",
    "",
    "Environment note: the driver env runs ~30% slower than a quiet",
    "local sbt shell on broadcast-heavy queries (JIT/GC attribution in",
    "docs/SCALING.md) — the 2x bar absorbs that; per-query gc_ms/exec_ms",
    "in each artifact diagnose any residual.",
    "",
    "| query | best_s | median_s |",
    "|-------|--------|----------|",
]
for name in sorted(queries):
    best = queries[name]
    med = medians.get(name)
    best_s = "null" if best is None else f"{best:.4f}"
    med_s = "null" if med is None else f"{med:.4f}"
    lines.append(f"| {name} | {best_s} | {med_s} |")
lines.append("")
lines.append(f"total_best_s: {d['value']:.4f}")
lines.append(f"total_median_s: {d.get('total_median', 0.0):.4f}")
lines.append("")

with open(out, "w") as f:
    f.write("\n".join(lines))
print(f"wrote {out}: {len(queries)} queries, total {d['value']:.2f} s")
