#!/usr/bin/env python3
"""Freeze a driver bench artifact into BASELINE.md — the per-query
regression reference that makes the "within 2x of BASELINE" gate
mechanical (it was vacuous while no numeric baseline existed).

Usage: python3 tools/freeze_baseline.py [bench.json] [out.md]
Defaults: BENCH.out.json -> BASELINE.md
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "BENCH.out.json"
out = sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md"

d = json.load(open(src))
queries = d["queries"]
medians = d.get("median", {})

lines = [
    "# BASELINE — per-query benchmark reference",
    "",
    "Frozen from the round-5 DRIVER bench artifact (`BENCH.out.json`:",
    f"total best {d['value']:.1f} s over {len(queries)} queries, sf0.1,",
    f"local[32], runs={d.get('runs', '?')} + spread-gated retries).",
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
