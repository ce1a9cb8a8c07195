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

force = []
argv = []
refresh_only = False
it = iter(sys.argv[1:])
for a in it:
    if a == "--force":
        names = next(it, None)
        if names is None or names.startswith("--"):
            raise SystemExit("usage: --force q1,q2,... (comma-separated "
                             "query names must follow --force)")
        force.extend(names.split(","))
    elif a == "--refresh":
        refresh_only = True
    else:
        argv.append(a)
args = [a for a in argv if a != "--extend"]
extend = "--extend" in argv
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


if not refresh_only:
    d = load_artifact(src)
    queries = d["queries"]
    medians = d.get("median", {})


def refresh_summary(body):
    """Recompute the self-describing header row-count line and the
    total_best_s/total_median_s footer from the table itself, so an
    --extend can never leave them stale (the round-11 ding)."""
    hdr = body.index("| query | best_s | median_s |")
    n, tb, tm = 0, 0.0, 0.0
    i = hdr + 2
    while i < len(body) and body[i].startswith("|"):
        m = re.match(r"\|\s*\S+\s*\|\s*([0-9.]+|null)\s*\|\s*([0-9.]+|null)\s*\|",
                     body[i])
        if m:
            n += 1
            if m.group(1) != "null":
                tb += float(m.group(1))
            if m.group(2) != "null":
                tm += float(m.group(2))
        i += 1
    for j, line in enumerate(body):
        if re.match(r"^\d+ rows, frozen from", line):
            body[j] = f"{n} rows, frozen from full-suite local bench artifacts — all"
        elif line.startswith("total_best_s:"):
            body[j] = f"total_best_s: {tb:.4f}"
        elif line.startswith("total_median_s:"):
            body[j] = f"total_median_s: {tm:.4f}"
    return n, tb, tm


if refresh_only:
    body = open(out).read().splitlines()
    n, tb, tm = refresh_summary(body)
    with open(out, "w") as f:
        f.write("\n".join(body) + ("\n" if not body[-1] == "" else ""))
    print(f"refreshed {out} summary: {n} rows, total_best {tb:.2f} s, "
          f"total_median {tm:.2f} s")
    raise SystemExit(0)

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
            name = m.group(1)
            existing.add(name)
            if name in force and name in queries:
                best, med = queries[name], medians.get(name)
                body[end] = (f"| {name} | {best:.4f} | "
                             + ("null" if med is None else f"{med:.4f}") + " |")
                print(f"force-refroze {name}: best {best:.4f}")
        end += 1
    bad_force = sorted(n for n in force if n not in queries)
    if bad_force:
        raise SystemExit(f"--force names absent from the bench artifact "
                         f"(nothing refrozen for them): {', '.join(bad_force)}")
    unseen_force = sorted(n for n in force if n not in existing)
    if unseen_force:
        print(f"[info] --force names not yet in the baseline table (added "
              f"as new rows): {', '.join(unseen_force)}")
    add = sorted(set(queries) - existing)
    if not add and not force:
        raise SystemExit("nothing to extend: all bench queries already baselined")
    rows = []
    for name in add:
        best, med = queries[name], medians.get(name)
        rows.append(f"| {name} | {best:.4f} | "
                    + ("null" if med is None else f"{med:.4f}") + " |")
    body[end:end] = rows
    n, tb, tm = refresh_summary(body)
    with open(out, "w") as f:
        f.write("\n".join(body) + ("\n" if not body[-1] == "" else ""))
    print(f"extended {out}: +{len(add)} queries ({', '.join(add)}); "
          f"summary refreshed: {n} rows, total_best {tb:.2f} s")
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
