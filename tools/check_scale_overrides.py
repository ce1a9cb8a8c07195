#!/usr/bin/env python3
"""Assert every scale-form oracle override is EXACTLY equivalent to
the committed oracle it replaces, at a scale where both can run.

Usage: python3 tools/check_scale_overrides.py <sfDir> <verifyOutDir>

For each non-underscore key in tools/oracle_scale_overrides.json:
run BOTH the committed oracle (from <verifyOutDir>/oracle_sql.json)
and the override against the same DuckDB views and require identical
frames (values AND dtypes). This is the precondition for an sf1 gate
run that passes the overrides file to check_oracle.py — the override
proves itself at sf0.01 before standing in at sf1.
"""
import json
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main(sf_dir: str, out_dir: str) -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    raw = json.load(open(os.path.join(here, "oracle_scale_overrides.json")))
    overrides = {k: v for k, v in raw.items() if not k.startswith("_")}
    committed = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = 0
    for name, sql in sorted(overrides.items()):
        if name not in committed:
            print(f"FAIL {name}: override has no committed oracle")
            bad += 1
            continue
        a = con.sql(committed[name]).df()
        b = con.sql(sql).df()
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            bad += 1
        elif not (a.dtypes == b.dtypes).all():
            print(f"FAIL {name}: dtypes differ: {list(a.dtypes)} vs {list(b.dtypes)}")
            bad += 1
        elif not a.equals(b):
            print(f"FAIL {name}: values differ ({len(a)} vs {len(b)} rows)")
            bad += 1
        else:
            print(f"PASS {name}: override == committed oracle ({len(a)} rows)")
    print(f"== {len(overrides) - bad} pass, {bad} fail ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
