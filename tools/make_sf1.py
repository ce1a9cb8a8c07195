#!/usr/bin/env python3
"""Scale the driver testdata one notch up (default sf0.1 -> "sf1")
with referential integrity, for the full-suite oracle gate at 10x the
bench scale (docs/SCALING.md "sf1 gate").

Relational tables replicate `copies` times with per-table key strides
(max(key)+1, so ids never collide) and every foreign key remapped by
the SAME stride as its target table — join cardinalities per key stay
exactly what the driver generated, while table sizes scale linearly
(the TPC-H scaling shape: dims region/nation fixed, fact/entity
tables linear). Key-derived names (Customer#%09d / Supplier#%09d) are
regenerated from the new keys so uniqueness survives; monetary values
get a small deterministic jitter (±1.00) so replicas are not
byte-identical and global top-k orderings keep realistic tie density;
dates/timestamps replicate unchanged (TPC-H dates do not scale with
SF — density grows, range does not).

documents/embeddings go through make_scale_corpus.py's BANDED
near-duplicate replication (copies bands of 1 => dup-group count
scales, group size constant — see that tool's docstring).

Usage: python3 tools/make_sf1.py [srcDir] [outDir] [copies]
Then:  sbt "runMain graft.Verify <outDir> /tmp/verify_sf1"
       python3 tools/check_oracle.py <outDir> /tmp/verify_sf1
"""
import os
import shutil
import subprocess
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(out, exist_ok=True)
con = duckdb.connect()


def stride(table, key):
    return con.sql(
        f"SELECT max({key}) + 1 FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]


CS = stride("customer", "c_custkey")
SS = stride("supplier", "s_suppkey")
PS = stride("part", "p_partkey")
OS = stride("orders", "o_orderkey")
ES = stride("events", "event_id")
US = stride("events", "user_id")

# fixed dims: straight copies (region/nation never scale in TPC-H)
for t in ("region", "nation"):
    shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")

K = f"generate_series(0, {copies - 1}) AS g(k)"
jit = lambda key: f"((({key}) * 31 + k) % 200 - 100) * 0.01"

con.sql(f"""
COPY (
  SELECT (c_custkey + k * {CS})::BIGINT AS c_custkey,
    'Customer#' || lpad((c_custkey + k * {CS})::VARCHAR, 9, '0') AS c_name,
    c_nationkey, round(c_acctbal + {jit('c_custkey')}, 2) AS c_acctbal,
    c_mktsegment
  FROM read_parquet('{src}/customer.parquet'), {K}
) TO '{out}/customer.parquet' (FORMAT PARQUET)
""")
con.sql(f"""
COPY (
  SELECT (s_suppkey + k * {SS})::BIGINT AS s_suppkey,
    'Supplier#' || lpad((s_suppkey + k * {SS})::VARCHAR, 9, '0') AS s_name,
    s_nationkey, round(s_acctbal + {jit('s_suppkey')}, 2) AS s_acctbal
  FROM read_parquet('{src}/supplier.parquet'), {K}
) TO '{out}/supplier.parquet' (FORMAT PARQUET)
""")
con.sql(f"""
COPY (
  SELECT (p_partkey + k * {PS})::BIGINT AS p_partkey,
    p_name, p_brand, p_type, p_size,
    round(p_retailprice + {jit('p_partkey')}, 2) AS p_retailprice
  FROM read_parquet('{src}/part.parquet'), {K}
) TO '{out}/part.parquet' (FORMAT PARQUET)
""")
con.sql(f"""
COPY (
  SELECT (o_orderkey + k * {OS})::BIGINT AS o_orderkey,
    (o_custkey + k * {CS})::BIGINT AS o_custkey,
    o_orderstatus, round(o_totalprice + {jit('o_orderkey')}, 2) AS o_totalprice,
    o_orderdate, o_orderpriority
  FROM read_parquet('{src}/orders.parquet'), {K}
) TO '{out}/orders.parquet' (FORMAT PARQUET)
""")
con.sql(f"""
COPY (
  SELECT (l_orderkey + k * {OS})::BIGINT AS l_orderkey,
    (l_partkey + k * {PS})::BIGINT AS l_partkey,
    (l_suppkey + k * {SS})::BIGINT AS l_suppkey,
    l_linenumber, l_quantity,
    round(l_extendedprice + {jit('l_orderkey * 7 + l_linenumber')}, 2)
      AS l_extendedprice,
    l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{src}/lineitem.parquet'), {K}
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")
# events goes through pyarrow so the replica's ts keeps the SOURCE's
# timestamp unit: the driver has generated events.ts as TIMESTAMP(NANOS)
# in some rounds and TIMESTAMP(MICROS) in others, and Tables.load
# detects the unit per file — so the sf1 replica must match its source
# (DuckDB's writer would silently downgrade NANOS to µs).
import pyarrow as pa
import pyarrow.parquet as pq

src_ts_type = pq.read_schema(f"{src}/events.parquet").field("ts").type
ev = con.sql(f"""
  SELECT (event_id + k * {ES})::BIGINT AS event_id, ts,
    (user_id + k * {US})::BIGINT AS user_id,
    event_type, round(value + {jit('event_id')}, 2) AS value, props
  FROM read_parquet('{src}/events.parquet'), {K}
""").arrow()
idx = ev.schema.get_field_index("ts")
ev = ev.set_column(idx, "ts", ev.column("ts").cast(src_ts_type))
pq.write_table(ev, f"{out}/events.parquet")

# documents + embeddings: banded near-dup replication (group count
# scales, group size constant) via the existing tool
subprocess.run(
    [sys.executable, os.path.join(os.path.dirname(__file__), "make_scale_corpus.py"),
     src, out, str(copies), str(copies)],
    check=True)

for t in ("customer", "supplier", "part", "orders", "lineitem", "events",
          "documents", "embeddings"):
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(t, n)
