#!/usr/bin/env python3
"""Build the replicated adversarial corpus used by docs/SCALING.md.

Each copy k of a document perturbs every 5th word (offset by doc_id)
with a copy-specific suffix, so copies are NEAR-duplicates (J ~ 0.4
vs their base) rather than byte-duplicates, and ~40% of shingles stay
shared across all copies — the worst case for posting self-joins.
Embeddings get a small deterministic per-copy shift.

`bands` (default 1) controls how the replicas group at larger scales:
with B bands, the `copies` replicas split into B mutually DISSIMILAR
bands (every 2nd word also carries the band id, so cross-band Jaccard
falls well under dedup thresholds) of copies/B near-duplicate members
each. This keeps dup-GROUP SIZE constant while GROUP COUNT scales —
the realistic shape for a 100x experiment (a corpus where every doc
has 99 near-dups makes the true pair OUTPUT itself quadratic, which
measures the corpus, not the engine).

Usage: python3 tools/make_scale_corpus.py [srcDir] [outDir] [copies] [bands]
Then:  sbt "runMain graft.tools.ScaleProbe <outDir> 50 12"
"""
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
bands = int(sys.argv[4]) if len(sys.argv) > 4 else 1
assert copies % bands == 0, "copies must divide evenly into bands"
per_band = copies // bands

import os
import shutil

os.makedirs(out, exist_ok=True)
con = duckdb.connect()
# Replica-id stride derived from the source corpus so ids never
# collide regardless of the source's doc_id range (a fixed stride
# silently corrupted larger corpora).
doc_stride = con.sql(
    f"SELECT max(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')"
).fetchone()[0]
vec_stride = con.sql(
    f"SELECT max(vec_id) + 1 FROM read_parquet('{src}/embeddings.parquet')"
).fetchone()[0]
con.sql(f"""
COPY (
  SELECT (doc_id + k * {doc_stride})::BIGINT AS doc_id,
    array_to_string(list_transform(string_split(text, ' '),
      (w, i) -> CASE
        WHEN (k // {per_band}) > 0 AND (i + doc_id) % 2 = 0
        THEN w || '~b' || (k // {per_band})::VARCHAR ||
             CASE WHEN (k % {per_band}) > 0 AND (i + doc_id) % 5 = 0
                  THEN '_' || (k % {per_band})::VARCHAR ELSE '' END
        WHEN (k % {per_band}) > 0 AND (i + doc_id) % 5 = 0
        THEN w || '_' || (k % {per_band})::VARCHAR
        ELSE w END), ' ') AS text,
    lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet'),
       generate_series(0, {copies - 1}) AS g(k)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
con.sql(f"""
COPY (
  SELECT (vec_id + k * {vec_stride})::BIGINT AS vec_id,
    list_transform(embedding,
      x -> (x + ((vec_id * 31 + k) % 7 - 3) * 0.01)::FLOAT) AS embedding,
    label
  FROM read_parquet('{src}/embeddings.parquet'),
       generate_series(0, {copies - 1}) AS g(k)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
# ScaleProbe / QueryTime warm up on lineitem (skip if a previous run
# already linked/copied it — copyfile onto an existing symlink to the
# source raises SameFileError after the data tables are written)
if not os.path.exists(f"{out}/lineitem.parquet"):
    shutil.copyfile(f"{src}/lineitem.parquet", f"{out}/lineitem.parquet")
print(con.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchall())
print(con.sql(f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchall())
