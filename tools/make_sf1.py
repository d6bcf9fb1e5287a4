#!/usr/bin/env python3
"""Synthesize a ~sf1 table set for the r17 oracle spot-sweep: replicate
sf0.1's documents/events/embeddings 10x with shifted ids (the Stress
replication scheme - text/payload content repeats, so dedup gates see a
dup-heavy corpus, their hardest regime), copy the TPC-H tables verbatim
(the spot-swept gates never read them; check_oracle still needs the
files present to create its views).

Usage: python3 tools/make_sf1.py [srcDir] [dstDir] [factor]
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SHIFT = 10_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

REPL = {
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation", "customer", "supplier", "part", "orders",
        "lineitem"]

for t, keys in REPL.items():
    cols = con.sql(f"SELECT * FROM '{SRC}/{t}.parquet' LIMIT 0").columns
    sel = ", ".join(
        f"{c} + i * {SHIFT} AS {c}" if c in keys else c for c in cols)
    con.sql(f"""
        COPY (SELECT {sel}
              FROM read_parquet('{SRC}/{t}.parquet'), range({FACTOR}) r(i)
              ORDER BY {keys[0]})
        TO '{DST}/{t}.parquet' (FORMAT PARQUET)""")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")

for t in COPY:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
print(f"wrote {DST}")
